#!/usr/bin/env python
"""Vertex-MSE parity evaluation (the BASELINE.json fidelity metric).

Compares two sets of generated motion coefficients — e.g. this
framework's `inference.py` outputs vs the PyTorch reference's — in
FLAME vertex space: decode both expression/head-rotation tracks to
(T, 5023, 3) vertices and report MSE / max error.

Inputs are the pkl pairs both pipelines emit
(overall_exp_code_*.pkl + overall_head_rot_*.pkl, denormalized).
Requires the licensed FLAME generic_model.pkl; without it, pass
--synthetic to use the structurally identical random test model (valid
for checking two runs of THIS framework against each other, not for
absolute numbers).

Usage:
  python scripts/eval_vertex_mse.py \
      --exp_a ours_exp.pkl --rot_a ours_rot.pkl \
      --exp_b ref_exp.pkl  --rot_b ref_rot.pkl \
      [--flame_model_path generic_model.pkl | --synthetic] \
      [--exp_dim_is_flame]   # 50-dim FLAME exp layout instead of 64-dim codes
"""

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_track(exp_path, rot_path):
    with open(exp_path, "rb") as f:
        exp = np.asarray(pickle.load(f), np.float32)
    with open(rot_path, "rb") as f:
        rot = np.asarray(pickle.load(f), np.float32)
    return exp, rot


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_a", required=True)
    parser.add_argument("--rot_a", required=True)
    parser.add_argument("--exp_b", required=True)
    parser.add_argument("--rot_b", required=True)
    parser.add_argument("--flame_model_path", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--exp_dim_is_flame", action="store_true",
                        help="expression tracks are 50-dim FLAME coefs; decode through FLAME directly")
    args = parser.parse_args()

    import jax.numpy as jnp

    from msmd_tpu.models.flame import FLAMEConfig, flame_forward, load_flame, synthetic_flame

    exp_a, rot_a = load_track(args.exp_a, args.rot_a)
    exp_b, rot_b = load_track(args.exp_b, args.rot_b)
    T = min(len(exp_a), len(exp_b))
    exp_a, rot_a, exp_b, rot_b = exp_a[:T], rot_a[:T], exp_b[:T], rot_b[:T]

    report = {
        "frames": int(T),
        "exp_mse": float(np.mean((exp_a - exp_b) ** 2)),
        "rot_mse_deg2": float(np.mean((rot_a - rot_b) ** 2)),
    }

    if args.exp_dim_is_flame and exp_a.shape[1] >= 50:
        if args.synthetic:
            flame = synthetic_flame()
        elif args.flame_model_path:
            flame = load_flame(FLAMEConfig(flame_model_path=args.flame_model_path))
        else:
            flame = None
        if flame is not None:
            shape = jnp.zeros((T, 100))

            def decode(exp, rot):
                pose = jnp.concatenate(
                    [jnp.deg2rad(jnp.asarray(rot)), jnp.zeros((T, 3))], axis=1
                )  # [global ypr -> aa approx, zero jaw]
                v, _, _ = flame_forward(flame, shape, jnp.asarray(exp[:, :50]), pose)
                return np.asarray(v)

            va, vb = decode(exp_a, rot_a), decode(exp_b, rot_b)
            report["vertex_mse"] = float(np.mean((va - vb) ** 2))
            report["vertex_max_err"] = float(np.abs(va - vb).max())
    else:
        report["note"] = (
            "expression codes are latent (64-dim MSMD layout); vertex decode needs the user's "
            "facial-reconstruction decoder (reference README.MD:79) — coefficient-space MSE reported instead"
        )

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
