#!/usr/bin/env python
"""Checkpoint conversion tool: reference torch `.pt` <-> msmd-tpu.

Usage:
  # inspect a checkpoint (either format)
  python scripts/convert_checkpoint.py inspect <path.pt>

  # reference .pt -> orbax-native TrainState (for fast TPU resume)
  python scripts/convert_checkpoint.py to-native <exp_dir_with_args_json> <path.pt> <out_exp_dir>

  # verify a reference .pt round-trips through the flax param mapping
  python scripts/convert_checkpoint.py roundtrip <exp_dir_with_args_json> <path.pt>
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


def cmd_inspect(args):
    from msmd_tpu.train.checkpoint import load_reference_pt

    cfg_args, model_sd, style_sd, it = load_reference_pt(args.ckpt)
    print(f"iteration: {it}")
    print(f"args keys: {sorted(cfg_args)[:12]}{' ...' if len(cfg_args) > 12 else ''}")
    n_model = sum(int(np.prod(v.shape)) for v in model_sd.values())
    n_style = sum(int(np.prod(v.shape)) for v in style_sd.values())
    print(f"model:     {len(model_sd)} tensors, {n_model:,} params")
    print(f"style_enc: {len(style_sd)} tensors, {n_style:,} params")


def cmd_roundtrip(args):
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.interop.msmd_checkpoint import (
        flax_to_reference_msmd,
        flax_to_reference_style_enc,
        reference_msmd_to_flax,
        reference_style_enc_to_flax,
    )
    from msmd_tpu.train.checkpoint import load_reference_pt

    cfg = MSMDConfig.load_args_json(args.exp_dir)
    _, model_sd, style_sd, _ = load_reference_pt(args.ckpt)
    model_params = reference_msmd_to_flax(model_sd, cfg)
    style_params = reference_style_enc_to_flax(style_sd)
    back_m = flax_to_reference_msmd(model_params, cfg)
    back_s = flax_to_reference_style_enc(style_params)
    bad = 0
    for name, sd, back in (("model", model_sd, back_m), ("style_enc", style_sd, back_s)):
        for k, v in sd.items():
            if k not in back:
                print(f"[{name}] missing on export: {k}")
                bad += 1
            elif not np.allclose(back[k], v, atol=1e-6):
                print(f"[{name}] mismatch: {k}")
                bad += 1
    print("round-trip OK" if bad == 0 else f"{bad} mismatches")
    sys.exit(1 if bad else 0)


def cmd_to_native(args):
    import jax

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.interop.msmd_checkpoint import reference_msmd_to_flax, reference_style_enc_to_flax
    from msmd_tpu.train import checkpoint as ckpt
    from msmd_tpu.train.checkpoint import load_reference_pt
    from msmd_tpu.train.loop import TrainState, make_optimizer

    cfg = MSMDConfig.load_args_json(args.exp_dir)
    _, model_sd, style_sd, it = load_reference_pt(args.ckpt)
    params = {
        "model": reference_msmd_to_flax(model_sd, cfg),
        "style_enc": reference_style_enc_to_flax(style_sd),
    }
    tx = make_optimizer(cfg, params)
    state = TrainState(step=jax.numpy.asarray(it, jax.numpy.int32), params=params, opt_state=tx.init(params))
    out = ckpt.save_native(args.out_dir, state, it)
    cfg.save_args_json(args.out_dir)
    print(f"wrote {out}")


def main():
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("inspect")
    p.add_argument("ckpt")
    p.set_defaults(fn=cmd_inspect)

    p = sub.add_parser("roundtrip")
    p.add_argument("exp_dir")
    p.add_argument("ckpt")
    p.set_defaults(fn=cmd_roundtrip)

    p = sub.add_parser("to-native")
    p.add_argument("exp_dir")
    p.add_argument("ckpt")
    p.add_argument("out_dir")
    p.set_defaults(fn=cmd_to_native)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
