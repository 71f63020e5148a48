#!/usr/bin/env python
"""Cross-framework fidelity certificate (BASELINE.md north-star fidelity
metric; VERDICT r1 item 4).

Runs the COMPLETE generation path — raw 16 kHz audio -> windowed
autoregressive CFG DDPM -> motion coefficients — through BOTH frameworks
with identical weights and identical noise:

  A. this framework (msmd_tpu.inference_lib.infer_coeffs, jit/lax.scan)
  B. a full PyTorch oracle of the reference (HF wav2vec2 + the reference
     denoiser architecture + the reference sampling loop verbatim,
     msmd_tpu/interop/torch_oracle.py; reference inference.py:35-75)

Weights flow through the production converter (flax_to_reference_msmd ->
torch load_state_dict(strict)).

Methodology. The DDPM reverse process amplifies per-step float error
exponentially (each step's update has gain > 1 through the CFG mix), so
comparisons across PRECISIONS are meaningless over a full run — the
chaos control (the torch oracle against itself, f32 vs f64) diverges to
O(1). The certificate therefore reports:
  1. float64 end-to-end max error (the SEMANTIC equivalence proof),
  2. float32 cross-framework divergence at matched precision (how
     tightly the two implementations' f32 arithmetic tracks),
  3. the chaos control: the torch oracle's own f32-vs-f64 divergence,
     showing what ANY precision mismatch does to this system.
Also decodes both f64 tracks to FLAME vertex space (synthetic FLAME).

Usage: JAX_PLATFORMS=cpu python scripts/fidelity_certificate.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main():
    import os

    # force the CPU backend: the parity oracle is torch-CPU, and the axon
    # environment pre-sets JAX_PLATFORMS=axon (see tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.flame import flame_forward, synthetic_flame
    from test_fidelity_e2e import run_both, tiny_cfg

    full = "--full" in sys.argv
    if full:
        # FLAGSHIP width/depth (VERDICT r2 item 4): 512-dim / 8-layer /
        # 8-head / mlp_ratio 4 — the exact shapes of the production
        # serving path (fused-QKV einsums, identity-band elimination, KV
        # cache all take their shape-dependent branches here). Steps cut
        # to 50 and windows to 2.4 so the f64 torch oracle finishes on
        # CPU; step count does not change any shape-dependent code path.
        cfg = MSMDConfig(
            feature_dim=512, n_heads=8, n_layers=8, mlp_ratio=4, d_style=256,
            n_motions=100, n_prev_motions=25, n_diff_steps=50, num_of_basis=4,
            use_indicator=True,
        )
        cfg_desc = "FLAGSHIP feature_dim=512 L=8 H=8 mlp=4 n_motions=100 n_prev=25 T=50, 3 windows (padded tail)"
    else:
        # full window structure (100 motions / 25 prev), reduced width/
        # depth/steps so the double-precision torch oracle runs quickly
        cfg = MSMDConfig(
            feature_dim=64, n_heads=4, n_layers=2, mlp_ratio=2, d_style=32,
            n_motions=100, n_prev_motions=25, n_diff_steps=50, num_of_basis=4,
            use_indicator=True,
        )
        cfg_desc = "feature_dim=64 L=2 n_motions=100 n_prev=25 T=50, 3 windows (padded tail)"

    t0 = time.perf_counter()
    ours64, theirs64 = run_both(cfg, n_windows_f=2.4, f64=True)
    t64 = time.perf_counter() - t0
    f64_max = float(np.abs(ours64 - theirs64).max())

    ours32, theirs32 = run_both(cfg, n_windows_f=2.4, f64=False)
    f32_cross = float(np.abs(ours32 - theirs32).max())
    f32_cross_mse = float(np.mean((ours32 - theirs32) ** 2))
    chaos = float(np.abs(theirs32.astype(np.float64) - theirs64).max())

    # vertex-space decode of the f64 tracks through the same synthetic FLAME
    flame = synthetic_flame()
    T = ours64.shape[0]

    def decode(coefs):
        coefs = np.asarray(coefs, np.float64)
        exp = jnp.asarray(coefs[:, :50])
        pose = jnp.concatenate([jnp.asarray(coefs[:, 64:67]), jnp.zeros((T, 3))], axis=1)
        v, _, _ = flame_forward(flame, jnp.zeros((T, 100)), exp, pose)
        return np.asarray(v)

    va, vb = decode(ours64), decode(theirs64)
    vert_mse = float(np.mean((va - vb) ** 2))
    vert_max = float(np.abs(va - vb).max())

    report = {
        "config": cfg_desc,
        "frames": int(T),
        "f64_semantic_max_err": f64_max,
        "f64_vertex_mse": vert_mse,
        "f64_vertex_max_err": vert_max,
        "f32_cross_framework_max_err": f32_cross,
        "f32_cross_framework_mse": f32_cross_mse,
        "f32_chaos_control_max_err (torch f32 vs torch f64)": chaos,
        "f64_wall_seconds": round(t64, 1),
        "pass": bool(f64_max < 1e-7 and f32_cross < max(10.0 * chaos, 1e-4)),
    }
    print(json.dumps(report, indent=2))

    cert = Path(__file__).resolve().parent.parent / ("PARITY_CERT_FULL.md" if full else "PARITY_CERT.md")
    cert.write_text(
        "# Cross-framework fidelity certificate\n\n"
        "Generated by `scripts/fidelity_certificate.py` (the same pipeline is\n"
        "asserted per-commit at tiny scale by `tests/test_fidelity_e2e.py`).\n\n"
        "The COMPLETE generation path — raw audio -> wav2vec2 features ->\n"
        "windowed autoregressive CFG DDPM (3 windows, prev-motion carry, noise\n"
        "reuse, indicator tail masking, dynamic threshold (0,1,4)) -> motion\n"
        "coefficients — runs in both this framework (jit + lax.scan) and a full\n"
        "PyTorch oracle of the reference (reference inference.py:35-75,\n"
        "model.py:282-440) with identical weights (via flax_to_reference_msmd,\n"
        "strict load) and identical noise (motion_at_T + per-step z override).\n\n"
        "**Methodology.** The DDPM reverse process amplifies per-step float\n"
        "error exponentially, so f32 bitwise parity over a full run is\n"
        "impossible for ANY two implementations (two builds of the torch\n"
        "reference diverge identically — see the chaos control). The f64 row is\n"
        "the semantic-equivalence proof; the f32 rows show the cross-framework\n"
        "divergence is the same magnitude as torch's own f32-vs-f64 chaos.\n\n"
        "```json\n" + json.dumps(report, indent=2) + "\n```\n\n"
        "Vertex rows decode both f64 coefficient tracks through the same\n"
        "structure-identical synthetic FLAME (the licensed generic_model.pkl\n"
        "cannot ship; see scripts/eval_vertex_mse.py --synthetic).\n"
    )
    print(f"wrote {cert}")
    if not report["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
