#!/usr/bin/env python
"""Batch-48 step decomposition: fused decoder kernel ALONE in a
500-step scan vs the full sampler step, at the exact production shapes.
The difference is the per-step prologue/epilogue glue that still runs
as XLA ops outside the kernel (feature proj + token build, motion
decode, CFG mix, DDPM update, scan scaffolding). Run on the axon TPU.

Env: MSMD_PROBE_TILE (default 8), MSMD_PROBE_RESIDENT=1 (layer-outer
grid), MSMD_PROBE_PAD=1 (sublane padding), MSMD_BENCH_STEPS.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _timing import configure_cache, timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    configure_cache()
    import msmd_tpu.ops.pallas.decoder_kernel as dk
    from msmd_tpu.ops.pallas.decoder_kernel import (
        build_identity_band_aux,
        fused_decoder_forward,
        fused_decoder_forward_resident,
    )

    # VPU-stage ablation (MSMD_ABLATE=softmax,gelu,ln): replace a stage
    # with a shape-preserving cheap op to measure its serialized in-kernel
    # cost. Numerically WRONG on purpose — timing probe only.
    ablate = set(filter(None, os.environ.get("MSMD_ABLATE", "").split(",")))
    if "softmax" in ablate:
        dk._softmax = lambda s, axis=-1: s * jnp.float32(1e-3)
    if "gelu" in ablate:
        dk._gelu = lambda x: x * jnp.float32(0.5)
    if "ln" in ablate:
        dk._layernorm = lambda x, scale, bias, eps=1e-5: x * scale + bias

    B = int(os.environ.get("MSMD_PROBE_BATCH", "48"))
    E = 2  # live CFG entries after dead-entry elimination
    Be = B * E
    n_prev, n_cur, F, H, L, FFN = 10, 100, 512, 8, 8, 2048
    lq, lm = 1 + n_prev + n_cur, n_prev + n_cur
    tile = int(os.environ.get("MSMD_PROBE_TILE", "8"))
    resident = os.environ.get("MSMD_PROBE_RESIDENT") == "1"
    pad = os.environ.get("MSMD_PROBE_PAD") == "1"
    pad_lq = ((lq + 7) // 8) * 8 if (pad and lq % 8) else 0
    n_steps = int(os.environ.get("MSMD_BENCH_STEPS", "500"))
    interp = jax.default_backend() == "cpu"

    rs = np.random.RandomState(0)
    pack = {
        "wqkv": rs.randn(L, F, 3 * F) * 0.02, "bqkv": rs.randn(L, 1, 3 * F) * 0.01,
        "wso": rs.randn(L, F, F) * 0.02, "bso": rs.randn(L, 1, F) * 0.01,
        "wcq": rs.randn(L, F, F) * 0.02, "bcq": rs.randn(L, 1, F) * 0.01,
        "wco": rs.randn(L, F, F) * 0.02, "bco": rs.randn(L, 1, F) * 0.01,
        "wf1": rs.randn(L, F, FFN) * 0.02, "bf1": rs.randn(L, 1, FFN) * 0.01,
        "wf2": rs.randn(L, FFN, F) * 0.02, "bf2": rs.randn(L, 1, F) * 0.01,
        "ln_scale": np.ones((L, 3, F)), "ln_bias": np.zeros((L, 3, F)),
    }
    pack = {
        k: jnp.asarray(v, jnp.float32 if k.startswith("ln") else jnp.bfloat16)
        for k, v in pack.items()
    }
    km = jnp.asarray(rs.randn(L, Be * lm, F) * 0.1, jnp.bfloat16)
    vm = jnp.asarray(rs.randn(L, Be * lm, F) * 0.1, jnp.bfloat16)
    aux = build_identity_band_aux(tile, pad_lq or lq, lm, dtype=jnp.bfloat16)
    x0 = jnp.asarray(rs.randn(Be, lq, F) * 0.1, jnp.float32)
    # MSMD_PROBE_VMW: 0 = in-kernel gather (off), 1 = hoisted projected
    # V-gather streamed in bf16, f32 = same in f32 (2x DMA)
    vmw_mode = os.environ.get("MSMD_PROBE_VMW", "0")
    vmw = None
    if vmw_mode != "0":
        vmw = dk.build_vmw(
            aux[3], vm, pack["wco"], Be // tile,
            out_dtype=jnp.float32 if vmw_mode == "f32" else jnp.bfloat16,
        )

    import functools

    @jax.jit
    def kernel_scan(x0):
        def body(c, _):
            if resident:
                out = fused_decoder_forward_resident(
                    pack, km, vm, c, aux, n_heads=H, tile_entries=tile,
                    pad_lq=pad_lq, interpret=interp,
                )
            else:
                out = fused_decoder_forward(
                    pack, km, vm, c, None, aux, n_heads=H, tile_entries=tile,
                    per_entry_attention=True, pad_lq=pad_lq, interpret=interp,
                )
            # cheap bounded feedback so the scan carries state (values
            # contract toward 0; magnitude stays sane over 500 steps)
            return out * jnp.float32(0.05), None

        out, _ = jax.lax.scan(body, x0, None, length=n_steps)
        return jnp.sum(out)

    dt = timeit(kernel_scan, x0)
    print(json.dumps({
        "probe": "decoder48_kernel_only",
        "ablate": sorted(ablate),
        "tile": tile, "resident": resident, "pad_lq": pad_lq,
        "batch": B, "n_steps": n_steps,
        "wall_s": round(dt, 4), "per_step_us": round(dt / n_steps * 1e6, 1),
    }))


if __name__ == "__main__":
    main()
