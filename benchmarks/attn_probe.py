#!/usr/bin/env python
"""Per-entry attention strategies inside a Pallas TPU kernel — microbench.

Round-2 finding (BENCH.md): the batch-48 production step is 5.50 ms vs a
3.32 ms pure-matmul chain; the remaining gap is the attention middle's
HBM round-trips (scores/weights tensors, ~150 MB/layer at f32). The
row-tiled fused kernel lost (40.5x) because flattening T entries into
rows makes the score matrix (T*lq, T*lq) — T x wasted MXU work on
block-diagonal masks. This probe times the candidate fixes at the
production shapes (Be=96 entries, lq=126 rows, F=512, H=8, dh=64):

  flat      scores (T*lq, T*lq) with block-diag mask (round-2 design)
  batched   rank-3 dot_general with batch dims: (T*H, lq, dh) -> scores
            (T*H, lq, lq) — tests Mosaic's batched-dot lowering
  unrolled  python loop over T entries, per-entry (lq, 3F)-sliced 2D dots
            (H folded into the lane dim where possible)

Each kernel computes ONLY the self-attention middle (QK^T, softmax, PV)
from pre-projected qkv rows, scanned n_steps times, entry-tiled with
grid=(n_tiles,). Prints one JSON line per variant. Run on the axon TPU.
"""

import functools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _timing import configure_cache, timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    configure_cache()

    Be = int(os.environ.get("MSMD_PROBE_BE", "96"))
    lq = int(os.environ.get("MSMD_PROBE_LQ", "126"))
    F = int(os.environ.get("MSMD_PROBE_F", "512"))
    H = int(os.environ.get("MSMD_PROBE_H", "8"))
    T = int(os.environ.get("MSMD_PROBE_TILE", "8"))  # entries per tile
    n_steps = int(os.environ.get("MSMD_BENCH_STEPS", "500"))
    dh = F // H
    n_tiles = Be // T
    scale = 1.0 / np.sqrt(dh)
    interp = jax.default_backend() == "cpu"

    rs = np.random.RandomState(0)
    qkv_host = rs.randn(Be * lq, 3 * F).astype(np.float32) * 0.1

    NEG = -1e30
    eye = np.eye(T, dtype=np.float32)
    self_mask = jnp.asarray((1.0 - np.kron(eye, np.ones((lq, lq), np.float32))) * NEG)

    results = {}

    # ---- flat: block-diagonal flattened rows (round-2 design) ------------
    def flat_kernel(qkv_ref, mask_ref, out_ref):
        qkv = qkv_ref[:]
        heads = []
        for h in range(H):
            q = qkv[:, h * dh : (h + 1) * dh].astype(jnp.bfloat16) * scale
            k = qkv[:, F + h * dh : F + (h + 1) * dh].astype(jnp.bfloat16)
            v = qkv[:, 2 * F + h * dh : 2 * F + (h + 1) * dh].astype(jnp.bfloat16)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) + mask_ref[:]
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            heads.append(jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32))
        out_ref[:] = jnp.concatenate(heads, axis=-1)

    @jax.jit
    def run_flat(qkv0):
        call = pl.pallas_call(
            flat_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((T * lq, 3 * F), lambda t: (t, 0)),
                pl.BlockSpec((T * lq, T * lq), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((T * lq, F), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((Be * lq, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )

        def body(x, _):
            y = call(x, self_mask)
            return jnp.concatenate([y, y, y], axis=-1) / (jnp.abs(y).max() + 1.0), None

        x, _ = jax.lax.scan(body, qkv0, None, length=n_steps)
        return x[..., 0].sum()

    # ---- batched: rank-3 dot_general with batch dims ---------------------
    def batched_kernel(qkv_ref, out_ref):
        qkv = qkv_ref[:]  # (T*lq, 3F)
        R = T * lq
        q = qkv[:, :F].reshape(T, lq, H, dh).transpose(0, 2, 1, 3).reshape(T * H, lq, dh)
        k = qkv[:, F : 2 * F].reshape(T, lq, H, dh).transpose(0, 2, 1, 3).reshape(T * H, lq, dh)
        v = qkv[:, 2 * F :].reshape(T, lq, H, dh).transpose(0, 2, 1, 3).reshape(T * H, lq, dh)
        s = jax.lax.dot_general(
            (q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # (T*H, lq, lq)
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
        o = jax.lax.dot_general(
            p, v.astype(jnp.bfloat16), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (T*H, lq, dh)
        out_ref[:] = o.reshape(T, H, lq, dh).transpose(0, 2, 1, 3).reshape(R, F)

    @jax.jit
    def run_batched(qkv0):
        call = pl.pallas_call(
            batched_kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((T * lq, 3 * F), lambda t: (t, 0))],
            out_specs=pl.BlockSpec((T * lq, F), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((Be * lq, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )

        def body(x, _):
            y = call(x)
            return jnp.concatenate([y, y, y], axis=-1) / (jnp.abs(y).max() + 1.0), None

        x, _ = jax.lax.scan(body, qkv0, None, length=n_steps)
        return x[..., 0].sum()

    # ---- unrolled: per-entry 2D dots, heads packed in the lane dim -------
    def unrolled_kernel(qkv_ref, out_ref):
        qkv = qkv_ref[:]
        for e in range(T):
            rows = qkv[e * lq : (e + 1) * lq]  # (lq, 3F)
            heads = []
            for h in range(H):
                q = rows[:, h * dh : (h + 1) * dh].astype(jnp.bfloat16) * scale
                k = rows[:, F + h * dh : F + (h + 1) * dh].astype(jnp.bfloat16)
                v = rows[:, 2 * F + h * dh : 2 * F + (h + 1) * dh].astype(jnp.bfloat16)
                s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                heads.append(jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                                 preferred_element_type=jnp.float32))
            out_ref[e * lq : (e + 1) * lq] = jnp.concatenate(heads, axis=-1)

    @jax.jit
    def run_unrolled(qkv0):
        call = pl.pallas_call(
            unrolled_kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((T * lq, 3 * F), lambda t: (t, 0))],
            out_specs=pl.BlockSpec((T * lq, F), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((Be * lq, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interp,
        )

        def body(x, _):
            y = call(x)
            return jnp.concatenate([y, y, y], axis=-1) / (jnp.abs(y).max() + 1.0), None

        x, _ = jax.lax.scan(body, qkv0, None, length=n_steps)
        return x[..., 0].sum()

    # ---- XLA reference: batched einsum attention -------------------------
    @jax.jit
    def run_xla(qkv0):
        def body(x, _):
            q = x[:, :F].reshape(Be, lq, H, dh)
            k = x[:, F : 2 * F].reshape(Be, lq, H, dh)
            v = x[:, 2 * F :].reshape(Be, lq, H, dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(jnp.bfloat16),
                           k.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            y = o.reshape(Be * lq, F)
            return jnp.concatenate([y, y, y], axis=-1) / (jnp.abs(y).max() + 1.0), None

        x, _ = jax.lax.scan(body, qkv0, None, length=n_steps)
        return x[..., 0].sum()

    qkv0 = jnp.asarray(qkv_host)
    variants = [("xla_einsum", run_xla), ("flat", run_flat),
                ("batched", run_batched), ("unrolled", run_unrolled)]
    if os.environ.get("MSMD_PROBE_ONLY"):
        keep = set(os.environ["MSMD_PROBE_ONLY"].split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, fn in variants:
        try:
            dt = timeit(fn, qkv0)
            results[name] = dt
            print(json.dumps({"probe": name, "wall_s": round(dt, 4),
                              "per_step_us": round(dt / n_steps * 1e6, 1)}), flush=True)
        except Exception as e:  # lowering failures are a probe RESULT
            print(json.dumps({"probe": name, "error": f"{type(e).__name__}: {str(e)[:300]}"}),
                  flush=True)

    print(json.dumps({"probe": "summary", "Be": Be, "lq": lq, "tile": T,
                      **{k: round(v / n_steps * 1e6, 1) for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
