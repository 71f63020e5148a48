#!/usr/bin/env python
"""Batch-48 (throughput-regime) denoiser decomposition on the real chip.

bench.py measures 57.5x RT at batch 48 = 6.6 ms/step for the denoiser
(latency_probe.py shows scaffold fully overlapped). The pure-matmul
roofline is ~3.4 ms/step (677 GFLOP at 197 TFLOP/s), i.e. ~52% MXU.
This probe attributes the gap by timing 500-step scans of stripped
decoder variants at the exact production shapes (Be=96, 126 rows, 512
dims, 8 layers):

  matmul_chain  ONLY the 6 big per-layer matmuls (qkv/proj/cq/co/f1/f2)
                chained, no attention math, no LN — the practical MXU
                ceiling including layout/pipeline effects
  attn_only     self+cross attention math on fixed qkv (einsum softmax
                einsum per layer) — head-layout transpose + softmax cost
  full          the production TransformerDecoder stack (KV-cached)

Prints one JSON line per probe.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from _timing import configure_cache, timeit  # noqa: E402


def main():
    import jax

    configure_cache()
    import jax.numpy as jnp

    n_steps = int(os.environ.get("MSMD_BENCH_STEPS", "500"))
    Be = int(os.environ.get("MSMD_PROBE_BE", "96"))  # 48 windows x 2 CFG entries
    R, F, H, L, FFN = 126, 512, 8, 8, 2048
    M = 125
    dh = F // H
    key = jax.random.PRNGKey(0)

    def t_scan(body, x0):
        @jax.jit
        def run(x0):
            x, _ = jax.lax.scan(lambda c, _: (body(c), None), x0, None, length=n_steps)
            return x[..., 0].sum()

        return timeit(run, x0)

    ws = {
        "wqkv": jax.random.normal(key, (L, F, 3 * F), jnp.bfloat16) * 0.02,
        "wso": jax.random.normal(key, (L, F, F), jnp.bfloat16) * 0.02,
        "wcq": jax.random.normal(key, (L, F, F), jnp.bfloat16) * 0.02,
        "wco": jax.random.normal(key, (L, F, F), jnp.bfloat16) * 0.02,
        "wf1": jax.random.normal(key, (L, F, FFN), jnp.bfloat16) * 0.02,
        "wf2": jax.random.normal(key, (L, FFN, F), jnp.bfloat16) * 0.02,
    }
    kv = jax.random.normal(key, (L, 2, Be, M, H, dh), jnp.bfloat16)
    x0 = jax.random.normal(key, (Be, R, F), jnp.bfloat16)

    # ---- probe 1: big-matmul chain only ----------------------------------
    def matmul_chain(x):
        for l in range(L):
            qkv = x @ ws["wqkv"][l]
            a = qkv[..., :F] @ ws["wso"][l]
            c = (a @ ws["wcq"][l]) @ ws["wco"][l]
            h = jnp.maximum(c @ ws["wf1"][l], 0)
            x = h @ ws["wf2"][l]
        return x / (jnp.abs(x).max() + 1.0)  # keep magnitudes bounded over 500 steps

    dt = t_scan(matmul_chain, x0)
    flops = n_steps * L * 2 * Be * R * (F * 3 * F + F * F * 3 + F * FFN * 2)
    print(json.dumps({"probe": "matmul_chain", "wall_s": round(dt, 4),
                      "per_step_ms": round(dt / n_steps * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    # ---- probe 2: attention math only ------------------------------------
    scale = 1.0 / dh ** 0.5
    def attn_only(x):
        for l in range(L):
            qh = x.reshape(Be, R, H, dh)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, qh)
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
            sa = jnp.einsum("bhqk,bkhd->bqhd", w, qh).reshape(Be, R, F)
            logits2 = jnp.einsum("bqhd,bkhd->bhqk", sa.reshape(Be, R, H, dh) * scale, kv[l, 0])
            w2 = jax.nn.softmax(logits2.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
            x = jnp.einsum("bhqk,bkhd->bqhd", w2, kv[l, 1]).reshape(Be, R, F)
        return x / (jnp.abs(x).max() + 1.0)

    dt = t_scan(attn_only, x0)
    print(json.dumps({"probe": "attn_only", "wall_s": round(dt, 4),
                      "per_step_ms": round(dt / n_steps * 1e3, 3)}), flush=True)

    # ---- probe 3: the production decoder stack ---------------------------
    from msmd_tpu.models.transformer import TransformerDecoder

    dec = TransformerDecoder(L, F, H, FFN, 0.1, jnp.bfloat16, jnp.float32)
    mem = jax.random.normal(key, (Be, M, F), jnp.float32)
    variables = dec.init(jax.random.PRNGKey(1), jnp.asarray(x0, jnp.float32), mem)

    @jax.jit
    def full(variables, x0, mem):
        kvc = dec.apply(variables, mem, method=TransformerDecoder.cache_memory)

        def body(c, _):
            y = dec.apply(variables, c, None, None, True, memory_kv=kvc)
            return (y / (jnp.abs(y).max() + 1.0)).astype(c.dtype), None

        x, _ = jax.lax.scan(body, x0, None, length=n_steps)
        return x[..., 0].sum()

    dt = timeit(full, variables, x0, mem)
    print(json.dumps({"probe": "full_decoder", "wall_s": round(dt, 4),
                      "per_step_ms": round(dt / n_steps * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
