#!/usr/bin/env python
"""Fused-Pallas vs plain-XLA FLAME vertex decode benchmark.

Decodes (B*L, 5023, 3) vertices — the vertex-loss workload
(reference: utils/common.py:176-196 chunks this by 512 on GPU) — with
both the jnp LBS and the fused Pallas kernel, and prints one JSON line
per variant. Timing forces host fetches (axon-safe)."""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from msmd_tpu.models.flame import flame_forward, synthetic_flame
    from msmd_tpu.ops.pallas.lbs_kernel import FusedFlame, flame_vertices_fused

    B = int(os.environ.get("LBS_BENCH_BATCH", "1600"))  # ~ batch 16 x 100 frames
    interpret = os.environ.get("LBS_BENCH_INTERPRET") == "1"
    model = synthetic_flame(n_verts=5023)
    fused = FusedFlame(model)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = jax.random.normal(k1, (B, 100)) * 0.1
    exp = jax.random.normal(k2, (B, 50)) * 0.1
    pose = jax.random.normal(k3, (B, 6)) * 0.2

    # chain CHAIN decodes with a data dependency so device compute
    # dominates the ~30 ms host-fetch floor of the axon tunnel
    CHAIN = int(os.environ.get("LBS_BENCH_CHAIN", "20"))

    def chained(decode):
        def run(s, e, p):
            def body(carry, _):
                v = decode(s + carry * 1e-9, e, p)
                return v.sum(), None
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=CHAIN)
            return out
        return jax.jit(run)

    ref_fn = chained(lambda s, e, p: flame_forward(model, s, e, p)[0])
    fused_fn = chained(
        lambda s, e, p: flame_vertices_fused(fused, s, e, p, batch_tile=8, vertex_tile=640, interpret=interpret)
    )

    results = {}
    for name, fn in (("xla_lbs", ref_fn), ("pallas_fused_lbs", fused_fn)):
        float(fn(shape, exp, pose))  # compile + warm fetch
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(fn(shape + 1e-6 * i, exp, pose))
            times.append(time.perf_counter() - t0)
        dt = min(times) / CHAIN
        results[name] = dt
        print(json.dumps({
            "metric": f"FLAME vertex decode ({name}, {B} frames x 5023 verts)",
            "value": round(B / dt, 1),
            "unit": "frames/sec",
            "wall_s": round(dt, 6),
        }))
    print(json.dumps({"metric": "fused speedup", "value": round(results["xla_lbs"] / results["pallas_fused_lbs"], 3), "unit": "x"}))


if __name__ == "__main__":
    main()
