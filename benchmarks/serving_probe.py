#!/usr/bin/env python
"""StreamingBatcher aggregate-rate probe on the real chip.

Measures the continuous multi-stream micro-batcher's steady-state
aggregate throughput (audio-seconds generated per wall second, and the
per-stream real-time factor) at a given slot count, with every slot
occupied by a continuing stream — the serving deployment shape. The
aggregate should approach bench.py's batch-N throughput figure; the
delta is the batcher's host-side scheduling + feature-extraction cost.

Usage: [MSMD_SERVE_SLOTS=48] [MSMD_SERVE_ROUNDS=3] python benchmarks/serving_probe.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _timing import configure_cache  # noqa: E402


def main():
    import jax

    from msmd_tpu.platform import apply_platform_env

    apply_platform_env()  # honor JAX_PLATFORMS=cpu for smoke runs
    configure_cache()
    import jax.numpy as jnp
    import numpy as np

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.diffusion import get_diffusion_model
    from msmd_tpu.serving import StreamingBatcher

    slots = int(os.environ.get("MSMD_SERVE_SLOTS", "48"))
    rounds = int(os.environ.get("MSMD_SERVE_ROUNDS", "3"))
    depth = int(os.environ.get("MSMD_SERVE_DEPTH", "1"))
    dtype = os.environ.get("MSMD_SERVE_DTYPE", "bfloat16")

    cfg = MSMDConfig(compute_dtype=dtype)
    model = get_diffusion_model(cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "spec_augment": jax.random.PRNGKey(3)},
        jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim)),
        jnp.zeros((1, cfg.n_audio_samples)),
        jnp.zeros((1, cfg.shape_feat_dim)),
        jnp.zeros((1, cfg.d_style)),
        deterministic=True,
    )
    variables = {"params": variables["params"]}

    bat = StreamingBatcher(model, variables, max_slots=slots, cfg_scale=1.15,
                           pipeline_depth=depth)
    rng = np.random.RandomState(0)
    window_s = cfg.n_motions / cfg.fps
    n_windows = rounds + 2  # warmup round + measured rounds + slack
    for i in range(slots):
        bat.add_stream(f"s{i}", jax.random.PRNGKey(i),
                       style=rng.randn(cfg.d_style).astype(np.float32))
        bat.push_audio(f"s{i}", rng.randn(int(cfg.n_audio_samples * n_windows)).astype(np.float32))

    n = bat.step()  # compile + warm (windows 0: first-window program path)
    assert n == slots, n
    bat.flush()
    if depth == 1:
        times = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            n = bat.step()
            times.append(time.perf_counter() - t0)
            assert n == slots, n
        dt = min(times)
    else:
        # pipelined: individual step() calls are cheap dispatches until a
        # resolve fires — time the whole block (steps + final flush) and
        # report the amortized per-round wall
        t0 = time.perf_counter()
        for _ in range(rounds):
            assert bat.step() == slots
        bat.flush()
        dt = (time.perf_counter() - t0) / rounds
    agg = slots * window_s / dt
    print(
        json.dumps(
            {
                "metric": f"StreamingBatcher aggregate ({slots} slots, {dtype}"
                          + (f", pipeline_depth={depth})" if depth > 1 else ")"),
                "value": round(agg, 1),
                "unit": "audio-seconds/sec (aggregate, per chip)",
                "per_stream_rt": round(window_s / dt, 2),
                "round_wall_s": round(dt, 4),
                "vs_baseline": round(agg / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
