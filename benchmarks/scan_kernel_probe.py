#!/usr/bin/env python
"""Time the weight-resident whole-scan sampler kernel alone vs the
per-step mega kernel inside a lax.scan, at the flagship batch-1 config.
Isolates the kernel from the sampler's pre/post glue. Run on axon TPU."""

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

    configure_cache()

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.diffusion import (
        MSMD, _prepare_sample_inputs, get_diffusion_model, sample,
    )

    n_steps = int(os.environ.get("MSMD_BENCH_STEPS", "500"))
    cfg = MSMDConfig(n_diff_steps=n_steps, compute_dtype="bfloat16")
    model = get_diffusion_model(cfg, dtype=jnp.bfloat16)
    B = 1

    motion = jnp.zeros((B, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.zeros((B, cfg.n_audio_samples))
    shape = jnp.zeros((B, cfg.shape_feat_dim))
    style = jnp.zeros((B, cfg.d_style))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, shape, style, deterministic=True,
    )
    window_s = cfg.n_motions / cfg.fps

    import functools

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def run(use_scan, use_step, variables, key, audio, shape, style):
        os.environ["MSMD_FUSED_SCAN"] = "1" if use_scan else "0"
        os.environ["MSMD_FUSED_STEP"] = "1" if use_step else "0"
        m, _, _ = sample(model, variables, key, audio, shape, style, cfg_scale=1.15)
        return m[:, -1, 0].sum()

    for name, (s, st) in (
        ("full_scan_kernel", (True, True)),
        ("full_step_kernel", (False, True)),
        ("full_stack_kernel", (False, False)),
    ):
        dt = timeit(
            functools.partial(run, s, st), variables, jax.random.PRNGKey(2), audio, shape, style
        )
        print(json.dumps({"probe": name, "wall_s": round(dt, 4),
                          "per_step_us": round(dt / n_steps * 1e6, 1),
                          "rtf": round(window_s / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
