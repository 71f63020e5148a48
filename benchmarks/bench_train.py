#!/usr/bin/env python
"""Training-step throughput benchmark (BASELINE config 5: data-parallel
diffusion training step).

One full two-clip MSMD training step — 2x style-VAE encode, 2 chained
diffusion forwards (hubert included), masked losses, Adam update with
the freezing mask — at the paper config (batch 16, hubert-base,
512/8-layer denoiser, bf16). On a multi-chip mesh the same jitted step
shards the batch over 'data' (this box exposes one chip; the 8-device
sharding is validated on the virtual CPU mesh in tests).

Prints one JSON line with steps/sec and window-seconds of training
audio consumed per wall second. Timing forces host fetches (axon-safe).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    try:
        from msmd_tpu.platform import cache_dir_for
        jax.config.update("jax_compilation_cache_dir", cache_dir_for("/tmp/msmd_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.diffusion import get_diffusion_model
    from msmd_tpu.models.style_encoder import get_style_encoder
    from msmd_tpu.parallel.mesh import make_mesh, replicate_sharding, shard_batch
    from msmd_tpu.train.loop import create_train_state, make_train_step

    batch = int(os.environ.get("MSMD_TRAIN_BENCH_BATCH", "16"))
    steps = int(os.environ.get("MSMD_TRAIN_BENCH_STEPS", "5"))
    dtype = os.environ.get("MSMD_TRAIN_BENCH_DTYPE", "bfloat16")
    fused_ffn_train = os.environ.get("MSMD_TRAIN_FUSED_FFN", "0") == "1"
    remat = os.environ.get("MSMD_TRAIN_REMAT", "0") == "1"
    # identity-band training is the production default since r5 (config.py)
    band_train = os.environ.get("MSMD_TRAIN_IDENTITY_BAND", "1") == "1"
    two_clip = os.environ.get("MSMD_TRAIN_TWO_CLIP", "0") == "1"

    cfg = MSMDConfig(batch_size=batch, compute_dtype=dtype,
                     fused_ffn_train=fused_ffn_train, remat_denoiser=remat,
                     identity_band_train=band_train, two_clip_batch=two_clip)
    model = get_diffusion_model(cfg, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)

    mesh = make_mesh(("data",))
    state = jax.device_put(state, replicate_sharding(mesh))
    rng = np.random.RandomState(0)
    L_a = cfg.n_audio_samples
    batch_data = shard_batch(
        {
            "audio_0": rng.randn(batch, L_a).astype(np.float32),
            "audio_1": rng.randn(batch, L_a).astype(np.float32),
            "motion_0": rng.randn(batch, cfg.n_motions, 67).astype(np.float32),
            "motion_1": rng.randn(batch, cfg.n_motions, 67).astype(np.float32),
            "shape_0": np.zeros((batch, cfg.n_motions, 100), np.float32),
            "shape_1": np.zeros((batch, cfg.n_motions, 100), np.float32),
        },
        mesh,
    )
    step = make_train_step(cfg, model, style_enc, tx)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch_data, key)
    _ = float(metrics["loss"])  # force compile+exec (lazy backends)

    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch_data, jax.random.fold_in(key, i))
        _ = float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    # pipelined rate: dispatch all steps, fetch once — how trainer.fit
    # actually runs (metrics stay on device between log points)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch_data, jax.random.fold_in(key, 100 + i))
    _ = float(metrics["loss"])
    dt_pipe = (time.perf_counter() - t0) / steps

    # roofline: XLA's own FLOP count for the compiled step -> MFU against
    # the v5e bf16 peak (197 TFLOP/s/chip). Two MFU figures:
    # - mfu_vs_197tflops: from the per-step host-fetch timing (dt) —
    #   conservative, comparable to the round 1-4 rows;
    # - mfu_pipelined_vs_197tflops: from the dispatch-all, fetch-once
    #   timing (dt_pipe) — how Trainer.fit actually runs in production
    #   (metrics are smoothed on device, one fetch per log point;
    #   train/trainer.py), i.e. the device's real utilization without
    #   the benchmark's per-step tunnel round-trip artifact.
    mfu = mfu_pipe = flops = None
    try:
        compiled = jax.jit(step).lower(state, batch_data, key).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) or None
        if flops:
            mfu = flops / dt / (197e12 * mesh.devices.size)
            mfu_pipe = flops / dt_pipe / (197e12 * mesh.devices.size)
    except Exception:
        pass

    audio_seconds_per_step = 2 * batch * cfg.n_motions / cfg.fps  # two windows per sample
    print(
        json.dumps(
            {
                "metric": f"MSMD train step (batch {batch}, {dtype}, {mesh.devices.size} chip(s))"
                + (", fused_ffn_train" if fused_ffn_train else "")
                + (", identity_band_train" if band_train else "")
                + (", remat" if remat else "")
                + (", two_clip_batch" if two_clip else ""),
                "value": round(1.0 / dt, 3),
                "unit": "steps/sec",
                "pipelined_steps_per_sec": round(1.0 / dt_pipe, 3),
                "train_audio_seconds_per_sec": round(audio_seconds_per_step / dt, 1),
                "step_wall_s": round(dt, 4),
                "step_tflop_xla": round(flops / 1e12, 2) if flops else None,
                "mfu_vs_197tflops": round(mfu, 3) if mfu else None,
                "mfu_pipelined_vs_197tflops": round(mfu_pipe, 3) if mfu_pipe else None,
            }
        )
    )


if __name__ == "__main__":
    main()
