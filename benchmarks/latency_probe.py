#!/usr/bin/env python
"""Batch-1 latency decomposition on the real chip (VERDICT r1 item 10).

The 500-step sampler at batch 1 runs ~20x real-time while batch 48 runs
~57x — the chip is idle at small batch. This probe times three programs
to locate the cost:

  full        the production sampler (sample(): denoiser + schedule math
              + RNG + CFG mix), batch 1 -> effective batch 2 (CFG stack)
  denoiser    500-step scan of ONLY the KV-cached denoiser forward at the
              same effective batch (transformer cost floor)
  scaffold    500-step scan of ONLY the sampler scaffolding (RNG, schedule
              gathers, elementwise mix) with the denoiser replaced by a
              single matmul (dispatch/elementwise floor)

NOTE on comparability: 'full' runs the PRODUCTION sampler, which at
small batch auto-enables the fused Pallas decoder and the bf16 weight
pre-cast; 'denoiser' deliberately measures the UNFUSED XLA decoder on
f32-stored weights as the before/after baseline. The fused-kernel-alone
probe ('fused_kernel_only') is the like-for-like component of 'full'.
Prints one JSON line per probe. Run on the axon TPU (default platform).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("MSMD_BENCH_STEPS", "500")


from _timing import configure_cache, timeit  # noqa: E402


def main():
    import jax

    configure_cache()
    import jax.numpy as jnp

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.diffusion import MSMD, get_diffusion_model, sample
    from msmd_tpu.ops.schedule import DiffusionSchedule

    n_steps = int(os.environ.get("MSMD_BENCH_STEPS", "500"))
    B = int(os.environ.get("MSMD_BENCH_REPS", "1"))
    cfg = MSMDConfig(n_diff_steps=n_steps, compute_dtype="bfloat16")
    model = get_diffusion_model(cfg, dtype=jnp.bfloat16)

    motion = jnp.zeros((B, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.zeros((B, cfg.n_audio_samples))
    shape = jnp.zeros((B, cfg.shape_feat_dim))
    style = jnp.zeros((B, cfg.d_style))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, shape, style, deterministic=True,
    )
    window_s = cfg.n_motions / cfg.fps

    results = {}

    # ---- probe 1: full production sampler --------------------------------
    @jax.jit
    def full(variables, key, audio, shape, style):
        m, _, _ = sample(model, variables, key, audio, shape, style, cfg_scale=1.15)
        return m[:, -1, 0].sum()

    dt = timeit(full, variables, jax.random.PRNGKey(2), audio, shape, style)
    results["full"] = dt
    print(json.dumps({"probe": "full", "wall_s": round(dt, 4),
                      "rtf": round(window_s * B / dt, 2)}), flush=True)

    # ---- on-silicon correctness: fused Pallas decoder vs XLA decoder -----
    if os.environ.get("MSMD_PROBE_CHECK", "1") == "1":
        import numpy as np

        mT = jax.random.normal(jax.random.PRNGKey(7), (B, cfg.n_motions, cfg.motion_feat_dim))
        z = jax.random.normal(jax.random.PRNGKey(8), (8, B, cfg.n_motions, cfg.motion_feat_dim))
        short = MSMDConfig(n_diff_steps=8, compute_dtype="bfloat16")
        smodel = get_diffusion_model(short, dtype=jnp.bfloat16)

        import functools

        @functools.partial(jax.jit, static_argnums=0)
        def gen(fused, variables, mT, z, audio, shape, style):
            m, _, _ = sample(smodel, variables, jax.random.PRNGKey(9), audio, shape, style,
                             fused_decoder=fused, cfg_scale=1.15, motion_at_T=mT, noise_override=z)
            return m

        a = np.asarray(gen(True, variables, mT, z, audio, shape, style), np.float32)
        b = np.asarray(gen(False, variables, mT, z, audio, shape, style), np.float32)
        md = float(np.abs(a - b).max())
        print(json.dumps({"probe": "fused_vs_xla_8step", "max_diff": round(md, 5),
                          "ok": bool(md < 0.2 and np.isfinite(a).all())}), flush=True)

    # ---- probe 2: denoiser-only scan (KV-cached, effective batch 2B) -----
    n_entries = 2  # post-dead-entry-elimination CFG stack
    Be = B * n_entries
    L_p, L = cfg.n_prev_motions, cfg.n_motions
    audio_feat = jnp.zeros((Be, L, cfg.feature_dim), jnp.float32)
    prev_audio = jnp.zeros((Be, L_p, cfg.feature_dim), jnp.float32)
    prev_motion = jnp.zeros((Be, L_p, cfg.motion_feat_dim), jnp.float32)
    person = jnp.zeros((Be, 1, cfg.shape_feat_dim + cfg.d_style), jnp.float32)
    style_in = jnp.zeros((Be, 1, cfg.d_style), jnp.float32)

    @jax.jit
    def denoiser_only(variables, motion0):
        memory_kv = model.apply(variables, prev_audio, audio_feat,
                                method=MSMD.cache_denoiser_memory_kv)

        def body(m, t):
            step = jnp.full((Be,), t, jnp.int32)
            out = model.apply(variables, m, audio_feat, person, style_in,
                              prev_motion, prev_audio, step, None,
                              memory_kv=memory_kv, method=MSMD.denoise)
            return out[:, -L:].astype(m.dtype), None

        ts = jnp.arange(n_steps, 0, -1)
        m, _ = jax.lax.scan(body, motion0, ts)
        return m[:, -1, 0].sum()

    motion0 = jnp.zeros((Be, L, cfg.motion_feat_dim))
    dt = timeit(denoiser_only, variables, motion0)
    results["denoiser"] = dt
    print(json.dumps({"probe": "denoiser_only", "wall_s": round(dt, 4),
                      "per_step_us": round(dt / n_steps * 1e6, 1)}), flush=True)

    # ---- probe 2b: fused Pallas decoder stack alone ----------------------
    if os.environ.get("MSMD_PROBE_FUSED", "1") == "1":
        from msmd_tpu.ops.pallas.decoder_kernel import (
            build_masks, fused_decoder_forward, pack_decoder_weights, pack_memory_kv,
        )
        from msmd_tpu.ops.seq import alignment_mask

        lq = 1 + L_p + L
        align = alignment_mask(L_p, L, cfg.align_mask_width)
        interp = jax.default_backend() == "cpu"

        @jax.jit
        def fused_only(variables, x0):
            pack = pack_decoder_weights(
                variables["params"]["denoising_net"]["transformer"], cfg.n_layers, dtype=jnp.bfloat16
            )
            kv = model.apply(variables, prev_audio, audio_feat, method=MSMD.cache_denoiser_memory_kv)
            km, vm = pack_memory_kv(kv, dtype=jnp.bfloat16)
            sm, cm = build_masks(Be, lq, L_p + L, align)

            def body(x, _):
                y = fused_decoder_forward(
                    pack, km, vm, x, sm, cm, n_heads=cfg.n_heads, interpret=interp
                )
                return y / (jnp.abs(y).max() + 1.0), None

            x, _ = jax.lax.scan(body, x0, None, length=n_steps)
            return x[..., 0].sum()

        x0 = jnp.zeros((Be, lq, cfg.feature_dim), jnp.float32)
        dt = timeit(fused_only, variables, x0)
        print(json.dumps({"probe": "fused_kernel_only", "wall_s": round(dt, 4),
                          "per_step_us": round(dt / n_steps * 1e6, 1)}), flush=True)

    # ---- probe 3: scaffolding-only scan ----------------------------------
    sched = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
    W = jnp.zeros((cfg.motion_feat_dim, cfg.motion_feat_dim), jnp.bfloat16)

    @jax.jit
    def scaffold(key, motion0):
        def body(carry, t):
            m, k = carry
            k, kz = jax.random.split(k)
            z = jax.random.normal(kz, m.shape, m.dtype)
            z = jnp.where(t > 1, z, jnp.zeros_like(z))
            alpha, alpha_bar = sched.alphas[t], sched.alpha_bars[t]
            sigma = sched.get_sigmas(t, 0.0)
            stack = jnp.concatenate([m] * n_entries, axis=0)
            r = (stack.astype(jnp.bfloat16) @ W).astype(m.dtype)
            r = r.reshape((n_entries,) + m.shape)
            tgt = -0.15 * r[0] + 1.15 * r[1]
            c0 = 1.0 / jnp.sqrt(alpha)
            c1 = (1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)
            m = c0 * (m - c1 * tgt) + sigma * z
            return (m, k), None

        ts = jnp.arange(n_steps, 0, -1)
        (m, _), _ = jax.lax.scan(body, (motion0, key), ts)
        return m[:, -1, 0].sum()

    m0 = jnp.zeros((B, L, cfg.motion_feat_dim))
    dt = timeit(scaffold, jax.random.PRNGKey(3), m0)
    results["scaffold"] = dt
    print(json.dumps({"probe": "scaffold_only", "wall_s": round(dt, 4),
                      "per_step_us": round(dt / n_steps * 1e6, 1)}), flush=True)

    print(json.dumps({
        "probe": "summary", "batch": B, "steps": n_steps,
        "full_s": round(results["full"], 4),
        "xla_denoiser_s": round(results["denoiser"], 4),
        "scaffold_s": round(results["scaffold"], 4),
        "full_rtf": round(window_s * B / results["full"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
