"""Prove the lax.scan DDPM sampler computes exactly the reference's
sequential loop semantics: re-implement the per-step update as an eager
Python loop over t = T..1 (CFG stacking, guidance mix, DDPM update,
final zero-noise step) and compare against `sample`."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.diffusion import (
    MSMD,
    _build_cfg_stacks,
    _cfg_combine,
    _normalize_cfg,
    get_diffusion_model,
    sample,
)
from msmd_tpu.ops.schedule import DiffusionSchedule


def tiny_cfg(**kw):
    base = dict(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=5, num_of_basis=2, use_indicator=True,
    )
    base.update(kw)
    return MSMDConfig(**base)


@pytest.mark.parametrize("cfg_mode", ["incremental", "independent"])
def test_scan_sampler_equals_python_loop(cfg_mode):
    cfg = tiny_cfg(cfg_mode=cfg_mode)
    model = get_diffusion_model(cfg)
    B = 2
    audio_feat = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_motions, cfg.feature_dim))
    shape = jnp.zeros((B, 100))
    style = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.d_style))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(3)},
        jax.random.normal(jax.random.PRNGKey(4), (B, cfg.n_motions, 67)),
        audio_feat, shape, style, deterministic=True,
    )

    key = jax.random.PRNGKey(7)
    cfg_scale = 1.2

    # --- framework scan sampler -----------------------------------------
    got, noise_T, _ = sample(model, variables, key, audio_feat, shape, style, cfg_scale=cfg_scale)

    # --- eager reference loop --------------------------------------------
    sched = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
    params = variables["params"]
    cfg_mode_n, cfg_cond_n, cfg_scale_n = _normalize_cfg(cfg, None, None, cfg_scale)
    style3 = style[:, None]
    shape3 = shape[:, None]
    audio_in, person_in, n_entries = _build_cfg_stacks(
        cfg, params, audio_feat, shape3, style3, cfg_mode_n, cfg_cond_n
    )
    prev_m = jnp.broadcast_to(params["start_motion_feat"], (B,) + params["start_motion_feat"].shape[1:])
    prev_a = jnp.broadcast_to(params["start_audio_feat"], (B,) + params["start_audio_feat"].shape[1:])
    tile = lambda x: jnp.concatenate([x] * n_entries, axis=0)
    prev_m_in, prev_a_in, style_in = tile(prev_m), tile(prev_a), tile(style3)

    # replicate the sampler's PRNG stream: one split for x_T, then one per step
    k = key
    k, sub = jax.random.split(k)
    x = jax.random.normal(sub, (B, cfg.n_motions, cfg.motion_feat_dim))
    np.testing.assert_allclose(np.asarray(x), np.asarray(noise_T), atol=1e-6)

    for t in range(cfg.n_diff_steps, 0, -1):
        k, kz = jax.random.split(k)
        z = jax.random.normal(kz, x.shape)
        if t == 1:
            z = jnp.zeros_like(z)
        motion_in = jnp.concatenate([x] * n_entries, axis=0)
        step_in = jnp.full((B * n_entries,), t, jnp.int32)
        results = model.apply(
            variables, motion_in, audio_in, person_in, style_in, prev_m_in, prev_a_in, step_in, None,
            method=MSMD.denoise,
        )
        results = results.reshape((n_entries, B) + results.shape[1:])
        target = _cfg_combine(results, cfg_mode_n, cfg_scale_n, cfg.n_motions)

        alpha = sched.alphas[t]
        ab, ab_prev = sched.alpha_bars[t], sched.alpha_bars[t - 1]
        sigma = sched.get_sigmas(t, 0.0)
        c0 = (1 - ab_prev) * jnp.sqrt(alpha) / (1 - ab)
        c1 = (1 - alpha) * jnp.sqrt(ab_prev) / (1 - ab)
        x = c0 * x + c1 * target + sigma * z

    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-4, rtol=1e-4)
