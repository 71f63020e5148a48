"""Prove the lax.scan DDPM sampler computes exactly the reference's
sequential loop semantics: re-implement the per-step update as an eager
Python loop over t = T..1 — building ALL CFG entries and applying the
reference's sequential guidance mix (model.py:339-417), with NO
dead-entry elimination — and compare against `sample` (which stacks
only nonzero-coefficient entries). Covers both CFG modes and both
equal scales (middle entry dropped) and unequal scales (all kept)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.diffusion import MSMD, _cfg_coefficients, get_diffusion_model, sample
from msmd_tpu.ops.schedule import DiffusionSchedule


def tiny_cfg(**kw):
    base = dict(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=5, num_of_basis=2, use_indicator=True,
    )
    base.update(kw)
    return MSMDConfig(**base)


def test_cfg_coefficients():
    # incremental, equal scales: middle coefficient is exactly 0
    assert _cfg_coefficients("incremental", (1.4, 1.4), 3) == (1 - 1.4, 0.0, 1.4)
    assert _cfg_coefficients("incremental", (1.2, 1.1), 3) == (1 - 1.2, pytest.approx(0.1), 1.1)
    # independent: torch's in-place += aliases results[0] with the target,
    # so the coefficients are the nested form (1-s1)(1-s0), (1-s1)s0, s1
    assert _cfg_coefficients("independent", (1.2, 1.1), 3) == (
        pytest.approx((1 - 1.2) * (1 - 1.1)), pytest.approx(1.2 * (1 - 1.1)), 1.1,
    )
    assert _cfg_coefficients("independent", (1.3,), 2) == (pytest.approx(-0.3), 1.3)
    assert _cfg_coefficients("incremental", (1.3,), 2) == (pytest.approx(-0.3), 1.3)
    assert _cfg_coefficients("independent", (), 1) == (1.0,)


@pytest.mark.parametrize(
    "cfg_mode,scales",
    [
        ("incremental", 1.2),         # equal scales -> middle entry dropped
        ("incremental", [1.2, 1.1]),  # unequal -> all three entries kept
        ("independent", [1.3, 0.9]),
    ],
)
def test_scan_sampler_equals_reference_loop(cfg_mode, scales):
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

    # --- framework scan sampler (dead entries dropped) --------------------
    got, noise_T, _ = sample(model, variables, key, audio_feat, shape, style, cfg_scale=scales)

    # --- eager reference loop: ALL entries, sequential mix -----------------
    sched = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
    params = variables["params"]
    # the reference zips scales with guiding_conditions ('style,audio')
    # THEN sorts to ['audio', 'style'] (model.py:294-303): a list input
    # [a, b] therefore lands as audio<-b, style<-a.
    cfg_cond = ["audio", "style"]
    raw = list(scales) if isinstance(scales, (list, tuple)) else [scales] * 2
    pairs = sorted(zip(["style", "audio"], raw), key=lambda x: ["audio", "style"].index(x[0]))
    cfg_scale = [s for _, s in pairs]
    style3, shape3 = style[:, None], shape[:, None]

    null_audio = jnp.broadcast_to(params["null_audio_feat"], audio_feat.shape)
    null_style = jnp.broadcast_to(params["null_style_feat"], (B, 1, cfg.d_style))
    person_null = jnp.concatenate([shape3, null_style], axis=-1)
    person_cond = jnp.concatenate([shape3, style3], axis=-1)

    audio_in = [null_audio, audio_feat]
    person_in = [person_null, person_null]
    audio_in.append(null_audio if cfg_mode == "independent" else audio_feat)
    person_in.append(person_cond)
    n_entries = 3
    audio_in = jnp.concatenate(audio_in, axis=0)
    person_in = jnp.concatenate(person_in, axis=0)

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
        results = list(results.reshape((n_entries, B) + results.shape[1:])[:, :, -cfg.n_motions :])

        # the reference's sequential guidance mix (model.py:406-417).
        # NB: in torch, target_theta is a VIEW of results[0], so the
        # in-place += makes "results[0]" on later iterations read the
        # accumulated target — i.e. independent mode is the nested
        # update t <- t + s_i*(r_{i+1} - t), not a linear one.
        target = results[0]
        for i in range(n_entries - 1):
            base = target if cfg_mode == "independent" else results[i]
            target = target + cfg_scale[i] * (results[i + 1] - base)

        alpha = sched.alphas[t]
        ab, ab_prev = sched.alpha_bars[t], sched.alpha_bars[t - 1]
        sigma = sched.get_sigmas(t, 0.0)
        c0 = (1 - ab_prev) * jnp.sqrt(alpha) / (1 - ab)
        c1 = (1 - alpha) * jnp.sqrt(ab_prev) / (1 - ab)
        x = c0 * x + c1 * target + sigma * z

    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("conds", ["", "audio", "style", "style,audio"])
def test_sampler_condition_subsets(conds):
    """Sampling works for every guiding_conditions subset
    (reference: model.py:128-137, 304-334). With 'style' guided, a None
    style_feat falls back to the null embedding; without it, passing
    style_feat is mandatory (the model still concatenates it into the
    person feature since use_style is always True for MSMD)."""
    cfg = tiny_cfg(guiding_conditions=conds)
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
    params = variables["params"]
    assert ("null_style_feat" in params) == ("style" in conds)
    assert ("null_audio_feat" in params) == ("audio" in conds)

    motion, _, _ = sample(model, variables, jax.random.PRNGKey(7), audio_feat, shape, style)
    assert motion.shape == (B, cfg.n_motions, cfg.motion_feat_dim)
    assert np.isfinite(np.asarray(motion)).all()

    if "style" in conds:
        # None style -> null-style fallback still samples
        motion2, _, _ = sample(model, variables, jax.random.PRNGKey(7), audio_feat, shape, None)
        assert np.isfinite(np.asarray(motion2)).all()
    else:
        with pytest.raises(ValueError, match="style_feat is required"):
            sample(model, variables, jax.random.PRNGKey(7), audio_feat, shape, None)


def test_precomputed_noise_bit_identical():
    """The hoisted key-split noise chain (latency regime) must reproduce
    the in-scan split/normal sequence bit-for-bit."""
    import jax

    from msmd_tpu.models.diffusion import get_diffusion_model, sample

    cfg = tiny_cfg()
    model = get_diffusion_model(cfg)
    key = jax.random.PRNGKey(0)
    B = 2
    audio = jax.random.normal(jax.random.PRNGKey(1), (B, cfg.n_audio_samples))
    shape = jnp.zeros((B, cfg.shape_feat_dim))
    style = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.d_style))
    variables = model.init(
        {"params": jax.random.PRNGKey(3), "diffusion": jax.random.PRNGKey(4)},
        jnp.zeros((B, cfg.n_motions, cfg.motion_feat_dim)), audio, shape, style,
        deterministic=True,
    )
    m_pre, _, _ = sample(model, variables, key, audio, shape, style, precompute_noise=True)
    m_scan, _, _ = sample(model, variables, key, audio, shape, style, precompute_noise=False)
    np.testing.assert_array_equal(np.asarray(m_pre), np.asarray(m_scan))
