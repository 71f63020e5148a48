"""Model-core tests on a tiny config: denoiser shapes + style-basis
decomposition semantics, style-encoder VAE outputs, MSMD training
forward (q-sample + CFG dropout), and the lax.scan DDPM sampler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.denoiser import DenoisingNetwork
from msmd_tpu.models.diffusion import MSMD, get_diffusion_model, sample, sample_separate, sample_with_guide
from msmd_tpu.models.style_encoder import StyleEncoderVAE, StyleEncoderVAE2, get_style_encoder


def tiny_cfg(**kw):
    base = dict(
        feature_dim=32,
        n_heads=4,
        n_layers=2,
        mlp_ratio=2,
        d_style=16,
        n_motions=8,
        n_prev_motions=2,
        n_diff_steps=4,
        num_of_basis=2,
        use_indicator=True,
    )
    base.update(kw)
    return MSMDConfig(**base)


B = 2
D_MOTION = 67


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_cfg()
    model = get_diffusion_model(cfg)
    motion = rand(0, B, cfg.n_motions, D_MOTION)
    audio_feat = rand(1, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(2, B, cfg.d_style)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio_feat, shape, style, deterministic=True,
    )
    return cfg, model, variables


def test_denoiser_shapes_and_decomposition(rng_key):
    cfg = tiny_cfg()
    net = DenoisingNetwork(cfg)
    L, Lp = cfg.n_motions, cfg.n_prev_motions
    motion = rand(0, B, L, D_MOTION)
    audio = rand(1, B, L, cfg.feature_dim)
    person = rand(2, B, 1, 100 + cfg.d_style)
    style = rand(3, B, 1, cfg.d_style)
    prev_m = rand(4, B, Lp, D_MOTION)
    prev_a = rand(5, B, Lp, cfg.feature_dim)
    step = jnp.array([1, 3])
    ind = jnp.ones((B, L))

    params = net.init(rng_key, motion, audio, person, style, prev_m, prev_a, step, ind)
    out = net.apply(params, motion, audio, person, style, prev_m, prev_a, step, ind)
    assert out.shape == (B, Lp + L, D_MOTION)

    dyn, static, alphas = net.apply(
        params, motion, audio, person, style, prev_m, prev_a, step, ind, keep_separate=True
    )
    assert dyn.shape == (B, Lp + L, D_MOTION)
    assert static.shape == (B, Lp + L, cfg.num_of_basis, D_MOTION)
    assert alphas.shape == (B, Lp + L, cfg.num_of_basis)

    # combined output = dynamic + alpha-weighted static with head pose
    # excluded from alpha weighting (use_head_alpha=False default)
    face = (static[..., :-3] * alphas[..., None]).sum(axis=2)
    pose = static[..., -3:].sum(axis=2)
    recon = dyn + jnp.concatenate([face, pose], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(recon), atol=1e-5)


def test_denoiser_static_constant_over_time(rng_key):
    # static offsets depend only on style -> identical at every frame
    cfg = tiny_cfg()
    net = DenoisingNetwork(cfg)
    L, Lp = cfg.n_motions, cfg.n_prev_motions
    args = (
        rand(0, B, L, D_MOTION), rand(1, B, L, cfg.feature_dim), rand(2, B, 1, 100 + cfg.d_style),
        rand(3, B, 1, cfg.d_style), rand(4, B, Lp, D_MOTION), rand(5, B, Lp, cfg.feature_dim),
        jnp.array([1, 2]), jnp.ones((B, L)),
    )
    params = net.init(rng_key, *args)
    _, static, _ = net.apply(params, *args, keep_separate=True)
    np.testing.assert_allclose(np.asarray(static[:, 0]), np.asarray(static[:, -1]), atol=1e-6)


@pytest.mark.parametrize("cls,out_mult", [(StyleEncoderVAE2, 1), (StyleEncoderVAE, 2)])
def test_style_encoder_outputs(cls, out_mult, rng_key):
    d_style = 16
    enc = cls(d_style=d_style)
    motion = rand(0, B, 10, 67)
    variables = enc.init({"params": rng_key, "style": jax.random.PRNGKey(1)}, motion)
    z, mu, logvar = enc.apply(variables, motion, rngs={"style": jax.random.PRNGKey(2)})
    assert z.shape == mu.shape == logvar.shape == (B, d_style * out_mult)
    s = enc.apply(variables, motion, rngs={"style": jax.random.PRNGKey(3)}, method=cls.sample)
    assert s.shape == (B, d_style * out_mult)
    # reparameterization: z differs across rng draws but mu is deterministic
    z2, mu2, _ = enc.apply(variables, motion, rngs={"style": jax.random.PRNGKey(4)})
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu2), atol=1e-6)
    assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_style_encoder_factory():
    cfg = tiny_cfg()
    assert isinstance(get_style_encoder(cfg, "vae2"), StyleEncoderVAE2)
    assert isinstance(get_style_encoder(cfg, "vae"), StyleEncoderVAE)
    with pytest.raises(ValueError):
        get_style_encoder(cfg, "nope")


def test_msmd_training_forward(model_and_params):
    cfg, model, variables = model_and_params
    motion = rand(10, B, cfg.n_motions, D_MOTION)
    audio_feat = rand(11, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(12, B, cfg.d_style)

    eps, target, motion_out, audio_out = model.apply(
        variables, motion, audio_feat, shape, style,
        rngs={"diffusion": jax.random.PRNGKey(5)}, deterministic=True,
    )
    assert eps.shape == (B, cfg.n_motions, D_MOTION)
    assert target.shape == (B, cfg.n_prev_motions + cfg.n_motions, D_MOTION)
    np.testing.assert_allclose(np.asarray(motion_out), np.asarray(motion), atol=1e-6)

    # keep_separate variant
    out = model.apply(
        variables, motion, audio_feat, shape, style, keep_separate=True,
        rngs={"diffusion": jax.random.PRNGKey(5)}, deterministic=True,
    )
    assert len(out) == 7


def test_msmd_forward_with_fixed_timestep_qsample(model_and_params):
    # with t fixed and CFG off, the target is deterministic given the rngs
    cfg, model, variables = model_and_params
    motion = rand(20, B, cfg.n_motions, D_MOTION)
    audio_feat = rand(21, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(22, B, cfg.d_style)
    t = jnp.array([2, 3])

    run = lambda k: model.apply(
        variables, motion, audio_feat, shape, style, time_step=t, train_with_cfg=False,
        rngs={"diffusion": jax.random.PRNGKey(k)}, deterministic=True,
    )
    eps1, tgt1, _, _ = run(7)
    eps2, tgt2, _, _ = run(7)
    np.testing.assert_allclose(np.asarray(tgt1), np.asarray(tgt2), atol=1e-6)
    eps3, tgt3, _, _ = run(8)
    assert not np.allclose(np.asarray(eps1), np.asarray(eps3))


def test_sampler_shapes_and_determinism(model_and_params):
    cfg, model, variables = model_and_params
    audio_feat = rand(30, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(31, B, cfg.d_style)
    ind = jnp.ones((B, cfg.n_motions))

    motion, noise, afeat = sample(
        model, variables, jax.random.PRNGKey(0), audio_feat, shape, style,
        indicator=ind, cfg_scale=1.15,
    )
    assert motion.shape == (B, cfg.n_motions, D_MOTION)
    assert noise.shape == (B, cfg.n_motions, D_MOTION)
    assert np.isfinite(np.asarray(motion)).all()

    motion2, _, _ = sample(
        model, variables, jax.random.PRNGKey(0), audio_feat, shape, style,
        indicator=ind, cfg_scale=1.15,
    )
    np.testing.assert_allclose(np.asarray(motion), np.asarray(motion2), atol=1e-6)
    motion3, _, _ = sample(
        model, variables, jax.random.PRNGKey(9), audio_feat, shape, style,
        indicator=ind, cfg_scale=1.15,
    )
    assert not np.allclose(np.asarray(motion), np.asarray(motion3))


def test_sampler_traj_and_jit(model_and_params):
    cfg, model, variables = model_and_params
    audio_feat = rand(40, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(41, B, cfg.d_style)

    traj, noise, _ = sample(
        model, variables, jax.random.PRNGKey(1), audio_feat, shape, style, ret_traj=True
    )
    assert traj.shape == (cfg.n_diff_steps + 1, B, cfg.n_motions, D_MOTION)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(noise), atol=1e-6)

    jitted = jax.jit(lambda v, k, a: sample(model, v, k, a, shape, style)[0])
    m = jitted(variables, jax.random.PRNGKey(1), audio_feat)
    assert np.isfinite(np.asarray(m)).all()


def test_sampler_cfg_entry_variants(model_and_params):
    cfg, model, variables = model_and_params
    audio_feat = rand(50, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(51, B, cfg.d_style)

    for cond, scales in [([], None), (["audio"], 1.2), (["audio", "style"], [1.2, 1.1])]:
        m, _, _ = sample(
            model, variables, jax.random.PRNGKey(2), audio_feat, shape, style,
            cfg_cond=cond, cfg_scale=scales if scales is not None else 1.0,
        )
        assert np.isfinite(np.asarray(m)).all()


def test_sample_separate(model_and_params):
    cfg, model, variables = model_and_params
    audio_feat = rand(60, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(61, B, cfg.d_style)

    motion, noise, afeat, dyn, cum_static, alpha = sample_separate(
        model, variables, jax.random.PRNGKey(3), audio_feat, shape, style
    )
    assert motion.shape == (B, cfg.n_motions, D_MOTION)
    assert dyn.shape == (B, cfg.n_motions, D_MOTION)
    assert cum_static.shape == (B, cfg.n_motions, D_MOTION)
    assert alpha.shape == (B, cfg.n_motions, cfg.num_of_basis)

    _, _, _, _, _, alpha_traj = sample_separate(
        model, variables, jax.random.PRNGKey(3), audio_feat, shape, style, return_all_alpha=True
    )
    assert alpha_traj.shape == (cfg.n_diff_steps, B, cfg.n_motions, cfg.num_of_basis)


def test_sample_with_guide(model_and_params):
    cfg, model, variables = model_and_params
    audio_feat = rand(70, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(71, B, cfg.d_style)
    idx = jnp.array([0, 1])
    vals = jnp.zeros((2, D_MOTION))

    m, _, _ = sample_with_guide(
        model, variables, jax.random.PRNGKey(4), audio_feat, shape,
        style_feat=style, guidance_indice=idx, guidance_values=vals,
    )
    assert np.isfinite(np.asarray(m)).all()


def test_dynamic_thresholding(model_and_params):
    cfg, model, variables = model_and_params
    audio_feat = rand(80, B, cfg.n_motions, cfg.feature_dim)
    shape = jnp.zeros((B, 100))
    style = rand(81, B, cfg.d_style)
    m, _, _ = sample(
        model, variables, jax.random.PRNGKey(5), audio_feat, shape, style,
        dynamic_threshold=(0.99, 0.5, 4.0),
    )
    assert np.isfinite(np.asarray(m)).all()


def test_step_emb_table_exact(model_and_params):
    """precompute_step_emb()[t] must equal the per-step diff_step_map
    exactly (the MLP is rowwise over timesteps)."""
    cfg, model, variables = model_and_params
    table = model.apply(variables, method=MSMD.precompute_step_emb)
    assert table.shape == (cfg.n_diff_steps + 1, cfg.feature_dim)
    steps = jnp.asarray([0, 1, cfg.n_diff_steps])
    direct = model.apply(
        variables, steps,
        method=lambda m, s: m.denoising_net.diff_step_map(s),
    )
    np.testing.assert_array_equal(np.asarray(table[steps]), np.asarray(direct))
