"""Equivalence tests for the 2B-row batched two-clip training forward
(``cfg.two_clip_batch`` — one style/audio/denoiser pass for both clips).

The batched path is statistically equivalent in the stochastic
augmentations (RNG draw order changes) but must be EXACTLY the same loss
function. Strategy:

1. model-level exactness: one stacked 2B-row ``MSMD.__call__`` with
   explicit prev features and fixed (time_step, noise) equals two B-row
   calls — including the learned-start broadcast for clip 0.
2. loss-level exactness: with every remaining stochastic site made
   degenerate (n_diff_steps=1 -> timestep always 1, do_ignore_cfg, eval
   mode, a deterministic duck-typed style-encoder stub, noise_pair
   override), two_clip_loss(two_clip_batch=True) == sequential — values
   AND parameter gradients.
3. train-mode statistics: fixed-seed mean loss over many keys matches the
   sequential path's mean; a two_clip_batch train step runs and updates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.diffusion import MSMD, get_diffusion_model
from msmd_tpu.models.style_encoder import get_style_encoder
from msmd_tpu.parallel.mesh import make_mesh, replicate_sharding, shard_batch
from msmd_tpu.train.loop import create_train_state, make_train_step, two_clip_loss

from test_train_step import TINY_AUDIO, make_batch, tiny_cfg


class DetStyleStub:
    """Duck-typed, deterministic, row-wise stand-in for the style VAE:
    exact-equivalence tests need zero style randomness, and row-wise maps
    stack/split losslessly."""

    def __init__(self, d_style):
        self.d = d_style

    def apply(self, svars, x, deterministic=True, rngs=None):
        mu = x.mean(axis=1)[:, : self.d]
        logvar = jnp.tanh(x.std(axis=1)[:, : self.d])
        return mu, mu, logvar


def _init_model_params(cfg, model, key):
    B = 1
    return model.init(
        {"params": key, "diffusion": key, "dropout": key, "spec_augment": key},
        jnp.zeros((B, cfg.n_motions, cfg.motion_feat_dim)),
        jnp.zeros((B, cfg.n_audio_samples)),
        jnp.zeros((B, cfg.shape_feat_dim)),
        jnp.zeros((B, cfg.d_style)),
        deterministic=True,
    )["params"]


def test_stacked_forward_matches_two_calls():
    """2B-row __call__ (explicit prevs, fixed t/noise) == two B-row calls."""
    cfg = tiny_cfg(do_ignore_cfg=True)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    params = _init_model_params(cfg, model, jax.random.PRNGKey(0))
    mvars = {"params": params}
    B = 2
    rng = np.random.RandomState(3)
    motion = [jnp.asarray(rng.randn(B, cfg.n_motions, cfg.motion_feat_dim), jnp.float32) for _ in range(2)]
    feat = [jnp.asarray(rng.randn(B, cfg.n_motions, cfg.feature_dim), jnp.float32) for _ in range(2)]
    shape = jnp.zeros((B, cfg.shape_feat_dim))
    style = [jnp.asarray(rng.randn(B, cfg.d_style), jnp.float32) for _ in range(2)]
    noise = [jnp.asarray(rng.randn(B, cfg.n_motions, cfg.motion_feat_dim), jnp.float32) for _ in range(2)]
    prev_m = jnp.asarray(rng.randn(B, cfg.n_prev_motions, cfg.motion_feat_dim), jnp.float32)
    prev_a = jnp.asarray(rng.randn(B, cfg.n_prev_motions, cfg.feature_dim), jnp.float32)
    t = jnp.ones((B,), jnp.int32)
    kw = dict(train_with_cfg=False, deterministic=True, rngs={"diffusion": jax.random.PRNGKey(9)})

    # sequential: clip 0 with the in-module learned-start default
    eps0, tgt0, _, _ = model.apply(mvars, motion[0], feat[0], shape, style[0], time_step=t, noise=noise[0], **kw)
    eps1, tgt1, _, _ = model.apply(
        mvars, motion[1], feat[1], shape, style[1],
        prev_motion_feat=prev_m, prev_audio_feat=prev_a, time_step=t, noise=noise[1], **kw
    )

    # stacked: clip 0's learned starts materialized from the params tree
    start_m = jnp.broadcast_to(params["start_motion_feat"], (B,) + params["start_motion_feat"].shape[1:])
    start_a = jnp.broadcast_to(params["start_audio_feat"], (B,) + params["start_audio_feat"].shape[1:])
    eps_c, tgt_c, _, _ = model.apply(
        mvars,
        jnp.concatenate(motion), jnp.concatenate(feat),
        jnp.concatenate([shape, shape]), jnp.concatenate(style),
        prev_motion_feat=jnp.concatenate([start_m, prev_m]),
        prev_audio_feat=jnp.concatenate([start_a, prev_a]),
        time_step=jnp.concatenate([t, t]), noise=jnp.concatenate(noise), **kw,
    )
    np.testing.assert_allclose(eps_c[:B], eps0, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(eps_c[B:], eps1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(tgt_c[:B], tgt0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tgt_c[B:], tgt1, rtol=1e-5, atol=1e-5)


def _exact_setting():
    """Config + inputs where seq and batched paths share every stochastic
    draw: eval mode (no truncation/dropout/SpecAugment), do_ignore_cfg
    (no null-cond masking), n_diff_steps=1 (timestep always 1), style
    stub (no VAE sampling), noise_pair (fixed q-sample noise)."""
    kw = dict(n_diff_steps=1, do_ignore_cfg=True)
    cfg_seq = tiny_cfg(**kw)
    cfg_bat = tiny_cfg(two_clip_batch=True, **kw)
    model = get_diffusion_model(cfg_seq, audio_config=TINY_AUDIO)
    params = {"model": _init_model_params(cfg_seq, model, jax.random.PRNGKey(1)), "style_enc": {}}
    style_stub = DetStyleStub(cfg_seq.d_style)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_seq, batch_size=2, seed=7).items()}
    rng = np.random.RandomState(11)
    noise_pair = tuple(
        jnp.asarray(rng.randn(2, cfg_seq.n_motions, cfg_seq.motion_feat_dim), jnp.float32) for _ in range(2)
    )
    return cfg_seq, cfg_bat, model, style_stub, params, batch, noise_pair


def _loss_fn(cfg, model, style_stub, batch, noise_pair):
    def f(params):
        return two_clip_loss(
            cfg, model, style_stub, params, batch, jax.random.PRNGKey(5),
            train=False, eval_always_cross_style=True, noise_pair=noise_pair,
        )
    return f


def test_two_clip_loss_batched_exact_eval():
    cfg_seq, cfg_bat, model, stub, params, batch, noise_pair = _exact_setting()
    total_s, metrics_s = _loss_fn(cfg_seq, model, stub, batch, noise_pair)(params)
    total_b, metrics_b = _loss_fn(cfg_bat, model, stub, batch, noise_pair)(params)
    np.testing.assert_allclose(np.asarray(total_b), np.asarray(total_s), rtol=1e-5, atol=1e-6)
    assert set(metrics_s) == set(metrics_b)
    for k in metrics_s:
        np.testing.assert_allclose(
            np.asarray(metrics_b[k]), np.asarray(metrics_s[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


def test_two_clip_loss_batched_exact_grads():
    cfg_seq, cfg_bat, model, stub, params, batch, noise_pair = _exact_setting()
    grad_s = jax.grad(lambda p: _loss_fn(cfg_seq, model, stub, batch, noise_pair)(p)[0])(params)
    grad_b = jax.grad(lambda p: _loss_fn(cfg_bat, model, stub, batch, noise_pair)(p)[0])(params)
    flat_s = jax.tree_util.tree_leaves_with_path(grad_s["model"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(grad_b["model"]))
    checked = 0
    for path, g_s in flat_s:
        g_b = flat_b[path]
        np.testing.assert_allclose(
            np.asarray(g_b), np.asarray(g_s), rtol=2e-4, atol=1e-6, err_msg=str(path)
        )
        checked += 1
    assert checked > 10
    # the learned-start features must receive gradient through the
    # explicit broadcast exactly as through the in-module default
    g_start = np.asarray(grad_b["model"]["start_motion_feat"])
    assert np.abs(g_start).max() > 0


def test_two_clip_loss_batched_train_statistics():
    """Fixed-seed train-mode means match between paths (RNG order differs,
    so only the distribution is preserved; deterministic given the seeds)."""
    kw = dict(trunc_prob1=0.5, trunc_prob2=0.5, prob_cross_style=0.5)
    cfg_seq = tiny_cfg(**kw)
    cfg_bat = tiny_cfg(two_clip_batch=True, **kw)
    model = get_diffusion_model(cfg_seq, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg_seq, "vae2")
    state, _ = create_train_state(cfg_seq, jax.random.PRNGKey(0), model, style_enc)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_seq, batch_size=2, seed=0).items()}

    def mean_loss(cfg, n=24):
        f = jax.jit(
            lambda key: two_clip_loss(cfg, model, style_enc, state.params, batch, key, train=True)[0]
        )
        return float(np.mean([f(jax.random.PRNGKey(1000 + i)) for i in range(n)]))

    m_seq, m_bat = mean_loss(cfg_seq), mean_loss(cfg_bat)
    assert np.isfinite(m_seq) and np.isfinite(m_bat)
    assert abs(m_bat - m_seq) / abs(m_seq) < 0.15, (m_seq, m_bat)


def test_two_clip_batch_train_step_runs():
    cfg = tiny_cfg(two_clip_batch=True, warm_iter=0)  # warmup LR is 0 at step 0
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    step = make_train_step(cfg, model, style_enc, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    before = np.asarray(state.params["model"]["start_motion_feat"]).copy()
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state2.params["model"]["start_motion_feat"])
    assert not np.allclose(before, after)


def test_two_clip_batch_data_parallel_8_devices():
    """The 2B-row concat of two data-sharded B-row arrays stays sharded
    over the mesh; the step runs and params remain replicated."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"
    cfg = tiny_cfg(two_clip_batch=True, batch_size=8)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    mesh = make_mesh(("data",))
    state = jax.device_put(state, replicate_sharding(mesh))
    batch = shard_batch(make_batch(cfg, batch_size=8), mesh)
    step = make_train_step(cfg, model, style_enc, tx)
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree_util.tree_leaves(state2.params["model"])[0]
    assert leaf.sharding.is_fully_replicated
