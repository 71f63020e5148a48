"""Training-step tests: single-host step, loss decrease on an overfit
batch, freezing mask, LR schedule semantics, and the 8-virtual-device
data-parallel step (gradient psum over the mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.audio import AudioEncoderConfig
from msmd_tpu.models.diffusion import get_diffusion_model
from msmd_tpu.models.style_encoder import get_style_encoder
from msmd_tpu.parallel.mesh import batch_sharding, make_mesh, replicate_sharding, shard_batch
from msmd_tpu.train.loop import create_train_state, make_eval_step, make_train_step, trainable_mask
from msmd_tpu.train.scheduler import make_schedule

TINY_AUDIO = AudioEncoderConfig(
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 4, 4),  # stride 80 per 50Hz step? -> see audio_unit note
)


def tiny_cfg(**kw):
    base = dict(
        feature_dim=32,
        n_heads=4,
        n_layers=2,
        mlp_ratio=2,
        d_style=16,
        n_motions=8,
        n_prev_motions=4,
        n_diff_steps=4,
        num_of_basis=2,
        use_indicator=True,
        use_cross_style=True,
        fps=25,
        lr=1e-3,
        warm_iter=2,
        audio_model="hubert",
    )
    base.update(kw)
    return MSMDConfig(**base)


def make_batch(cfg, batch_size=2, seed=0):
    rng = np.random.RandomState(seed)
    L_a = cfg.n_audio_samples
    return {
        "audio_0": rng.randn(batch_size, L_a).astype(np.float32),
        "audio_1": rng.randn(batch_size, L_a).astype(np.float32),
        "motion_0": rng.randn(batch_size, cfg.n_motions, 67).astype(np.float32),
        "motion_1": rng.randn(batch_size, cfg.n_motions, 67).astype(np.float32),
        "shape_0": np.zeros((batch_size, cfg.n_motions, 100), np.float32),
        "shape_1": np.zeros((batch_size, cfg.n_motions, 100), np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    return cfg, model, style_enc, state, tx


def test_train_step_runs_and_updates(setup):
    cfg, model, style_enc, state, tx = setup
    step = make_train_step(cfg, model, style_enc, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(state2.params["model"])[0])).all()


def test_overfit_loss_decreases():
    cfg = tiny_cfg(use_cross_style=False, trunc_prob1=0.0, trunc_prob2=0.0, do_ignore_cfg=True, lr=5e-4, warm_iter=1)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    step = make_train_step(cfg, model, style_enc, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=3).items()}

    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))  # fixed rng: same noise each step
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


@pytest.mark.slow
def test_grad_accum_sums_like_reference():
    """accum=2: two micro-batch grads must be applied as their SUM
    (reference does plain loss.backward() per iter with no scaling,
    then optimizer.step() every k iters — training_script.py:195-201)."""
    import optax
    from msmd_tpu.train.loop import make_optimizer, two_clip_loss

    # warm_iter=0 -> constant LR, so the LR applied by the accumulated
    # update equals the oracle's and the SUM property is actually
    # exercised (with a warmup the first LR is 0 and the check is vacuous)
    cfg = tiny_cfg(gradient_accumulation_steps=2, warm_iter=0, lr=1e-3)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)

    def grads_of(batch, key):
        def loss_fn(params):
            return two_clip_loss(cfg, model, style_enc, params, batch, key, train=True)

        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return g

    b1 = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=1).items()}
    b2 = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=2).items()}
    g1, g2 = grads_of(b1, jax.random.PRNGKey(1)), grads_of(b2, jax.random.PRNGKey(2))

    # framework path: two accumulated micro-steps
    opt_state = tx.init(state.params)
    u1, opt_state = tx.update(g1, opt_state, state.params)
    u2, opt_state = tx.update(g2, opt_state, state.params)
    accum_params = optax.apply_updates(optax.apply_updates(state.params, u1), u2)

    # oracle: one Adam step on the SUMMED grads (same masking)
    cfg1 = tiny_cfg(gradient_accumulation_steps=1, warm_iter=0, lr=1e-3)
    tx_ref = make_optimizer(cfg1, state.params)
    g_sum = jax.tree_util.tree_map(lambda a, b: a + b, g1, g2)
    u_ref, _ = tx_ref.update(g_sum, tx_ref.init(state.params), state.params)
    ref_params = optax.apply_updates(state.params, u_ref)

    flat_a = jax.tree_util.tree_leaves(accum_params)
    flat_r = jax.tree_util.tree_leaves(ref_params)
    for a, r in zip(flat_a, flat_r):
        # MultiSteps stores the running MEAN and we rescale by k, so the
        # sum is reproduced up to one extra f32 rounding per element
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=5e-6, rtol=1e-4)


def test_eval_never_truncates():
    """Eval metrics must be identical whatever trunc_prob is — the
    reference test() never truncates (training_script.py:317-323)."""
    base = dict(use_cross_style=False, do_ignore_cfg=True)
    cfg_a = tiny_cfg(trunc_prob1=1.0, trunc_prob2=1.0, **base)
    cfg_b = tiny_cfg(trunc_prob1=0.0, trunc_prob2=0.0, **base)
    model = get_diffusion_model(cfg_a, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg_a, "vae2")
    state, _ = create_train_state(cfg_a, jax.random.PRNGKey(0), model, style_enc)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg_a, seed=5).items()}
    m_a = make_eval_step(cfg_a, model, style_enc)(state.params, batch, jax.random.PRNGKey(9))
    m_b = make_eval_step(cfg_b, model, style_enc)(state.params, batch, jax.random.PRNGKey(9))
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-6)


def test_freezing_mask(setup):
    cfg, model, style_enc, state, tx = setup
    mask = trainable_mask(cfg, state.params)
    # conv extractor frozen, hubert layers 0-1 frozen, last layer not
    assert mask["model"]["audio_encoder"]["feature_extractor"]["conv_0"]["kernel"] is False
    assert mask["model"]["audio_encoder"]["feature_projection"]["projection"]["kernel"] is False
    assert mask["model"]["audio_encoder"]["encoder"]["layers_0"]["q_proj"]["kernel"] is False
    assert mask["model"]["audio_encoder"]["encoder"]["layers_1"]["q_proj"]["kernel"] is False
    assert mask["model"]["denoising_net"]["person_proj"]["kernel"] is True
    assert mask["style_enc"]["encoder"]["self_attn"]["q_proj"]["kernel"] is True


def test_frozen_params_do_not_move():
    cfg = tiny_cfg()
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    frozen_before = np.asarray(state.params["model"]["audio_encoder"]["feature_extractor"]["conv_0"]["kernel"]).copy()
    live_before = np.asarray(state.params["model"]["denoising_net"]["person_proj"]["kernel"]).copy()
    step = make_train_step(cfg, model, style_enc, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(state.params["model"]["audio_encoder"]["feature_extractor"]["conv_0"]["kernel"]), frozen_before
    )
    assert np.abs(np.asarray(state.params["model"]["denoising_net"]["person_proj"]["kernel"]) - live_before).max() > 0


def test_eval_step(setup):
    cfg, model, style_enc, state, tx = setup
    fresh_state, _ = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    ev = make_eval_step(cfg, model, style_enc)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    metrics = ev(fresh_state.params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # do_ignore_style ablation
    ev2 = make_eval_step(cfg, model, style_enc, do_ignore_style=True)
    m2 = ev2(fresh_state.params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m2["loss"]))


def test_schedules():
    cfg = tiny_cfg(scheduler="Warmup", lr=1e-3, warm_iter=10)
    s = make_schedule(cfg)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(1000)), 1e-3, rtol=1e-6)

    cfg2 = tiny_cfg(scheduler="WarmupThenDecay", lr=1e-3, warm_iter=10, cos_max_iter=110, min_lr_ratio=0.1)
    s2 = make_schedule(cfg2)
    np.testing.assert_allclose(float(s2(10)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s2(60)), (1e-4 + 0.5 * 9e-4), rtol=1e-4)  # midpoint
    np.testing.assert_allclose(float(s2(110)), 1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(s2(10_000)), 1e-4, rtol=1e-4)  # holds after cos_max


def test_data_parallel_step_8_devices():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"
    cfg = tiny_cfg(batch_size=8)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)

    mesh = make_mesh(("data",))
    assert mesh.devices.size == 8
    repl = replicate_sharding(mesh)
    state = jax.device_put(state, repl)
    batch = shard_batch(make_batch(cfg, batch_size=8), mesh)
    # every batch leaf is sharded over 'data'
    assert batch["audio_0"].sharding.spec == batch_sharding(mesh).spec

    step = make_train_step(cfg, model, style_enc, tx)
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(state2.params["model"])[0]
    assert leaf.sharding.is_fully_replicated


def test_stretched_schedule_matches_reference_stepping():
    """The reference steps its LR scheduler every micro-iteration while
    the optimizer steps every accum (training_script.py:199-224): the
    u-th optimizer update therefore uses the LR after u*accum + accum-1
    scheduler steps."""
    from msmd_tpu.train.loop import stretched_schedule
    from msmd_tpu.train.scheduler import warmup_schedule

    inner = warmup_schedule(1e-3, 10)
    accum = 4
    stretched = stretched_schedule(inner, accum)
    for u in range(6):
        np.testing.assert_allclose(
            float(stretched(u)), float(inner(u * accum + accum - 1)), rtol=1e-7
        )
    # accum=1 degenerates to the plain schedule
    s1 = stretched_schedule(inner, 1)
    for u in range(6):
        np.testing.assert_allclose(float(s1(u)), float(inner(u)), rtol=1e-7)


def test_warmup_schedule_zero_warm_iter_is_constant():
    from msmd_tpu.train.scheduler import warmup_schedule

    f = warmup_schedule(2e-4, 0)
    assert float(f(0)) == pytest.approx(2e-4)
    assert float(f(100)) == pytest.approx(2e-4)


def test_remat_denoiser_same_loss_and_grads_flow():
    """cfg.remat_denoiser (gradient checkpointing of the decoder layers)
    must be a pure memory/compute trade: identical param tree, identical
    loss for the same rngs, finite grads."""
    cfg = tiny_cfg()
    cfg_r = tiny_cfg(remat_denoiser=True)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    model_r = get_diffusion_model(cfg_r, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    state_r, tx_r = create_train_state(cfg_r, jax.random.PRNGKey(0), model_r, style_enc)

    # identical parameter trees (remat is a lifted transform, not a
    # structural change)
    ta = jax.tree_util.tree_structure(state.params)
    tb = jax.tree_util.tree_structure(state_r.params)
    assert ta == tb
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(state_r.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, seed=7).items()}
    step = make_train_step(cfg, model, style_enc, tx)
    step_r = make_train_step(cfg_r, model_r, style_enc, tx_r)
    s1, m1 = step(state, batch, jax.random.PRNGKey(11))
    s2, m2 = step_r(state_r, batch, jax.random.PRNGKey(11))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=1e-5, rtol=1e-4)
