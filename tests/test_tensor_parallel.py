"""Tensor-parallel (dp x tp mesh) equivalence tests.

The TP layer is pure sharding metadata (msmd_tpu/parallel/tp.py): the
same jitted programs run on a ("data", "model") mesh with Megatron-style
column/row PartitionSpecs on the dense kernels, and GSPMD inserts the
collectives. These tests prove on the 8-virtual-device CPU backend that

1. the rules actually engage (leaves shard over the model axis),
2. a dp=2 x tp=4 train step computes the same loss (and the same
   updated parameters) as the unsharded single-device step,
3. the full CFG sampler runs under TP and matches the unsharded result.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.models.diffusion import get_diffusion_model, sample
from msmd_tpu.models.style_encoder import get_style_encoder
from msmd_tpu.parallel.mesh import shard_batch
from msmd_tpu.parallel.tp import (
    count_tp_sharded,
    make_dp_tp_mesh,
    shard_state_tp,
    tp_shardings,
    tp_spec,
)
from msmd_tpu.train.loop import create_train_state, make_train_step

from test_train_step import TINY_AUDIO, make_batch, tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg(batch_size=2)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    return cfg, model, style_enc, state, tx


def test_tp_rules_engage(setup):
    cfg, model, style_enc, state, tx = setup
    mesh = make_dp_tp_mesh(2, 4)
    n = count_tp_sharded(state.params, mesh)
    assert n > 20, f"only {n} leaves sharded — TP rules not engaging"
    # spot-check one attention projection and one FFN pair
    dn = state.params["model"]["denoising_net"]["transformer"]["layers_0"]
    flat = dict(jax.tree_util.tree_flatten_with_path(dn)[0])
    shard = tp_shardings(dn, mesh)
    sflat = dict(jax.tree_util.tree_flatten_with_path(shard)[0])
    for path, s in sflat.items():
        names = [str(k.key) for k in path]
        if names[-2:] == ["q_proj", "kernel"]:
            assert s.spec == jax.sharding.PartitionSpec(None, "model"), names
        if names[-2:] == ["out_proj", "kernel"]:
            assert s.spec == jax.sharding.PartitionSpec("model", None), names
        if names[-2:] == ["linear1", "kernel"]:
            assert s.spec == jax.sharding.PartitionSpec(None, "model"), names


def test_tp_spec_divisibility_guard():
    """Odd dims replicate instead of failing."""
    mesh = make_dp_tp_mesh(2, 4)

    class Leaf:
        shape = (7, 9)

    path = (jax.tree_util.DictKey("q_proj"), jax.tree_util.DictKey("kernel"))
    assert tp_spec(path, Leaf(), 4) == jax.sharding.PartitionSpec()
    del mesh


def test_tp_train_step_matches_single_device(setup):
    assert jax.device_count() >= 8
    cfg, model, style_enc, _, tx = setup
    step = make_train_step(cfg, model, style_enc, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, batch_size=2).items()}
    key = jax.random.PRNGKey(3)

    # unsharded single-device reference (the step donates its state, so
    # each run gets a fresh — deterministically identical — state)
    state_ref, _ = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    ref_state, ref_metrics = step(state_ref, batch, key)
    ref_loss = float(ref_metrics["loss"])
    ref_leaf = np.asarray(ref_state.params["model"]["denoising_net"]["person_proj"]["kernel"])

    # dp=2 x tp=4
    mesh = make_dp_tp_mesh(2, 4)
    state_fresh, _ = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    state_tp = shard_state_tp(state_fresh, mesh)
    batch_tp = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    state2, metrics = step(state_tp, batch_tp, key)
    np.testing.assert_allclose(float(metrics["loss"]), ref_loss, rtol=2e-4)
    leaf = np.asarray(
        jax.device_get(state2.params["model"]["denoising_net"]["person_proj"]["kernel"])
    )
    np.testing.assert_allclose(leaf, ref_leaf, rtol=3e-3, atol=2e-5)
    # a TP-sharded parameter keeps its model-axis sharding after the update
    q = state2.params["model"]["denoising_net"]["transformer"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "model" in (q.sharding.spec[1],), q.sharding.spec


def test_trainer_tp_size(tmp_path):
    """cfg.tp_size=2 gives the Trainer a (data, model) mesh, TP-sharded
    state, and a working train step (the --tp_size CLI path)."""
    from msmd_tpu.train.trainer import Trainer

    cfg = tiny_cfg(batch_size=4, tp_size=2)
    trainer = Trainer(cfg, tmp_path, audio_config=TINY_AUDIO, use_mesh=True)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    q = trainer.state.params["model"]["denoising_net"]["transformer"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    batch = shard_batch(make_batch(cfg, batch_size=4), trainer.mesh)
    state2, metrics = trainer.train_step(trainer.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_tp_sampler_matches_single_device(setup):
    assert jax.device_count() >= 8
    cfg, model, style_enc, state, tx = setup
    variables = {"params": state.params["model"]}
    B = 2
    rng = np.random.RandomState(5)
    audio = jnp.asarray(rng.randn(B, cfg.n_audio_samples), jnp.float32) * 0.05
    shape = jnp.zeros((B, cfg.shape_feat_dim))
    style = jnp.asarray(rng.randn(B, cfg.d_style), jnp.float32)
    key = jax.random.PRNGKey(7)

    fn = jax.jit(
        lambda v, a, sh, st: sample(model, v, key, a, sh, st, cfg_scale=1.15)[0]
    )
    ref = np.asarray(fn(variables, audio, shape, style))

    mesh = make_dp_tp_mesh(2, 4)
    v_tp = jax.device_put(variables, tp_shardings(variables, mesh))
    data = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    out = np.asarray(
        jax.device_get(
            fn(v_tp, jax.device_put(audio, data), jax.device_put(shape, data), jax.device_put(style, data))
        )
    )
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-5)
