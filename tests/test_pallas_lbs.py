"""Fused Pallas LBS kernel vs the reference-semantics jnp FLAME decode
(interpret mode on CPU — the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from msmd_tpu.models.flame import flame_forward, synthetic_flame
from msmd_tpu.ops.pallas.lbs_kernel import FusedFlame, flame_vertices_fused


def test_fused_lbs_matches_reference_decode(rng_key):
    model = synthetic_flame(n_verts=200)  # pads to 256 lanes
    fused = FusedFlame(model)
    B = 5  # intentionally not a multiple of the batch tile
    k1, k2, k3 = jax.random.split(rng_key, 3)
    shape = jax.random.normal(k1, (B, 100)) * 0.3
    exp = jax.random.normal(k2, (B, 50)) * 0.3
    pose = jax.random.normal(k3, (B, 6)) * 0.4

    want, _, _ = flame_forward(model, shape, exp, pose)
    got = flame_vertices_fused(fused, shape, exp, pose, batch_tile=4, vertex_tile=128, interpret=True)
    assert got.shape == want.shape == (B, 200, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_lbs_ignore_global_rot(rng_key):
    model = synthetic_flame(n_verts=128)
    fused = FusedFlame(model)
    B = 2
    shape = jnp.zeros((B, 100))
    exp = jnp.zeros((B, 50))
    pose = jnp.concatenate([jax.random.normal(rng_key, (B, 3)), jnp.zeros((B, 3))], axis=1)
    want, _, _ = flame_forward(model, shape, exp, pose, ignore_global_rot=True)
    got = flame_vertices_fused(fused, shape, exp, pose, ignore_global_rot=True, batch_tile=2, vertex_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_lbs_grad_matches_reference(rng_key):
    model = synthetic_flame(n_verts=128)
    fused = FusedFlame(model)
    k1, k2 = jax.random.split(rng_key)
    exp0 = jax.random.normal(k1, (2, 50)) * 0.1
    pose0 = jax.random.normal(k2, (2, 6)) * 0.2

    def loss_fused(exp, pose):
        v = flame_vertices_fused(fused, jnp.zeros((2, 100)), exp, pose, batch_tile=2, vertex_tile=128, interpret=True)
        return jnp.sum(jnp.sin(v))

    def loss_ref(exp, pose):
        v, _, _ = flame_forward(model, jnp.zeros((2, 100)), exp, pose)
        return jnp.sum(jnp.sin(v))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(exp0, pose0)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(exp0, pose0)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_ref[0]), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_ref[1]), atol=3e-4, rtol=1e-3)


def test_vertex_loss_with_fused_flame(rng_key):
    """compute_loss accepts a FusedFlame drop-in and matches the jnp path."""
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.losses import compute_loss

    cfg = MSMDConfig(n_motions=6, n_prev_motions=3, rot_repr="aa", use_vertex_space=True)
    model = synthetic_flame(n_verts=128)
    fused = FusedFlame(model, interpret=True, batch_tile=4, vertex_tile=128)
    B, L, Lp = 2, cfg.n_motions, cfg.n_prev_motions
    rs = np.random.RandomState(0)
    gt = jnp.asarray(rs.randn(B, L, 54).astype(np.float32))
    target = jnp.asarray(rs.randn(B, Lp + L, 54).astype(np.float32))
    prev = jnp.asarray(rs.randn(B, Lp, 54).astype(np.float32))
    shape = jnp.asarray(rs.randn(B, 100).astype(np.float32) * 0.1)

    out_ref = compute_loss(cfg, False, shape, gt, None, target, prev, None, model)
    out_fused = compute_loss(cfg, False, shape, gt, None, target, prev, None, fused)
    for k in out_ref:
        np.testing.assert_allclose(float(out_fused[k]), float(out_ref[k]), rtol=1e-4, atol=1e-6, err_msg=k)
