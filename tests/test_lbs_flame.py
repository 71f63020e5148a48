"""LBS / FLAME decode parity vs an independent torch oracle implementing
the published SMPL/FLAME LBS math (reference behavior: utils/lbs.py,
utils/flame.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from msmd_tpu.models.flame import flame_forward, synthetic_flame
from msmd_tpu.ops.lbs import (
    batch_rigid_transform,
    blend_shapes,
    lbs,
    transform_mat,
    vertices2joints,
    vertices2landmarks,
)


# ---------------------------------------------------------------------------
# torch oracle (independent implementation of the published formulas)
# ---------------------------------------------------------------------------

def torch_rodrigues(r):
    angle = torch.norm(r + 1e-8, dim=1, keepdim=True)
    d = r / angle
    cos, sin = angle.cos().unsqueeze(1), angle.sin().unsqueeze(1)
    rx, ry, rz = torch.split(d, 1, dim=1)
    z = torch.zeros_like(rx)
    K = torch.cat([z, -rz, ry, rz, z, -rx, -ry, rx, z], dim=1).view(-1, 3, 3)
    return torch.eye(3).unsqueeze(0) + sin * K + (1 - cos) * torch.bmm(K, K)


def torch_lbs(betas, pose, v_template, shapedirs, posedirs, J_regressor, parents, weights):
    B = betas.shape[0]
    v_shaped = v_template.unsqueeze(0) + torch.einsum("bl,mkl->bmk", betas, shapedirs)
    J = torch.einsum("bik,ji->bjk", v_shaped, J_regressor)
    rot = torch_rodrigues(pose.reshape(-1, 3)).view(B, -1, 3, 3)
    pose_feat = (rot[:, 1:] - torch.eye(3)).reshape(B, -1)
    v_posed = v_shaped + (pose_feat @ posedirs).view(B, -1, 3)

    # kinematic chain
    rel_J = J.clone()
    rel_J[:, 1:] -= J[:, parents[1:]]
    T_local = torch.zeros(B, J.shape[1], 4, 4)
    T_local[:, :, :3, :3] = rot
    T_local[:, :, :3, 3] = rel_J
    T_local[:, :, 3, 3] = 1.0
    chain = [T_local[:, 0]]
    for i in range(1, J.shape[1]):
        chain.append(chain[parents[i]] @ T_local[:, i])
    G = torch.stack(chain, dim=1)
    posed_J = G[:, :, :3, 3]
    # remove rest-pose joint contribution
    Jh = torch.cat([J, torch.zeros(B, J.shape[1], 1)], dim=-1)
    corr = torch.einsum("bjmn,bjn->bjm", G, Jh)
    A = G.clone()
    A[:, :, :, 3] -= corr
    T = torch.einsum("vj,bjmn->bvmn", weights, A)
    vh = torch.cat([v_posed, torch.ones(B, v_posed.shape[1], 1)], dim=-1)
    verts = torch.einsum("bvmn,bvn->bvm", T[:, :, :3, :], vh)
    return verts, posed_J


def make_assets(n_verts=64, n_betas=12, seed=3):
    rng = np.random.RandomState(seed)
    parents = np.array([-1, 0, 1, 1, 1])
    return dict(
        v_template=rng.randn(n_verts, 3).astype(np.float32) * 0.1,
        shapedirs=(rng.randn(n_verts, 3, n_betas) * 0.01).astype(np.float32),
        posedirs=(rng.randn(4 * 9, n_verts * 3) * 0.001).astype(np.float32),
        J_regressor=(rng.rand(5, n_verts) / n_verts).astype(np.float32),
        weights=(lambda w: w / w.sum(1, keepdims=True))(rng.rand(n_verts, 5).astype(np.float32)),
        parents=parents,
    )


def test_lbs_matches_torch_oracle(rng_key):
    a = make_assets()
    B = 4
    k1, k2 = jax.random.split(rng_key)
    betas = np.asarray(jax.random.normal(k1, (B, 12))) * 0.5
    pose = np.asarray(jax.random.normal(k2, (B, 15))) * 0.3

    verts_j, joints_j = lbs(
        jnp.asarray(betas),
        jnp.asarray(pose),
        jnp.asarray(a["v_template"]),
        jnp.asarray(a["shapedirs"]),
        jnp.asarray(a["posedirs"]),
        jnp.asarray(a["J_regressor"]),
        a["parents"],
        jnp.asarray(a["weights"]),
    )
    verts_t, joints_t = torch_lbs(
        torch.from_numpy(betas.astype(np.float32)),
        torch.from_numpy(pose.astype(np.float32)),
        torch.from_numpy(a["v_template"]),
        torch.from_numpy(a["shapedirs"]),
        torch.from_numpy(a["posedirs"]),
        torch.from_numpy(a["J_regressor"]),
        a["parents"],
        torch.from_numpy(a["weights"]),
    )
    np.testing.assert_allclose(np.asarray(verts_j), verts_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints_j), joints_t.numpy(), atol=2e-5)


def test_zero_pose_is_shaped_template():
    a = make_assets()
    betas = jnp.zeros((2, 12))
    pose = jnp.zeros((2, 15))
    verts, _ = lbs(
        betas, pose,
        jnp.asarray(a["v_template"]), jnp.asarray(a["shapedirs"]), jnp.asarray(a["posedirs"]),
        jnp.asarray(a["J_regressor"]), a["parents"], jnp.asarray(a["weights"]),
    )
    np.testing.assert_allclose(np.asarray(verts[0]), a["v_template"], atol=1e-5)


def test_flame_forward_shapes_and_jit(rng_key):
    model = synthetic_flame(n_verts=128)
    B = 3
    shape = jax.random.normal(rng_key, (B, 100)) * 0.1
    exp = jax.random.normal(jax.random.fold_in(rng_key, 1), (B, 50)) * 0.1
    pose = jax.random.normal(jax.random.fold_in(rng_key, 2), (B, 6)) * 0.2

    fwd = jax.jit(lambda s, e, p: flame_forward(model, s, e, p, return_lm2d=True, return_lm3d=True))
    verts, lm2d, lm3d = fwd(shape, exp, pose)
    assert verts.shape == (B, 128, 3)
    assert lm3d.shape[0] == B and lm3d.shape[2] == 3
    assert lm2d.shape[0] == B
    assert np.isfinite(np.asarray(verts)).all()


def test_flame_ignore_global_rot(rng_key):
    model = synthetic_flame(n_verts=64)
    B = 2
    shape = jnp.zeros((B, 100))
    exp = jnp.zeros((B, 50))
    pose = jnp.concatenate([jax.random.normal(rng_key, (B, 3)), jnp.zeros((B, 3))], axis=1)
    v_rot, _, _ = flame_forward(model, shape, exp, pose)
    v_ign, _, _ = flame_forward(model, shape, exp, pose, ignore_global_rot=True)
    v_zero, _, _ = flame_forward(model, shape, exp, jnp.zeros((B, 6)))
    assert not np.allclose(np.asarray(v_rot), np.asarray(v_zero), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_ign), np.asarray(v_zero), atol=1e-5)


def test_flame_grad_flows(rng_key):
    model = synthetic_flame(n_verts=64)

    def loss(exp):
        v, _, _ = flame_forward(model, jnp.zeros((1, 100)), exp, jnp.zeros((1, 6)))
        return jnp.sum(v ** 2)

    g = jax.grad(loss)(jax.random.normal(rng_key, (1, 50)) * 0.1)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
