"""Rotation-conversion parity: round-trips, group properties, and a
Rodrigues cross-check against an independent torch implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

import msmd_tpu.ops.rotations as R


def _rand_aa(key, n=32, scale=1.5):
    return jax.random.normal(key, (n, 3)) * scale


def test_axis_angle_matrix_roundtrip(rng_key):
    aa = _rand_aa(rng_key)
    m = R.axis_angle_to_matrix(aa)
    aa2 = R.matrix_to_axis_angle(m)
    m2 = R.axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_quaternion_matrix_roundtrip(rng_key):
    q = R.random_quaternions(rng_key, 64)
    q = R.standardize_quaternion(q)
    m = R.quaternion_to_matrix(q)
    q2 = R.matrix_to_quaternion(m)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


def test_matrices_are_rotations(rng_key):
    m = R.random_rotations(rng_key, 16)
    eye = jnp.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(m)), np.ones(16), atol=1e-5)


def test_euler_roundtrip(rng_key):
    for conv in ["XYZ", "YXZ", "ZYX"]:
        m = R.random_rotations(jax.random.fold_in(rng_key, hash(conv) % 1000), 16)
        e = R.matrix_to_euler_angles(m, conv)
        m2 = R.euler_angles_to_matrix(e, conv)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)


def test_rotation_6d_roundtrip(rng_key):
    m = R.random_rotations(rng_key, 16)
    d6 = R.matrix_to_rotation_6d(m)
    m2 = R.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)
    aa = _rand_aa(rng_key, 16)
    d6b = R.axis_angle_to_rotation_6d(aa)
    aab = R.rotation_6d_to_axis_angle(d6b)
    np.testing.assert_allclose(
        np.asarray(R.axis_angle_to_matrix(aa)), np.asarray(R.axis_angle_to_matrix(aab)), atol=1e-5
    )


def test_quaternion_apply_equals_matrix(rng_key):
    k1, k2 = jax.random.split(rng_key)
    q = R.random_quaternions(k1, 8)
    p = jax.random.normal(k2, (8, 3))
    via_q = R.quaternion_apply(q, p)
    via_m = jnp.einsum("bij,bj->bi", R.quaternion_to_matrix(q), p)
    np.testing.assert_allclose(np.asarray(via_q), np.asarray(via_m), atol=1e-5)


def test_quaternion_multiply_composition(rng_key):
    k1, k2 = jax.random.split(rng_key)
    qa = R.random_quaternions(k1, 8)
    qb = R.random_quaternions(k2, 8)
    m_prod = R.quaternion_to_matrix(R.quaternion_raw_multiply(qa, qb))
    m_comp = R.quaternion_to_matrix(qa) @ R.quaternion_to_matrix(qb)
    np.testing.assert_allclose(np.asarray(m_prod), np.asarray(m_comp), atol=1e-5)
    inv = R.quaternion_raw_multiply(qa, R.quaternion_invert(qa))
    np.testing.assert_allclose(np.asarray(inv[..., 0]), np.ones(8), atol=1e-5)


def torch_rodrigues(rot_vecs):
    # Independent oracle: R = I + sin K + (1-cos) K^2, with the reference's
    # ||r + 1e-8|| regularizer (behavior at utils/lbs.py:270-301).
    angle = torch.norm(rot_vecs + 1e-8, dim=1, keepdim=True)
    rot_dir = rot_vecs / angle
    cos = angle.cos().unsqueeze(1)
    sin = angle.sin().unsqueeze(1)
    rx, ry, rz = torch.split(rot_dir, 1, dim=1)
    zeros = torch.zeros_like(rx)
    K = torch.cat([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], dim=1).view(-1, 3, 3)
    ident = torch.eye(3).unsqueeze(0)
    return ident + sin * K + (1 - cos) * torch.bmm(K, K)


def test_batch_rodrigues_matches_torch(rng_key):
    aa = np.asarray(_rand_aa(rng_key, 64))
    got = np.asarray(R.batch_rodrigues(jnp.asarray(aa)))
    oracle = torch_rodrigues(torch.from_numpy(aa)).numpy()
    np.testing.assert_allclose(got, oracle, atol=1e-5)


def test_small_angle_stability():
    aa = jnp.asarray([[1e-9, 0, 0], [0, 0, 0], [1e-4, 1e-4, -1e-4]])
    q = R.axis_angle_to_quaternion(aa)
    assert np.isfinite(np.asarray(q)).all()
    m = R.axis_angle_to_matrix(aa)
    np.testing.assert_allclose(np.asarray(m[1]), np.eye(3), atol=1e-6)
    # gradients finite at zero
    g = jax.grad(lambda a: R.axis_angle_to_quaternion(a).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
