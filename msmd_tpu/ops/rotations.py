"""Rotation-representation conversions (PyTorch3D-convention), in jnp.

Covers the full 24-function surface of the reference geometry library
(reference: utils/rotation_conversions.py:38-568) plus the Rodrigues
kernel used by LBS (reference: utils/lbs.py:270-301). All functions are
pure, batched over leading dims, and differentiable; quaternions are
(w, x, y, z) with w >= 0 after standardization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# quaternion <-> matrix
# --------------------------------------------------------------------------

def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _copysign(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(b < 0, -jnp.abs(a), jnp.abs(a))


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a zero subgradient at x <= 0."""
    safe = jnp.where(x > 0, x, jnp.ones_like(x))
    return jnp.where(x > 0, jnp.sqrt(safe), jnp.zeros_like(x))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz."""
    m00 = matrix[..., 0, 0]
    m11 = matrix[..., 1, 1]
    m22 = matrix[..., 2, 2]
    o0 = 0.5 * _sqrt_positive_part(1 + m00 + m11 + m22)
    x = 0.5 * _sqrt_positive_part(1 + m00 - m11 - m22)
    y = 0.5 * _sqrt_positive_part(1 - m00 + m11 - m22)
    z = 0.5 * _sqrt_positive_part(1 - m00 - m11 + m22)
    o1 = _copysign(x, matrix[..., 2, 1] - matrix[..., 1, 2])
    o2 = _copysign(y, matrix[..., 0, 2] - matrix[..., 2, 0])
    o3 = _copysign(z, matrix[..., 1, 0] - matrix[..., 0, 1])
    return jnp.stack([o0, o1, o2, o3], axis=-1)


# --------------------------------------------------------------------------
# euler <-> matrix
# --------------------------------------------------------------------------

def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError("letter must be either X, Y or Z.")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """(..., 3) radians in `convention` (e.g. 'XYZ') -> (..., 3, 3).

    Matches PyTorch3D: R = R_c0(a0) @ R_c1(a1) @ R_c2(a2).
    """
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    if euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i]) for i, c in enumerate(convention)
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def _index_from_letter(letter: str) -> int:
    return "XYZ".index(letter)


def _angle_from_tan(axis: str, other_axis: str, data: jnp.ndarray, horizontal: bool, tait_bryan: bool) -> jnp.ndarray:
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3) radians in `convention`."""
    if len(convention) != 3:
        raise ValueError("Convention must have 3 letters.")
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central_angle = jnp.arcsin(
            jnp.clip(matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0), -1.0, 1.0)
        )
    else:
        central_angle = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))

    o = (
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central_angle,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    )
    return jnp.stack(o, axis=-1)


# --------------------------------------------------------------------------
# random rotations
# --------------------------------------------------------------------------

def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    o = jax.random.normal(key, (n, 4), dtype=dtype)
    return o / jnp.linalg.norm(o, axis=-1, keepdims=True)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jnp.ndarray:
    return quaternion_to_matrix(random_quaternions(key, n, dtype))


def random_rotation(key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    return random_rotations(key, 1, dtype)[0]


# --------------------------------------------------------------------------
# quaternion algebra
# --------------------------------------------------------------------------

def standardize_quaternion(quaternions: jnp.ndarray) -> jnp.ndarray:
    """Force w >= 0 (each (q) and (-q) denote the same rotation)."""
    return jnp.where(quaternions[..., 0:1] < 0, -quaternions, quaternions)


def quaternion_raw_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    ow = aw * bw - ax * bx - ay * by - az * bz
    ox = aw * bx + ax * bw + ay * bz - az * by
    oy = aw * by - ax * bz + ay * bw + az * bx
    oz = aw * bz + ax * by - ay * bx + az * bw
    return jnp.stack([ow, ox, oy, oz], axis=-1)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return standardize_quaternion(quaternion_raw_multiply(a, b))


def quaternion_invert(quaternion: jnp.ndarray) -> jnp.ndarray:
    return quaternion * jnp.asarray([1, -1, -1, -1], dtype=quaternion.dtype)


def quaternion_apply(quaternion: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., 3) points by (..., 4) quaternions."""
    if point.shape[-1] != 3:
        raise ValueError(f"Points are not in 3D, {point.shape}.")
    real_parts = jnp.zeros(point.shape[:-1] + (1,), dtype=point.dtype)
    point_as_quaternion = jnp.concatenate([real_parts, point], axis=-1)
    out = quaternion_raw_multiply(
        quaternion_raw_multiply(quaternion, point_as_quaternion),
        quaternion_invert(quaternion),
    )
    return out[..., 1:]


# --------------------------------------------------------------------------
# axis-angle
# --------------------------------------------------------------------------

def _safe_norm(x: jnp.ndarray, axis=-1, keepdims=True, eps: float = 1e-12) -> jnp.ndarray:
    """Norm with a finite gradient at zero (sqrt'(0) is inf, so plain
    jnp.linalg.norm produces NaN grads at the origin — the double-where
    trick keeps both branches finite)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    safe = jnp.where(sq > eps, sq, jnp.ones_like(sq))
    return jnp.where(sq > eps, jnp.sqrt(safe), jnp.zeros_like(sq))


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 4) wxyz, with the small-angle Taylor branch."""
    angles = _safe_norm(axis_angle)
    half_angles = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # sin(x/2)/x ~ 0.5 - x^2/48 for small x
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return jnp.concatenate([jnp.cos(half_angles), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    norms = _safe_norm(quaternions[..., 1:])
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, jnp.ones_like(angles), angles),
    )
    return quaternions[..., 1:] / sin_half_over_angle


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def batch_rodrigues(rot_vecs: jnp.ndarray, epsilon: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3) via the Rodrigues
    formula, with the reference's exact epsilon regularization
    (reference: utils/lbs.py:270-301: angle = ||r + 1e-8||).

    This is the LBS hot path — pure VPU-friendly elementwise math.
    """
    dtype = rot_vecs.dtype
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=-1, keepdims=True)  # (N, 1)
    rot_dir = rot_vecs / angle

    cos = jnp.cos(angle)[..., None]  # (N, 1, 1)
    sin = jnp.sin(angle)[..., None]

    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack([zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1)
    K = K.reshape(rot_vecs.shape[:-1] + (3, 3))

    ident = jnp.eye(3, dtype=dtype)
    return ident + sin * K + (1 - cos) * (K @ K)


# --------------------------------------------------------------------------
# 6d representation
# --------------------------------------------------------------------------

def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt (Zhou et al. 2019)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


def axis_angle_to_rotation_6d(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(axis_angle))


def rotation_6d_to_axis_angle(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))


def rot_mat_to_euler(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """y-rotation angle extracted as in the reference FLAME contour-landmark
    selector (reference: utils/lbs.py:26-33)."""
    sy = jnp.sqrt(rot_mats[..., 0, 0] * rot_mats[..., 0, 0] + rot_mats[..., 1, 0] * rot_mats[..., 1, 0])
    return jnp.arctan2(-rot_mats[..., 2, 0], sy)
