"""Linear Blend Skinning as one fused XLA tensor program.

Functional re-design of the reference LBS stack (reference:
utils/lbs.py:141-371) for TPU: everything is batched matmul/einsum that
XLA tiles onto the MXU; the 5-joint kinematic chain is unrolled at trace
time (it's a static tree), so the whole shape->vertices decode compiles
into a single fused kernel with no host round-trips.

Conventions match the reference exactly:
- betas = concat(shape, expression) coefficients
- pose is per-joint axis-angle (pose2rot=True) or flattened 3x3 matrices
- returns (verts, posed_joints)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from msmd_tpu.ops.rotations import batch_rodrigues


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """(B, num_betas) x (V, 3, num_betas) -> (B, V, 3) per-vertex offsets
    (reference: utils/lbs.py:249-267). One big MXU matmul."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps)


def vertices2joints(J_regressor: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3) (reference: utils/lbs.py:226-243)."""
    return jnp.einsum("bik,ji->bjk", vertices, J_regressor)


def transform_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Rotation (..., 3, 3) + translation (..., 3, 1) -> homogeneous
    (..., 4, 4) (reference: utils/lbs.py:304-314)."""
    batch = R.shape[:-2]
    pad_R = jnp.concatenate([R, jnp.zeros(batch + (1, 3), R.dtype)], axis=-2)
    pad_t = jnp.concatenate([t, jnp.ones(batch + (1, 1), t.dtype)], axis=-2)
    return jnp.concatenate([pad_R, pad_t], axis=-1)


def batch_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray, parents: np.ndarray):
    """Accumulate the kinematic chain (reference: utils/lbs.py:317-371).

    `parents` must be a static NumPy array: the chain is unrolled at trace
    time (FLAME has only 5 joints), which XLA schedules as a handful of
    small fused matmuls rather than a sequential loop.

    Returns (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).
    """
    parents = np.asarray(parents)
    num_joints = parents.shape[0]

    rel_joints = jnp.concatenate(
        [joints[:, :1], joints[:, 1:] - joints[:, parents[1:]]], axis=1
    )  # (B, J, 3)
    transforms_mat = transform_mat(rot_mats, rel_joints[..., None])  # (B, J, 4, 4)

    chain = [transforms_mat[:, 0]]
    for i in range(1, num_joints):
        chain.append(chain[parents[i]] @ transforms_mat[:, i])
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]

    # rel_transforms = transforms - [0 | transforms @ [joints; 0]]
    joints_homo = jnp.concatenate([joints, jnp.zeros_like(joints[..., :1])], axis=-1)  # (B, J, 4)
    shifted = jnp.einsum("bjmn,bjn->bjm", transforms, joints_homo)  # (B, J, 4)
    correction = jnp.zeros_like(transforms).at[:, :, :, 3].set(shifted)
    rel_transforms = transforms - correction
    return posed_joints, rel_transforms


def lbs(
    betas: jnp.ndarray,
    pose: jnp.ndarray,
    v_template: jnp.ndarray,
    shapedirs: jnp.ndarray,
    posedirs: jnp.ndarray,
    J_regressor: jnp.ndarray,
    parents: np.ndarray,
    lbs_weights: jnp.ndarray,
    pose2rot: bool = True,
):
    """Full linear blend skinning (reference: utils/lbs.py:141-223).

    Args:
        betas: (B, n_betas) shape+expression coefficients
        pose: (B, J*3) axis-angle, or (B, J*9) rotation matrices
        v_template: (B, V, 3) or (V, 3) template vertices
        shapedirs: (V, 3, n_betas)
        posedirs: (P, V*3) pose-corrective basis (already transposed)
        J_regressor: (J, V)
        parents: static (J,) kinematic tree
        lbs_weights: (V, J)

    Returns:
        verts (B, V, 3), posed_joints (B, J, 3)
    """
    batch_size = max(betas.shape[0], pose.shape[0])
    dtype = betas.dtype

    if v_template.ndim == 2:
        v_template = v_template[None]

    # 1. shape/expression blendshapes
    v_shaped = v_template + blend_shapes(betas, shapedirs)

    # 2. rest-pose joints
    J = vertices2joints(J_regressor, v_shaped)

    # 3. pose-corrective blendshapes
    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(batch_size, -1, 3, 3)
    else:
        rot_mats = pose.reshape(batch_size, -1, 3, 3)
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(batch_size, -1)  # (B, (J-1)*9)
    pose_offsets = (pose_feature @ posedirs).reshape(batch_size, -1, 3)
    v_posed = pose_offsets + v_shaped

    # 4. kinematic chain
    J_transformed, A = batch_rigid_transform(rot_mats, J, parents)

    # 5. skinning: per-vertex 4x4 = W @ A (one (V,J)x(B,J,16) matmul),
    # then the homogeneous transform of each vertex.
    num_joints = J_regressor.shape[0]
    T = jnp.einsum("vj,bjmn->bvmn", lbs_weights, A)  # (B, V, 4, 4)
    v_posed_homo = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvmn,bvn->bvm", T[..., :3, :], v_posed_homo)  # (B, V, 3)

    return verts, J_transformed


def vertices2landmarks(
    vertices: jnp.ndarray,
    faces: jnp.ndarray,
    lmk_faces_idx: jnp.ndarray,
    lmk_bary_coords: jnp.ndarray,
) -> jnp.ndarray:
    """Barycentric landmark interpolation (reference: utils/lbs.py:100-137).

    Args:
        vertices: (B, V, 3)
        faces: (F, 3) int
        lmk_faces_idx: (B, L) or (L,) int
        lmk_bary_coords: (B, L, 3) or (L, 3)
    """
    batch_size = vertices.shape[0]
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(lmk_faces_idx[None], (batch_size,) + lmk_faces_idx.shape)
    if lmk_bary_coords.ndim == 2:
        lmk_bary_coords = jnp.broadcast_to(lmk_bary_coords[None], (batch_size,) + lmk_bary_coords.shape)
    lmk_faces = faces[lmk_faces_idx]  # (B, L, 3) vertex ids
    flat_idx = lmk_faces.reshape(batch_size, -1).astype(jnp.int32)  # (B, L*3)
    lmk_vertices = jnp.take_along_axis(vertices, flat_idx[..., None], axis=1)
    lmk_vertices = lmk_vertices.reshape(batch_size, -1, 3, 3)  # (B, L, 3, 3)
    return jnp.einsum("blfi,blf->bli", lmk_vertices, lmk_bary_coords)
