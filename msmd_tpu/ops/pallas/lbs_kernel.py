"""Fused FLAME LBS vertex decode as a Pallas TPU kernel.

The north-star kernel of BASELINE.json: shape/expression/pose
coefficients -> skinned vertices in ONE pass over VMEM, fusing

  1. shape+expression blendshapes AND pose-corrective offsets as a
     single (N, 186) x (186, V) matmul per coordinate (MXU),
  2. the per-vertex skinning transform out = sum_j W[v,j] (R_j v + t_j)
     as scalar-broadcast VPU FMAs,

so the (N, V, 16) per-vertex transform matrix T and the intermediate
v_shaped/v_posed buffers of the reference implementation
(utils/lbs.py:195-221) are never materialized in HBM. Memory traffic
drops from ~(16 + 3 + 3) floats/vertex to 3 floats/vertex of output
plus the streamed basis tiles.

Layout notes (see pallas_guide.md): all tensors are kept 2D with the
vertex dimension on the 128-wide lane axis; x/y/z are separate planes
so no TPU-hostile (N, V, 3) reshapes happen inside the kernel. The
tiny kinematic chain (5 joints) is prepared in plain jnp outside.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from msmd_tpu.models.flame import FlameModel
from msmd_tpu.ops.lbs import batch_rigid_transform, vertices2joints
from msmd_tpu.ops.rotations import batch_rodrigues

N_JOINTS = 5


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedFlame:
    """Precomputed kernel-friendly FLAME buffers.

    - ``dirs``: (3, n_basis, Vp) combined [shapedirs | posedirs] per
      coordinate, vertex-padded to a multiple of 128 lanes
    - ``template``: (3, Vp)
    - ``weights_t``: (N_JOINTS, Vp) skinning weights, transposed
    """

    def __init__(self, model: FlameModel, lane: int = 128, interpret: bool = False, batch_tile: int = 8, vertex_tile: int = 512):
        self.model = model
        self.interpret = interpret
        self.batch_tile = batch_tile
        self.vertex_tile = vertex_tile
        V = model.n_verts
        self.n_verts = V
        self.vp = _round_up(V, lane)
        n_shape_exp = model.shapedirs.shape[-1]
        n_pose = model.posedirs.shape[0]
        self.n_basis = n_shape_exp + n_pose

        # shapedirs (V, 3, S) -> (3, S, V); posedirs (P, V*3) -> (3, P, V)
        sd = jnp.transpose(model.shapedirs, (1, 2, 0))  # (3, S, V)
        pd = jnp.transpose(model.posedirs.reshape(n_pose, V, 3), (2, 0, 1))  # (3, P, V)
        dirs = jnp.concatenate([sd, pd], axis=1)  # (3, S+P, V)
        pad = self.vp - V
        self.dirs = jnp.pad(dirs, ((0, 0), (0, 0), (0, pad)))
        self.template = jnp.pad(model.v_template.T, ((0, 0), (0, pad)))  # (3, Vp)
        self.weights_t = jnp.pad(model.lbs_weights.T, ((0, 0), (0, pad)))  # (J, Vp)

        # reduced joint regressor: J(betas) = J_template + betas @ J_dirs
        # (so the fused path never materializes the (B, V, 3) shaped mesh)
        self.j_template = vertices2joints(model.J_regressor, model.v_template[None])[0]  # (J, 3)
        self.j_dirs = jnp.einsum("jv,vck->kjc", model.J_regressor, model.shapedirs)  # (S, J, 3)

    def skin_fn(self, batch_tile: int = 8, vertex_tile: int = 512, interpret: bool = False):
        """Differentiable fused skinning fn of (betas_ext (N, n_basis),
        rt (N, 60)) -> (3, N, Vp). Forward runs the Pallas kernel; the
        custom VJP recomputes the posed planes with three jnp matmuls
        (pallas_call has no automatic linearization)."""
        dirs, template, weights_t = self.dirs, self.template, self.weights_t

        @jax.custom_vjp
        def skin(betas_ext, rt):
            return _fused_skin(betas_ext, rt, dirs, template, weights_t, batch_tile, vertex_tile, interpret)

        def fwd(betas_ext, rt):
            return skin(betas_ext, rt), (betas_ext, rt)

        def bwd(res, g):
            # g: (3, N, Vp) cotangent of the output planes
            betas_ext, rt = res
            N = betas_ext.shape[0]
            # recompute posed planes v_c = template_c + betas @ dirs_c
            v = template[:, None, :] + jnp.einsum("bk,ckv->cbv", betas_ext, dirs)  # (3, N, Vp)
            R = rt.reshape(N, N_JOINTS, 3, 4)[..., :3]  # (N, J, 3, 3)
            # dL/dv_c = sum_j w_j * sum_d g_d R_j[d, c]
            gw = jnp.einsum("dbv,jv->dbvj", g, weights_t)  # (3, N, Vp, J)
            dv = jnp.einsum("dbvj,bjdc->cbv", gw, R)  # (3, N, Vp)
            d_betas = jnp.einsum("cbv,ckv->bk", dv, dirs)
            # dR_j[b, d, c] = sum_v g_d[b, v] w_j[v] v_c[b, v]
            dR = jnp.einsum("dbvj,cbv->bjdc", gw, v)  # (N, J, 3, 3)
            dt = jnp.einsum("dbvj->bjd", gw)  # (N, J, 3)
            d_rt = jnp.concatenate([dR, dt[..., None]], axis=-1).reshape(N, N_JOINTS * 12)
            return d_betas, d_rt

        skin.defvjp(fwd, bwd)
        return skin


def _lbs_kernel(betas_ref, dirs_x_ref, dirs_y_ref, dirs_z_ref, tmpl_ref, rt_ref, w_ref, out_x_ref, out_y_ref, out_z_ref):
    """One (batch-tile, vertex-tile) block.

    betas_ref: (Nb, n_basis)    coefficient rows (shape+exp+pose-feature)
    dirs_*_ref: (n_basis, Vt)   combined basis, per coordinate
    tmpl_ref: (3, Vt)           template coordinates
    rt_ref: (Nb, 60)            per-joint [R | t] rows, 12 per joint
    w_ref: (J, Vt)              skinning weights
    out_*_ref: (Nb, Vt)
    """
    betas = betas_ref[:]
    f32 = jnp.float32
    # posed positions per coordinate: template + betas @ dirs  (MXU)
    vx = tmpl_ref[0, :][None, :] + jnp.dot(betas, dirs_x_ref[:], preferred_element_type=f32)
    vy = tmpl_ref[1, :][None, :] + jnp.dot(betas, dirs_y_ref[:], preferred_element_type=f32)
    vz = tmpl_ref[2, :][None, :] + jnp.dot(betas, dirs_z_ref[:], preferred_element_type=f32)

    nb = betas.shape[0]
    out_x = jnp.zeros_like(vx)
    out_y = jnp.zeros_like(vy)
    out_z = jnp.zeros_like(vz)
    # skinning: out_d[b] = sum_j w_j * (R_j[d, :] . v[b] + t_j[d])
    # joints and coordinates unroll (5 x 3); scalars broadcast over lanes.
    for j in range(N_JOINTS):
        wj = w_ref[j, :][None, :]  # (1, Vt)
        base = j * 12
        rows = []
        for d in range(3):
            r0 = rt_ref[:, base + 4 * d + 0][:, None]
            r1 = rt_ref[:, base + 4 * d + 1][:, None]
            r2 = rt_ref[:, base + 4 * d + 2][:, None]
            t = rt_ref[:, base + 4 * d + 3][:, None]
            rows.append(r0 * vx + r1 * vy + r2 * vz + t)
        out_x = out_x + wj * rows[0]
        out_y = out_y + wj * rows[1]
        out_z = out_z + wj * rows[2]
    out_x_ref[:] = out_x
    out_y_ref[:] = out_y
    out_z_ref[:] = out_z


@partial(jax.jit, static_argnames=("batch_tile", "vertex_tile", "interpret"))
def _fused_skin(betas_ext, rt, fused_dirs, template, weights_t, batch_tile: int = 8, vertex_tile: int = 512, interpret: bool = False):
    """betas_ext (N, n_basis), rt (N, 60) -> (3, N, Vp) vertex planes."""
    from jax.experimental import pallas as pl

    N = betas_ext.shape[0]
    n_basis = betas_ext.shape[1]
    vp = template.shape[1]
    nb = min(batch_tile, N)
    vt = min(vertex_tile, vp)
    if vp % vt != 0:
        # the grid below floors vp/vt; a remainder would leave trailing
        # vertex tiles unwritten (garbage) — shrink vt to an exact divisor
        vt = next(d for d in range(vt, 0, -1) if vp % d == 0)
    # pad batch to a tile multiple
    n_pad = _round_up(N, nb)
    if n_pad != N:
        betas_ext = jnp.pad(betas_ext, ((0, n_pad - N), (0, 0)))
        rt = jnp.pad(rt, ((0, n_pad - N), (0, 0)))

    grid = (n_pad // nb, vp // vt)
    out_shape = [jax.ShapeDtypeStruct((n_pad, vp), jnp.float32)] * 3

    out_spec = pl.BlockSpec((nb, vt), lambda i, j: (i, j))
    outs = pl.pallas_call(
        _lbs_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, n_basis), lambda i, j: (i, 0)),
            pl.BlockSpec((n_basis, vt), lambda i, j: (0, j)),
            pl.BlockSpec((n_basis, vt), lambda i, j: (0, j)),
            pl.BlockSpec((n_basis, vt), lambda i, j: (0, j)),
            pl.BlockSpec((3, vt), lambda i, j: (0, j)),
            pl.BlockSpec((nb, 60), lambda i, j: (i, 0)),
            pl.BlockSpec((N_JOINTS, vt), lambda i, j: (0, j)),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        interpret=interpret,
    )(betas_ext, fused_dirs[0], fused_dirs[1], fused_dirs[2], template, rt, weights_t)
    return jnp.stack(outs)[:, :N]


def flame_vertices_fused(
    fused: FusedFlame,
    shape_params: jnp.ndarray,
    expression_params: jnp.ndarray,
    pose_params: Optional[jnp.ndarray] = None,
    ignore_global_rot: bool = False,
    batch_tile: Optional[int] = None,
    vertex_tile: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in fused replacement for ``flame_forward(...)[0]``:
    (shape (B,100), exp (B,50), pose (B,6)) -> verts (B, V, 3).

    The kinematic-chain prep (rodrigues on 7 joint rotations, 5-node
    rigid-transform accumulation) stays in plain jnp — it's O(B*5)
    work; the O(B*V) decode runs in the Pallas kernel.
    """
    model = fused.model
    batch_tile = fused.batch_tile if batch_tile is None else batch_tile
    vertex_tile = fused.vertex_tile if vertex_tile is None else vertex_tile
    interpret = fused.interpret if interpret is None else interpret
    batch_size = shape_params.shape[0]
    dtype = shape_params.dtype
    if pose_params is None:
        pose_params = jnp.zeros((batch_size, 6), dtype)
    head = pose_params[:, :3] if not ignore_global_rot else jnp.zeros_like(pose_params[:, :3])
    full_pose = jnp.concatenate(
        [head, jnp.zeros((batch_size, 3), dtype), pose_params[:, 3:], jnp.zeros((batch_size, 6), dtype)], axis=1
    )

    betas = jnp.concatenate([shape_params, expression_params], axis=1)
    rot_mats = batch_rodrigues(full_pose.reshape(-1, 3)).reshape(batch_size, -1, 3, 3)
    pose_feature = (rot_mats[:, 1:] - jnp.eye(3, dtype=dtype)).reshape(batch_size, -1)  # (B, 36)
    betas_ext = jnp.concatenate([betas, pose_feature], axis=1).astype(jnp.float32)  # (B, 186)

    # joints via the reduced regressor: (B, 150) @ (150, J*3) — tiny
    J = fused.j_template[None] + jnp.einsum("bk,kjc->bjc", betas, fused.j_dirs)
    _, A = batch_rigid_transform(rot_mats, J, model.parents)  # (B, J, 4, 4)
    rt = A[:, :, :3, :].reshape(batch_size, N_JOINTS * 12).astype(jnp.float32)  # rows [R|t]

    skin = fused.skin_fn(batch_tile=batch_tile, vertex_tile=vertex_tile, interpret=interpret)
    planes = skin(betas_ext, rt)  # (3, B, Vp)
    return jnp.transpose(planes, (1, 2, 0))[:, : fused.n_verts]
