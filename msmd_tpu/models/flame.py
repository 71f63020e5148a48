"""FLAME 2020 head model as a functional JAX decoder.

Capability-parity rebuild of the reference FLAME wrapper (reference:
utils/flame.py:59-301): 100 shape + 50 expression blendshapes, LBS over a
5-joint kinematic tree, static + pose-dependent (contour) landmark
embeddings, and the BFM/FLAME texture decoder. The model is a frozen
pytree of buffers, so `flame_forward` jits into one fused XLA program —
the "fused LBS vertex decode" of BASELINE.json.

Asset loading: FLAME's `generic_model.pkl` is a licensed artifact the
user supplies (same as the reference, whose paths are hardcoded to
/code/models/flame_data — utils/flame.py:48-55). `load_flame` reads it
(handling chumpy-pickled arrays without chumpy installed);
`synthetic_flame` builds a random, small but structurally identical
model for tests and benchmarks.
"""

from __future__ import annotations

import io
import pickle
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from msmd_tpu.ops.lbs import lbs, vertices2landmarks
from msmd_tpu.ops.rotations import batch_rodrigues, rot_mat_to_euler

FLAME_N_VERTS = 5023
FLAME_N_JOINTS = 5  # global, neck, jaw, left eye, right eye


@dataclass(frozen=True)
class FLAMEConfig:
    flame_model_path: Optional[str] = None
    n_shape: int = 100
    n_exp: int = 50
    n_tex: int = 50
    tex_type: str = "BFM"
    tex_path: Optional[str] = None
    flame_lmk_embedding_path: Optional[str] = None


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class FlameModel:
    """Static buffers of the FLAME decoder. `parents` and `faces` stay as
    NumPy (trace-time constants: the kinematic tree and the mesh topology
    never change)."""

    v_template: jnp.ndarray  # (V, 3)
    shapedirs: jnp.ndarray  # (V, 3, n_shape + n_exp)
    posedirs: jnp.ndarray  # ((J-1)*9, V*3), transposed like the reference
    J_regressor: jnp.ndarray  # (J, V)
    lbs_weights: jnp.ndarray  # (V, J)
    parents: np.ndarray  # (J,) static
    faces: np.ndarray  # (F, 3) static
    # landmark embeddings (optional; zeros-shaped placeholders if absent)
    lmk_faces_idx: Optional[jnp.ndarray] = None  # (51,)
    lmk_bary_coords: Optional[jnp.ndarray] = None  # (51, 3)
    dynamic_lmk_faces_idx: Optional[jnp.ndarray] = None  # (79, 17)
    dynamic_lmk_bary_coords: Optional[jnp.ndarray] = None  # (79, 17, 3)
    full_lmk_faces_idx: Optional[jnp.ndarray] = None  # (68,)
    full_lmk_bary_coords: Optional[jnp.ndarray] = None  # (68, 3)

    @property
    def n_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def neck_kin_chain(self) -> np.ndarray:
        """Joint chain from the neck (idx 1) to the root (reference:
        utils/flame.py:120-126)."""
        chain = []
        idx = 1
        while idx != -1:
            chain.append(idx)
            idx = int(self.parents[idx])
        return np.asarray(chain)

    def tree_flatten(self):
        children = (
            self.v_template,
            self.shapedirs,
            self.posedirs,
            self.J_regressor,
            self.lbs_weights,
            self.lmk_faces_idx,
            self.lmk_bary_coords,
            self.dynamic_lmk_faces_idx,
            self.dynamic_lmk_bary_coords,
            self.full_lmk_faces_idx,
            self.full_lmk_bary_coords,
        )
        aux = (self.parents.tobytes(), self.parents.shape, self.faces.tobytes(), self.faces.shape)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        pb, ps, fb, fs = aux
        parents = np.frombuffer(pb, dtype=np.int64).reshape(ps)
        faces = np.frombuffer(fb, dtype=np.int64).reshape(fs)
        return cls(*children[:5], parents, faces, *children[5:])


# ---------------------------------------------------------------------------
# asset loading
# ---------------------------------------------------------------------------

class _ChumpylessUnpickler(pickle.Unpickler):
    """Unpickle FLAME's generic_model.pkl without chumpy installed by
    substituting a minimal array shim for chumpy.Ch objects."""

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            class _Ch:  # minimal stand-in exposing .r via __setstate__ dict
                def __setstate__(self, state):
                    self.__dict__.update(state)

            return _Ch
        if module == "scipy.sparse.csc" and name == "csc_matrix":
            from scipy.sparse import csc_matrix

            return csc_matrix
        return super().find_class(module, name)


def _to_np(a, dtype=np.float32):
    if hasattr(a, "todense"):
        a = np.asarray(a.todense())
    if hasattr(a, "r"):  # chumpy
        a = a.r
    if hasattr(a, "__dict__") and "x" in getattr(a, "__dict__", {}):
        a = a.__dict__["x"]
    return np.asarray(a, dtype=dtype)


def load_flame(config: FLAMEConfig, dtype=jnp.float32) -> FlameModel:
    """Load FLAME buffers from generic_model.pkl (+ optional landmark
    embedding npy), mirroring the reference's slicing of shapedirs to
    [:n_shape] + [300:300+n_exp] (reference: utils/flame.py:78-80)."""
    with open(config.flame_model_path, "rb") as f:
        data = _ChumpylessUnpickler(io.BytesIO(f.read()), encoding="latin1").load()

    shapedirs = _to_np(data["shapedirs"])
    shapedirs = np.concatenate(
        [shapedirs[:, :, : config.n_shape], shapedirs[:, :, 300 : 300 + config.n_exp]], axis=2
    )
    posedirs = _to_np(data["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (P, V*3)
    parents = _to_np(data["kintree_table"], np.int64)[0]
    parents[0] = -1

    kw = {}
    if config.flame_lmk_embedding_path:
        lmk = np.load(config.flame_lmk_embedding_path, allow_pickle=True, encoding="latin1")[()]
        kw = dict(
            lmk_faces_idx=jnp.asarray(np.asarray(lmk["static_lmk_faces_idx"], np.int64)),
            lmk_bary_coords=jnp.asarray(np.asarray(lmk["static_lmk_bary_coords"], np.float32)),
            dynamic_lmk_faces_idx=jnp.asarray(_to_np(lmk["dynamic_lmk_faces_idx"], np.int64)),
            dynamic_lmk_bary_coords=jnp.asarray(_to_np(lmk["dynamic_lmk_bary_coords"], np.float32)),
            full_lmk_faces_idx=jnp.asarray(np.asarray(lmk["full_lmk_faces_idx"], np.int64).reshape(-1)),
            full_lmk_bary_coords=jnp.asarray(np.asarray(lmk["full_lmk_bary_coords"], np.float32).reshape(-1, 3)),
        )

    return FlameModel(
        v_template=jnp.asarray(_to_np(data["v_template"]), dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(_to_np(data["J_regressor"]), dtype),
        lbs_weights=jnp.asarray(_to_np(data["weights"]), dtype),
        parents=parents,
        faces=_to_np(data["f"], np.int64),
        **kw,
    )


def synthetic_flame(
    n_verts: int = FLAME_N_VERTS,
    n_shape: int = 100,
    n_exp: int = 50,
    seed: int = 0,
    dtype=jnp.float32,
) -> FlameModel:
    """A random FLAME-shaped model (same joint tree / buffer shapes) for
    tests and benchmarks when the licensed assets are unavailable."""
    rng = np.random.RandomState(seed)
    n_joints = FLAME_N_JOINTS
    parents = np.array([-1, 0, 1, 1, 1], np.int64)  # global->neck->{jaw,eyeL,eyeR}
    v_template = rng.randn(n_verts, 3).astype(np.float32) * 0.1
    shapedirs = rng.randn(n_verts, 3, n_shape + n_exp).astype(np.float32) * 0.01
    posedirs = rng.randn((n_joints - 1) * 9, n_verts * 3).astype(np.float32) * 0.001
    J_regressor = rng.rand(n_joints, n_verts).astype(np.float32)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    lbs_weights = rng.rand(n_verts, n_joints).astype(np.float32)
    lbs_weights /= lbs_weights.sum(axis=1, keepdims=True)
    n_faces = max(n_verts - 2, 1)
    faces = np.stack(
        [np.arange(n_faces), (np.arange(n_faces) + 1) % n_verts, (np.arange(n_faces) + 2) % n_verts],
        axis=1,
    ).astype(np.int64)
    lmk_n = min(51, n_faces)
    bary = rng.rand(lmk_n, 3).astype(np.float32)
    bary /= bary.sum(axis=1, keepdims=True)
    full_n = min(68, n_faces)
    full_bary = rng.rand(full_n, 3).astype(np.float32)
    full_bary /= full_bary.sum(axis=1, keepdims=True)
    dyn_bary = rng.rand(79, min(17, n_faces), 3).astype(np.float32)
    dyn_bary /= dyn_bary.sum(axis=-1, keepdims=True)
    return FlameModel(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        J_regressor=jnp.asarray(J_regressor, dtype),
        lbs_weights=jnp.asarray(lbs_weights, dtype),
        parents=parents,
        faces=faces,
        lmk_faces_idx=jnp.asarray(rng.randint(0, n_faces, lmk_n)),
        lmk_bary_coords=jnp.asarray(bary),
        dynamic_lmk_faces_idx=jnp.asarray(rng.randint(0, n_faces, (79, min(17, n_faces)))),
        dynamic_lmk_bary_coords=jnp.asarray(dyn_bary),
        full_lmk_faces_idx=jnp.asarray(rng.randint(0, n_faces, full_n)),
        full_lmk_bary_coords=jnp.asarray(full_bary),
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _find_dynamic_lmk_idx_and_bcoords(model: FlameModel, full_pose: jnp.ndarray):
    """Contour landmark selection by relative neck rotation (reference:
    utils/flame.py:128-172), vectorized: the per-chain bmm loop becomes a
    tiny unrolled matmul chain; the index_select becomes a gather."""
    batch_size = full_pose.shape[0]
    chain = model.neck_kin_chain
    aa_pose = full_pose.reshape(batch_size, -1, 3)[:, chain]  # (B, C, 3)
    rot_mats = batch_rodrigues(aa_pose.reshape(-1, 3)).reshape(batch_size, -1, 3, 3)

    rel_rot_mat = jnp.broadcast_to(jnp.eye(3, dtype=full_pose.dtype), (batch_size, 3, 3))
    for idx in range(len(chain)):
        rel_rot_mat = rot_mats[:, idx] @ rel_rot_mat

    y_rot_angle = jnp.round(jnp.clip(rot_mat_to_euler(rel_rot_mat) * 180.0 / np.pi, max=39)).astype(jnp.int32)
    neg_mask = (y_rot_angle < 0).astype(jnp.int32)
    mask = (y_rot_angle < -39).astype(jnp.int32)
    neg_vals = mask * 78 + (1 - mask) * (39 - y_rot_angle)
    y_rot_angle = neg_mask * neg_vals + (1 - neg_mask) * y_rot_angle

    dyn_lmk_faces_idx = model.dynamic_lmk_faces_idx[y_rot_angle]  # (B, 17)
    dyn_lmk_b_coords = model.dynamic_lmk_bary_coords[y_rot_angle]  # (B, 17, 3)
    return dyn_lmk_faces_idx, dyn_lmk_b_coords


def flame_forward(
    model: FlameModel,
    shape_params: jnp.ndarray,
    expression_params: jnp.ndarray,
    pose_params: Optional[jnp.ndarray] = None,
    eye_pose_params: Optional[jnp.ndarray] = None,
    pose2rot: bool = True,
    ignore_global_rot: bool = False,
    return_lm2d: bool = False,
    return_lm3d: bool = False,
):
    """FLAME decode: (shape (B,100), exp (B,50), pose (B,6) =
    [global(3), jaw(3)]) -> vertices (B, V, 3) [, lm2d, lm3d]
    (reference: utils/flame.py:180-244). Neck pose is fixed at zero and
    eye poses default to zero, exactly like the reference."""
    batch_size = shape_params.shape[0]
    dtype = shape_params.dtype
    betas = jnp.concatenate([shape_params, expression_params], axis=1)

    if pose2rot:
        if pose_params is None:
            pose_params = jnp.zeros((batch_size, 6), dtype)
        if eye_pose_params is None:
            eye_pose_params = jnp.zeros((batch_size, 6), dtype)
        head_pose = pose_params[:, :3]
        if ignore_global_rot:
            head_pose = jnp.zeros_like(head_pose)
        neck_pose = jnp.zeros((batch_size, 3), dtype)
        full_pose = jnp.concatenate([head_pose, neck_pose, pose_params[:, 3:], eye_pose_params], axis=1)
    else:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype).reshape(1, 9), (batch_size, 9))
        if pose_params is None:
            pose_params = jnp.concatenate([eye, eye], axis=1)
        if eye_pose_params is None:
            eye_pose_params = jnp.concatenate([eye, eye], axis=1)
        head_pose = pose_params[:, :9] if not ignore_global_rot else eye
        full_pose = jnp.concatenate([head_pose, eye, pose_params[:, 9:], eye_pose_params], axis=1)

    verts, _ = lbs(
        betas,
        full_pose,
        model.v_template,
        model.shapedirs,
        model.posedirs,
        model.J_regressor,
        model.parents,
        model.lbs_weights,
        pose2rot=pose2rot,
    )

    landmarks2d = None
    landmarks3d = None
    if return_lm2d:
        lmk_faces_idx = jnp.broadcast_to(model.lmk_faces_idx[None], (batch_size,) + model.lmk_faces_idx.shape)
        lmk_bary = jnp.broadcast_to(model.lmk_bary_coords[None], (batch_size,) + model.lmk_bary_coords.shape)
        dyn_idx, dyn_bary = _find_dynamic_lmk_idx_and_bcoords(model, full_pose)
        lmk_faces_idx = jnp.concatenate([dyn_idx, lmk_faces_idx], axis=1)
        lmk_bary = jnp.concatenate([dyn_bary, lmk_bary], axis=1)
        landmarks2d = vertices2landmarks(verts, jnp.asarray(model.faces), lmk_faces_idx, lmk_bary)
    if return_lm3d:
        landmarks3d = vertices2landmarks(
            verts, jnp.asarray(model.faces), model.full_lmk_faces_idx, model.full_lmk_bary_coords
        )
    return verts, landmarks2d, landmarks3d


def select_3d68(model: FlameModel, vertices: jnp.ndarray) -> jnp.ndarray:
    """68-landmark selection helper (reference: utils/flame.py:174-178)."""
    return vertices2landmarks(vertices, jnp.asarray(model.faces), model.full_lmk_faces_idx, model.full_lmk_bary_coords)


# ---------------------------------------------------------------------------
# texture decoder (reference: utils/flame.py:247-301)
# ---------------------------------------------------------------------------

def load_flame_tex(config: FLAMEConfig):
    """Load the BFM->FLAME (or FLAME) texture basis. Returns (mean (1,N),
    basis (N, n_tex)) as jnp arrays."""
    tex_space = np.load(config.tex_path)
    if config.tex_type == "BFM":
        mu_key, pc_key, scale = "MU", "PC", 1.0
    elif config.tex_type == "FLAME":
        mu_key, pc_key, scale = "mean", "tex_dir", 255.0
    else:
        raise ValueError(f"Texture type {config.tex_type} not supported")
    texture_mean = np.reshape(tex_space[mu_key], (1, -1)) * scale
    texture_basis = np.reshape(tex_space[pc_key], (-1, 199))[:, : config.n_tex] * scale
    return jnp.asarray(texture_mean, jnp.float32), jnp.asarray(texture_basis, jnp.float32)


def flame_tex_forward(texture_mean: jnp.ndarray, texture_basis: jnp.ndarray, texcode: jnp.ndarray, size: int = 512):
    """Texture decode: texcode (B, n_tex) -> (B, 3, size, size) RGB in
    [0, 1], with the reference's BGR->RGB flip and bilinear resize."""
    texture = texture_mean + (texture_basis @ texcode.T).T  # (B, N)
    b = texcode.shape[0]
    texture = texture.reshape(b, 512, 512, 3)
    texture = texture[..., ::-1] / 255.0  # BGR -> RGB
    if size != 512:
        texture = jax.image.resize(texture, (b, size, size, 3), method="bilinear")
    return jnp.transpose(texture, (0, 3, 1, 2))
