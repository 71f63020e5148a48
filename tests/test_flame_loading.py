"""FLAME asset loading: fabricate a generic_model.pkl with the real
file's structure (numpy + scipy-sparse J_regressor, 400-basis shapedirs
with expression components at 300+, flattened posedirs) and a landmark
embedding npy, then load and decode."""

import pickle

import numpy as np
import pytest

from msmd_tpu.models.flame import FLAMEConfig, flame_forward, load_flame


@pytest.fixture(scope="module")
def fake_assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("flame_assets")
    rng = np.random.RandomState(0)
    V, J = 64, 5
    model = {
        "v_template": rng.randn(V, 3) * 0.1,
        # real FLAME: 300 shape + 100 expression basis columns
        "shapedirs": rng.randn(V, 3, 400) * 0.01,
        "posedirs": rng.randn(V, 3, (J - 1) * 9) * 0.001,
        "kintree_table": np.array([[4294967295, 0, 1, 1, 1], [0, 1, 2, 3, 4]], dtype=np.uint32),
        "weights": (lambda w: w / w.sum(1, keepdims=True))(rng.rand(V, J)),
        "f": rng.randint(0, V, (100, 3)).astype(np.uint32),
    }
    try:
        from scipy.sparse import csc_matrix

        model["J_regressor"] = csc_matrix(rng.rand(J, V) / V)
    except ImportError:
        model["J_regressor"] = rng.rand(J, V) / V
    with open(root / "generic_model.pkl", "wb") as f:
        pickle.dump(model, f)

    lmk = {
        "static_lmk_faces_idx": rng.randint(0, 100, 51),
        "static_lmk_bary_coords": rng.rand(51, 3),
        "dynamic_lmk_faces_idx": rng.randint(0, 100, (79, 17)),
        "dynamic_lmk_bary_coords": rng.rand(79, 17, 3),
        "full_lmk_faces_idx": rng.randint(0, 100, (1, 68)),
        "full_lmk_bary_coords": rng.rand(1, 68, 3),
    }
    np.save(root / "landmark_embedding.npy", lmk, allow_pickle=True)
    return root


def test_load_flame_and_decode(fake_assets):
    cfg = FLAMEConfig(
        flame_model_path=str(fake_assets / "generic_model.pkl"),
        flame_lmk_embedding_path=str(fake_assets / "landmark_embedding.npy"),
        n_shape=100,
        n_exp=50,
    )
    model = load_flame(cfg)
    assert model.v_template.shape == (64, 3)
    # sliced to [:100] + [300:350]
    assert model.shapedirs.shape == (64, 3, 150)
    assert model.posedirs.shape == (36, 64 * 3)
    assert model.parents.tolist() == [-1, 0, 1, 1, 1]
    assert model.lmk_faces_idx.shape == (51,)
    assert model.full_lmk_faces_idx.shape == (68,)

    import jax.numpy as jnp

    verts, lm2d, lm3d = flame_forward(
        model, jnp.zeros((2, 100)), jnp.zeros((2, 50)), jnp.zeros((2, 6)),
        return_lm2d=True, return_lm3d=True,
    )
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5)
    assert lm2d.shape[0] == 2 and lm3d.shape == (2, 68, 3)


class FakeCh:
    """chumpy-pickled arrays appear as objects exposing .r; emulate that."""

    def __init__(self, arr):
        self.r = arr


def test_load_flame_chumpy_style(fake_assets):
    with open(fake_assets / "generic_model.pkl", "rb") as f:
        model = pickle.load(f)
    model["v_template"] = FakeCh(model["v_template"])
    model["weights"] = FakeCh(np.asarray(model["weights"]))
    with open(fake_assets / "generic_model_ch.pkl", "wb") as f:
        pickle.dump(model, f)

    cfg = FLAMEConfig(flame_model_path=str(fake_assets / "generic_model_ch.pkl"))
    loaded = load_flame(cfg)
    assert loaded.v_template.shape == (64, 3)
