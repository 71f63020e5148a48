"""Small parity surfaces: FLAMETex decode, emotion-keyed sampling,
eval JSON dump, config round-trip/legacy shims, option text."""

import json

import numpy as np
import jax.numpy as jnp

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.flame import FLAMEConfig, flame_tex_forward, load_flame_tex
from msmd_tpu.utils.common import count_parameters, get_option_text


def test_flame_tex_forward(tmp_path):
    # synthetic BFM-style texture space
    rng = np.random.RandomState(0)
    np.savez(
        tmp_path / "tex.npz",
        MU=rng.rand(512 * 512 * 3).astype(np.float32),
        PC=rng.randn(512 * 512 * 3, 199).astype(np.float32) * 0.01,
    )
    mean, basis = load_flame_tex(FLAMEConfig(tex_path=str(tmp_path / "tex.npz"), n_tex=50, tex_type="BFM"))
    assert mean.shape == (1, 512 * 512 * 3)
    assert basis.shape == (512 * 512 * 3, 50)
    tex = flame_tex_forward(mean, basis, jnp.zeros((2, 50)), size=64)
    assert tex.shape == (2, 3, 64, 64)
    assert np.isfinite(np.asarray(tex)).all()


def test_emotion_keyed_sampling(tmp_path):
    # RAVDESS-style names: field 3 is the emotion code
    from msmd_tpu.data.synthetic import write_synthetic_dataset
    from msmd_tpu.data.pickle_dataset import MotionClipDataset, load_chunked_pickle
    import pickle

    write_synthetic_dataset(tmp_path, name="rav", n_videos=8, seed=0)
    data = load_chunked_pickle(tmp_path / "rav.pkl")
    renamed = {}
    for i, (k, v) in enumerate(sorted(data.items())):
        renamed[f"01-01-0{i % 4 + 1}-clip{i}"] = v
    with open(tmp_path / "rav2.pkl", "wb") as f:
        pickle.dump(renamed, f)
    with open(tmp_path / "rav2_keys_train.txt", "w") as f:
        f.write("\n".join(renamed) + "\n")
    ds = MotionClipDataset(tmp_path / "rav2.pkl", tmp_path / "rav2_keys_train.txt", original_fps=30, coef_fps=25)
    idx = ds.get_k_indices_for_each_emotion(k=1)
    assert set(idx) == {f"{i:02d}" for i in range(1, 9)}
    for emo in ("01", "02", "03", "04"):
        assert len(idx[emo]) == 1
        assert ds.entries[idx[emo][0]].split("-")[2] == emo
    for emo in ("05", "06", "07", "08"):
        assert idx[emo] == []


def test_config_roundtrip_and_shims(tmp_path):
    cfg = MSMDConfig(exp_name="x", feature_dim=64, continue_from=None)
    cfg.save_args_json(tmp_path)
    with open(tmp_path / "args.json") as f:
        d = json.load(f)
    assert "continue_from" not in d  # None values dropped (reference behavior)
    cfg2 = MSMDConfig.load_args_json(tmp_path)
    assert cfg2.feature_dim == 64

    # legacy aliases (reference NullableArgs shims)
    c = MSMDConfig.from_dict({"use_alignment_mask": False, "predict_head_pose": True, "use_learnable_pe": False})
    assert c.align_mask_width == 0
    assert c.no_head_pose is False
    assert c.no_use_learnable_pe is True


def test_option_text_and_param_count():
    cfg = MSMDConfig(feature_dim=999)
    text = get_option_text(cfg)
    assert "feature_dim" in text and "[default: 512]" in text
    params = {"a": {"w": jnp.zeros((3, 4))}, "b": jnp.zeros(5)}
    assert count_parameters(params) == 17
