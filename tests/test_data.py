"""Data pipeline tests on a synthetic Step-6-format dataset."""

import numpy as np
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.data.pickle_dataset import (
    BatchLoader,
    MotionClipDataset,
    WeightedConcatSampler,
    collate,
    get_dataset,
    load_chunked_pickle,
)
from msmd_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_data")
    write_synthetic_dataset(root, name="tinyset", n_videos=10, seed=0)
    return root


def test_chunked_pickle_roundtrip(synth_root):
    data = load_chunked_pickle(synth_root / "tinyset.pkl")
    assert len(data) == 10
    clip = next(iter(data.values()))
    assert clip["expression_code"].shape[1] == 64
    assert clip["head_orientation"].shape[1] == 3
    assert clip["audio"].ndim == 1


def test_dataset_windows(synth_root):
    ds = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25, n_motions=100, clip_len=100,
    )
    assert len(ds) > 0
    audio_pair, coef_pair, (am, astd) = ds[0]
    assert coef_pair[0]["motion"].shape == (100, 67)
    assert coef_pair[1]["motion"].shape == (100, 67)
    assert coef_pair[0]["shape"].shape == (100, 100)
    assert np.abs(coef_pair[0]["shape"]).sum() == 0
    # normalized motion stats are ~unit-scale
    assert abs(float(coef_pair[0]["motion"].mean())) < 3.0


def test_fps_resampling(synth_root):
    ds30 = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=30,
    )
    ds25 = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25,
    )
    k = ds25.entries[0]
    n30 = ds30.data[k]["expression_code"].shape[0]
    n25 = ds25.data[k]["expression_code"].shape[0]
    assert n25 == int(round(n30 / 30 * 25))


def test_collate_ragged_shapes_diagnostic(synth_root):
    """Ragged clips raise with every per-item shape listed
    (reference sanitizer: datasets.py:477-493)."""
    ds = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25, n_motions=100, clip_len=100,
    )
    a, b = ds[0], ds[1 % len(ds)]
    bad = (b[0], ({"motion": b[1][0]["motion"][:-1], "shape": b[1][0]["shape"]}, b[1][1]), b[2])
    with pytest.raises(ValueError, match="Failed to stack tensors"):
        collate([a, bad])


def test_collate_fixed_shapes(synth_root):
    ds = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25,
    )
    batch = collate([ds[i % len(ds)] for i in range(4)])
    assert batch["audio_0"].shape == (4, 64000)
    assert batch["audio_1"].shape == (4, 64000)
    assert batch["motion_0"].shape == (4, 100, 67)
    assert batch["shape_0"].shape == (4, 100, 100)
    assert np.isfinite(batch["audio_0"]).all()


def test_weighted_sampler_balances(synth_root):
    big = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25,
    )
    small = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_valid.txt",
        original_fps=30, coef_fps=25,
    )
    sampler = WeightedConcatSampler([big, small], seed=0)
    idx = sampler.sample(4000)
    frac_big = (idx < len(big)).mean()
    # inverse-size weighting -> each dataset gets ~half the draws
    assert 0.35 < frac_big < 0.65


def test_batch_loader_and_get_dataset(synth_root):
    cfg = MSMDConfig(data_root=str(synth_root), dataset_type="tinyset", batch_size=2)
    train_sets, val_sets, train_loader, val_loader = get_dataset(cfg)
    batch = next(train_loader)
    assert batch["audio_0"].shape == (2, 64000)
    assert batch["motion_1"].shape == (2, 100, 67)
    train_loader.close()
    val_loader.close()


def test_query_for_video_and_overfit_mode(synth_root):
    ds = MotionClipDataset(
        synth_root / "tinyset.pkl", synth_root / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25, batch_overfit_size=2,
    )
    assert len(ds) == 2 and ds.random_crop is False
    audio, coef, _ = ds.query_for_video(0)
    assert coef["motion"].shape[1] == 67
    assert audio.ndim == 1
