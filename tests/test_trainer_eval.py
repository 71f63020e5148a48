"""Trainer.evaluate: metrics aggregation + mean/std/n JSON dump
(reference test() --do_save path, training_script.py:380-393)."""

import itertools
import json

import numpy as np
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.audio import AudioEncoderConfig
from msmd_tpu.train.trainer import Trainer

TINY_AUDIO = AudioEncoderConfig(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
)


def fake_loader(cfg, batch_size=2, seed=0):
    rng = np.random.RandomState(seed)

    def batches():
        while True:
            yield {
                "audio_0": rng.randn(batch_size, cfg.n_audio_samples).astype(np.float32),
                "audio_1": rng.randn(batch_size, cfg.n_audio_samples).astype(np.float32),
                "motion_0": rng.randn(batch_size, cfg.n_motions, 67).astype(np.float32),
                "motion_1": rng.randn(batch_size, cfg.n_motions, 67).astype(np.float32),
                "shape_0": np.zeros((batch_size, cfg.n_motions, 100), np.float32),
                "shape_1": np.zeros((batch_size, cfg.n_motions, 100), np.float32),
            }

    return batches()


def test_evaluate_writes_stats_json(tmp_path):
    cfg = MSMDConfig(
        feature_dim=16, n_heads=2, n_layers=1, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=2, num_of_basis=2,
        use_indicator=True, compute_dtype="float32",
    )
    trainer = Trainer(cfg, tmp_path / "exp", audio_config=TINY_AUDIO, use_mesh=False)
    means = trainer.evaluate(
        fake_loader(cfg), iteration=0, n_rounds=2, n_batches_per_round=2,
        mode="test", do_save=True,
    )
    assert np.isfinite(means["loss"])

    stats_file = tmp_path / "exp" / "eval_test_0.json"
    assert stats_file.exists()
    stats = json.loads(stats_file.read_text())
    assert stats["loss"]["n"] == 4
    assert "mean" in stats["noise"] and "std" in stats["noise"]
    assert np.isfinite(stats["loss"]["mean"])
