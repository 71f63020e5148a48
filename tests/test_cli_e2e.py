"""End-to-end CLI test: training_script.py trains on a synthetic
Step-6-format dataset and writes reference-format checkpoints; then
inference.py loads them and generates windowed long-form motion pkls
(exercises the full BASELINE config-1/3 path on CPU)."""

import json
import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def run(cmd, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # share the persistent compilation cache across the CLI subprocesses
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/msmd_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "5"
    # generous default: a COLD cache compile of the jitted train step on a
    # loaded CI machine can exceed 10 min (r1 flake); warm runs take ~1 min
    timeout = int(os.environ.get("MSMD_E2E_SUBPROC_TIMEOUT", "1800"))
    return subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout, **kw)


@pytest.fixture(scope="module")
def e2e_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_e2e")
    from msmd_tpu.data.synthetic import write_synthetic_dataset

    write_synthetic_dataset(root / "data", name="tinyset", n_videos=8, seed=0)
    rng = np.random.RandomState(1)
    pickle.dump(rng.randn(120, 64).astype(np.float32), open(root / "style_exp.pkl", "wb"))
    pickle.dump((rng.randn(120, 3) * 10).astype(np.float32), open(root / "style_head.pkl", "wb"))
    from scipy.io import wavfile

    wavfile.write(root / "audio.wav", 16000, (rng.randn(16000) * 0.1).astype(np.float32))

    from msmd_tpu.data.pickle_dataset import MotionClipDataset

    ds = MotionClipDataset(
        root / "data" / "tinyset.pkl", root / "data" / "tinyset_keys_train.txt",
        original_fps=30, coef_fps=25, n_motions=8, clip_len=8,
    )
    pickle.dump(ds.coef_stats, open(root / "coef_stats.pkl", "wb"))
    return root


TINY_FLAGS = [
    "--feature_dim", "16", "--n_heads", "2", "--n_layers", "1", "--mlp_ratio", "2",
    "--d_style", "16", "--n_motions", "8", "--n_prev_motions", "4",
    "--n_diff_steps", "2", "--num_of_basis", "2", "--use_indicator", "--use_cross_style",
    "--tiny_audio_encoder", "--compute_dtype", "float32",
]


@pytest.mark.slow
def test_train_then_infer_cli(e2e_dir):
    exp_root = e2e_dir / "experiments"
    r = run(
        [sys.executable, "training_script.py", "--mode", "train", "--exp_name", "e2e",
         "--data_root", str(e2e_dir / "data"), "--dataset_type", "tinyset",
         "--batch_size", "2", "--max_iter", "1", "--save_iter", "1", "--val_iter", "0",
         "--log_iter", "1", "--lr", "1e-4", "--warm_iter", "1",
         "--exp_root", str(exp_root)] + TINY_FLAGS
    )
    assert r.returncode == 0, r.stderr[-3000:]
    exps = list(exp_root.iterdir())
    assert len(exps) == 1
    exp = exps[0]
    assert (exp / "args.json").exists()
    assert (exp / "checkpoints" / "iter_0000001.pt").exists()
    assert (exp / "checkpoints" / "orbax" / "0000001").exists()
    # args.json round-trips through the config
    from msmd_tpu.config import MSMDConfig

    cfg = MSMDConfig.load_args_json(exp)
    assert cfg.feature_dim == 16 and cfg.n_motions == 8

    out_dir = e2e_dir / "out"
    r2 = run(
        [sys.executable, "inference.py",
         "--model_root", str(exp_root), "--model_name", exp.name, "--model_iter", "0000001",
         "--style_clip_exp_code_path", str(e2e_dir / "style_exp.pkl"),
         "--style_clip_head_rot_path", str(e2e_dir / "style_head.pkl"),
         "--audio_clip", str(e2e_dir / "audio.wav"),
         "--coef_dict_path", str(e2e_dir / "coef_stats.pkl"),
         "--cfg_level", "1.4", "--output_dir", str(out_dir),
         "--versions_of_render", "2", "--batch_seeds"]
    )
    assert r2.returncode == 0, r2.stderr[-3000:]

    temp = out_dir / f"{exp.name}_iter_0000001" / "temp"
    exp_files = sorted(temp.glob("overall_exp_code_*_seed_*.pkl"))
    rot_files = sorted(temp.glob("overall_head_rot_*_seed_*.pkl"))
    assert len(exp_files) == 2 and len(rot_files) == 2
    exp_code = pickle.load(open(exp_files[0], "rb"))
    head_rot = pickle.load(open(rot_files[0], "rb"))
    # 1 s of audio @ 25 fps = 25 frames (windowed over ceil(25/8) windows,
    # tail padding trimmed)
    assert exp_code.shape == (25, 64)
    assert head_rot.shape == (25, 3)
    assert np.isfinite(exp_code).all() and np.isfinite(head_rot).all()

    # --- resume from the checkpoint and continue one more iteration ------
    r3 = run(
        [sys.executable, "training_script.py", "--mode", "train", "--exp_name", "e2e",
         "--data_root", str(e2e_dir / "data"), "--dataset_type", "tinyset",
         "--batch_size", "2", "--max_iter", "2", "--save_iter", "1", "--val_iter", "0",
         "--log_iter", "1", "--lr", "1e-4", "--warm_iter", "1",
         "--continue_from", str(exp)] + TINY_FLAGS
    )
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "Resumed" in r3.stdout
    assert (exp / "checkpoints" / "iter_0000002.pt").exists()

    # --- --mode test: eval metrics JSON ----------------------------------
    r4 = run(
        [sys.executable, "training_script.py", "--mode", "test", "--exp_name", "e2e",
         "--data_root", str(e2e_dir / "data"), "--dataset_type", "tinyset",
         "--batch_size", "2", "--val_iter", "0",
         "--exp_root", str(e2e_dir / "experiments_test")] + TINY_FLAGS
    )
    assert r4.returncode == 0, r4.stderr[-3000:]
    assert "Test results:" in r4.stdout and "noise" in r4.stdout
