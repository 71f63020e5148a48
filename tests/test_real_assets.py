"""Real-artifact validation hooks (VERDICT r2 item 8 / "missing" item 1).

The licensed FLAME ``generic_model.pkl``, real HF hubert/wav2vec2
weights, and real reference checkpoints are not distributable in this
image, so the machinery (chumpy-less pkl loader, HF param mapper,
bidirectional ``.pt`` checkpoint converter) is normally exercised on
structure-identical fabricated assets. The moment the real assets exist,
point ``MSMD_ASSETS`` at a directory laid out as

    $MSMD_ASSETS/
      flame/generic_model.pkl            # FLAME 2020
      flame/landmark_embedding.npy       # optional
      hf/<model dir or name>             # HF hubert-base-ls960 snapshot
      reference_ckpt/args.json           # a real MSMD experiment dir
      reference_ckpt/checkpoints/iter_*.pt
      step6/test.pkl                     # Step-6 test-split chunked pickle
      step6/stats.pkl                    # exp/pose mean-std (datasets.py:346-350)
      step6/keys_test.txt                # optional key restriction

and these tests extend the parity certificate to the real artifacts
with zero new code. Each test SKIPS (visibly, naming the missing path)
when its asset is absent — run ``pytest tests/test_real_assets.py -rs``
to see what is still missing.
"""

import os
from pathlib import Path

import numpy as np
import pytest

ASSETS = os.environ.get("MSMD_ASSETS", "")


_PARITY_CMD = (
    "once the assets exist, get the BASELINE vertex-MSE parity number with ONE command: "
    "python scripts/real_asset_parity.py --reference_exp_dir $MSMD_ASSETS/reference_ckpt "
    "--step6_pkl <test.pkl> --keys <keys_test.txt> --coef_stats <stats.pkl> "
    "--flame_model_path $MSMD_ASSETS/flame/generic_model.pkl"
)


def _need(relpath: str) -> Path:
    if not ASSETS:
        pytest.skip(f"MSMD_ASSETS not set (real licensed assets not in this image); {_PARITY_CMD}")
    p = Path(ASSETS) / relpath
    if not p.exists():
        pytest.skip(f"real asset missing: {p}; {_PARITY_CMD}")
    return p


def test_real_flame_pkl_loads_and_decodes():
    """reference utils/flame.py:48-55 asset; full load + LBS decode."""
    import jax.numpy as jnp

    from msmd_tpu.models.flame import FLAMEConfig, flame_forward, load_flame

    pkl = _need("flame/generic_model.pkl")
    lmk = Path(ASSETS) / "flame" / "landmark_embedding.npy"
    cfg = FLAMEConfig(
        flame_model_path=str(pkl),
        flame_lmk_embedding_path=str(lmk) if lmk.exists() else "",
    )
    model = load_flame(cfg)
    assert model.v_template.shape == (5023, 3)
    verts, lm2d, lm3d = flame_forward(
        model, jnp.zeros((2, 100)), jnp.zeros((2, 50)), jnp.zeros((2, 6))
    )
    assert verts.shape == (2, 5023, 3)
    assert np.isfinite(np.asarray(verts)).all()
    # the zero-pose decode must reproduce the template up to LBS identity
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-4
    )


def test_real_hf_audio_weights_load():
    """reference model.py:100-104 (HF from_pretrained); our torch-free
    HF loader maps the real snapshot (config.json + safetensors/bin)
    into the flax audio encoder."""
    import jax.numpy as jnp

    from msmd_tpu.interop.hf_loader import load_hf_audio_encoder_params
    from msmd_tpu.models.audio import AudioEncoder, AudioEncoderConfig

    snap = _need("hf")
    candidates = [p for p in sorted(Path(snap).iterdir()) if (p / "config.json").exists()]
    target = candidates[0] if candidates else Path(snap)
    if not (target / "config.json").exists():
        pytest.skip(f"no HF snapshot (config.json) under {snap}")
    params = load_hf_audio_encoder_params(str(target))
    enc = AudioEncoder(AudioEncoderConfig())
    audio = jnp.zeros((1, 16000))
    out = enc.apply({"params": params}, audio, output_fps=25, frame_num=25)
    assert out.shape[1] == 25
    assert np.isfinite(np.asarray(out)).all()


def test_real_reference_checkpoint_roundtrip():
    """reference training_script.py:227-233 layout; torch-free read +
    name-map into flax + write-back must round-trip every tensor."""
    exp_dir = _need("reference_ckpt")
    ckpts = sorted(exp_dir.glob("checkpoints/iter_*.pt")) or sorted(exp_dir.glob("iter_*.pt"))
    if not ckpts:
        pytest.skip(f"no iter_*.pt under {exp_dir}")

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.interop.msmd_checkpoint import (
        flax_to_reference_msmd, reference_msmd_to_flax,
    )
    from msmd_tpu.interop.torch_pickle import load_reference_checkpoint

    args, model_sd, style_sd, it = load_reference_checkpoint(str(ckpts[-1]))
    cfg = MSMDConfig.from_dict(args)
    flax_params = reference_msmd_to_flax(model_sd, cfg)
    back = flax_to_reference_msmd(flax_params, cfg)
    missing = set(model_sd) - set(back)
    assert not missing, f"tensors lost in roundtrip: {sorted(missing)[:10]}"
    for k, v in back.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(model_sd[k]),
                                   atol=1e-6, err_msg=k)


def test_real_asset_parity_command():
    """The documented one-command parity run (scripts/real_asset_parity.py)
    against a real experiment dir + Step-6 test pkls. This is the
    BASELINE.json fidelity metric on real artifacts."""
    import json
    import subprocess
    import sys

    exp_dir = _need("reference_ckpt")
    pkl = _need("step6/test.pkl")
    stats = _need("step6/stats.pkl")
    keys = Path(ASSETS) / "step6" / "keys_test.txt"
    flame = Path(ASSETS) / "flame" / "generic_model.pkl"
    cmd = [
        sys.executable, str(Path(__file__).parent.parent / "scripts" / "real_asset_parity.py"),
        "--reference_exp_dir", str(exp_dir), "--step6_pkl", str(pkl),
        "--coef_stats", str(stats), "--n_clips", "2", "--n_diff_steps", "8",
    ]
    if keys.exists():
        cmd += ["--keys", str(keys)]
    if flame.exists():
        cmd += ["--flame_model_path", str(flame)]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert report["aggregate"]["coef_max_err"] < 1e-6, report["aggregate"]
