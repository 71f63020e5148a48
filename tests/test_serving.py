"""Serving API smoke: load from an experiment dir written by the
training CLI flow, warm up, generate."""

import numpy as np
import pytest

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.audio import AudioEncoderConfig
from msmd_tpu.models.diffusion import get_diffusion_model
from msmd_tpu.models.style_encoder import get_style_encoder
from msmd_tpu.serving import MotionGenerator

TINY_AUDIO = AudioEncoderConfig(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
)


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    import dataclasses
    import jax

    from msmd_tpu.interop.msmd_checkpoint import flax_to_reference_msmd, flax_to_reference_style_enc
    from msmd_tpu.train.checkpoint import save_reference_pt
    from msmd_tpu.train.loop import init_models

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=3, num_of_basis=2, use_indicator=True,
        audio_encoder_config=dataclasses.asdict(TINY_AUDIO),
    )
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    params = init_models(cfg, jax.random.PRNGKey(0), model, style_enc)

    exp_dir = tmp_path_factory.mktemp("serving_exp") / "DPT" / "m"
    exp_dir.mkdir(parents=True)
    cfg.save_args_json(exp_dir)
    save_reference_pt(
        exp_dir, cfg,
        flax_to_reference_msmd(params["model"], cfg),
        flax_to_reference_style_enc(params["style_enc"]),
        7,
    )
    return exp_dir.parent.parent


def test_generator_end_to_end(experiment):
    stats = {
        "exp_mean": np.zeros(64, np.float32), "exp_std": np.ones(64, np.float32),
        "pose_mean": np.zeros(3, np.float32), "pose_std": np.ones(3, np.float32) * 10,
    }
    gen = MotionGenerator.from_experiment(experiment, "m", "0000007", stats)
    gen.warmup(max_seconds=1.0)

    rng = np.random.RandomState(0)
    audio = rng.randn(16000).astype(np.float32) * 0.1  # 1 s -> 25 frames
    style = rng.randn(120, 67).astype(np.float32)
    exp_code, head_rot = gen.generate(audio, style, n_repetitions=2, seed=3)
    assert exp_code.shape == (2, 25, 64)
    assert head_rot.shape == (2, 25, 3)
    assert np.isfinite(exp_code).all() and np.isfinite(head_rot).all()

    # deterministic per seed
    e2, r2 = gen.generate(audio, style, n_repetitions=2, seed=3)
    np.testing.assert_allclose(exp_code, e2, atol=1e-5)
    # different seed differs
    e3, _ = gen.generate(audio, style, n_repetitions=2, seed=4)
    assert not np.allclose(exp_code, e3)


def test_generator_multichip_mesh(experiment):
    """Sharded serving: n_repetitions split over an 8-virtual-device
    mesh produces the same numbers as the unsharded path."""
    import jax

    from msmd_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets the flag)")
    stats = {
        "exp_mean": np.zeros(64, np.float32), "exp_std": np.ones(64, np.float32),
        "pose_mean": np.zeros(3, np.float32), "pose_std": np.ones(3, np.float32) * 10,
    }
    gen = MotionGenerator.from_experiment(experiment, "m", "0000007", stats)
    rng = np.random.RandomState(1)
    audio = rng.randn(16000).astype(np.float32) * 0.1
    style = rng.randn(120, 67).astype(np.float32)

    mesh = make_mesh(("data",))
    e_sharded, r_sharded = gen.generate(audio, style, n_repetitions=8, seed=5, mesh=mesh)
    e_local, r_local = gen.generate(audio, style, n_repetitions=8, seed=5)
    assert e_sharded.shape == (8, 25, 64)
    np.testing.assert_allclose(e_sharded, e_local, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(r_sharded, r_local, atol=1e-4, rtol=1e-4)
