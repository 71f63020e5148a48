"""HF pretrained-weight loading: save a tiny HF torch model to disk,
load through msmd_tpu.interop.hf_loader, verify output parity."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from msmd_tpu.interop.hf_loader import inject_pretrained_audio, load_hf_audio_encoder_params
from msmd_tpu.models.audio import AudioEncoder, AudioEncoderConfig

TINY = dict(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
)


@pytest.fixture(scope="module")
def saved_hf_model(tmp_path_factory):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    hf = Wav2Vec2Model(
        Wav2Vec2Config(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
            conv_dim=[16, 16, 16], conv_kernel=[10, 3, 3], conv_stride=[5, 2, 2],
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            feat_extract_norm="group", do_stable_layer_norm=False,
            hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        )
    ).eval()
    path = tmp_path_factory.mktemp("hf_model")
    hf.save_pretrained(path)
    return hf, path


def test_load_from_saved_dir(saved_hf_model):
    hf, path = saved_hf_model
    params = load_hf_audio_encoder_params(str(path))
    enc = AudioEncoder(AudioEncoderConfig(**TINY))
    audio = np.random.RandomState(0).randn(1, 2000).astype(np.float32)
    got = enc.apply({"params": params}, jnp.asarray(audio), frame_num=None)
    with torch.no_grad():
        want = hf(torch.from_numpy(audio)).last_hidden_state
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_inject_into_model_tree(saved_hf_model):
    _, path = saved_hf_model
    import jax

    enc = AudioEncoder(AudioEncoderConfig(**TINY))
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 2000)), frame_num=None)["params"]
    fake_model_params = {"audio_encoder": init, "other": {"w": np.zeros(3)}}
    merged = inject_pretrained_audio(fake_model_params, str(path))
    loaded = load_hf_audio_encoder_params(str(path))
    np.testing.assert_allclose(
        np.asarray(merged["audio_encoder"]["feature_projection"]["projection"]["kernel"]),
        np.asarray(loaded["feature_projection"]["projection"]["kernel"]),
    )
    assert "other" in merged


def test_missing_dir_raises():
    with pytest.raises(FileNotFoundError):
        load_hf_audio_encoder_params("facebook/does-not-exist-locally")
