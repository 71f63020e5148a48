"""Audio encoder parity vs HF torch Wav2Vec2Model / HubertModel
(random-initialized from a tiny config — no downloads), plus tests of
the MSMD frame-resampling head (reference: utils/wav2vec2.py:79-85)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from msmd_tpu.interop.torch_params import hf_audio_encoder, state_dict_to_numpy
from msmd_tpu.models.audio import (
    AudioEncoder,
    AudioEncoderConfig,
    audio_param_trainable,
    sample_time_masks,
)

TINY = dict(
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def tiny_hf_kwargs():
    return dict(
        hidden_size=TINY["hidden_size"],
        num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        conv_dim=list(TINY["conv_dim"]),
        conv_kernel=list(TINY["conv_kernel"]),
        conv_stride=list(TINY["conv_stride"]),
        num_conv_pos_embeddings=TINY["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=TINY["num_conv_pos_embedding_groups"],
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )


@pytest.mark.parametrize("family", ["wav2vec2", "hubert"])
def test_encoder_matches_hf(family):
    torch.manual_seed(0)
    if family == "wav2vec2":
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        hf = Wav2Vec2Model(Wav2Vec2Config(**tiny_hf_kwargs())).eval()
    else:
        from transformers import HubertConfig, HubertModel

        hf = HubertModel(HubertConfig(**tiny_hf_kwargs())).eval()

    sd = state_dict_to_numpy(hf.state_dict())
    params = hf_audio_encoder(sd, n_layers=TINY["num_layers"], n_convs=len(TINY["conv_dim"]))

    enc = AudioEncoder(AudioEncoderConfig(**TINY))
    audio = np.random.RandomState(1).randn(2, 2000).astype(np.float32)

    got = enc.apply({"params": params}, jnp.asarray(audio), frame_num=None)
    with torch.no_grad():
        want = hf(torch.from_numpy(audio)).last_hidden_state
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)


def test_resampling_head_lengths(rng_key):
    enc = AudioEncoder(AudioEncoderConfig(**TINY))
    audio = jax.random.normal(rng_key, (1, 16000))
    params = enc.init(jax.random.PRNGKey(0), audio, frame_num=None)
    # stride product 20 -> 16000/20 - few = ~797 raw frames; head should
    # truncate to round(frame_num * 50 / fps) and resample to frame_num
    out = enc.apply(params, audio, output_fps=25, frame_num=50)
    assert out.shape[1] == 50
    out2 = enc.apply(params, audio, output_fps=25, frame_num=64)
    assert out2.shape[1] == 64


def test_spec_augment_masks(rng_key):
    mask = np.asarray(sample_time_masks(rng_key, 4, 100, mask_prob=0.2, mask_length=10))
    assert mask.shape == (4, 100)
    assert mask.any(axis=1).all()  # at least one span per row
    frac = mask.mean()
    assert 0.02 < frac < 0.6


def test_spec_augment_changes_output(rng_key):
    enc = AudioEncoder(AudioEncoderConfig(**TINY, mask_time_prob=0.2))
    audio = jax.random.normal(rng_key, (1, 2000))
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "spec_augment": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        audio, frame_num=None, deterministic=False,
    )
    det = enc.apply(variables, audio, frame_num=None, deterministic=True)
    noisy = enc.apply(
        variables, audio, frame_num=None, deterministic=False,
        rngs={"spec_augment": jax.random.PRNGKey(5), "dropout": jax.random.PRNGKey(6)},
    )
    assert not np.allclose(np.asarray(det), np.asarray(noisy))


def test_freezing_policy():
    # reference model.py:93-110
    assert not audio_param_trainable("hubert", ("feature_extractor", "conv_0", "kernel"))
    assert not audio_param_trainable("wav2vec2", ("feature_extractor", "conv_0", "kernel"))
    assert not audio_param_trainable("hubert", ("feature_projection", "projection", "kernel"))
    assert audio_param_trainable("wav2vec2", ("feature_projection", "projection", "kernel"))
    assert not audio_param_trainable("hubert", ("encoder", "layers_0", "q_proj", "kernel"))
    assert not audio_param_trainable("hubert", ("encoder", "layers_1", "q_proj", "kernel"))
    assert audio_param_trainable("hubert", ("encoder", "layers_2", "q_proj", "kernel"))
    assert audio_param_trainable("hubert", ("encoder", "layers_10", "q_proj", "kernel"))
    assert audio_param_trainable("wav2vec2", ("encoder", "layers_0", "q_proj", "kernel"))
