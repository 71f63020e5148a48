"""Checkpoint interop tests:
1. flax -> reference-torch-names -> flax round-trip is exact.
2. The exported style-encoder state_dict loads strict=True into a torch
   module with the reference's architecture, and outputs match.
3. A full torch denoiser oracle (assembled from the public torch API to
   the documented reference architecture) matches our DenoisingNetwork
   on converted weights.
4. .pt save/load through msmd_tpu.train.checkpoint round-trips.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from msmd_tpu.config import MSMDConfig
from msmd_tpu.interop.msmd_checkpoint import (
    flax_to_reference_msmd,
    flax_to_reference_style_enc,
    reference_msmd_to_flax,
    reference_style_enc_to_flax,
)
from msmd_tpu.models.audio import AudioEncoderConfig
from msmd_tpu.models.denoiser import DenoisingNetwork
from msmd_tpu.models.diffusion import get_diffusion_model
from msmd_tpu.models.style_encoder import StyleEncoderVAE2


def tiny_cfg(**kw):
    base = dict(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2, use_indicator=True,
    )
    base.update(kw)
    return MSMDConfig(**base)


TINY_AUDIO = AudioEncoderConfig(
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
)


def tree_allclose(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            tree_allclose(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=path)


def test_msmd_roundtrip():
    cfg = tiny_cfg()
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    motion = jnp.zeros((1, cfg.n_motions, 67))
    audio = jnp.zeros((1, cfg.n_audio_samples))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, jnp.zeros((1, 100)), jnp.zeros((1, cfg.d_style)), deterministic=True,
    )
    params = jax.device_get(variables["params"])
    sd = flax_to_reference_msmd(params, cfg)
    back = reference_msmd_to_flax(sd, cfg)
    tree_allclose(params, back)


# ---------------------------------------------------------------------------
# torch oracle of the reference style encoder architecture
# ---------------------------------------------------------------------------

from msmd_tpu.interop.torch_oracle import build_torch_denoiser, build_torch_vae2


def test_style_encoder_matches_torch_oracle():
    d_style, conv_dim = 16, 64
    enc = StyleEncoderVAE2(d_style=d_style, conv_feature_dim=conv_dim)
    motion = np.random.RandomState(0).randn(2, 10, 67).astype(np.float32)
    variables = enc.init({"params": jax.random.PRNGKey(0), "style": jax.random.PRNGKey(1)}, jnp.asarray(motion))
    params = jax.device_get(variables["params"])

    sd = flax_to_reference_style_enc(params, conv_feature_dim=conv_dim)
    oracle = build_torch_vae2(d_style=d_style, conv_dim=conv_dim)
    missing, unexpected = oracle.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, strict=True)
    oracle.eval()

    _, mu, logvar = enc.apply(variables, jnp.asarray(motion), rngs={"style": jax.random.PRNGKey(2)})
    with torch.no_grad():
        mu_t, logvar_t = oracle.encode(torch.from_numpy(motion))
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(logvar), logvar_t.numpy(), atol=3e-5)

    back = reference_style_enc_to_flax(sd)
    sd2 = flax_to_reference_style_enc(back, conv_feature_dim=conv_dim)
    for k in sd:
        np.testing.assert_allclose(sd[k], sd2[k], atol=1e-7, err_msg=k)


# ---------------------------------------------------------------------------
# torch oracle of the reference denoiser architecture
# ---------------------------------------------------------------------------

def test_denoiser_matches_torch_oracle():
    cfg = tiny_cfg()
    torch.manual_seed(0)
    oracle = build_torch_denoiser(cfg).eval()

    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    # reuse the MSMD import path for the denoising_net subtree
    prefixed = {f"denoising_net.{k}": v for k, v in sd.items()}
    from msmd_tpu.interop.msmd_checkpoint import linear, transformer_decoder_layer

    params = {
        "diff_step_map": {
            "linear1": linear(prefixed, "denoising_net.diff_step_map.0"),
            "linear2": linear(prefixed, "denoising_net.diff_step_map.2"),
        },
        "PE": sd["PE"],
        "person_proj": linear(prefixed, "denoising_net.person_proj"),
        "feature_proj": linear(prefixed, "denoising_net.feature_proj"),
        "transformer": {
            f"layers_{i}": transformer_decoder_layer(prefixed, f"denoising_net.transformer.layers.{i}")
            for i in range(cfg.n_layers)
        },
        "motion_dec_1": linear(prefixed, "denoising_net.motion_dec.0"),
        "motion_dec_2": linear(prefixed, "denoising_net.motion_dec.2"),
    }
    for k in range(cfg.num_of_basis):
        params[f"static_feature_mapping_{k}"] = {
            "linear1": linear(prefixed, f"denoising_net.static_feature_mapping.{k}.0"),
            "linear2": linear(prefixed, f"denoising_net.static_feature_mapping.{k}.2"),
        }

    B, L, Lp, D = 2, cfg.n_motions, cfg.n_prev_motions, 67
    rs = np.random.RandomState(5)
    motion = rs.randn(B, L, D).astype(np.float32)
    audio = rs.randn(B, L, cfg.feature_dim).astype(np.float32)
    person = rs.randn(B, 1, 100 + cfg.d_style).astype(np.float32)
    style = rs.randn(B, 1, cfg.d_style).astype(np.float32)
    prev_m = rs.randn(B, Lp, D).astype(np.float32)
    prev_a = rs.randn(B, Lp, cfg.feature_dim).astype(np.float32)
    step = np.array([1, 3])
    ind = np.ones((B, L), np.float32)

    net = DenoisingNetwork(cfg)
    got = net.apply(
        {"params": params}, jnp.asarray(motion), jnp.asarray(audio), jnp.asarray(person), jnp.asarray(style),
        jnp.asarray(prev_m), jnp.asarray(prev_a), jnp.asarray(step), jnp.asarray(ind),
    )
    with torch.no_grad():
        want = oracle.run(
            torch.from_numpy(motion), torch.from_numpy(audio), torch.from_numpy(person), torch.from_numpy(style),
            torch.from_numpy(prev_m), torch.from_numpy(prev_a), torch.from_numpy(step), torch.from_numpy(ind),
        )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


def test_pt_checkpoint_roundtrip(tmp_path):
    from msmd_tpu.train.checkpoint import find_latest_pt, load_reference_pt, save_reference_pt

    cfg = tiny_cfg()
    sd_model = {"a.weight": np.random.randn(3, 4).astype(np.float32)}
    sd_style = {"b.bias": np.random.randn(5).astype(np.float32)}
    path = save_reference_pt(tmp_path, cfg, sd_model, sd_style, 1234)
    assert path.name == "iter_0001234.pt"
    assert find_latest_pt(tmp_path / "checkpoints") == path
    args, m, s, it = load_reference_pt(path)
    assert it == 1234
    assert args["feature_dim"] == cfg.feature_dim
    np.testing.assert_allclose(m["a.weight"], sd_model["a.weight"])
    np.testing.assert_allclose(s["b.bias"], sd_style["b.bias"])
