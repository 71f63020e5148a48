"""Bidirectional conversion between reference torch checkpoints and the
TPU framework's flax param trees.

The reference checkpoint layout is {args, model: MSMD.state_dict(),
style_enc: StyleEncoder_VAE2.state_dict(), iter} (reference:
training_script.py:227-233). This module translates:

- ``reference_msmd_to_flax`` / ``flax_to_reference_msmd``
- ``reference_style_enc_to_flax`` / ``flax_to_reference_style_enc``

Torch-name inventory (derived from the reference module definitions):
MSMD (model.py:73-143): audio_encoder.* (HF naming), audio_feature_map,
start_audio_feat/start_motion_feat, null_style_feat/null_audio_feat,
denoising_net.{TE.pe, diff_step_map.{0,2}, PE, person_proj,
feature_proj, transformer.layers.N.*, alignment_mask,
static_feature_mapping.K.{0,2}, motion_dec.{0,2}},
diffusion_sched.{betas,alphas,alpha_bars,sigmas_flex,sigmas_inflex}.
StyleEncoder_VAE2 (style_encoder.py:119-213): input_layers.{1,7} convs +
.{5,11} layer norms, encoder.* (one TransformerEncoderLayer),
output_layers.{1,7} convs + .5 layer norm.

Buffers (PE tables, alignment mask, schedule tables) are deterministic
functions of the config; the flax side rebuilds them, and the export
side regenerates them so torch ``load_state_dict(strict=True)`` works.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from msmd_tpu.interop.torch_params import (
    conv1d,
    hf_audio_encoder,
    layer_norm,
    linear,
    packed_mha,
    strip_prefix,
    transformer_decoder_layer,
)
from msmd_tpu.ops.schedule import DiffusionSchedule


# ---------------------------------------------------------------------------
# import: reference torch -> flax
# ---------------------------------------------------------------------------

def reference_msmd_to_flax(sd: Dict[str, np.ndarray], cfg) -> dict:
    """MSMD.state_dict() (numpy) -> params['model'] tree."""
    p: dict = {}
    p["audio_encoder"] = hf_audio_encoder(strip_prefix(sd, "audio_encoder"))
    p["audio_feature_map"] = linear(sd, "audio_feature_map")
    p["start_motion_feat"] = sd["start_motion_feat"]
    p["start_audio_feat"] = sd["start_audio_feat"]
    if "null_style_feat" in sd:
        p["null_style_feat"] = sd["null_style_feat"]
    if "null_audio_feat" in sd:
        p["null_audio_feat"] = sd["null_audio_feat"]

    dn: dict = {}
    dn["diff_step_map"] = {
        "linear1": linear(sd, "denoising_net.diff_step_map.0"),
        "linear2": linear(sd, "denoising_net.diff_step_map.2"),
    }
    if "denoising_net.PE" in sd:
        dn["PE"] = sd["denoising_net.PE"]
    dn["person_proj"] = linear(sd, "denoising_net.person_proj")
    dn["feature_proj"] = linear(sd, "denoising_net.feature_proj")
    dn["transformer"] = {
        f"layers_{i}": transformer_decoder_layer(sd, f"denoising_net.transformer.layers.{i}")
        for i in range(cfg.n_layers)
    }
    for k in range(cfg.num_of_basis):
        dn[f"static_feature_mapping_{k}"] = {
            "linear1": linear(sd, f"denoising_net.static_feature_mapping.{k}.0"),
            "linear2": linear(sd, f"denoising_net.static_feature_mapping.{k}.2"),
        }
    dn["motion_dec_1"] = linear(sd, "denoising_net.motion_dec.0")
    dn["motion_dec_2"] = linear(sd, "denoising_net.motion_dec.2")
    p["denoising_net"] = dn
    return p


def reference_style_enc_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    """StyleEncoder_VAE/VAE2.state_dict() (numpy) -> params['style_enc']."""
    from msmd_tpu.interop.torch_params import transformer_encoder_layer

    return {
        "input_layers": {
            "conv_0": conv1d(sd, "input_layers.1"),
            "norm_0": layer_norm(sd, "input_layers.5"),
            "conv_1": conv1d(sd, "input_layers.7"),
            "norm_1": layer_norm(sd, "input_layers.11"),
        },
        "encoder": transformer_encoder_layer(sd, "encoder"),
        "out_conv_0": conv1d(sd, "output_layers.1"),
        "out_norm": layer_norm(sd, "output_layers.5"),
        "out_conv_1": conv1d(sd, "output_layers.7"),
    }


# ---------------------------------------------------------------------------
# export: flax -> reference torch naming
# ---------------------------------------------------------------------------

def _lin_out(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _conv_out(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).transpose(2, 1, 0))
    if "bias" in p:
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _ln_out(sd, prefix, p):
    sd[f"{prefix}.weight"] = np.asarray(p["scale"])
    sd[f"{prefix}.bias"] = np.asarray(p["bias"])


def _mha_out(sd, prefix, p):
    w = np.concatenate([np.asarray(p[n]["kernel"]).T for n in ("q_proj", "k_proj", "v_proj")], axis=0)
    sd[f"{prefix}.in_proj_weight"] = np.ascontiguousarray(w)
    if "bias" in p["q_proj"]:
        sd[f"{prefix}.in_proj_bias"] = np.concatenate(
            [np.asarray(p[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")]
        )
    _lin_out(sd, f"{prefix}.out_proj", p["out_proj"])


def _decoder_layer_out(sd, prefix, p):
    _mha_out(sd, f"{prefix}.self_attn", p["self_attn"])
    _mha_out(sd, f"{prefix}.multihead_attn", p["cross_attn"])
    _lin_out(sd, f"{prefix}.linear1", p["ffn"]["linear1"])
    _lin_out(sd, f"{prefix}.linear2", p["ffn"]["linear2"])
    for n in ("norm1", "norm2", "norm3"):
        _ln_out(sd, f"{prefix}.{n}", p[n])


def _encoder_layer_out(sd, prefix, p):
    _mha_out(sd, f"{prefix}.self_attn", p["self_attn"])
    _lin_out(sd, f"{prefix}.linear1", p["ffn"]["linear1"])
    _lin_out(sd, f"{prefix}.linear2", p["ffn"]["linear2"])
    _ln_out(sd, f"{prefix}.norm1", p["norm1"])
    _ln_out(sd, f"{prefix}.norm2", p["norm2"])


def _hf_audio_out(sd, prefix, p, n_layers=12):
    fe = p["feature_extractor"]
    i = 0
    while f"conv_{i}" in fe:
        _conv_out(sd, f"{prefix}.feature_extractor.conv_layers.{i}.conv", fe[f"conv_{i}"])
        i += 1
    if "group_norm" in fe:
        _ln_out(sd, f"{prefix}.feature_extractor.conv_layers.0.layer_norm", fe["group_norm"])
    _ln_out(sd, f"{prefix}.feature_projection.layer_norm", p["feature_projection"]["layer_norm"])
    _lin_out(sd, f"{prefix}.feature_projection.projection", p["feature_projection"]["projection"])
    # pos conv: re-emit weight-norm split (dim=2 convention)
    w = np.ascontiguousarray(np.asarray(p["encoder"]["pos_conv_embed"]["conv"]["kernel"]).transpose(2, 1, 0))
    g = np.linalg.norm(w, axis=(0, 1), keepdims=True)
    sd[f"{prefix}.encoder.pos_conv_embed.conv.weight_g"] = g
    sd[f"{prefix}.encoder.pos_conv_embed.conv.weight_v"] = np.where(g > 0, w, w)  # v = w (g*v/||v|| == w)
    sd[f"{prefix}.encoder.pos_conv_embed.conv.bias"] = np.asarray(p["encoder"]["pos_conv_embed"]["conv"]["bias"])
    _ln_out(sd, f"{prefix}.encoder.layer_norm", p["encoder"]["layer_norm"])
    li = 0
    while f"layers_{li}" in p["encoder"]:
        lp = p["encoder"][f"layers_{li}"]
        base = f"{prefix}.encoder.layers.{li}"
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _lin_out(sd, f"{base}.attention.{n}", lp[n])
        _ln_out(sd, f"{base}.layer_norm", lp["layer_norm"])
        _lin_out(sd, f"{base}.feed_forward.intermediate_dense", lp["intermediate_dense"])
        _lin_out(sd, f"{base}.feed_forward.output_dense", lp["output_dense"])
        _ln_out(sd, f"{base}.final_layer_norm", lp["final_layer_norm"])
        li += 1
    if "masked_spec_embed" in p:
        sd[f"{prefix}.masked_spec_embed"] = np.asarray(p["masked_spec_embed"])


def _sinusoidal_table_np(d_model: int, max_len: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def flax_to_reference_msmd(params: dict, cfg) -> Dict[str, np.ndarray]:
    """params['model'] -> MSMD.state_dict() naming (incl. regenerated
    buffers so torch load_state_dict(strict=True) succeeds)."""
    sd: Dict[str, np.ndarray] = {}
    _hf_audio_out(sd, "audio_encoder", params["audio_encoder"])
    _lin_out(sd, "audio_feature_map", params["audio_feature_map"])
    sd["start_motion_feat"] = np.asarray(params["start_motion_feat"])
    sd["start_audio_feat"] = np.asarray(params["start_audio_feat"])
    if "null_style_feat" in params:
        sd["null_style_feat"] = np.asarray(params["null_style_feat"])
    if "null_audio_feat" in params:
        sd["null_audio_feat"] = np.asarray(params["null_audio_feat"])

    dn = params["denoising_net"]
    sd["denoising_net.TE.pe"] = _sinusoidal_table_np(cfg.feature_dim, cfg.n_diff_steps + 1)[None]
    _lin_out(sd, "denoising_net.diff_step_map.0", dn["diff_step_map"]["linear1"])
    _lin_out(sd, "denoising_net.diff_step_map.2", dn["diff_step_map"]["linear2"])
    if "PE" in dn:
        sd["denoising_net.PE"] = np.asarray(dn["PE"])
    _lin_out(sd, "denoising_net.person_proj", dn["person_proj"])
    _lin_out(sd, "denoising_net.feature_proj", dn["feature_proj"])
    for i in range(cfg.n_layers):
        _decoder_layer_out(sd, f"denoising_net.transformer.layers.{i}", dn["transformer"][f"layers_{i}"])
    if cfg.align_mask_width > 0:
        from msmd_tpu.ops.seq import alignment_mask

        sd["denoising_net.alignment_mask"] = np.asarray(
            alignment_mask(cfg.n_prev_motions, cfg.n_motions, cfg.align_mask_width)
        )
    for k in range(cfg.num_of_basis):
        _lin_out(sd, f"denoising_net.static_feature_mapping.{k}.0", dn[f"static_feature_mapping_{k}"]["linear1"])
        _lin_out(sd, f"denoising_net.static_feature_mapping.{k}.2", dn[f"static_feature_mapping_{k}"]["linear2"])
    _lin_out(sd, "denoising_net.motion_dec.0", dn["motion_dec_1"])
    _lin_out(sd, "denoising_net.motion_dec.2", dn["motion_dec_2"])

    sched = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
    for name in ("betas", "alphas", "alpha_bars", "sigmas_flex", "sigmas_inflex"):
        sd[f"diffusion_sched.{name}"] = np.asarray(getattr(sched, name))
    return sd


def flax_to_reference_style_enc(params: dict, conv_feature_dim: int = 512) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    il = params["input_layers"]
    _conv_out(sd, "input_layers.1", il["conv_0"])
    _ln_out(sd, "input_layers.5", il["norm_0"])
    _conv_out(sd, "input_layers.7", il["conv_1"])
    _ln_out(sd, "input_layers.11", il["norm_1"])
    sd["PE.pe"] = _sinusoidal_table_np(conv_feature_dim, 600)[None]
    _encoder_layer_out(sd, "encoder", params["encoder"])
    _conv_out(sd, "output_layers.1", params["out_conv_0"])
    _ln_out(sd, "output_layers.5", params["out_norm"])
    _conv_out(sd, "output_layers.7", params["out_conv_1"])
    return sd
