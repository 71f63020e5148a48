"""torch state_dict <-> flax param-tree conversion primitives.

These power two things:
1. loading the reference's released ``.pt`` checkpoints (reference
   layout: {args, model, style_enc, iter} — training_script.py:227-233)
   onto the TPU modules, and
2. oracle tests that instantiate the equivalent torch modules from the
   public torch API and assert numerical parity with our Flax modules.

Everything here consumes plain dicts of NumPy arrays (a "state dict"),
so no torch import is required at conversion time; use
``msmd_tpu.interop.torch_ckpt`` to read ``.pt`` files into that form.

Layout rules:
- torch ``nn.Linear`` weight is (out, in); flax ``nn.Dense`` kernel is
  (in, out): transpose.
- torch ``nn.Conv1d`` weight is (out, in/groups, k); flax ``nn.Conv``
  kernel is (k, in/groups, out): transpose (2, 1, 0).
- torch ``nn.MultiheadAttention`` packs q/k/v into ``in_proj_weight``
  (3E, E); our MHA keeps separate q/k/v Dense layers: split then
  transpose.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def linear(sd: StateDict, prefix: str) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def conv1d(sd: StateDict, prefix: str) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def layer_norm(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def group_norm(sd: StateDict, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def packed_mha(sd: StateDict, prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj) -> our MultiHeadAttention."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd.get(f"{prefix}.in_proj_bias")
    e = w.shape[1]
    parts = {}
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        parts[name] = {"kernel": np.ascontiguousarray(w[i * e : (i + 1) * e].T)}
        if b is not None:
            parts[name]["bias"] = b[i * e : (i + 1) * e]
    parts["out_proj"] = linear(sd, f"{prefix}.out_proj")
    return parts


def separate_mha(sd: StateDict, prefix: str) -> dict:
    """HF-style attention with separate q/k/v/out projections."""
    return {name: linear(sd, f"{prefix}.{name}") for name in ["q_proj", "k_proj", "v_proj", "out_proj"]}


# ---------------------------------------------------------------------------
# composite modules
# ---------------------------------------------------------------------------

def transformer_decoder_layer(sd: StateDict, prefix: str) -> dict:
    """torch nn.TransformerDecoderLayer -> msmd_tpu TransformerDecoderLayer."""
    return {
        "self_attn": packed_mha(sd, f"{prefix}.self_attn"),
        "cross_attn": packed_mha(sd, f"{prefix}.multihead_attn"),
        "ffn": {"linear1": linear(sd, f"{prefix}.linear1"), "linear2": linear(sd, f"{prefix}.linear2")},
        "norm1": layer_norm(sd, f"{prefix}.norm1"),
        "norm2": layer_norm(sd, f"{prefix}.norm2"),
        "norm3": layer_norm(sd, f"{prefix}.norm3"),
    }


def transformer_encoder_layer(sd: StateDict, prefix: str) -> dict:
    """torch nn.TransformerEncoderLayer -> msmd_tpu TransformerEncoderLayer."""
    return {
        "self_attn": packed_mha(sd, f"{prefix}.self_attn"),
        "ffn": {"linear1": linear(sd, f"{prefix}.linear1"), "linear2": linear(sd, f"{prefix}.linear2")},
        "norm1": layer_norm(sd, f"{prefix}.norm1"),
        "norm2": layer_norm(sd, f"{prefix}.norm2"),
    }


def transformer_decoder(sd: StateDict, prefix: str, n_layers: int) -> dict:
    return {f"layers_{i}": transformer_decoder_layer(sd, f"{prefix}.layers.{i}") for i in range(n_layers)}


# ---------------------------------------------------------------------------
# HF wav2vec2 / hubert encoders (facebook base checkpoints)
# ---------------------------------------------------------------------------

def hf_audio_encoder(sd: StateDict, n_layers: Optional[int] = None, n_convs: Optional[int] = None) -> dict:
    """HF Wav2Vec2Model/HubertModel state_dict -> msmd_tpu AudioEncoder
    params. Handles both naming families (wav2vec2 uses
    ``feature_projection.projection``; both use
    ``encoder.pos_conv_embed.conv`` with weight-norm 'g'/'v' splits or
    the newer parametrizations layout)."""
    if n_convs is None:
        n_convs = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("feature_extractor.conv_layers."))
    if n_layers is None:
        n_layers = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers."))
    p: dict = {"feature_extractor": {}, "feature_projection": {}, "encoder": {}}

    for i in range(n_convs):
        base = f"feature_extractor.conv_layers.{i}"
        p["feature_extractor"][f"conv_{i}"] = conv1d(sd, f"{base}.conv")
    if "feature_extractor.conv_layers.0.layer_norm.weight" in sd:
        p["feature_extractor"]["group_norm"] = group_norm(sd, "feature_extractor.conv_layers.0.layer_norm")

    p["feature_projection"]["layer_norm"] = layer_norm(sd, "feature_projection.layer_norm")
    p["feature_projection"]["projection"] = linear(sd, "feature_projection.projection")

    # positional conv embedding: reconstruct the weight-normed kernel
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
        w = g * v / np.linalg.norm(v, axis=(0, 1), keepdims=True)
    elif "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]
        v = sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]
        w = g * v / np.linalg.norm(v, axis=(0, 1), keepdims=True)
    else:
        w = sd["encoder.pos_conv_embed.conv.weight"]
    p["encoder"]["pos_conv_embed"] = {
        "conv": {"kernel": np.ascontiguousarray(w.transpose(2, 1, 0)), "bias": sd["encoder.pos_conv_embed.conv.bias"]}
    }
    p["encoder"]["layer_norm"] = layer_norm(sd, "encoder.layer_norm")
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        p["encoder"][f"layers_{i}"] = {
            **separate_mha(sd, f"{base}.attention"),
            "layer_norm": layer_norm(sd, f"{base}.layer_norm"),
            "intermediate_dense": linear(sd, f"{base}.feed_forward.intermediate_dense"),
            "output_dense": linear(sd, f"{base}.feed_forward.output_dense"),
            "final_layer_norm": layer_norm(sd, f"{base}.final_layer_norm"),
        }
    if "masked_spec_embed" in sd:
        p["masked_spec_embed"] = sd["masked_spec_embed"]
    return p


def strip_prefix(sd: StateDict, prefix: str) -> StateDict:
    """Select the sub-dict under ``prefix.`` and strip it."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}


def state_dict_to_numpy(sd) -> StateDict:
    """Detach a torch state_dict into NumPy (torch import stays local so
    torch-less TPU hosts can still import this module)."""
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out
