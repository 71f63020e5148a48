"""Transformer layer parity vs torch oracles built from the public torch
API (nn.TransformerDecoderLayer/EncoderLayer, the modules the reference
denoiser and style encoders are built on)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from msmd_tpu.interop.torch_params import (
    state_dict_to_numpy,
    transformer_decoder_layer,
    transformer_encoder_layer,
)
from msmd_tpu.models.transformer import (
    TransformerDecoder,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
)

DIM, HEADS, FFN = 32, 4, 64


def test_decoder_layer_matches_torch(rng_key):
    torch.manual_seed(0)
    oracle = torch.nn.TransformerDecoderLayer(
        d_model=DIM, nhead=HEADS, dim_feedforward=FFN, activation="gelu", batch_first=True
    ).eval()
    sd = state_dict_to_numpy(oracle.state_dict())
    params = transformer_decoder_layer({f"l.{k}": v for k, v in sd.items()}, "l")

    layer = TransformerDecoderLayer(DIM, HEADS, FFN)
    x = np.random.RandomState(1).randn(2, 7, DIM).astype(np.float32)
    mem = np.random.RandomState(2).randn(2, 11, DIM).astype(np.float32)
    mask = np.zeros((7, 11), bool)
    mask[:, 5:] = True  # torch bool mask: True = masked

    got = layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(mem), jnp.asarray(mask))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x), torch.from_numpy(mem), memory_mask=torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_encoder_layer_matches_torch():
    torch.manual_seed(3)
    oracle = torch.nn.TransformerEncoderLayer(
        d_model=DIM, nhead=HEADS, dim_feedforward=FFN, activation="gelu", batch_first=True
    ).eval()
    sd = state_dict_to_numpy(oracle.state_dict())
    params = transformer_encoder_layer({f"l.{k}": v for k, v in sd.items()}, "l")

    layer = TransformerEncoderLayer(DIM, HEADS, FFN)
    x = np.random.RandomState(4).randn(3, 9, DIM).astype(np.float32)
    got = layer.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_decoder_stack_matches_torch():
    torch.manual_seed(5)
    n_layers = 3
    layer = torch.nn.TransformerDecoderLayer(
        d_model=DIM, nhead=HEADS, dim_feedforward=FFN, activation="gelu", batch_first=True
    )
    oracle = torch.nn.TransformerDecoder(layer, num_layers=n_layers).eval()
    sd = state_dict_to_numpy(oracle.state_dict())
    params = {f"layers_{i}": transformer_decoder_layer(sd, f"layers.{i}") for i in range(n_layers)}

    dec = TransformerDecoder(n_layers, DIM, HEADS, FFN)
    x = np.random.RandomState(6).randn(2, 5, DIM).astype(np.float32)
    mem = np.random.RandomState(7).randn(2, 5, DIM).astype(np.float32)
    got = dec.apply({"params": params}, jnp.asarray(x), jnp.asarray(mem))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x), torch.from_numpy(mem))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


def test_cross_identity_band_equals_masked_softmax():
    """cross_identity_band=True (the width-1 V-gather rewrite) must equal
    the masked-softmax path with alignment_mask(width=1) exactly."""
    from msmd_tpu.ops.seq import alignment_mask

    n_prev, n_cur = 3, 7
    Lq = 1 + n_prev + n_cur
    Lm = n_prev + n_cur
    dec = TransformerDecoder(2, DIM, HEADS, FFN)
    rs = np.random.RandomState(8)
    x = jnp.asarray(rs.randn(2, Lq, DIM).astype(np.float32))
    mem = jnp.asarray(rs.randn(2, Lm, DIM).astype(np.float32))
    variables = dec.init(jax.random.PRNGKey(0), x, mem)

    align = alignment_mask(n_prev, n_cur, 1)
    want = dec.apply(variables, x, mem, align, True)
    got = dec.apply(variables, x, mem, None, True, cross_identity_band=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)

    # and through the cached-KV path used by the sampler
    kv = dec.apply(variables, mem, method=TransformerDecoder.cache_memory)
    got_kv = dec.apply(variables, x, None, None, True, memory_kv=kv, cross_identity_band=True)
    np.testing.assert_allclose(np.asarray(got_kv), np.asarray(want), atol=1e-6, rtol=1e-6)
