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


def test_cross_identity_band_train_rate0_exact():
    """--identity_band_train semantics at dropout rate 0: the train-mode
    (deterministic=False) identity-band path must equal the masked-softmax
    train path EXACTLY (rate 0 makes both dropout-free, so the rewrite's
    exactness argument applies unchanged)."""
    from msmd_tpu.ops.seq import alignment_mask

    n_prev, n_cur = 3, 7
    Lq, Lm = 1 + n_prev + n_cur, n_prev + n_cur
    rs = np.random.RandomState(9)
    x = jnp.asarray(rs.randn(2, Lq, DIM).astype(np.float32))
    mem = jnp.asarray(rs.randn(2, Lm, DIM).astype(np.float32))
    align = alignment_mask(n_prev, n_cur, 1)

    dec = TransformerDecoder(2, DIM, HEADS, FFN, 0.0)
    variables = dec.init(jax.random.PRNGKey(0), x, mem)
    rngs = {"dropout": jax.random.PRNGKey(1)}
    want = dec.apply(variables, x, mem, align, False, rngs=rngs)
    got = dec.apply(variables, x, mem, None, False, cross_identity_band=True, rngs=rngs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


def test_identity_band_weight_dropout_distribution():
    """Train-mode identity band with dropout: the one-hot weight dropout
    (a Bernoulli/(1-p) on each gathered V row) must match the
    masked-softmax path's full-matrix weight dropout IN DISTRIBUTION.
    Checked at the attention-output level (where dropout is unbiased —
    downstream LayerNorm is nonlinear): per-element mean of N draws of
    both paths ~= the deterministic output, and the two paths'
    per-element variances agree in aggregate."""
    from msmd_tpu.models.transformer import MultiHeadAttention
    from msmd_tpu.ops.seq import alignment_mask

    n_prev, n_cur = 3, 7
    Lq, Lm = 1 + n_prev + n_cur, n_prev + n_cur
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(2, Lq, DIM).astype(np.float32))
    mem = jnp.asarray(rs.randn(2, Lm, DIM).astype(np.float32))
    align = jnp.asarray(alignment_mask(n_prev, n_cur, 1))

    mha = MultiHeadAttention(DIM, HEADS, dropout=0.5)
    variables = mha.init(jax.random.PRNGKey(0), x, mem, mem)
    det = np.asarray(mha.apply(variables, x, mem, mem, identity_band=True))

    N = 600
    def draws(**kw):
        outs = [
            np.asarray(mha.apply(variables, x, mem, mem, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(100 + i)}, **kw))
            for i in range(N)
        ]
        return np.stack(outs)

    band = draws(identity_band=True)
    full = draws(mask=align)

    sd = np.abs(det).mean()  # scale for tolerances
    # unbiasedness: mean of draws -> deterministic output (SE ~ sd/sqrt(N))
    np.testing.assert_allclose(band.mean(0), det, atol=0.25 * sd, rtol=0.2)
    np.testing.assert_allclose(full.mean(0), det, atol=0.25 * sd, rtol=0.2)
    # equal dispersion: aggregate per-element std of the two estimators
    b_std, f_std = band.std(0).mean(), full.std(0).mean()
    assert abs(b_std - f_std) < 0.12 * f_std, (b_std, f_std)
    # and dropout actually happened
    assert b_std > 0.05 * sd and f_std > 0.05 * sd


def test_identity_band_train_step_runs():
    """cfg.identity_band_train=True: one full training step runs finite
    with the identity-band cross-attention active in the train forward
    (covers the denoiser gate and rng plumbing)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_train_step import TINY_AUDIO, make_batch, tiny_cfg

    from msmd_tpu.models.diffusion import get_diffusion_model
    from msmd_tpu.models.style_encoder import get_style_encoder
    from msmd_tpu.train.loop import create_train_state, make_train_step

    cfg = tiny_cfg(identity_band_train=True, align_mask_width=1)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    step = make_train_step(cfg, model, style_enc, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(state2.params["model"])[0])).all()
