"""Transformer building blocks with torch-parity semantics.

The reference builds its denoiser on ``nn.TransformerDecoder`` and its
style encoders on ``nn.TransformerEncoderLayer`` (reference:
model.py:874-885, style_encoder.py:158-160). To keep checkpoint
interoperability we reproduce torch's exact *post-LN* layer algebra
(norm_first=False): residual-add THEN LayerNorm, GELU FFN, per-layer
dropout — but as Flax modules whose attention math runs as batched
einsum/matmul that XLA fuses onto the MXU. Attention masks use the
torch boolean convention: True = disallowed.

All matmuls honor ``dtype`` (bfloat16 on TPU) while parameters stay in
``param_dtype`` (float32): the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    """Torch-``nn.MultiheadAttention``-equivalent attention.

    Parameters are stored as separate q/k/v/out dense layers; the interop
    layer splits torch's packed ``in_proj_weight`` into these when
    converting checkpoints.
    """

    dim: int
    n_heads: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        head_dim = self.dim // self.n_heads
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        qh = dense("q_proj")(q)
        kh = dense("k_proj")(k)
        vh = dense("v_proj")(v)

        B, Lq, _ = qh.shape
        Lk = kh.shape[1]
        qh = qh.reshape(B, Lq, self.n_heads, head_dim)
        kh = kh.reshape(B, Lk, self.n_heads, head_dim)
        vh = vh.reshape(B, Lk, self.n_heads, head_dim)

        scale = jnp.asarray(1.0 / head_dim ** 0.5, self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
        if mask is not None:
            # torch convention: boolean True = masked out.
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
            logits = jnp.where(mask, neg, logits)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(B, Lq, self.dim)
        return dense("out_proj")(out)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2")(x)
        return x


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn -> cross-attn(memory) -> FFN,
    each followed by residual-add + LayerNorm (torch
    ``nn.TransformerDecoderLayer`` with norm_first=False, gelu)."""

    dim: int
    n_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        drop = nn.Dropout(self.dropout)

        sa = MultiHeadAttention(self.dim, self.n_heads, self.dropout, self.dtype, self.param_dtype, name="self_attn")(
            x, x, x, deterministic=deterministic
        )
        x = ln("norm1")(x + drop(sa, deterministic=deterministic))

        ca = MultiHeadAttention(self.dim, self.n_heads, self.dropout, self.dtype, self.param_dtype, name="cross_attn")(
            x, memory, memory, mask=memory_mask, deterministic=deterministic
        )
        x = ln("norm2")(x + drop(ca, deterministic=deterministic))

        ff = FeedForward(self.dim, self.ffn_dim, self.dropout, self.dtype, self.param_dtype, name="ffn")(
            x, deterministic=deterministic
        )
        x = ln("norm3")(x + drop(ff, deterministic=deterministic))
        return x


class TransformerDecoder(nn.Module):
    """Stack of decoder layers (torch ``nn.TransformerDecoder`` with
    norm=None, as the reference constructs it at model.py:884)."""

    n_layers: int
    dim: int
    n_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, memory_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        for i in range(self.n_layers):
            x = TransformerDecoderLayer(
                self.dim, self.n_heads, self.ffn_dim, self.dropout, self.dtype, self.param_dtype, name=f"layers_{i}"
            )(x, memory, memory_mask, deterministic)
        return x


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch ``nn.TransformerEncoderLayer``,
    norm_first=False, gelu)."""

    dim: int
    n_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        drop = nn.Dropout(self.dropout)

        sa = MultiHeadAttention(self.dim, self.n_heads, self.dropout, self.dtype, self.param_dtype, name="self_attn")(
            x, x, x, mask=mask, deterministic=deterministic
        )
        x = ln("norm1")(x + drop(sa, deterministic=deterministic))
        ff = FeedForward(self.dim, self.ffn_dim, self.dropout, self.dtype, self.param_dtype, name="ffn")(
            x, deterministic=deterministic
        )
        x = ln("norm2")(x + drop(ff, deterministic=deterministic))
        return x
