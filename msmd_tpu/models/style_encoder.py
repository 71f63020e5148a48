"""Motion-clip -> style VAE encoders.

Rebuild of the reference style encoders (reference:
style_encoder.py:22-213): a 2x(Conv1d k3 + ELU + LayerNorm) stem, the
sinusoidal PE (with the single-row quirk), one post-LN transformer
encoder layer (d=512, 8 heads, ffn=512, gelu), a 2xConv1d head, temporal
mean-pool, and a reparameterized (mu, logvar) split.

Two variants ship, as in the reference:
- ``StyleEncoderVAE2`` (the factory default, reference
  style_encoder.py:10-12): ELU head, output 2*d_style.
- ``StyleEncoderVAE`` (legacy, constructible but not wired to the
  factory in the reference): ReLU head, output 2*d_style*2.

The input dim is 67 (54 for HDTF/flame-dataset configs — reference
style_encoder.py:123-125).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msmd_tpu.models.transformer import TransformerEncoderLayer
from msmd_tpu.ops.seq import apply_pe_single_row, sinusoidal_table


def style_input_dim(dataset_type: str) -> int:
    if dataset_type[:9] == "HDTF_TFHP" or dataset_type == "flame_mead_ravdess":
        return 54
    return 67


class _ConvStem(nn.Module):
    """conv1d(k3, same) -> dropout -> ELU -> LayerNorm, twice."""

    feature_dim: int
    dropout: float = 0.2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = nn.Conv(
                self.feature_dim, kernel_size=(3,), padding=[(1, 1)],
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv_{i}",
            )(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            x = nn.elu(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=f"norm_{i}")(x)
        return x


class _StyleVAEBase(nn.Module):
    """Shared trunk; subclasses choose the head activation + output size."""

    d_style: int
    input_dim: int = 67
    conv_feature_dim: int = 512
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    # subclass knobs
    head_activation: str = "elu"
    output_multiplier: int = 1  # VAE2: 1, VAE: 2
    final_activation: bool = False  # VAE applies ReLU after the last conv

    @property
    def output_size(self) -> int:
        return self.d_style * 2 * self.output_multiplier

    @nn.compact
    def _encode(self, motion_coef: jnp.ndarray, deterministic: bool = True):
        x = motion_coef.astype(self.dtype)
        x = _ConvStem(self.conv_feature_dim, 0.2, self.dtype, self.param_dtype, name="input_layers")(x, deterministic)
        # sinusoidal PE with the reference's single-row quirk + dropout 0.1
        table = sinusoidal_table(self.conv_feature_dim, 600, self.dtype)
        x = apply_pe_single_row(x, table)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        x = TransformerEncoderLayer(
            self.conv_feature_dim, 8, self.conv_feature_dim, 0.1, self.dtype, self.param_dtype, name="encoder"
        )(x, deterministic=deterministic)

        act = nn.elu if self.head_activation == "elu" else nn.relu
        x = nn.Conv(self.output_size, (3,), padding=[(1, 1)], dtype=self.dtype, param_dtype=self.param_dtype, name="out_conv_0")(x)
        x = nn.Dropout(0.1)(x, deterministic=deterministic)
        x = act(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name="out_norm")(x)
        x = nn.Conv(self.output_size, (3,), padding=[(1, 1)], dtype=self.dtype, param_dtype=self.param_dtype, name="out_conv_1")(x)
        if self.final_activation:
            x = nn.relu(x)

        out = x.mean(axis=1)  # temporal mean-pool
        mu = out[:, : self.output_size // 2]
        logvar = out[:, self.output_size // 2 :]
        return mu, logvar

    def __call__(self, motion_coef: jnp.ndarray, deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (z, mu, logvar) with z = mu + eps * exp(logvar/2)."""
        mu, logvar = self._encode(motion_coef, deterministic)
        eps = jax.random.normal(self.make_rng("style"), mu.shape, mu.dtype)
        return mu + eps * jnp.exp(0.5 * logvar), mu, logvar

    def sample(self, motion_coef: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """One reparameterized draw (reference: style_encoder.py:209-213 —
        note the reference draws twice and returns the second; one draw is
        distributionally identical)."""
        mu, logvar = self._encode(motion_coef, deterministic)
        eps = jax.random.normal(self.make_rng("style"), mu.shape, mu.dtype)
        return mu + eps * jnp.exp(0.5 * logvar)

    def encode_mean(self, motion_coef: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Posterior mean — the deterministic style embedding (used by the
        `do_ignore_style` eval ablation, reference training_script.py:287)."""
        mu, _ = self._encode(motion_coef, deterministic)
        return mu


class StyleEncoderVAE2(_StyleVAEBase):
    """The production style encoder (reference: style_encoder.py:119-213)."""

    head_activation: str = "elu"
    output_multiplier: int = 1
    final_activation: bool = False


class StyleEncoderVAE(_StyleVAEBase):
    """Legacy VAE variant (reference: style_encoder.py:22-117): ReLU head,
    doubled output size."""

    head_activation: str = "relu"
    output_multiplier: int = 2
    final_activation: bool = True


def get_style_encoder(cfg, style: str = "vae2", dtype=jnp.float32, param_dtype=jnp.float32):
    """Factory (reference: style_encoder.py:7-12). Only 'vae2' is
    constructible via the reference factory; we also expose 'vae'."""
    input_dim = style_input_dim(cfg.dataset_type)
    if style == "vae2":
        return StyleEncoderVAE2(d_style=cfg.d_style, input_dim=input_dim, dtype=dtype, param_dtype=param_dtype)
    if style == "vae":
        return StyleEncoderVAE(d_style=cfg.d_style, input_dim=input_dim, dtype=dtype, param_dtype=param_dtype)
    raise ValueError(f"Style encoder model style {style} not recognized")
