"""wav2vec2 / HuBERT audio encoders as jit-compiled Flax modules.

Capability-parity rebuild of the reference's modified HF encoders
(reference: utils/wav2vec2.py:66-119, utils/hubert.py:9-51): the
strided-conv feature extractor runs at 50 Hz, is truncated to
``round(frame_num * 50 / output_fps)`` frames and linearly resampled to
``frame_num`` (the reference's "BackResample" head), then projected and
fed through a 12-layer transformer encoder with a grouped positional
convolution. Training-time SpecAugment masking replaces masked frames
with a learned embedding (reference: utils/wav2vec2.py:99-110).

Architecture constants follow facebook/wav2vec2-base-960h and
facebook/hubert-base-ls960 (both use the "group"-norm extractor and
post-LN encoder); ``msmd_tpu.interop.hf_weights`` maps HF torch
checkpoints onto these modules when pretrained weights are available
locally.

TPU notes: the conv stack is 7 ``lax.conv_general_dilated`` calls that
XLA lowers to MXU matmuls; everything downstream is batched matmul.
The mask sampler runs in pure JAX (statistically matching the
reference's numpy sampler, not bit-identical — RNG parity across
frameworks is impossible and irrelevant for training).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msmd_tpu.ops.seq import linear_interpolate


@dataclass(frozen=True)
class AudioEncoderConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    # SpecAugment (training only)
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10


class ConvFeatureExtractor(nn.Module):
    """7-layer strided conv stack, 16 kHz waveform -> 50 Hz features.

    Uses the "group"-norm layout of the base checkpoints: GroupNorm
    (per-channel) + GELU after layer 0, plain conv + GELU after. The
    whole stack reduces 320 samples to one frame.
    """

    config: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (N, L) -> (N, T50, C)
        c = self.config
        h = x[..., None].astype(self.dtype)  # (N, L, 1)
        for i, (dim, kernel, stride) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            h = nn.Conv(
                features=dim,
                kernel_size=(kernel,),
                strides=(stride,),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(h)
            if i == 0:
                # per-channel affine norm (GroupNorm with groups == channels)
                h = nn.GroupNorm(
                    num_groups=dim, epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="group_norm"
                )(h)
            h = nn.gelu(h, approximate=False)
        return h  # (N, T50, 512)


class FeatureProjection(nn.Module):
    config: AudioEncoderConfig
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=self.config.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="layer_norm")(x)
        x = nn.Dense(self.config.hidden_size, dtype=self.dtype, param_dtype=self.param_dtype, name="projection")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv relative positional embedding (kernel 128, 16 groups,
    'same'-ish padding with one trailing element dropped for even
    kernels)."""

    config: AudioEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.config
        pad = c.num_conv_pos_embeddings // 2
        h = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.num_conv_pos_embeddings,),
            padding=[(pad, pad)],
            feature_group_count=c.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if c.num_conv_pos_embeddings % 2 == 0:
            h = h[:, :-1]
        return nn.gelu(h, approximate=False)


class AudioEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer matching the HF base layout
    (separate q/k/v/out projections, LayerNorm after each residual)."""

    config: AudioEncoderConfig
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        dense = lambda feats, name: nn.Dense(feats, dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        residual = x
        B, L, _ = x.shape
        q = dense(c.hidden_size, "q_proj")(x).reshape(B, L, c.num_heads, head_dim)
        k = dense(c.hidden_size, "k_proj")(x).reshape(B, L, c.num_heads, head_dim)
        v = dense(c.hidden_size, "v_proj")(x).reshape(B, L, c.num_heads, head_dim)
        scale = jnp.asarray(head_dim ** -0.5, self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        # softmax in >= f32 (upcast bf16, but never downcast f64)
        weights = nn.softmax(logits.astype(jnp.promote_types(logits.dtype, jnp.float32)), axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(B, L, c.hidden_size)
        attn = dense(c.hidden_size, "out_proj")(attn)
        x = residual + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="layer_norm")(x)

        residual = x
        h = dense(c.intermediate_size, "intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = dense(c.hidden_size, "output_dense")(h)
        x = residual + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="final_layer_norm")(x)
        return x


class AudioTransformerEncoder(nn.Module):
    config: AudioEncoderConfig
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.config
        x = x + PositionalConvEmbedding(c, self.dtype, self.param_dtype, name="pos_conv_embed")(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, param_dtype=self.param_dtype, name="layer_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(c.num_layers):
            x = AudioEncoderLayer(c, self.dropout, self.dtype, self.param_dtype, name=f"layers_{i}")(x, deterministic)
        return x


def sample_time_masks(key: jax.Array, batch_size: int, seq_len: int, mask_prob: float, mask_length: int) -> jnp.ndarray:
    """Jax-native SpecAugment span sampler: num_spans ~ the reference's
    expectation (utils/wav2vec2.py:17-53), with uniformly random span
    starts. Returns a (B, L) bool mask (True = masked)."""
    num_spans = max(2, int(mask_prob * seq_len / float(mask_length) + 0.5))
    starts = jax.random.randint(key, (batch_size, num_spans), 0, max(1, seq_len - mask_length))
    positions = jnp.arange(seq_len)[None, None, :]  # (1, 1, L)
    spans = (positions >= starts[..., None]) & (positions < starts[..., None] + mask_length)
    return spans.any(axis=1)


class AudioEncoder(nn.Module):
    """The full audio encoder with the MSMD resampling head. Covers both
    backends — wav2vec2 and hubert share the base architecture; the
    backend name only selects pretrained weights and the freezing policy
    (reference: model.py:93-110)."""

    config: AudioEncoderConfig = field(default_factory=AudioEncoderConfig)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,  # (N, L) padded raw audio
        output_fps: int = 25,
        frame_num: Optional[int] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.config
        feats = ConvFeatureExtractor(c, self.dtype, self.param_dtype, name="feature_extractor")(input_values)
        # (N, T50, 512) -> truncate at 50 Hz, then linear-resample to frame_num
        # (reference: utils/hubert.py:23-28 / utils/wav2vec2.py:79-85).
        if frame_num is not None:
            keep = round(frame_num * 50 / output_fps)
            feats = feats[:, :keep]
            feats = jnp.transpose(linear_interpolate(jnp.transpose(feats, (0, 2, 1)), frame_num), (0, 2, 1))

        hidden = FeatureProjection(c, self.dropout, self.dtype, self.param_dtype, name="feature_projection")(
            feats, deterministic
        )

        if c.apply_spec_augment and c.mask_time_prob > 0:
            # created unconditionally so init (deterministic) and training
            # (masking active) share one param tree
            masked_embed = self.param(
                "masked_spec_embed", nn.initializers.uniform(scale=1.0), (c.hidden_size,), self.param_dtype
            )
        if c.apply_spec_augment and not deterministic and c.mask_time_prob > 0:
            key = self.make_rng("spec_augment")
            mask = sample_time_masks(key, hidden.shape[0], hidden.shape[1], c.mask_time_prob, c.mask_time_length)
            hidden = jnp.where(mask[..., None], masked_embed.astype(hidden.dtype), hidden)

        return AudioTransformerEncoder(c, self.dropout, self.dtype, self.param_dtype, name="encoder")(
            hidden, deterministic
        )


def wav2vec2_base(dtype=jnp.float32, param_dtype=jnp.float32) -> AudioEncoder:
    """facebook/wav2vec2-base-960h equivalent (mask_time_prob 0.05)."""
    return AudioEncoder(AudioEncoderConfig(), dtype=dtype, param_dtype=param_dtype)


def hubert_base(dtype=jnp.float32, param_dtype=jnp.float32) -> AudioEncoder:
    """facebook/hubert-base-ls960 equivalent."""
    return AudioEncoder(AudioEncoderConfig(), dtype=dtype, param_dtype=param_dtype)


# --------------------------------------------------------------------------
# freezing policy, expressed as optax-style parameter label fns
# --------------------------------------------------------------------------

def audio_param_trainable(audio_model: str, path: Tuple[str, ...]) -> bool:
    """Reference freezing policy (model.py:93-110): both backends freeze
    the conv feature extractor; hubert additionally freezes the feature
    projection and encoder layers 0-1. ``path`` is the flattened flax
    param path of the audio-encoder subtree."""
    joined = "/".join(path)
    if "feature_extractor" in joined:
        return False
    if audio_model == "hubert":
        if "feature_projection" in joined:
            return False
        for frozen in ("layers_0/", "layers_1/"):
            if f"encoder/{frozen}" in joined + "/":
                return False
    return True
