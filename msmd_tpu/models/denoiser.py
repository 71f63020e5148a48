"""The MSMD denoising network: a conditional transformer decoder with
style-basis static/dynamic/alpha decomposition.

Rebuild of the reference denoiser (reference: model.py:820-996):
- diffusion-step embedding: sinusoidal table row + 2-layer GELU MLP,
  added to the projected person (shape+style) token
- motion features (+ optional 0/1 indicator channel) projected to
  ``feature_dim``; previous-window motion prepended; person token
  prepended; learnable (or sinusoidal) positional encoding added
- an N-layer post-LN transformer decoder cross-attending into the audio
  features with a banded alignment ``memory_mask``
- a motion-decoder MLP emitting ``motion_feat_dim + num_of_basis``
  channels; the last ``num_of_basis`` are per-frame alpha weights over
  ``num_of_basis`` style->static-offset MLPs; the output is
  dynamic + sum(alpha * static), with the 3 head-pose channels excluded
  from alpha weighting when ``use_head_alpha`` is False (the MSMD
  default — reference model.py:17,983-990).

Everything is a fixed-shape batched matmul program: one forward is
n_layers x (self-attn + cross-attn + FFN) over 1 + L_p + L tokens, which
XLA maps straight onto the MXU. During sampling the cross-attention
memory (audio features) is constant over all diffusion steps, so its
per-layer K/V can be precomputed once via ``cache_memory_kv`` and
passed back in as ``memory_kv`` — saving 2 x n_layers matmuls per
denoising step inside the sampler's scan.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.transformer import KVCache, TransformerDecoder
from msmd_tpu.ops.seq import alignment_mask, apply_pe_single_row, sinusoidal_table


class DiffusionStepEmbedding(nn.Module):
    """PE-table row lookup (by timestep) + 2-layer GELU MLP
    (reference: model.py:855-860, lookup at model.py:931)."""

    feature_dim: int
    n_diff_steps: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, step: jnp.ndarray) -> jnp.ndarray:
        table = sinusoidal_table(self.feature_dim, self.n_diff_steps + 1, self.dtype)
        emb = table[step]  # (N, feature_dim)
        emb = nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear1")(emb)
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2")(emb)
        return emb


class StyleBasisMLP(nn.Module):
    """style (N, 1, d_style) -> static motion offset (N, 1, d_motion)
    (reference: model.py:890-899)."""

    feature_dim: int
    motion_feat_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, style: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear1")(style)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.motion_feat_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear2")(h)


class DenoisingNetwork(nn.Module):
    cfg: MSMDConfig
    use_head_alpha: bool = False  # MSMD default (reference model.py:17)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.diff_step_map = DiffusionStepEmbedding(
            cfg.feature_dim, cfg.n_diff_steps, self.dtype, self.param_dtype, name="diff_step_map"
        )
        self.person_proj = nn.Dense(cfg.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="person_proj")
        self.feature_proj = nn.Dense(cfg.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="feature_proj")
        if not cfg.no_use_learnable_pe:
            self.PE = self.param(
                "PE",
                nn.initializers.normal(stddev=1.0),
                (1, 1 + cfg.n_prev_motions + cfg.n_motions, cfg.feature_dim),
                self.param_dtype,
            )
        else:
            # the reference PositionalEncoding applies dropout(0.1) after
            # adding the PE row in train mode (utils/model_common.py:99-101)
            self.pe_dropout = nn.Dropout(0.1)
        self.transformer = TransformerDecoder(
            cfg.n_layers, cfg.feature_dim, cfg.n_heads, cfg.mlp_ratio * cfg.feature_dim,
            0.1, self.dtype, self.param_dtype,
            jnp.dtype(cfg.attn_softmax_dtype) if getattr(cfg, "attn_softmax_dtype", "") else None,
            remat=getattr(cfg, "remat_denoiser", False),
            name="transformer",
        )
        self.static_feature_mappings = [
            StyleBasisMLP(cfg.feature_dim, cfg.motion_feat_dim, self.dtype, self.param_dtype, name=f"static_feature_mapping_{k}")
            for k in range(cfg.num_of_basis)
        ]
        self.motion_dec_1 = nn.Dense(cfg.feature_dim // 2, dtype=self.dtype, param_dtype=self.param_dtype, name="motion_dec_1")
        self.motion_dec_2 = nn.Dense(
            cfg.motion_feat_dim + cfg.num_of_basis, dtype=self.dtype, param_dtype=self.param_dtype, name="motion_dec_2"
        )

    def cache_memory_kv(self, prev_audio_feat: jnp.ndarray, audio_feat: jnp.ndarray) -> List[KVCache]:
        """Per-layer K/V of the (constant-per-sampling-run) audio memory."""
        memory = jnp.concatenate([prev_audio_feat, audio_feat], axis=1).astype(self.dtype)
        return self.transformer.cache_memory(memory)

    def precompute_step_emb(self) -> jnp.ndarray:
        """The diffusion-step embedding (PE row + 2-layer GELU MLP) for
        EVERY timestep 0..n_diff_steps as one (T+1, F) table. The MLP is
        rowwise, so ``table[t] == diff_step_map(t)`` exactly; sampling
        precomputes this once and turns the per-step embedding inside the
        scan into a single gather (the MLP is t-dependent, so XLA's loop
        LICM cannot hoist it by itself)."""
        return self.diff_step_map(jnp.arange(self.cfg.n_diff_steps + 1))

    def __call__(
        self,
        motion_feat: jnp.ndarray,  # (N, L, d_motion) noisy motion
        audio_feat: jnp.ndarray,  # (N, L, feature_dim)
        person_feat: jnp.ndarray,  # (N, 1, d_person)
        static_style_feat: Optional[jnp.ndarray],  # (N, 1, d_style)
        prev_motion_feat: jnp.ndarray,  # (N, L_p, d_motion)
        prev_audio_feat: jnp.ndarray,  # (N, L_p, feature_dim)
        step: jnp.ndarray,  # (N,) int timesteps
        indicator: Optional[jnp.ndarray] = None,  # (N, L) 0/1
        keep_separate: bool = False,
        deterministic: bool = True,
        memory_kv: Optional[List[KVCache]] = None,
        fused_decoder: Optional[dict] = None,
        fused_ffn: bool = False,
        fused_tail: bool = False,
        step_emb_table: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        d_motion = cfg.motion_feat_dim
        n_prev, n_cur = prev_motion_feat.shape[1], motion_feat.shape[1]

        # diffusion-step conditioning rides on the person token
        if step_emb_table is not None:
            step_emb = step_emb_table[step][:, None, :].astype(self.dtype)
        else:
            step_emb = self.diff_step_map(step)[:, None, :]
        person = self.person_proj(person_feat.astype(self.dtype)) + step_emb

        feats_in = jnp.concatenate([prev_motion_feat, motion_feat], axis=1).astype(self.dtype)
        if cfg.use_indicator:
            if indicator is None:
                indicator = jnp.ones((motion_feat.shape[0], n_cur), self.dtype)
            ind = jnp.concatenate(
                [jnp.zeros((indicator.shape[0], n_prev), self.dtype), indicator.astype(self.dtype)], axis=1
            )[..., None]
            feats_in = jnp.concatenate([feats_in, ind], axis=-1)
        feats_in = self.feature_proj(feats_in)
        feats_in = jnp.concatenate([person, feats_in], axis=1)  # (N, 1 + L_p + L, F)

        if not cfg.no_use_learnable_pe:
            feats_in = feats_in + self.PE.astype(self.dtype)
        else:
            feats_in = apply_pe_single_row(feats_in, sinusoidal_table(cfg.feature_dim, 600, self.dtype))
            feats_in = self.pe_dropout(feats_in, deterministic=deterministic)

        memory_mask = None
        # width-1 band (the default): every motion row's softmax is a
        # one-hot over exactly one memory token, so cross-attention is an
        # exact V-gather (transformer.MultiHeadAttention._identity_band).
        # Deterministic mode always; training only with the opt-in
        # --identity_band_train (one-hot weight dropout becomes a
        # Bernoulli on the gathered V rows — statistically equivalent).
        identity_band = cfg.align_mask_width == 1 and (
            deterministic or getattr(cfg, "identity_band_train", False)
        )
        if cfg.align_mask_width > 0 and not identity_band:
            memory_mask = alignment_mask(n_prev, n_cur, cfg.align_mask_width)

        if fused_decoder is not None:
            # single-Pallas-program decoder stack for the sampling hot
            # loop (ops/pallas/decoder_kernel.py): ~100 XLA ops -> 1
            # kernel; masks/packed weights are built once outside the scan
            from msmd_tpu.ops.pallas.decoder_kernel import (
                fused_decoder_forward, fused_decoder_forward_resident,
            )

            if fused_decoder.get("layer_outer", False):
                feat_out = fused_decoder_forward_resident(
                    fused_decoder["pack"], fused_decoder["kmem"], fused_decoder["vmem"],
                    feats_in.astype(jnp.float32),
                    fused_decoder["cross_mask"],
                    n_heads=cfg.n_heads, tile_entries=fused_decoder["tile_entries"],
                    pad_lq=fused_decoder.get("pad_lq", 0),
                    interpret=fused_decoder["interpret"],
                    vmw=fused_decoder.get("vmw"),
                ).astype(self.dtype)
            else:
                feat_out = fused_decoder_forward(
                    fused_decoder["pack"], fused_decoder["kmem"], fused_decoder["vmem"],
                    feats_in.astype(jnp.float32),
                    fused_decoder["self_mask"], fused_decoder["cross_mask"],
                    n_heads=cfg.n_heads, tile_entries=fused_decoder.get("tile_entries", 0),
                    per_entry_attention=fused_decoder.get("per_entry_attention", False),
                    pad_lq=fused_decoder.get("pad_lq", 0),
                    interpret=fused_decoder["interpret"],
                    vmw=fused_decoder.get("vmw"),
                ).astype(self.dtype)
        else:
            memory = None
            if memory_kv is None:
                memory = jnp.concatenate([prev_audio_feat, audio_feat], axis=1).astype(self.dtype)
            feat_out = self.transformer(
                feats_in, memory, memory_mask, deterministic, memory_kv=memory_kv,
                cross_identity_band=identity_band, fused_ffn=fused_ffn and deterministic,
                fused_tail=fused_tail if (identity_band and memory_kv is not None) else False,
                fused_ffn_train=getattr(cfg, "fused_ffn_train", False) and not deterministic,
            )

        # motion decoder (person token dropped)
        h = self.motion_dec_1(feat_out[:, 1:])
        h = nn.gelu(h, approximate=False)
        decoded = self.motion_dec_2(h)  # (N, L_p + L, d_motion + num_of_basis)

        dynamic = decoded[..., : -cfg.num_of_basis]  # (N, L_p+L, d_motion)
        alphas = decoded[..., -cfg.num_of_basis :]  # (N, L_p+L, K)
        if cfg.regularize_alpha == "sigmoid":
            alphas = nn.sigmoid(alphas)

        # style-basis static offsets, tiled over time: (N, L_p+L, K, d_motion)
        statics = [m(static_style_feat.astype(self.dtype)) for m in self.static_feature_mappings]
        static = jnp.stack(statics, axis=2)  # (N, 1, K, d_motion)
        static = jnp.broadcast_to(static, (static.shape[0], decoded.shape[1]) + static.shape[2:])

        alphas_e = alphas[..., None]  # (N, L, K, 1)
        if self.use_head_alpha:
            summed_static = (static * alphas_e).sum(axis=2)
        else:
            # head-pose channels (last 3) bypass the alpha weighting
            # (reference: model.py:983-990)
            face = (static[..., :-3] * alphas_e).sum(axis=2)
            pose = static[..., -3:].sum(axis=2)
            summed_static = jnp.concatenate([face, pose], axis=-1)

        if keep_separate:
            return dynamic, static, alphas
        return dynamic + summed_static
