"""Sequence utilities: sinusoidal tables, alignment masks, audio padding,
and linear feature resampling.

These are the pure building blocks under every model in the framework
(reference: utils/model_common.py:86-123, utils/wav2vec2.py:57-63).
All functions are jnp-pure and shape-static, so they trace cleanly under
``jax.jit``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(d_model: int, max_len: int = 600, dtype=jnp.float32) -> jnp.ndarray:
    """Vanilla sinusoidal positional-encoding table of shape
    ``(max_len, d_model)`` (reference: utils/model_common.py:89-97).

    Built with NumPy so it constant-folds at trace time.
    """
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


def apply_pe_single_row(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Reproduce the reference PositionalEncoding forward *exactly*: it
    adds ``pe[:, x.shape[1], :]`` — the single table row indexed by the
    sequence length, broadcast to every position — NOT the first
    ``seq_len`` rows (reference: utils/model_common.py:100, a released
    quirk we keep for checkpoint parity).

    Args:
        x: (N, L, d_model)
        table: (max_len, d_model) from :func:`sinusoidal_table`.
    """
    return x + table[x.shape[1]][None, None, :]


def enc_dec_mask(T: int, S: int, frame_width: int = 2, expansion: int = 0) -> jnp.ndarray:
    """Banded audio<->motion cross-attention mask. ``True`` = masked
    (disallowed), matching the reference's boolean convention
    (reference: utils/model_common.py:103-107).

    Row ``i`` unmasks source columns
    ``[max(0, (i-expansion)*frame_width), (i+expansion+1)*frame_width)``.
    """
    rows = np.arange(T)[:, None]
    cols = np.arange(S)[None, :]
    lo = np.maximum(0, (rows - expansion) * frame_width)
    hi = (rows + expansion + 1) * frame_width
    allowed = (cols >= lo) & (cols < hi)
    return jnp.asarray(~allowed)


def alignment_mask(n_prev_motions: int, n_motions: int, align_mask_width: int) -> jnp.ndarray:
    """The denoiser's full memory mask: a width-``align_mask_width`` band
    over the (L_p+L, L_p+L) audio/motion grid, with an extra unmasked row
    prepended for the person token (reference: model.py:879-883).

    Returns a boolean (1 + L_p + L, L_p + L) array, True = masked.
    """
    motion_len = n_prev_motions + n_motions
    band = enc_dec_mask(motion_len, motion_len, 1, align_mask_width - 1)
    person_row = jnp.zeros((1, motion_len), dtype=bool)
    return jnp.concatenate([person_row, band], axis=0)


def pad_audio(audio: jnp.ndarray, audio_unit: int = 320, pad_threshold: int = 80) -> jnp.ndarray:
    """Symmetrically pad raw audio so the strided-conv feature extractor
    emits enough 50 Hz frames (reference: utils/model_common.py:110-123).

    The reference applies reflect padding of ``side_len // 2`` TWICE per
    side plus one replicate sample if ``side_len`` is odd; we reproduce
    that exact scheme (total per-side padding = ``side_len``).

    Args:
        audio: (N, L) raw waveform.
    """
    audio_len = audio.shape[1]
    n_units = audio_len // audio_unit
    side_len = math.ceil((audio_unit * n_units + pad_threshold - audio_len) / 2)
    if side_len >= 0:
        reflect_len = side_len // 2
        replicate_len = side_len % 2
        if reflect_len > 0:
            audio = jnp.pad(audio, ((0, 0), (reflect_len, reflect_len)), mode="reflect")
            audio = jnp.pad(audio, ((0, 0), (reflect_len, reflect_len)), mode="reflect")
        if replicate_len > 0:
            audio = jnp.pad(audio, ((0, 0), (1, 1)), mode="edge")
    return audio


def linear_interpolate(features: jnp.ndarray, output_len: int) -> jnp.ndarray:
    """Length-wise linear resampling of (N, C, L) features to
    (N, C, output_len), matching ``F.interpolate(mode='linear',
    align_corners=False)`` (reference: utils/wav2vec2.py:57-63 and
    model.py:259-261).

    Source coordinate for output index i is ``(i + 0.5) * L/L_out - 0.5``
    clamped into ``[0, L-1]``; gather + lerp. The gather is tiny next to
    the conv/transformer work so XLA fuses it for free.
    """
    in_len = features.shape[-1]
    if output_len == in_len:
        return features
    scale = in_len / output_len
    # coordinate math in f64 (static shapes -> constant-folded at trace
    # time): f32 coords introduce ~1e-5 lerp-weight error vs torch
    coord_dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    src = (jnp.arange(output_len, dtype=coord_dt) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, float(in_len - 1))
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_len - 1)
    w = (src - i0.astype(coord_dt)).astype(features.dtype)
    f0 = features[..., i0]
    f1 = features[..., i1]
    return f0 + (f1 - f0) * w


def linear_interpolation_fps(features: jnp.ndarray, input_fps: int, output_fps: int, output_len=None) -> jnp.ndarray:
    """FPS-style wrapper over :func:`linear_interpolate`
    (reference: utils/wav2vec2.py:57-63 ``linear_interpolation``)."""
    if output_len is None:
        output_len = int(features.shape[2] / float(input_fps) * output_fps)
    return linear_interpolate(features, output_len)
