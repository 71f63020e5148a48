"""Fused FFN + residual + LayerNorm Pallas kernel (throughput regime).

Measured motivation (benchmarks/glue_probe.py, v5e, batch-48 production
shapes): the decoder step is HBM-bound on unfused intermediates, and the
largest single item is the FFN hidden state — (Be*R, 4F) bf16 is ~50 MB
per layer that XLA must write after the first matmul and re-read for the
second (matmuls cannot fuse through). This kernel runs

    out = LayerNorm(x + (gelu(x @ wf1 + bf1) @ wf2 + bf2))

as ONE Pallas program with the hidden state resident in VMEM: per row
tile, HBM traffic is read-x + write-out only; the weights are fetched
once across the whole grid (constant index maps). Post-LN algebra and
erf-GELU match msmd_tpu.models.transformer.FeedForward + LayerNorm
(torch ``nn.TransformerDecoderLayer`` FFN block, reference
model.py:874-885). Inference-only (dropout-free), like the sampling path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msmd_tpu.ops.pallas.decoder_kernel import _gelu, _layernorm


def _ffn_kernel(x_ref, wf1, bf1, wf2, bf2, g, b, out_ref):
    cdt = wf1.dtype
    x = x_ref[:]  # (T, F) in compute dtype

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    h = _gelu(dot(x, wf1[:]) + bf1[:].astype(jnp.float32), cdt)  # (T, 4F) f32, VMEM-resident
    y = dot(h, wf2[:]) + bf2[:].astype(jnp.float32)
    out = _layernorm(x.astype(jnp.float32) + y, g[:], b[:])
    out_ref[:] = out.astype(out_ref.dtype)


def _pick_tile(rows: int, target: int = 512) -> int:
    """Largest row-tile <= target that divides ``rows`` and satisfies the
    Pallas TPU sublane tiling for every supported dtype (multiple of 16:
    bf16 needs (16, 128) tiles — 8 only suffices for f32), falling back
    to the whole array (always legal) when no such divisor exists."""
    if rows <= target:
        return rows
    best = 0
    for d in range(16, target + 1, 16):
        if rows % d == 0:
            best = d
    return best or rows


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_ffn_ln(
    x: jnp.ndarray,  # (..., F) activations (compute dtype)
    wf1: jnp.ndarray,  # (F, FFN)
    bf1: jnp.ndarray,  # (FFN,)
    wf2: jnp.ndarray,  # (FFN, F)
    bf2: jnp.ndarray,  # (F,)
    ln_scale: jnp.ndarray,  # (F,)
    ln_bias: jnp.ndarray,  # (F,)
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm(x + FFN(x)) with the FFN hidden state kept in VMEM."""
    orig_shape = x.shape
    F = orig_shape[-1]
    FFN = wf1.shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    xf = x.reshape(rows, F)
    tile = _pick_tile(rows)
    # VMEM guard: h tile (tile, FFN) f32 + weights; fall back to XLA-sized
    # tiles only via _pick_tile; the caller gates batch sizes.
    grid = (rows // tile,)
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    out = pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, F), lambda i: (i, 0)),
            const(wf1), const(bf1.reshape(1, FFN)),
            const(wf2), const(bf2.reshape(1, F)),
            const(ln_scale.reshape(1, F)), const(ln_bias.reshape(1, F)),
        ],
        out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, F), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        xf,
        wf1, bf1.reshape(1, FFN), wf2, bf2.reshape(1, F),
        ln_scale.astype(jnp.float32).reshape(1, F), ln_bias.astype(jnp.float32).reshape(1, F),
    )
    return out.reshape(orig_shape)
