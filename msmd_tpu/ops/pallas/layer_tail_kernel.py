"""Fused decoder-layer TAIL Pallas kernel (throughput regime).

After the identity-band rewrite, everything in a decoder layer past the
self-attention einsums is row-local dense math for the MOTION rows
(cross-attention is a V-gather aligned row-for-row with the memory):

    so  = sa_pre @ Wso + bso
    x1  = LN1(x + so)
    x2  = LN2(x1 + V @ Wco + bco)
    out = LN3(x2 + FFN(x2))

glue_probe.py attribution shows the batch-48 step is HBM-bound on the
intermediates between these ops (so / x1 / co-out / x2 / FFN-hidden each
round-trip ~25-50 MB per layer). This kernel runs the whole motion-row
tail as ONE program per layer with every intermediate VMEM-resident:
per row tile the HBM traffic is read sa_pre + x + memory-V + write out,
with the weights fetched once across the grid. Because motion row
e*lm + i gathers exactly memory-V row e*lm + i (the width-1 band's
one-hot softmax), the kernel has NO entry structure at all — plain
row-tiled dense math, like ops/pallas/ffn_kernel.py but covering the
full tail. The person rows (one per entry) take the same algebra in
XLA — a handful of (Be, 1, F)-sized ops per layer — and are
concatenated back outside. Post-LN algebra matches
transformer.TransformerDecoderLayer (torch ``nn.TransformerDecoderLayer``,
reference model.py:874-885). Inference-only (dropout-free).

Measured results (v5e, batch 48, 500-step sampler):
- v1 (whole entries per tile, selector/loop assembly in-kernel): 56.0x
  — 1776-row tiles pipeline poorly, 32 unaligned slice-stores relayout.
- v2 (this file, row-pure motion tail + XLA person tail): 65.3x — the
  ~12 extra (Be, 1, F) person ops per layer plus the slice/concat
  outweigh the saved round-trips.
- XLA decoder + fused FFN+LN kernel (ops/pallas/ffn_kernel.py): 69.9x.
The tail kernel therefore stays OPT-IN (MSMD_FUSED_TAIL=1), kept as a
documented measured-negative with full equivalence tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from msmd_tpu.ops.pallas.decoder_kernel import _gelu, _layernorm
from msmd_tpu.ops.pallas.ffn_kernel import _pick_tile


def _tail_kernel(sa_ref, x_ref, v_ref, wso, bso, wco, bco, wf1, bf1, wf2, bf2,
                 ln_scale, ln_bias, out_ref):
    cdt = wso.dtype

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(cdt), w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    so = dot(sa_ref[:], wso[:]) + bso[:].astype(jnp.float32)
    x1 = _layernorm(x_ref[:].astype(jnp.float32) + so, ln_scale[0], ln_bias[0])
    co = dot(v_ref[:], wco[:]) + bco[:].astype(jnp.float32)
    x2 = _layernorm(x1 + co, ln_scale[1], ln_bias[1])
    h = _gelu(dot(x2, wf1[:]) + bf1[:].astype(jnp.float32))
    ff = dot(h, wf2[:]) + bf2[:].astype(jnp.float32)
    out_ref[:] = _layernorm(x2 + ff, ln_scale[2], ln_bias[2]).astype(out_ref.dtype)


def tail_rows_tile(rows: int, max_tile: int = 512) -> int:
    """Row tile for the tail kernel; 0 when only an oversized whole-array
    tile would work (caller falls back to the XLA path)."""
    t = _pick_tile(rows, target=max_tile)
    return t if t <= 2048 else 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_layer_tail(
    sa_m: jnp.ndarray,  # (Be, lm, F) motion rows of self-attn output, PRE out-proj
    x_m: jnp.ndarray,  # (Be, lm, F) motion rows of the layer input
    v_rows: jnp.ndarray,  # (Be*lm, F) memory V rows (identity-band gather source)
    wso, bso, wco, bco, wf1, bf1, wf2, bf2,  # layer weights (compute dtype)
    ln_scale: jnp.ndarray,  # (3, F) f32
    ln_bias: jnp.ndarray,  # (3, F) f32
    interpret: bool = False,
) -> jnp.ndarray:
    Be, lm, F = x_m.shape
    rows = Be * lm
    tile = tail_rows_tile(rows)
    assert tile, (Be, lm)
    FFN = wf1.shape[-1]

    tspec = pl.BlockSpec((tile, F), lambda i: (i, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    out = pl.pallas_call(
        _tail_kernel,
        grid=(rows // tile,),
        in_specs=[
            tspec, tspec, tspec,
            const(wso), pl.BlockSpec((1, F), lambda i: (0, 0)),
            const(wco), pl.BlockSpec((1, F), lambda i: (0, 0)),
            const(wf1), pl.BlockSpec((1, FFN), lambda i: (0, 0)),
            const(wf2), pl.BlockSpec((1, F), lambda i: (0, 0)),
            const(ln_scale), const(ln_bias),
        ],
        out_specs=tspec,
        out_shape=jax.ShapeDtypeStruct((rows, F), x_m.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        sa_m.reshape(rows, F), x_m.reshape(rows, F), v_rows,
        wso, bso.reshape(1, F), wco, bco.reshape(1, F),
        wf1, bf1.reshape(1, FFN), wf2, bf2.reshape(1, F),
        ln_scale, ln_bias,
    )
    return out.reshape(Be, lm, F)
