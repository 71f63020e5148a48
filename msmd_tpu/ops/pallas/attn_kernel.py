"""Per-entry self-attention MIDDLE as one Pallas kernel (throughput
regime).

Hybrid design point between the XLA decoder and the full-stack fused
kernel: XLA's big matmuls (qkv/out-proj/FFN) run at MXU peak as batched
einsums (measured 214 TFLOP/s, BENCH.md), so this kernel replaces ONLY
the attention middle — scores, softmax, P@V — whose f32 score tensors
are the largest remaining HBM round-trip of the batch-48 step
(~(Be*H, lq, lq) written + read twice per layer). Inside the kernel
each batch entry's attention runs as its own small (lq, lq) 2D dot —
no flattened block-diagonal waste; measured faster than both the flat
kernel and XLA's einsums at production shapes
(benchmarks/attn_probe.py; Mosaic's rank-3 batched dot does not lower).

HBM traffic per layer: read q,k,v (3 x (rows, F) bf16) + write out
(rows, F) — the score tensors never leave VMEM.

Deterministic-mode only (no attention dropout), like every serving-path
kernel. Reference semantics: the self-attention of
``nn.TransformerDecoderLayer`` (model.py:874-885) with no target mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_mid_kernel(q_ref, k_ref, v_ref, out_ref, *, n_heads: int, entries: int):
    T = entries
    F = q_ref.shape[-1]
    dh = F // n_heads
    lq = q_ref.shape[0] // T
    scale = 1.0 / np.sqrt(dh)
    cdt = q_ref.dtype

    ent_out = []
    for e in range(T):
        q = q_ref[e * lq : (e + 1) * lq]
        k = k_ref[e * lq : (e + 1) * lq]
        v = v_ref[e * lq : (e + 1) * lq]
        heads = []
        for h in range(n_heads):
            qh = q[:, h * dh : (h + 1) * dh].astype(jnp.float32) * scale
            s = jax.lax.dot_general(
                qh.astype(cdt), k[:, h * dh : (h + 1) * dh],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            p = jax.nn.softmax(s, axis=-1)
            heads.append(
                jax.lax.dot_general(
                    p.astype(cdt), v[:, h * dh : (h + 1) * dh],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
            )
        ent_out.append(jnp.concatenate(heads, axis=-1))
    out_ref[:] = jnp.concatenate(ent_out, axis=0).astype(out_ref.dtype)


def _pick_tile(B: int, lq: int, cap: int = 8):
    """Largest tile T <= cap with T | B and 8 | T*lq (the Mosaic sublane
    constraint on the row-block height). None if no tile qualifies."""
    for T in range(min(cap, B), 0, -1):
        if B % T == 0 and (T * lq) % 8 == 0:
            return T
    return None


def attn_middle_viable(B: int, lq: int, F: int, n_heads: int) -> bool:
    """Trace-time guard for the MSMD_ATTN_KERNEL=1 hybrid path (ADVICE
    r3): the kernel was probed at the decoder geometry only; shapes
    whose rows cannot form an 8-aligned tile (or whose head dim is not
    sublane-aligned) hit Mosaic tiling failures. Callers must fall back
    to the XLA einsum path when this returns False."""
    return (
        F % n_heads == 0
        and (F // n_heads) % 8 == 0
        and _pick_tile(B, lq) is not None
    )


@functools.partial(jax.jit, static_argnames=("n_heads", "tile_entries", "interpret"))
def attention_middle(
    q: jnp.ndarray,  # (B, lq, F)
    k: jnp.ndarray,  # (B, lq, F)
    v: jnp.ndarray,  # (B, lq, F)
    n_heads: int,
    tile_entries: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q kᵀ/√dh) v per entry and head; returns (B, lq, F) in the
    input dtype. No masks: full bidirectional self-attention within each
    batch entry (batch isolation is structural)."""
    B, lq, F = q.shape
    if interpret:
        # the CPU interpreter has no sublane constraint: any divisor tile
        T = next(d for d in range(min(tile_entries, B), 0, -1) if B % d == 0)
    else:
        T = _pick_tile(B, lq, cap=tile_entries)
        if T is None:
            raise ValueError(
                f"attention_middle: no 8-aligned row tile for B={B}, lq={lq} "
                "(gate calls with attn_middle_viable)"
            )
    n_tiles = B // T
    qf = q.reshape(B * lq, F)
    kf = k.reshape(B * lq, F)
    vf = v.reshape(B * lq, F)
    spec = pl.BlockSpec((T * lq, F), lambda i: (i, 0))
    out = pl.pallas_call(
        functools.partial(_attn_mid_kernel, n_heads=n_heads, entries=T),
        grid=(n_tiles,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * lq, F), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, lq, F)
