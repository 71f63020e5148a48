"""Fused transformer-decoder-stack Pallas kernel for the DDPM sampling
hot loop.

Motivation (measured, benchmarks/latency_probe.py on v5e): at batch 1
the 500-step sampler spends 95% of its time in the denoiser, at
~256 us/step for 8 layers — ~100 small XLA ops each costing ~2.5 us of
fixed per-op latency; neither MXU nor HBM is remotely saturated. The fix
is op-count reduction: this kernel runs the ENTIRE n_layer decoder stack
(self-attn -> cross-attn with cached memory K/V -> FFN, post-LN algebra
identical to msmd_tpu.models.transformer.TransformerDecoder and torch
``nn.TransformerDecoder``; reference model.py:874-885) as ONE Pallas
program:

- grid = (n_layers,): the activation block (R, F) lives in VMEM across
  all grid steps (constant index_map on the output); per-layer weights
  stream from HBM with Mosaic's automatic double-buffered pipelining, so
  layer l+1's weights load during layer l's compute.
- batch entries are flattened into the row dimension; batch isolation
  and the banded cross-attention alignment mask are enforced with
  precomputed additive masks (block-diagonal). This targets the
  low-latency small-batch regime (streaming/interactive inference);
  the large-batch throughput path keeps the XLA decoder.
- matmuls run in the pack dtype (bf16 in production) with f32
  accumulation; LayerNorm/softmax in f32.

Inference-only (dropout-free), exactly like the sampling path.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KVCache = Tuple[jnp.ndarray, jnp.ndarray]

NEG = -1e30  # additive mask value (matches finfo(f32).min semantics)


# ---------------------------------------------------------------------------
# packing helpers (run OUTSIDE the sampling scan, once per program)
# ---------------------------------------------------------------------------

def pack_decoder_weights(tparams: dict, n_layers: int, dtype=jnp.bfloat16) -> dict:
    """Stack the per-layer TransformerDecoder params
    (params['denoising_net']['transformer']) into per-array (L, ...)
    stacks for layer-streamed BlockSpecs."""

    def stack(path_fn):
        return jnp.stack([jnp.asarray(path_fn(tparams[f"layers_{i}"])) for i in range(n_layers)])

    def cat_qkv(layer):
        a = layer["self_attn"]
        return jnp.concatenate(
            [jnp.asarray(a[n]["kernel"]) for n in ("q_proj", "k_proj", "v_proj")], axis=1
        )

    def cat_qkv_b(layer):
        a = layer["self_attn"]
        return jnp.concatenate([jnp.asarray(a[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")])

    pack = {
        "wqkv": stack(cat_qkv),
        "bqkv": stack(cat_qkv_b)[:, None, :],
        "wso": stack(lambda l: l["self_attn"]["out_proj"]["kernel"]),
        "bso": stack(lambda l: l["self_attn"]["out_proj"]["bias"])[:, None, :],
        "wcq": stack(lambda l: l["cross_attn"]["q_proj"]["kernel"]),
        "bcq": stack(lambda l: l["cross_attn"]["q_proj"]["bias"])[:, None, :],
        "wco": stack(lambda l: l["cross_attn"]["out_proj"]["kernel"]),
        "bco": stack(lambda l: l["cross_attn"]["out_proj"]["bias"])[:, None, :],
        "wf1": stack(lambda l: l["ffn"]["linear1"]["kernel"]),
        "bf1": stack(lambda l: l["ffn"]["linear1"]["bias"])[:, None, :],
        "wf2": stack(lambda l: l["ffn"]["linear2"]["kernel"]),
        "bf2": stack(lambda l: l["ffn"]["linear2"]["bias"])[:, None, :],
        "ln_scale": stack(lambda l: jnp.stack([jnp.asarray(l[n]["scale"]) for n in ("norm1", "norm2", "norm3")])),
        "ln_bias": stack(lambda l: jnp.stack([jnp.asarray(l[n]["bias"]) for n in ("norm1", "norm2", "norm3")])),
    }
    out = {}
    for k, v in pack.items():
        out[k] = v.astype(jnp.float32 if k.startswith("ln") else dtype)
    return out


def pack_memory_kv(memory_kv: List[KVCache], dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer [(k, v)] with k/v (B, Lm, H, Dh) -> (L, B*Lm, H*Dh),
    batch-major rows, head-contiguous columns."""
    ks, vs = [], []
    for k, v in memory_kv:
        B, Lm, H, Dh = k.shape
        ks.append(k.reshape(B * Lm, H * Dh))
        vs.append(v.reshape(B * Lm, H * Dh))
    return jnp.stack(ks).astype(dtype), jnp.stack(vs).astype(dtype)


def build_masks(batch: int, lq: int, lm: int, alignment_bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Additive f32 masks over the flattened row layout:
    self: (B*lq, B*lq) block-diagonal (batch isolation);
    cross: (B*lq, B*lm) block-diagonal AND the banded alignment mask
    (torch bool convention: True = disallowed)."""
    eye = np.eye(batch, dtype=np.float32)
    self_block = np.kron(eye, np.ones((lq, lq), np.float32))
    self_mask = jnp.asarray((1.0 - self_block) * NEG)
    cross_block = np.kron(eye, np.ones((lq, lm), np.float32))
    cross_mask = jnp.asarray((1.0 - cross_block) * NEG)
    if alignment_bool is not None:
        # alignment_bool may be a traced jnp array (built inside jit).
        # Tiling it over ALL blocks is equivalent to block-diagonal
        # placement: off-diagonal blocks are already at NEG, and
        # NEG + NEG is still an effective -inf for the f32 softmax.
        align = jnp.where(jnp.asarray(alignment_bool), jnp.float32(NEG), jnp.float32(0.0))
        cross_mask = cross_mask + jnp.tile(align, (batch, batch))
    return self_mask, cross_mask


def build_identity_band_aux(batch: int, lq: int, lm: int, dtype=jnp.bfloat16):
    """Auxiliary arrays for the width-1 alignment band (identity-band)
    cross-attention inside the kernel (see ``_decoder_kernel``):

    - ``person_mask``  (B, B*lm) f32 additive: person row of entry e may
      attend only its own entry's memory block.
    - ``sel_pq``  (B, B*lq): one-hot selector extracting the person rows
      from the flattened activations (row e*lq) via a tiny matmul.
    - ``sel_ps``  (B*lq, B): scatters person attention outputs back to
      rows e*lq.
    - ``sel_vm``  (B*lq, B*lm): scatters memory-V rows to the motion rows
      (row e*lq + 1 + i <- memory row e*lm + i) — the exact one-hot
      softmax result of the width-1 band, realized as a single matmul
      instead of per-head QK/softmax/PV.
    """
    eye = np.eye(batch, dtype=np.float32)
    person_mask = jnp.asarray((1.0 - np.kron(eye, np.ones((1, lm), np.float32))) * NEG)
    sel_pq = np.zeros((batch, batch * lq), np.float32)
    sel_ps = np.zeros((batch * lq, batch), np.float32)
    sel_vm = np.zeros((batch * lq, batch * lm), np.float32)
    for e in range(batch):
        sel_pq[e, e * lq] = 1.0
        sel_ps[e * lq, e] = 1.0
        for i in range(lm):
            sel_vm[e * lq + 1 + i, e * lm + i] = 1.0
    return person_mask, jnp.asarray(sel_pq, dtype), jnp.asarray(sel_ps, dtype), jnp.asarray(sel_vm, dtype)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _layernorm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| <= 1.5e-7
    (f32-exact for practical purposes). Mosaic has no erf primitive; this
    uses only mul/add/exp, all supported on the VPU."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # erf-based GELU, matching torch / flax approximate=False to ~1e-7
    return x * 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _decoder_kernel(*refs, n_heads: int, identity_band: bool):
    if identity_band:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, self_mask, person_mask, sel_pq, sel_ps, sel_vm,
         x_out) = refs
    else:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, self_mask, cross_mask, x_out) = refs
    # grid = (n_tiles, layers): tile OUTER so the output block (indexed by
    # tile) is revisited on consecutive grid steps only — Pallas TPU
    # forbids non-consecutive output revisits (stale-VMEM hazard)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        x_out[:] = x_in[:]  # load this tile's input at its first layer

    F = x_in.shape[-1]
    dh = F // n_heads
    scale = 1.0 / np.sqrt(dh)
    x = x_out[:]  # (R, F) f32, resident across layers
    cdt = wqkv.dtype

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cdt), b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a.astype(cdt), b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    # ---- self-attention ------------------------------------------------
    qkv = dot(x, wqkv[0]) + bqkv[0].astype(jnp.float32)  # (R, 3F)
    heads = []
    for h in range(n_heads):
        q = qkv[:, h * dh : (h + 1) * dh] * scale
        k = qkv[:, F + h * dh : F + (h + 1) * dh]
        v = qkv[:, 2 * F + h * dh : 2 * F + (h + 1) * dh]
        s = dot_t(q, k.astype(cdt)) + self_mask[:]
        p = jax.nn.softmax(s, axis=-1)
        heads.append(dot(p, v.astype(cdt)))
    sa = jnp.concatenate(heads, axis=-1)
    sa = dot(sa, wso[0]) + bso[0].astype(jnp.float32)
    x = _layernorm(x + sa, ln_scale[0, 0], ln_bias[0, 0])

    # ---- cross-attention (cached memory K/V) ---------------------------
    km, vm = kmem[0], vmem[0]  # (M, F) in pack dtype
    if identity_band:
        # width-1 alignment band (the MSMD default): every motion row's
        # masked softmax is exactly a one-hot over memory token i, so its
        # output is vm[i] — realized as the one-hot selector matmul
        # sel_vm @ vm. Only the T person rows (one per tile entry) compute
        # real attention over their entry's memory block.
        xp = dot(sel_pq[:], x.astype(cdt))  # (T, F) person activations
        qp = dot(xp, wcq[0]) + bcq[0].astype(jnp.float32)
        heads = []
        for h in range(n_heads):
            q = qp[:, h * dh : (h + 1) * dh] * scale
            s = dot_t(q, km[:, h * dh : (h + 1) * dh]) + person_mask[:]
            p = jax.nn.softmax(s, axis=-1)
            heads.append(dot(p, vm[:, h * dh : (h + 1) * dh]))
        person_out = jnp.concatenate(heads, axis=-1)  # (T, F)
        ca = dot(sel_ps[:], person_out.astype(cdt)) + dot(sel_vm[:], vm)
    else:
        qc = dot(x, wcq[0]) + bcq[0].astype(jnp.float32)  # (R, F)
        heads = []
        for h in range(n_heads):
            q = qc[:, h * dh : (h + 1) * dh] * scale
            s = dot_t(q, km[:, h * dh : (h + 1) * dh]) + cross_mask[:]
            p = jax.nn.softmax(s, axis=-1)
            heads.append(dot(p, vm[:, h * dh : (h + 1) * dh]))
        ca = jnp.concatenate(heads, axis=-1)
    ca = dot(ca, wco[0]) + bco[0].astype(jnp.float32)
    x = _layernorm(x + ca, ln_scale[0, 1], ln_bias[0, 1])

    # ---- FFN -----------------------------------------------------------
    h1 = _gelu(dot(x, wf1[0]) + bf1[0].astype(jnp.float32))
    ff = dot(h1, wf2[0]) + bf2[0].astype(jnp.float32)
    x = _layernorm(x + ff, ln_scale[0, 2], ln_bias[0, 2])

    x_out[:] = x


@functools.partial(jax.jit, static_argnames=("n_heads", "tile_entries", "interpret"))
def fused_decoder_forward(
    pack: dict,
    kmem: jnp.ndarray,  # (L, B*Lm, F) batch-major rows
    vmem: jnp.ndarray,  # (L, B*Lm, F)
    x: jnp.ndarray,  # (B, Lq, F) any float dtype
    self_mask: jnp.ndarray,  # (T*Lq, T*Lq) f32 additive, T = tile_entries
    cross_mask: jnp.ndarray,  # (T*Lq, T*Lm) f32 additive — OR, in
    # identity-band mode, the 4-tuple from build_identity_band_aux
    # (person_mask (T, T*Lm), sel_pq (T, T*Lq), sel_ps (T*Lq, T),
    # sel_vm (T*Lq, T*Lm)); mode is selected by the tuple structure
    n_heads: int,
    tile_entries: int = 0,  # batch entries per row tile; 0 = all of B
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the full decoder stack; returns (B, Lq, F) float32.

    Row tiling (``tile_entries``) generalizes the kernel beyond the
    latency regime (one tile holding the whole flattened batch):
    grid = (row_tiles, layers), each tile holding ``tile_entries`` whole
    batch entries so attention stays local to the tile. The tile is the
    OUTER grid dimension so each output block's revisits are
    consecutive (a Pallas TPU requirement); the price is that weights
    re-stream once per tile, which is why the multi-tile mode loses to
    the XLA decoder at large batch (see BENCH.md) and is opt-in only."""
    B, Lq, F = x.shape
    L = pack["wqkv"].shape[0]
    Mtot = kmem.shape[1]
    Lm = Mtot // B
    T = tile_entries or B
    assert B % T == 0, (B, T)
    n_tiles = B // T
    Rt, Mt = T * Lq, T * Lm
    identity_band = isinstance(cross_mask, (tuple, list))
    assert self_mask.shape == (Rt, Rt), (self_mask.shape, Rt)
    if identity_band:
        person_mask, sel_pq, sel_ps, sel_vm = cross_mask
        assert Lq == Lm + 1, (Lq, Lm)
        assert person_mask.shape == (T, Mt), (person_mask.shape, T, Mt)
        cross_inputs = [person_mask, sel_pq, sel_ps, sel_vm]
    else:
        assert cross_mask.shape == (Rt, Mt), (cross_mask.shape, Rt, Mt)
        cross_inputs = [cross_mask]
    x_flat = x.reshape(B * Lq, F).astype(jnp.float32)

    spec = lambda *blk: pl.BlockSpec(blk, lambda t, l: (l,) + (0,) * (len(blk) - 1))
    # kv stored (L*n_tiles, Mt, F); block index = layer * n_tiles + tile
    kv_spec = lambda: pl.BlockSpec((1, Mt, F), lambda t, l: (l * n_tiles + t, 0, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda t, l: (0,) * a.ndim)

    in_specs = [
        pl.BlockSpec((Rt, F), lambda t, l: (t, 0)),
        spec(1, F, 3 * F), spec(1, 1, 3 * F),
        spec(1, F, F), spec(1, 1, F),
        spec(1, F, F), spec(1, 1, F),
        spec(1, F, F), spec(1, 1, F),
        spec(1, F, pack["wf1"].shape[-1]), spec(1, 1, pack["wf1"].shape[-1]),
        spec(1, pack["wf2"].shape[1], F), spec(1, 1, F),
        spec(1, 3, F), spec(1, 3, F),
        kv_spec(), kv_spec(),
        const(self_mask),
    ] + [const(a) for a in cross_inputs]
    out = pl.pallas_call(
        functools.partial(_decoder_kernel, n_heads=n_heads, identity_band=identity_band),
        grid=(n_tiles, L),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((Rt, F), lambda t, l: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Lq, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x_flat,
        pack["wqkv"], pack["bqkv"], pack["wso"], pack["bso"],
        pack["wcq"], pack["bcq"], pack["wco"], pack["bco"],
        pack["wf1"], pack["bf1"], pack["wf2"], pack["bf2"],
        pack["ln_scale"], pack["ln_bias"],
        kmem.reshape(L * n_tiles, Mt, F), vmem.reshape(L * n_tiles, Mt, F),
        self_mask, *cross_inputs,
    )
    return out.reshape(B, Lq, F)
