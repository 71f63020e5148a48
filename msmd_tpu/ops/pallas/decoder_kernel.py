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
import os
from typing import List, Optional, Tuple

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

_MASK_FLOOR = -1e29  # scores below this are structural masks (-1e30)


def _clamp_unmasked(s, lo, hi):
    """Clamp real logits into [lo, hi] while leaving masked scores
    (-1e30) untouched so their exp stays exactly 0. Guards the
    no-max-subtraction softmax forms against checkpoint-dependent
    extremes: a row whose real logits all sit below the f32-exp
    underflow point would otherwise produce a zero row-sum and a silent
    inf/NaN from the reciprocal, and logits above ~88 would overflow.
    With the clamp, an all-underflow row degrades gracefully to the
    mathematically correct limit (uniform over unmasked entries).
    Elementwise compare+select only — no reduce is reintroduced."""
    return jnp.where(s > _MASK_FLOOR, jnp.clip(s, lo, hi), s)


def _softmax_fast(s, axis=-1):
    """Softmax without the max-subtraction pass (saves one reduce +
    broadcast-subtract over the score elements per call). Real logits
    are clamped to [-80, 60] (see _clamp_unmasked) so arbitrary trained
    checkpoints can neither underflow a whole row to 0 nor overflow
    f32 exp. Reached only by MSMD_FAST_SOFTMAX=1 here; the production
    fast path (auto-on for bf16 packs, with a fixed -20 shift) lives in
    _attn_pv. exp(-1e30 mask) == 0 exactly, so masking is unchanged."""
    e = jnp.exp(_clamp_unmasked(s, -80.0, 60.0))
    return e / jnp.sum(e, axis=axis, keepdims=True)


def _softmax_dispatch(s, axis=-1):
    # NOTE: deliberately NOT _fast_softmax_active — this row-softmax
    # fallback has no matmul-dtype context (cdt), so only an explicit
    # "1" selects the no-max-subtraction form; "auto" stays safe here.
    # The auto-on-bf16 fast path is the restructured one in _attn_pv.
    if os.environ.get("MSMD_FAST_SOFTMAX", "0") == "1":
        return _softmax_fast(s, axis=axis)
    return jax.nn.softmax(s, axis=axis)


_softmax = _softmax_dispatch  # module-level indirection (probe ablation)


def _fast_softmax_active(cdt):
    """Trace-time: is the reduce-free fast softmax (see _attn_pv) the
    selected implementation for matmul dtype ``cdt``?"""
    impl = os.environ.get("MSMD_FAST_SOFTMAX", "auto")
    return impl == "1" or (impl == "auto" and cdt == jnp.bfloat16)


def _attn_pv(s, v, dot, cdt=None):
    """softmax(s) @ v with the normalization placed where it is cheapest.

    Fast mode restructures exp->normalize->matmul as exp->matmul->scale:
    the divide moves from the (lq, lkv) score matrix to the (lq, dh)
    output (dh < lkv in every call site), and the data-dependent
    max-subtraction REDUCE pass is replaced by a fixed logit shift of
    -20 (one broadcast-subtract, no reduce), with real logits clamped
    into a safe band (ADVICE r3): shifted logits below -80 would
    underflow every exp in a row to 0 (reciprocal of the zero row-sum
    -> silent inf/NaN) for checkpoints whose logits all sit below
    ~-60, and logits above ~108 would overflow. _clamp_unmasked keeps
    masked scores (-1e30) exp'ing to exactly 0 while clamped
    all-underflow rows degrade to the correct uniform-attention limit.
    The shift cancels exactly in the normalization.
    Measured +1.6x RTF at batch 48 on v5e (BENCH.md r3).

    MSMD_FAST_SOFTMAX: "auto" (default) = fast iff the matmul dtype is
    bf16 (the TPU production path, which is tolerance- not bit-equal to
    the reference anyway); "1" forces fast, "0" forces the safe
    max-subtracting softmax (bit-comparable to jax.nn.softmax).
    """
    if _fast_softmax_active(cdt) and _softmax is _softmax_dispatch:
        e = jnp.exp(_clamp_unmasked(s - jnp.float32(20.0), -80.0, 60.0))
        o = dot(e, v)
        return o * jax.lax.reciprocal(jnp.sum(e, axis=-1, keepdims=True))
    p = _softmax(s, axis=-1)
    return dot(p, v)


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


def _gelu_tanh(x):
    """tanh-approximation GELU (the torch approximate='tanh' formula).
    |err| <= 3e-4 abs vs exact — inside bf16 resolution of the values it
    feeds (the FFN hidden state is cast to bf16 for the next matmul).
    ~2x fewer VPU ops than the erf path: no divide, no sign/abs, 4-op
    polynomial + one tanh vs 12-op rational poly + exp + reciprocal."""
    c = np.float32(np.sqrt(2.0 / np.pi))
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + np.float32(0.044715) * x * x * x)))


def _gelu(x, cdt=None):
    """GELU with a dtype-aware implementation choice (trace-time; every
    Pallas kernel in this module routes through here).

    MSMD_GELU: "auto" (default) = tanh approximation iff the matmul
    dtype ``cdt`` is bf16 — the approximation error (3e-4 abs) is below
    the bf16 rounding the hidden state immediately suffers at the next
    matmul, and the tanh path measured +5.5x RTF at batch 48 on v5e
    (BENCH.md r3: the erf rational poly costs a VPU divide + exp per
    element). "tanh"/"erf" force either implementation; erf matches
    torch / flax approximate=False to ~1e-7."""
    impl = os.environ.get("MSMD_GELU", "auto")
    if impl == "tanh" or (impl == "auto" and cdt == jnp.bfloat16):
        return _gelu_tanh(x)
    return x * 0.5 * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _layer_compute(
    x, *, n_heads, per_entry, identity_band,
    wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
    ln_scale, ln_bias, km, vm,
    self_mask=None, cross_mask=None, person_mask=None, sel_pq=None,
    sel_ps=None, sel_vm=None, key_mask=None, vmw=None,
    head_mask=None, concat_sel=False, merged_person=False,
):
    """One decoder layer on already-loaded arrays (shared by the
    tile-outer kernel, the layer-outer resident kernel and the
    whole-scan kernel). ``x`` is (R, F) f32; returns the new (R, F) f32
    activations. ``per_entry`` > 0 = entry count for per-entry
    self-attention (requires identity_band). ``key_mask`` (1, lq) f32
    additive, per-entry mode only: masks sublane-padding rows out of the
    self-attention keys (their query outputs are discarded upstream).

    ``vmw`` (R, F): the PRECOMPUTED, PROJECTED identity-band V-gather
    ``(sel_vm @ vm) @ wco``. Both factors are step-invariant (memory V
    is cached once per window), so the whole hot loop hoists them. The
    rewrite is row-exact: sel_ps scatters to person rows only and
    sel_vm to motion rows only (disjoint supports), so distributing wco
    over the two terms changes no row's arithmetic — and it removes the
    (R, Mt) gather matmul AND shrinks the (R, F) wco projection to the
    T person rows, per layer per step.

    ``head_mask`` (n_heads*lq, F) 0/1 in the matmul dtype enables
    MERGED-HEAD attention (latency regime): all heads' scores come from
    ONE (lq, H*lq) dot against a block-masked vertically-tiled K, the
    PV pass is ONE dot against the same-masked tiled V (output column
    block h = head h, i.e. the head concat falls out for free), and the
    per-head normalization is ONE dot of exp-scores against head_mask
    (the expanded per-block row sums). Exact same fast-softmax algebra
    per head — the mask zeros are exact, only f32-accumulation pairing
    differs; requires the fast softmax (per-block normalization can't
    ride a plain row softmax). Trades ~4x MXU MAC waste on the tiny
    per-entry score matrices for ~14 fewer serialized dot issues per
    entry per layer — a win only where op-issue latency dominates
    (batch-1 whole-scan kernel; measured, BENCH.md).

    ``concat_sel``: replace the one-hot selector matmuls (sel_pq person
    gather, sel_ps person scatter) with row slices / concats — exact
    (and skips the bf16 round-trip the selector dots impose); requires
    per_entry mode and ``vmw`` (the scatter-free cross build).

    ``per_entry`` + ``self_mask``: BLOCK-DIAGONAL self-attention over
    the flattened (E*lq, E*lq) scores while keeping the per-entry
    identity-band cross path. At E=2 (batch-1 CFG after dead-entry
    elimination) this halves the self-attention dot issues per layer
    (2 per head instead of 4) for only ~2x MAC waste on the tiny score
    blocks — the latency-regime tradeoff, far milder than merged-heads
    (no K/V copies). Exact: the mask's -1e30 entries exp to exactly 0,
    so the cross-entry PV contributions are exact zeros.

    ``merged_person``: merged-head PERSON cross-attention only (same
    algebra as the head_mask path's person branch, independent of the
    self-attention form). The person score matrices are tiny ((T, Mt)
    per head), so merging their 2*n_heads serialized dots into 2 costs
    almost no MAC waste even in the throughput regime — unlike merged
    SELF attention, whose (lq, H*lq) score waste only pays off at
    batch 1. Requires the fast softmax (auto-disabled otherwise)."""
    F = x.shape[-1]
    dh = F // n_heads
    scale = 1.0 / np.sqrt(dh)
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
    qkv = dot(x, wqkv) + bqkv.astype(jnp.float32)  # (R, 3F)
    if per_entry and self_mask is None:
        lq = x.shape[0] // per_entry
        merged = head_mask is not None and _fast_softmax_active(cdt)
        entries = []
        for e in range(per_entry):
            rows = qkv[e * lq : (e + 1) * lq]
            if merged:
                q = rows[:, :F] * scale
                kbd = jnp.concatenate([rows[:, F : 2 * F].astype(cdt)] * n_heads, 0) * head_mask
                vbd = jnp.concatenate([rows[:, 2 * F :].astype(cdt)] * n_heads, 0) * head_mask
                s = dot_t(q, kbd)  # (lq, H*lq): column block h = head h scores
                if key_mask is not None:
                    s = s + jnp.tile(key_mask, (1, n_heads))
                e_ = jnp.exp(_clamp_unmasked(s - jnp.float32(20.0), -80.0, 60.0))
                out_un = dot(e_, vbd)  # (lq, F): col block h = head h PV
                denom = dot(e_, head_mask)  # (lq, F): per-block row sums, expanded
                entries.append(out_un * jax.lax.reciprocal(denom))
            else:
                heads = []
                for h in range(n_heads):
                    q = rows[:, h * dh : (h + 1) * dh] * scale
                    k = rows[:, F + h * dh : F + (h + 1) * dh]
                    v = rows[:, 2 * F + h * dh : 2 * F + (h + 1) * dh]
                    s = dot_t(q, k.astype(cdt))
                    if key_mask is not None:
                        s = s + key_mask
                    heads.append(_attn_pv(s, v.astype(cdt), dot, cdt))
                entries.append(jnp.concatenate(heads, axis=-1))
        sa = jnp.concatenate(entries, axis=0)
    else:
        heads = []
        for h in range(n_heads):
            q = qkv[:, h * dh : (h + 1) * dh] * scale
            k = qkv[:, F + h * dh : F + (h + 1) * dh]
            v = qkv[:, 2 * F + h * dh : 2 * F + (h + 1) * dh]
            s = dot_t(q, k.astype(cdt)) + self_mask
            heads.append(_attn_pv(s, v.astype(cdt), dot, cdt))
        sa = jnp.concatenate(heads, axis=-1)
    sa = dot(sa, wso) + bso.astype(jnp.float32)
    x = _layernorm(x + sa, ln_scale[0], ln_bias[0])

    # ---- cross-attention (cached memory K/V) ---------------------------
    if identity_band:
        # width-1 alignment band (the MSMD default): every motion row's
        # masked softmax is exactly a one-hot over memory token i, so its
        # output is vm[i] — realized as the one-hot selector matmul
        # sel_vm @ vm. Only the person rows compute real attention.
        T_p = person_mask.shape[0]
        if concat_sel:
            lq_ = x.shape[0] // per_entry
            xp = jnp.concatenate(
                [x[e * lq_ : e * lq_ + 1] for e in range(per_entry)], 0
            )  # (T, F) person activations, f32 (no selector-dot round-trip)
        else:
            xp = dot(sel_pq, x.astype(cdt))  # (T, F) person activations
        qp = dot(xp, wcq) + bcq.astype(jnp.float32)
        if merged_person and _fast_softmax_active(cdt):
            # merged-head person cross-attention: ONE score dot for all
            # heads via a block-masked head-major stack of the queries
            # (row h*T+e = entry e's head-h query), ONE full PV dot with
            # the invalid column blocks masked after, per-row (= per
            # head) fast-softmax normalization, then collapse the head
            # axis by summing the H disjoint-support row groups.
            rr = jax.lax.broadcasted_iota(jnp.int32, (n_heads * T_p, F), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (n_heads * T_p, F), 1)
            qmask = ((rr // T_p) == (cc // dh)).astype(cdt)
            q_bd = jnp.concatenate([(qp * scale).astype(cdt)] * n_heads, 0) * qmask
            s = dot_t(q_bd, km) + jnp.tile(person_mask, (n_heads, 1))  # (H*T, Mt)
            e_ = jnp.exp(_clamp_unmasked(s - jnp.float32(20.0), -80.0, 60.0))
            pv = dot(e_, vm) * qmask.astype(jnp.float32)  # (H*T, F), head-h cols only
            out_n = pv * jax.lax.reciprocal(jnp.sum(e_, axis=-1, keepdims=True))
            person_out = out_n[:T_p]
            for h in range(1, n_heads):
                person_out = person_out + out_n[h * T_p : (h + 1) * T_p]
        else:
            heads = []
            for h in range(n_heads):
                q = qp[:, h * dh : (h + 1) * dh] * scale
                s = dot_t(q, km[:, h * dh : (h + 1) * dh]) + person_mask
                heads.append(_attn_pv(s, vm[:, h * dh : (h + 1) * dh], dot, cdt))
            person_out = jnp.concatenate(heads, axis=-1)  # (T, F)
        if concat_sel:
            # slice/concat build of the cross output: person rows carry
            # the projected person attention (the vmw row there is 0 by
            # construction), motion rows the hoisted projected V-gather
            po = dot(person_out, wco)  # (T, F)
            vmw_f = vmw.astype(jnp.float32)
            lq_ = x.shape[0] // per_entry
            blocks = []
            for e in range(per_entry):
                blocks.append(po[e : e + 1] + vmw_f[e * lq_ : e * lq_ + 1])
                blocks.append(vmw_f[e * lq_ + 1 : (e + 1) * lq_])
            ca = jnp.concatenate(blocks, 0) + bco.astype(jnp.float32)
        elif vmw is not None:
            # hoisted projected gather: project the T person rows FIRST
            # (tiny matmul), scatter, and add the precomputed motion-row
            # block — row-exact vs the else-branch (disjoint supports)
            po = dot(person_out, wco)  # (T, F)
            ca = dot(sel_ps, po.astype(cdt)) + vmw.astype(jnp.float32)
            ca = ca + bco.astype(jnp.float32)
        else:
            ca = dot(sel_ps, person_out.astype(cdt)) + dot(sel_vm, vm)
            ca = dot(ca, wco) + bco.astype(jnp.float32)
    else:
        qc = dot(x, wcq) + bcq.astype(jnp.float32)  # (R, F)
        heads = []
        for h in range(n_heads):
            q = qc[:, h * dh : (h + 1) * dh] * scale
            s = dot_t(q, km[:, h * dh : (h + 1) * dh]) + cross_mask
            heads.append(_attn_pv(s, vm[:, h * dh : (h + 1) * dh], dot, cdt))
        ca = jnp.concatenate(heads, axis=-1)
        ca = dot(ca, wco) + bco.astype(jnp.float32)
    x = _layernorm(x + ca, ln_scale[1], ln_bias[1])

    # ---- FFN -----------------------------------------------------------
    h1 = _gelu(dot(x, wf1) + bf1.astype(jnp.float32), cdt)
    ff = dot(h1, wf2) + bf2.astype(jnp.float32)
    return _layernorm(x + ff, ln_scale[2], ln_bias[2])


def _decoder_kernel(*refs, n_heads: int, identity_band: bool, per_entry: int = 0,
                    padded: bool = False, has_vmw: bool = False):
    """``per_entry`` > 0 (= tile entry count T, requires identity_band):
    self-attention runs as T separate per-entry (lq, lq) attention
    passes instead of one flattened (T*lq, T*lq) masked pass — batch
    isolation is structural, no self_mask, and no T-fold wasted score
    compute/softmax (measured: benchmarks/attn_probe.py — unrolled
    per-entry 2D dots beat both the flat block-diag kernel AND XLA's
    batched einsums at the production shapes; Mosaic's rank-3 batched
    dot does not lower). ``has_vmw``: a streamed (1, R, F) block with
    the hoisted projected V-gather follows the cross inputs."""
    key_mask = vmw_ref = None
    refs = list(refs)
    x_out = refs.pop()
    if has_vmw:
        vmw_ref = refs.pop()
    if per_entry and padded:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, person_mask, sel_pq, sel_ps, sel_vm,
         key_mask) = refs
        self_mask = None
    elif per_entry:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, person_mask, sel_pq, sel_ps, sel_vm) = refs
        self_mask = None
    elif identity_band:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, self_mask, person_mask, sel_pq, sel_ps,
         sel_vm) = refs
    else:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, self_mask, cross_mask) = refs
    # grid = (n_tiles, layers): tile OUTER so the output block (indexed by
    # tile) is revisited on consecutive grid steps only — Pallas TPU
    # forbids non-consecutive output revisits (stale-VMEM hazard)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        x_out[:] = x_in[:]  # load this tile's input at its first layer

    x = x_out[:]  # (R, F) f32, resident across layers
    x_out[:] = _layer_compute(
        x, n_heads=n_heads, per_entry=per_entry, identity_band=identity_band,
        wqkv=wqkv[0], bqkv=bqkv[0], wso=wso[0], bso=bso[0],
        wcq=wcq[0], bcq=bcq[0], wco=wco[0], bco=bco[0],
        wf1=wf1[0], bf1=bf1[0], wf2=wf2[0], bf2=bf2[0],
        ln_scale=ln_scale[0], ln_bias=ln_bias[0], km=kmem[0], vm=vmem[0],
        self_mask=None if per_entry else self_mask[:],
        cross_mask=None if identity_band else cross_mask[:],
        person_mask=person_mask[:] if identity_band else None,
        sel_pq=sel_pq[:] if identity_band else None,
        sel_ps=sel_ps[:] if identity_band else None,
        sel_vm=sel_vm[:] if identity_band else None,
        key_mask=key_mask[:] if key_mask is not None else None,
        vmw=vmw_ref[0] if has_vmw else None,
        merged_person=identity_band and _merged_person_env(),
    )


def _merged_person_env():
    """Trace-time: merged-head person cross-attention (see
    _layer_compute). DEFAULT since r5 — measured fastest at BOTH batch
    shapes on v5e (BENCH.md r5: batch-1 52.1x vs 46-49x, batch-48 97.4x
    vs 95.9x; exact rewrite, only f32-accumulation pairing differs).
    MSMD_MERGED_PERSON=0 restores per-head person cross dots. Engages
    only where the fast softmax is active (bf16), like the fallback."""
    return os.environ.get("MSMD_MERGED_PERSON", "1") == "1"


def _pad_rows(x, pad_lq):
    """Pad each batch entry's row block (B, Lq, F) -> (B, pad_lq, F) with
    zero rows at the end, and build the additive self-attention key mask
    hiding the pad rows. Sublane alignment: odd lq (126 at the flagship
    geometry) makes every per-entry row slice 8-misaligned inside the
    kernel AND restricts viable tiles to 8-multiples; padding to the
    next 8-multiple gives aligned slices and frees the tile choice."""
    B, Lq, F = x.shape
    xp = jnp.pad(x, ((0, 0), (0, pad_lq - Lq), (0, 0)))
    key_mask = jnp.asarray(
        np.where(np.arange(pad_lq) < Lq, 0.0, NEG)[None, :], jnp.float32
    )
    return xp, key_mask


@functools.partial(jax.jit, static_argnames=("n_heads", "tile_entries", "per_entry_attention", "pad_lq", "interpret"))
def fused_decoder_forward(
    pack: dict,
    kmem: jnp.ndarray,  # (L, B*Lm, F) batch-major rows
    vmem: jnp.ndarray,  # (L, B*Lm, F)
    x: jnp.ndarray,  # (B, Lq, F) any float dtype
    self_mask: Optional[jnp.ndarray],  # (T*Lq, T*Lq) f32 additive, T =
    # tile_entries; None in per_entry_attention mode (batch isolation is
    # structural there)
    cross_mask: jnp.ndarray,  # (T*Lq, T*Lm) f32 additive — OR, in
    # identity-band mode, the 4-tuple from build_identity_band_aux
    # (person_mask (T, T*Lm), sel_pq (T, T*Lq), sel_ps (T*Lq, T),
    # sel_vm (T*Lq, T*Lm)); mode is selected by the tuple structure
    n_heads: int,
    tile_entries: int = 0,  # batch entries per row tile; 0 = all of B
    per_entry_attention: bool = False,  # per-entry self-attention (no
    # flattened score waste); requires identity-band cross mode
    pad_lq: int = 0,  # per-entry mode: pad each entry to this many rows
    # (sublane alignment; cross_aux must be built at pad_lq)
    interpret: bool = False,
    vmw: Optional[jnp.ndarray] = None,  # (L, B*Lq_kernel, F) f32: the
    # hoisted projected identity-band V-gather (sel_vm @ vm) @ wco,
    # streamed per (tile, layer); identity-band mode only
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
    B, Lq_in, F = x.shape
    L = pack["wqkv"].shape[0]
    Mtot = kmem.shape[1]
    Lm = Mtot // B
    T = tile_entries or B
    assert B % T == 0, (B, T)
    n_tiles = B // T
    key_mask = None
    padded = bool(per_entry_attention and pad_lq and pad_lq > Lq_in)
    if padded:
        x, key_mask = _pad_rows(x.astype(jnp.float32), pad_lq)
    Lq = pad_lq if padded else Lq_in
    Rt, Mt = T * Lq, T * Lm
    identity_band = isinstance(cross_mask, (tuple, list))
    if per_entry_attention:
        assert identity_band, "per_entry_attention requires identity-band cross mode"
        assert self_mask is None, "per_entry_attention mode takes no self_mask"
    else:
        assert self_mask.shape == (Rt, Rt), (self_mask.shape, Rt)
    if identity_band:
        person_mask, sel_pq, sel_ps, sel_vm = cross_mask
        assert Lq == Lm + 1 if not padded else Lq >= Lm + 1, (Lq, Lm)
        assert person_mask.shape == (T, Mt), (person_mask.shape, T, Mt)
        cross_inputs = [person_mask, sel_pq, sel_ps, sel_vm]
        if padded:
            cross_inputs.append(key_mask)
    else:
        assert cross_mask.shape == (Rt, Mt), (cross_mask.shape, Rt, Mt)
        cross_inputs = [cross_mask]
    x_flat = x.reshape(B * Lq, F).astype(jnp.float32)

    spec = lambda *blk: pl.BlockSpec(blk, lambda t, l: (l,) + (0,) * (len(blk) - 1))
    # kv stored (L*n_tiles, Mt, F); block index = layer * n_tiles + tile
    kv_spec = lambda: pl.BlockSpec((1, Mt, F), lambda t, l: (l * n_tiles + t, 0, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda t, l: (0,) * a.ndim)

    has_vmw = vmw is not None and identity_band
    vmw_inputs, vmw_specs = [], []
    if has_vmw:
        assert vmw.shape == (L, B * Lq, F), (vmw.shape, L, B * Lq, F)
        # streamed like the memory K/V: block (1, Rt, F) at (l*n_tiles + t)
        vmw_inputs = [vmw.reshape(L * n_tiles, Rt, F)]
        vmw_specs = [pl.BlockSpec((1, Rt, F), lambda t, l: (l * n_tiles + t, 0, 0))]

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
    ] + ([] if per_entry_attention else [const(self_mask)]) + [const(a) for a in cross_inputs] + vmw_specs
    out = pl.pallas_call(
        functools.partial(
            _decoder_kernel, n_heads=n_heads, identity_band=identity_band,
            per_entry=T if per_entry_attention else 0, padded=padded,
            has_vmw=has_vmw,
        ),
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
        *([] if per_entry_attention else [self_mask]), *cross_inputs, *vmw_inputs,
    )
    out = out.reshape(B, Lq, F)
    return out[:, :Lq_in] if padded else out


# ---------------------------------------------------------------------------
# layer-OUTER resident-activation variant of the throughput kernel: the
# FULL batch's activations live in one constant-index VMEM output block
# (24.8 MB f32 at the batch-48 flagship shapes; v5e has 128 MB/core),
# and the grid is (layer, tile) with tile INNERMOST — so the per-layer
# weights are fetched once per LAYER instead of once per (tile, layer):
# 59 MB/step of weight DMA instead of n_tiles * 59 MB. Consecutive grid
# steps touch different tiles (independent work), giving Mosaic's
# pipeliner cross-tile overlap room. Per-entry attention + identity-band
# cross mode only (the production throughput configuration).
# ---------------------------------------------------------------------------

def _decoder_kernel_resident(
    *refs, n_heads: int, tile_entries: int, rows_per_tile: int, padded: bool = False,
    has_vmw: bool = False,
):
    key_mask = vmw_ref = None
    refs = list(refs)
    x_out = refs.pop()
    if has_vmw:
        vmw_ref = refs.pop()
    if padded:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, person_mask, sel_pq, sel_ps, sel_vm,
         key_mask) = refs
    else:
        (x_in, wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
         ln_scale, ln_bias, kmem, vmem, person_mask, sel_pq, sel_ps, sel_vm) = refs
    t = pl.program_id(1)
    sl = pl.ds(t * rows_per_tile, rows_per_tile)

    @pl.when(pl.program_id(0) == 0)
    def _():
        x_out[sl] = x_in[sl]  # load this tile's input at its first layer

    x_out[sl] = _layer_compute(
        x_out[sl], n_heads=n_heads, per_entry=tile_entries, identity_band=True,
        wqkv=wqkv[0], bqkv=bqkv[0], wso=wso[0], bso=bso[0],
        wcq=wcq[0], bcq=bcq[0], wco=wco[0], bco=bco[0],
        wf1=wf1[0], bf1=bf1[0], wf2=wf2[0], bf2=bf2[0],
        ln_scale=ln_scale[0], ln_bias=ln_bias[0], km=kmem[0], vm=vmem[0],
        person_mask=person_mask[:], sel_pq=sel_pq[:],
        sel_ps=sel_ps[:], sel_vm=sel_vm[:],
        key_mask=key_mask[:] if padded else None,
        vmw=vmw_ref[0] if has_vmw else None,
        merged_person=_merged_person_env(),
    )


@functools.partial(jax.jit, static_argnames=("n_heads", "tile_entries", "pad_lq", "interpret"))
def fused_decoder_forward_resident(
    pack: dict,
    kmem: jnp.ndarray,  # (L, B*Lm, F) batch-major rows
    vmem: jnp.ndarray,  # (L, B*Lm, F)
    x: jnp.ndarray,  # (B, Lq, F) any float dtype
    cross_aux,  # 4-tuple from build_identity_band_aux at tile size
    n_heads: int,
    tile_entries: int,
    pad_lq: int = 0,  # pad each entry to this many rows (see _pad_rows)
    interpret: bool = False,
    vmw: Optional[jnp.ndarray] = None,  # (L, B*Lq_kernel, F): hoisted
    # projected identity-band V-gather (see fused_decoder_forward)
) -> jnp.ndarray:
    """Layer-outer resident-activation decoder stack (see
    _decoder_kernel_resident). Numerically identical to
    fused_decoder_forward(per_entry_attention=True) — same per-tile
    layer math, different grid order / weight streaming schedule."""
    B, Lq_in, F = x.shape
    L = pack["wqkv"].shape[0]
    Mtot = kmem.shape[1]
    Lm = Mtot // B
    T = tile_entries
    assert B % T == 0, (B, T)
    n_tiles = B // T
    key_mask = None
    padded = bool(pad_lq and pad_lq > Lq_in)
    if padded:
        x, key_mask = _pad_rows(x.astype(jnp.float32), pad_lq)
    Lq = pad_lq if padded else Lq_in
    Rt, Mt = T * Lq, T * Lm
    person_mask, sel_pq, sel_ps, sel_vm = cross_aux
    assert Lq == Lm + 1 if not padded else Lq >= Lm + 1, (Lq, Lm)
    assert person_mask.shape == (T, Mt), (person_mask.shape, T, Mt)
    x_flat = x.reshape(B * Lq, F).astype(jnp.float32)

    lspec = lambda *blk: pl.BlockSpec(blk, lambda l, t: (l,) + (0,) * (len(blk) - 1))
    kv_spec = lambda: pl.BlockSpec((1, Mt, F), lambda l, t: (l * n_tiles + t, 0, 0))
    const = lambda a: pl.BlockSpec(a.shape, lambda l, t: (0,) * a.ndim)

    has_vmw = vmw is not None
    vmw_inputs, vmw_specs = [], []
    if has_vmw:
        assert vmw.shape == (L, B * Lq, F), (vmw.shape, L, B * Lq, F)
        vmw_inputs = [vmw.reshape(L * n_tiles, Rt, F)]
        vmw_specs = [pl.BlockSpec((1, Rt, F), lambda l, t: (l * n_tiles + t, 0, 0))]

    in_specs = [
        const(x_flat),  # whole input resident (fetched once)
        lspec(1, F, 3 * F), lspec(1, 1, 3 * F),
        lspec(1, F, F), lspec(1, 1, F),
        lspec(1, F, F), lspec(1, 1, F),
        lspec(1, F, F), lspec(1, 1, F),
        lspec(1, F, pack["wf1"].shape[-1]), lspec(1, 1, pack["wf1"].shape[-1]),
        lspec(1, pack["wf2"].shape[1], F), lspec(1, 1, F),
        lspec(1, 3, F), lspec(1, 3, F),
        kv_spec(), kv_spec(),
        const(person_mask), const(sel_pq), const(sel_ps), const(sel_vm),
    ] + ([const(key_mask)] if padded else []) + vmw_specs
    out = pl.pallas_call(
        functools.partial(
            _decoder_kernel_resident, n_heads=n_heads, tile_entries=T,
            rows_per_tile=Rt, padded=padded, has_vmw=has_vmw,
        ),
        grid=(L, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B * Lq, F), lambda l, t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * Lq, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(
        x_flat,
        pack["wqkv"], pack["bqkv"], pack["wso"], pack["bso"],
        pack["wcq"], pack["bcq"], pack["wco"], pack["bco"],
        pack["wf1"], pack["bf1"], pack["wf2"], pack["bf2"],
        pack["ln_scale"], pack["ln_bias"],
        kmem.reshape(L * n_tiles, Mt, F), vmem.reshape(L * n_tiles, Mt, F),
        person_mask, sel_pq, sel_ps, sel_vm,
        *([key_mask] if padded else []), *vmw_inputs,
    )
    out = out.reshape(B, Lq, F)
    return out[:, :Lq_in] if padded else out


def build_vmw(sel_vm, vmem, wco, n_tiles: int, out_dtype=None):
    """The hoisted PROJECTED identity-band V-gather for the decoder
    kernels: ``(sel_vm @ vm) @ wco`` per layer and tile. Both factors
    are step-invariant inside a sampling window (the memory K/V cache is
    built once), so the DDPM hot loop can skip the dense (Rt, Mt)
    one-hot-gather matmul AND shrink the (Rt, F) wco projection to the
    person rows — see _layer_compute's ``vmw`` branch for the row-exact
    argument (sel_ps and sel_vm have disjoint row supports).

    sel_vm: (Rt, Mt) one-hot; vmem: (L, n_tiles*Mt, F); wco: (L, F, F).
    Returns (L, n_tiles*Rt, F) in ``out_dtype`` (default f32). The
    gather result is rounded through vmem's dtype exactly as the
    in-kernel gather would produce it before the f32-accumulated wco
    dot."""
    L, Mtot, F = vmem.shape
    Mt = Mtot // n_tiles
    f32 = jnp.float32
    vm_t = vmem.reshape(L, n_tiles, Mt, F)
    gat = jnp.einsum("rm,ltmf->ltrf", sel_vm.astype(f32), vm_t.astype(f32))
    gat = gat.astype(vmem.dtype).astype(f32)
    out = jnp.einsum("ltrf,lfg->ltrg", gat, wco.astype(f32))
    out = out.reshape(L, n_tiles * sel_vm.shape[0], F)
    return out.astype(out_dtype) if out_dtype is not None else out


# ---------------------------------------------------------------------------
# fused SAMPLER-STEP kernel: prologue (feature proj + person/step token +
# PE) and epilogue (motion decoder + style-basis combine + CFG mix + DDPM
# update) folded around the layer-streamed decoder stack, so one whole
# denoising step of the batch-1 latency regime is ONE Pallas program.
# ---------------------------------------------------------------------------

def build_sampler_step_aux(n_entries: int, lq: int, lm: int, n_prev: int, n_cur: int, dtype=jnp.bfloat16):
    """Selectors for the sampler-step kernel over the flattened
    (n_entries * lq, F) row layout (batch 1, single tile):

    - ``sel_pp``  (E*lq, E): scatters the E person tokens to rows e*lq.
    - ``sel_mm``  (E*lq, lm): scatters the SHARED motion-feature rows
      (identical across CFG entries — same noisy motion) to rows
      e*lq + 1 + i.
    - ``sel_tail`` (E*n_cur, E*lq): gathers the last n_cur motion rows of
      every entry for the epilogue's motion decoder.
    """
    E = n_entries
    sel_pp = np.zeros((E * lq, E), np.float32)
    sel_mm = np.zeros((E * lq, lm), np.float32)
    sel_tail = np.zeros((E * n_cur, E * lq), np.float32)
    for e in range(E):
        sel_pp[e * lq, e] = 1.0
        for i in range(lm):
            sel_mm[e * lq + 1 + i, i] = 1.0
        for i in range(n_cur):
            sel_tail[e * n_cur + i, e * lq + 1 + n_prev + i] = 1.0
    return (jnp.asarray(sel_pp, dtype), jnp.asarray(sel_mm, dtype), jnp.asarray(sel_tail, dtype))


def build_scan_self_mask(n_entries: int, lqp: int, lq: int) -> jnp.ndarray:
    """Additive (E*lqp, E*lqp) f32 self-attention mask for the
    whole-scan kernel's BLOCK-DIAGONAL mode (MSMD_SCAN_BLOCKDIAG):
    row r may attend column c iff both belong to the same CFG entry and
    c is a real (non-sublane-padding) row. Folds the entry isolation and
    the pad-row key mask into one resident constant."""
    idx = np.arange(n_entries * lqp)
    same_entry = (idx[:, None] // lqp) == (idx[None, :] // lqp)
    real_col = (idx[None, :] % lqp) < lq
    return jnp.asarray(np.where(same_entry & real_col, 0.0, NEG), jnp.float32)


def _sampler_step_kernel(
    # per-step inputs
    motion_t, emb_row, sc, z,
    # prologue constants
    prev_rows, ind_col, wfp, bfp, persons_pre, pe_flat,
    # layer-streamed weights (leading dim = layer)
    wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2, ln_scale, ln_bias,
    kmem, vmem,
    # masks / selectors
    self_mask, person_mask, sel_pq, sel_ps, sel_vm, sel_pp, sel_mm, sel_tail,
    # epilogue constants
    wd1, bd1, wd2, bd2, statics_rows, pose_sum_rows,
    # outputs / scratch
    out_ref, x_scr,
    *, n_heads: int, n_entries: int, n_cur: int, d_motion: int, num_basis: int,
    use_indicator: bool, sigmoid_alpha: bool, coefficients,
):
    l = pl.program_id(0)
    L = pl.num_programs(0)
    F = wso.shape[-1]
    dh = F // n_heads
    scale = 1.0 / np.sqrt(dh)
    cdt = wqkv.dtype

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cdt), b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a.astype(cdt), b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    # ---- prologue (first grid step): build the token rows -------------
    @pl.when(l == 0)
    def _():
        if use_indicator:
            cur = jnp.concatenate([motion_t[:], ind_col[:]], axis=1)
        else:
            cur = motion_t[:]
        rows = jnp.concatenate([prev_rows[:], cur], axis=0)  # (lm, Din)
        feats_m = dot(rows, wfp[:]) + bfp[:].astype(jnp.float32)  # (lm, F)
        persons = persons_pre[:] + emb_row[:]  # (E, F) + (1, F)
        x0 = (
            dot(sel_pp[:], persons.astype(cdt))
            + dot(sel_mm[:], feats_m.astype(cdt))
            + pe_flat[:]
        )
        x_scr[:] = x0

    x = x_scr[:]

    # ---- decoder layer (identity-band cross attention) ----------------
    qkv = dot(x, wqkv[0]) + bqkv[0].astype(jnp.float32)
    heads = []
    for h in range(n_heads):
        q = qkv[:, h * dh : (h + 1) * dh] * scale
        k = qkv[:, F + h * dh : F + (h + 1) * dh]
        v = qkv[:, 2 * F + h * dh : 2 * F + (h + 1) * dh]
        s = dot_t(q, k.astype(cdt)) + self_mask[:]
        heads.append(_attn_pv(s, v.astype(cdt), dot, cdt))
    sa = jnp.concatenate(heads, axis=-1)
    sa = dot(sa, wso[0]) + bso[0].astype(jnp.float32)
    x = _layernorm(x + sa, ln_scale[0, 0], ln_bias[0, 0])

    km, vm = kmem[0], vmem[0]
    xp = dot(sel_pq[:], x.astype(cdt))
    qp = dot(xp, wcq[0]) + bcq[0].astype(jnp.float32)
    heads = []
    for h in range(n_heads):
        q = qp[:, h * dh : (h + 1) * dh] * scale
        s = dot_t(q, km[:, h * dh : (h + 1) * dh]) + person_mask[:]
        heads.append(_attn_pv(s, vm[:, h * dh : (h + 1) * dh], dot, cdt))
    person_out = jnp.concatenate(heads, axis=-1)
    ca = dot(sel_ps[:], person_out.astype(cdt)) + dot(sel_vm[:], vm)
    ca = dot(ca, wco[0]) + bco[0].astype(jnp.float32)
    x = _layernorm(x + ca, ln_scale[0, 1], ln_bias[0, 1])

    h1 = _gelu(dot(x, wf1[0]) + bf1[0].astype(jnp.float32), cdt)
    ff = dot(h1, wf2[0]) + bf2[0].astype(jnp.float32)
    x = _layernorm(x + ff, ln_scale[0, 2], ln_bias[0, 2])
    x_scr[:] = x

    # ---- epilogue (last grid step): decode + CFG + DDPM ---------------
    @pl.when(l == L - 1)
    def _():
        feats_tail = dot(sel_tail[:], x.astype(cdt))  # (E*n_cur, F)
        hdec = _gelu(dot(feats_tail, wd1[:]) + bd1[:].astype(jnp.float32), cdt)
        dec = dot(hdec, wd2[:]) + bd2[:].astype(jnp.float32)  # (E*n_cur, D+K)
        dynamic = dec[:, :d_motion]
        alphas = dec[:, d_motion : d_motion + num_basis]
        if sigmoid_alpha:
            alphas = jax.nn.sigmoid(alphas)
        # face channels get the alpha-weighted statics; the 3 head-pose
        # channels get the plain static sum (use_head_alpha=False, the
        # MSMD default — reference model.py:983-990)
        face = dynamic[:, : d_motion - 3]
        for kb in range(num_basis):
            face = face + alphas[:, kb : kb + 1] * statics_rows[kb, :, : d_motion - 3]
        pose = dynamic[:, d_motion - 3 :] + pose_sum_rows[:]
        out = jnp.concatenate([face, pose], axis=1)  # (E*n_cur, D)
        target = jnp.zeros((n_cur, d_motion), jnp.float32)
        for e in range(n_entries):
            target = target + np.float32(coefficients[e]) * out[e * n_cur : (e + 1) * n_cur]
        A = sc[0, 0]
        Bc = sc[0, 1]
        sg = sc[0, 2]
        out_ref[:] = A * motion_t[:] + Bc * target + sg * z[:]


# ---------------------------------------------------------------------------
# weight-RESIDENT whole-scan kernel: the ENTIRE T-step reverse diffusion
# as ONE Pallas program. All decoder weights (~59 MB bf16 at the flagship
# config) are placed in VMEM once as whole-array operands (v5e has
# 128 MB VMEM/core), so the 59 MB/step weight-streaming DMA floor of the
# per-step kernel — the measured batch-1 latency bound (BENCH.md) — is
# paid ONCE per window instead of once per step. The grid is the step
# loop (t = T..1); per-step inputs (noise z, step embedding, DDPM
# scalars) stream through tiny double-buffered blocks; the motion carry
# lives in VMEM scratch. Sequential grid semantics on TPU give the
# exact lax.scan ordering. Same math as _sampler_step_kernel; the only
# numeric delta vs the per-step scan is that the motion carry stays f32
# between steps instead of being cast to the model dtype (equal in f32;
# tolerance-equal in bf16 — see PARITY.md equivalence classes).
# ---------------------------------------------------------------------------

def _sampler_scan_kernel(
    *refs, n_layers: int, n_heads: int, n_entries: int, n_cur: int, d_motion: int,
    num_basis: int, use_indicator: bool, sigmoid_alpha: bool, coefficients,
    padded: bool = False, has_vmw: bool = False, has_self_bd: bool = False,
):
    # ref order mirrors the `inputs` list in fused_sampler_scan:
    # streamed per step (grid dim 0 = scan order t = T..1), then x_T,
    # prologue constants, resident per-layer weight stacks, memory K/V,
    # masks/selectors (+ the pad-row key mask in padded mode, + the
    # hoisted per-layer V-gather stack), epilogue constants, output,
    # VMEM scratch.
    (emb_row, sc, z,
     motion_T,
     prev_rows, ind_col, wfp, bfp, persons_pre, pe_flat,
     wqkv, bqkv, wso, bso, wcq, bcq, wco, bco, wf1, bf1, wf2, bf2,
     ln_scale, ln_bias, kmem, vmem,
     person_mask, sel_pq, sel_ps, sel_vm, sel_pp, sel_mm, sel_tail,
     *rest) = refs
    key_mask = vmw = self_bd = None
    if padded:
        key_mask, rest = rest[0], rest[1:]
    if has_vmw:
        vmw, rest = rest[0], rest[1:]
    if has_self_bd:
        self_bd, rest = rest[0], rest[1:]
    wd1, bd1, wd2, bd2, statics_rows, pose_sum_rows, out_ref, m_scr = rest
    s = pl.program_id(0)
    F = wso.shape[-1]
    dh = F // n_heads
    scale = 1.0 / np.sqrt(dh)
    cdt = wqkv.dtype
    R = pe_flat.shape[0]
    lq = R // n_entries
    P = prev_rows.shape[0]
    lm = P + n_cur
    # latency-regime rewrites (trace-time knobs; see _layer_compute):
    # concat/slice row builds replace every one-hot selector matmul
    # (sel_pp/sel_mm prologue scatter, sel_pq/sel_ps person gather/
    # scatter, sel_tail epilogue gather), and merged-head attention
    # collapses the per-head dot fan-out to one dot per pass.
    concat_sel = has_vmw and os.environ.get("MSMD_SCAN_CONCAT", "1") != "0"
    merged = os.environ.get("MSMD_MERGED_HEADS", "0") == "1" and _fast_softmax_active(cdt)
    head_mask = None
    if merged:
        rr = jax.lax.broadcasted_iota(jnp.int32, (n_heads * lq, F), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (n_heads * lq, F), 1)
        head_mask = ((rr // lq) == (cc // dh)).astype(cdt)

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(cdt), b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def dot_t(a, b):  # a @ b.T
        return jax.lax.dot_general(
            a.astype(cdt), b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(s == 0)
    def _():
        m_scr[:] = motion_T[:]

    motion_t = m_scr[:]

    # ---- prologue (every step: the motion rows change) ----------------
    if use_indicator:
        cur = jnp.concatenate([motion_t, ind_col[:]], axis=1)
    else:
        cur = motion_t
    rows = jnp.concatenate([prev_rows[:], cur], axis=0)  # (lm, Din)
    feats_m = dot(rows, wfp[:]) + bfp[:].astype(jnp.float32)  # (lm, F)
    persons = persons_pre[:] + emb_row[0]  # (E, F) + (1, F)
    if concat_sel:
        pad_n = lq - 1 - lm
        blocks = []
        for e in range(n_entries):
            blocks.append(persons[e : e + 1])
            blocks.append(feats_m)
            if pad_n:
                blocks.append(jnp.zeros((pad_n, F), jnp.float32))
        x = jnp.concatenate(blocks, 0) + pe_flat[:]
    else:
        x = (
            dot(sel_pp[:], persons.astype(cdt))
            + dot(sel_mm[:], feats_m.astype(cdt))
            + pe_flat[:]
        )

    # ---- decoder stack (unrolled; weights resident) -------------------
    # per-entry self-attention: each CFG entry's (lq, lq) attention as
    # its own 2D dot — no flattened block-diagonal score waste (same
    # design as the throughput kernel's per_entry mode)
    for i in range(n_layers):
        x = _layer_compute(
            x, n_heads=n_heads, per_entry=n_entries, identity_band=True,
            wqkv=wqkv[i], bqkv=bqkv[i], wso=wso[i], bso=bso[i],
            wcq=wcq[i], bcq=bcq[i], wco=wco[i], bco=bco[i],
            wf1=wf1[i], bf1=bf1[i], wf2=wf2[i], bf2=bf2[i],
            ln_scale=ln_scale[i], ln_bias=ln_bias[i], km=kmem[i], vm=vmem[i],
            person_mask=person_mask[:], sel_pq=sel_pq[:],
            sel_ps=sel_ps[:], sel_vm=sel_vm[:],
            key_mask=key_mask[:] if padded else None,
            vmw=vmw[i] if has_vmw else None,
            self_mask=self_bd[:] if has_self_bd else None,
            head_mask=head_mask, concat_sel=concat_sel,
            merged_person=_merged_person_env(),
        )

    # ---- epilogue (every step): decode + CFG + DDPM -------------------
    if concat_sel:
        feats_tail = jnp.concatenate(
            [x[e * lq + 1 + P : e * lq + 1 + P + n_cur] for e in range(n_entries)], 0
        )  # (E*n_cur, F)
    else:
        feats_tail = dot(sel_tail[:], x.astype(cdt))  # (E*n_cur, F)
    hdec = _gelu(dot(feats_tail, wd1[:]) + bd1[:].astype(jnp.float32), cdt)
    dec = dot(hdec, wd2[:]) + bd2[:].astype(jnp.float32)  # (E*n_cur, D+K)
    dynamic = dec[:, :d_motion]
    alphas = dec[:, d_motion : d_motion + num_basis]
    if sigmoid_alpha:
        alphas = jax.nn.sigmoid(alphas)
    face = dynamic[:, : d_motion - 3]
    for kb in range(num_basis):
        face = face + alphas[:, kb : kb + 1] * statics_rows[kb, :, : d_motion - 3]
    pose = dynamic[:, d_motion - 3 :] + pose_sum_rows[:]
    out = jnp.concatenate([face, pose], axis=1)  # (E*n_cur, D)
    target = jnp.zeros((n_cur, d_motion), jnp.float32)
    for e in range(n_entries):
        target = target + np.float32(coefficients[e]) * out[e * n_cur : (e + 1) * n_cur]
    A = sc[0, 0, 0]
    Bc = sc[0, 0, 1]
    sg = sc[0, 0, 2]
    m_next = A * motion_t + Bc * target + sg * z[0]
    m_scr[:] = m_next
    out_ref[:] = m_next


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "n_entries", "n_cur", "d_motion", "num_basis",
    "use_indicator", "sigmoid_alpha", "coefficients", "interpret",
))
def fused_sampler_scan(
    pack: dict,
    kmem: jnp.ndarray,  # (L, E*Lm, F)
    vmem: jnp.ndarray,  # (L, E*Lm, F)
    motion_T: jnp.ndarray,  # (n_cur, D) f32 — x_T, batch 1
    emb_scan: jnp.ndarray,  # (T, 1, F) f32 — step embeddings in scan order (t=T..1)
    sc_scan: jnp.ndarray,  # (T, 1, 8) f32 — [A, B, sigma, pad...] in scan order
    z_scan: jnp.ndarray,  # (T, n_cur, D) f32 — PRE-MASKED noise (0 at t=1)
    const: dict,  # same dict as fused_sampler_step
    n_heads: int,
    n_entries: int,
    n_cur: int,
    d_motion: int,
    num_basis: int,
    use_indicator: bool,
    sigmoid_alpha: bool,
    coefficients: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """The ENTIRE T-step reverse diffusion (batch 1) as one Pallas
    program with all weights VMEM-resident; returns motion x_0
    (n_cur, d_motion) f32. See _sampler_scan_kernel for the design.
    Sublane padding: when ``const`` carries a ``key_mask``, the token
    rows are padded per entry to an 8-multiple (126 -> 128 at the
    flagship geometry) — every per-entry slice is 8-aligned and the
    per-entry attention dots are exactly MXU-tile-shaped; the key mask
    hides the pad rows from self-attention keys (their own outputs are
    never read: all selectors are zero on pad rows).
    Reference semantics: model.py:377-435 (the full sampler loop)."""
    T = z_scan.shape[0]
    L = pack["wqkv"].shape[0]
    padded = const.get("key_mask") is not None
    has_vmw = const.get("vmw") is not None
    has_self_bd = const.get("self_mask_bd") is not None

    res = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # whole array, loaded once
    step = lambda a: pl.BlockSpec((1,) + a.shape[1:], lambda s, _nd=a.ndim: (s,) + (0,) * (_nd - 1))

    const_order = ("prev_rows", "ind_col", "wfp", "bfp", "persons_pre", "pe_flat")
    mask_order = (
        ("person_mask", "sel_pq", "sel_ps", "sel_vm", "sel_pp", "sel_mm", "sel_tail")
        + (("key_mask",) if padded else ())
        + (("vmw",) if has_vmw else ())
        + (("self_mask_bd",) if has_self_bd else ())
    )
    epi_order = ("wd1", "bd1", "wd2", "bd2", "statics_rows", "pose_sum_rows")
    layer_arrs = [
        pack["wqkv"], pack["bqkv"], pack["wso"], pack["bso"],
        pack["wcq"], pack["bcq"], pack["wco"], pack["bco"],
        pack["wf1"], pack["bf1"], pack["wf2"], pack["bf2"],
        pack["ln_scale"], pack["ln_bias"],
    ]

    inputs = [emb_scan, sc_scan, z_scan]
    in_specs = [step(emb_scan), step(sc_scan), step(z_scan)]
    inputs += [motion_T] + [const[k] for k in const_order]
    in_specs += [res()] * (1 + len(const_order))
    inputs += layer_arrs + [kmem, vmem]
    in_specs += [res()] * (len(layer_arrs) + 2)
    inputs += [const[k] for k in mask_order] + [const[k] for k in epi_order]
    in_specs += [res()] * (len(mask_order) + len(epi_order))

    kernel = functools.partial(
        _sampler_scan_kernel,
        n_layers=L, n_heads=n_heads, n_entries=n_entries, n_cur=n_cur,
        d_motion=d_motion, num_basis=num_basis, use_indicator=use_indicator,
        sigmoid_alpha=sigmoid_alpha, coefficients=coefficients, padded=padded,
        has_vmw=has_vmw, has_self_bd=has_self_bd,
    )
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_cur, d_motion), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_cur, d_motion), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_cur, d_motion), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)


@functools.partial(jax.jit, static_argnames=(
    "n_heads", "n_entries", "n_cur", "d_motion", "num_basis",
    "use_indicator", "sigmoid_alpha", "coefficients", "interpret",
))
def fused_sampler_step(
    pack: dict,
    kmem: jnp.ndarray,  # (L, E*Lm, F)
    vmem: jnp.ndarray,  # (L, E*Lm, F)
    motion_t: jnp.ndarray,  # (n_cur, D) f32 — current noisy motion, batch 1
    emb_row: jnp.ndarray,  # (1, F) f32 — diffusion-step embedding
    sc: jnp.ndarray,  # (1, 8) f32 — [A, B, sigma, ...pad] DDPM scalars
    z: jnp.ndarray,  # (n_cur, D) f32 — pre-masked noise for this step
    const: dict,  # prologue/epilogue constants + masks/selectors
    n_heads: int,
    n_entries: int,
    n_cur: int,
    d_motion: int,
    num_basis: int,
    use_indicator: bool,
    sigmoid_alpha: bool,
    coefficients: tuple,
    interpret: bool = False,
) -> jnp.ndarray:
    """ONE full DDPM denoising step (batch 1) as one Pallas program.

    Covers: token-row construction (feature proj + person/step token +
    learnable PE), the n_layer decoder stack (identity-band cross
    attention), the motion decoder with style-basis alpha decomposition
    (use_head_alpha=False), the CFG linear combination, and the DDPM
    x_t -> x_{t-1} update. Returns motion_next (n_cur, d_motion) f32.
    Reference semantics: model.py:820-996 (denoiser) + model.py:377-435
    (sampler loop)."""
    L = pack["wqkv"].shape[0]
    F = pack["wso"].shape[-1]
    Mt = kmem.shape[1]
    Rt = const["self_mask"].shape[0]

    lspec = lambda *blk: pl.BlockSpec(blk, lambda l: (l,) + (0,) * (len(blk) - 1))
    const_spec = lambda a: pl.BlockSpec(a.shape, lambda l: (0,) * a.ndim)

    const_order = (
        "prev_rows", "ind_col", "wfp", "bfp", "persons_pre", "pe_flat",
    )
    mask_order = (
        "self_mask", "person_mask", "sel_pq", "sel_ps", "sel_vm",
        "sel_pp", "sel_mm", "sel_tail",
    )
    epi_order = ("wd1", "bd1", "wd2", "bd2", "statics_rows", "pose_sum_rows")

    inputs = [motion_t, emb_row, sc, z]
    in_specs = [const_spec(a) for a in inputs]
    inputs += [const[k] for k in const_order]
    in_specs += [const_spec(const[k]) for k in const_order]
    layer_arrs = [
        pack["wqkv"], pack["bqkv"], pack["wso"], pack["bso"],
        pack["wcq"], pack["bcq"], pack["wco"], pack["bco"],
        pack["wf1"], pack["bf1"], pack["wf2"], pack["bf2"],
        pack["ln_scale"], pack["ln_bias"],
    ]
    inputs += layer_arrs
    in_specs += [lspec(*((1,) + a.shape[1:])) for a in layer_arrs]
    inputs += [kmem, vmem]
    in_specs += [lspec(1, Mt, F), lspec(1, Mt, F)]
    inputs += [const[k] for k in mask_order]
    in_specs += [const_spec(const[k]) for k in mask_order]
    inputs += [const[k] for k in epi_order]
    in_specs += [const_spec(const[k]) for k in epi_order]

    kernel = functools.partial(
        _sampler_step_kernel,
        n_heads=n_heads, n_entries=n_entries, n_cur=n_cur, d_motion=d_motion,
        num_basis=num_basis, use_indicator=use_indicator,
        sigmoid_alpha=sigmoid_alpha, coefficients=coefficients,
    )
    return pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_cur, d_motion), lambda l: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_cur, d_motion), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Rt, F), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
