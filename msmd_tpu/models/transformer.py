"""Transformer building blocks with torch-parity semantics.

The reference builds its denoiser on ``nn.TransformerDecoder`` and its
style encoders on ``nn.TransformerEncoderLayer`` (reference:
model.py:874-885, style_encoder.py:158-160). To keep checkpoint
interoperability we reproduce torch's exact *post-LN* layer algebra
(norm_first=False): residual-add THEN LayerNorm, GELU FFN, per-layer
dropout — but as Flax modules whose attention math runs as batched
einsum/matmul that XLA fuses onto the MXU. Attention masks use the
torch boolean convention: True = disallowed.

TPU extras the reference doesn't have:
- cross-attention **memory KV caching**: during DDPM sampling the audio
  memory is constant across all diffusion steps, so its K/V projections
  are computed once per window (``TransformerDecoder.cache_memory``)
  and reused inside the sampling scan instead of 2 x n_layers matmuls
  per step.

All matmuls honor ``dtype`` (bfloat16 on TPU) while parameters stay in
``param_dtype`` (float32): the standard TPU mixed-precision recipe.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

KVCache = Tuple[jnp.ndarray, jnp.ndarray]  # (k, v): (B, L, H, Dh)


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
    # None = promote logits to >= f32 for the softmax (default, safest).
    # jnp.bfloat16 computes the softmax in bf16 — saves the f32<->bf16
    # cast round-trips on the (B, H, Lq, Lk) logits, the largest
    # non-matmul HBM traffic in the sampling hot loop.
    softmax_dtype: Optional[jnp.dtype] = None

    def setup(self):
        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.attn_drop = nn.Dropout(self.dropout)

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    def project_kv(self, kv_input: jnp.ndarray) -> KVCache:
        """Precompute the key/value projections for a fixed memory."""
        B, L, _ = kv_input.shape
        k = self.k_proj(kv_input).reshape(B, L, self.n_heads, self.head_dim)
        v = self.v_proj(kv_input).reshape(B, L, self.n_heads, self.head_dim)
        return k, v

    def _fused_qkv(self, x: jnp.ndarray):
        """Self-attention fast path: one (in, 3F) matmul instead of three
        (in, F) matmuls — better MXU utilization at small token counts.
        Same parameters, same math (kernels concatenated at trace time)."""
        ws, bs = [], []
        for proj in (self.q_proj, self.k_proj, self.v_proj):
            p = proj.variables["params"]
            ws.append(jnp.asarray(p["kernel"]))
            bs.append(jnp.asarray(p["bias"]))
        w = jnp.concatenate(ws, axis=1).astype(self.dtype)
        b = jnp.concatenate(bs).astype(self.dtype)
        y = x.astype(self.dtype) @ w + b
        return jnp.split(y, 3, axis=-1)

    def _identity_band(self, q, kh, vh, deterministic):
        """Cross-attention under the width-1 alignment band (the MSMD
        default, ``align_mask_width=1`` — reference model.py:879-883):
        every motion row i's band unmasks exactly ONE memory column
        (i-1), so its softmax is exactly a one-hot and its output is
        ``v[i-1]`` — no q/k products needed. Only the person row (row 0,
        unmasked over the full memory) computes real attention. Exact
        trace-time rewrite of the masked softmax in deterministic mode.

        Train mode (``--identity_band_train``): attention-weight dropout
        acting on a one-hot weight row is exactly a Bernoulli(1-p)/(1-p)
        scale of the gathered V row, sampled per (batch, row, head) —
        the zero weights stay zero under dropout. Statistically
        equivalent to the reference's full-matrix weight dropout (the
        RNG stream differs; same RNG-bound class as SpecAugment,
        PARITY.md). The person row keeps real weight dropout."""
        B, Lq, _ = q.shape
        q0 = self.q_proj(q[:, :1]).reshape(B, 1, self.n_heads, self.head_dim)
        scale = jnp.asarray(1.0 / self.head_dim ** 0.5, self.dtype)
        logits0 = jnp.einsum("bqhd,bkhd->bhqk", q0 * scale, kh)
        sm_dt = self.softmax_dtype or jnp.promote_types(logits0.dtype, jnp.float32)
        w0 = nn.softmax(logits0.astype(sm_dt), axis=-1).astype(self.dtype)
        w0 = self.attn_drop(w0, deterministic=deterministic)
        person = jnp.einsum("bhqk,bkhd->bqhd", w0, vh)
        motion = vh.astype(self.dtype)
        if not deterministic and self.dropout > 0.0:
            import jax as _jax

            keep = _jax.random.bernoulli(
                self.make_rng("dropout"), 1.0 - self.dropout,
                (B, kh.shape[1], self.n_heads, 1),
            )
            motion = motion * keep.astype(self.dtype) / jnp.asarray(
                1.0 - self.dropout, self.dtype
            )
        out = jnp.concatenate([person, motion], axis=1)
        return self.out_proj(out.reshape(B, Lq, self.dim))

    def self_attn_preproj(self, x: jnp.ndarray) -> jnp.ndarray:
        """Self-attention WITHOUT the final out-projection (merged heads):
        the fused layer-tail kernel absorbs out_proj together with the
        residual/LN/cross/FFN chain. Deterministic (no attention
        dropout), mask-free — exactly the sampling-path self-attention."""
        B, Lq, _ = x.shape
        qp, kp, vp = self._fused_qkv(x)
        qh = qp.reshape(B, Lq, self.n_heads, self.head_dim)
        kh = kp.reshape(B, Lq, self.n_heads, self.head_dim)
        vh = vp.reshape(B, Lq, self.n_heads, self.head_dim)
        scale = jnp.asarray(1.0 / self.head_dim ** 0.5, self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
        sm_dt = self.softmax_dtype or jnp.promote_types(logits.dtype, jnp.float32)
        weights = nn.softmax(logits.astype(sm_dt), axis=-1).astype(self.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(B, Lq, self.dim)

    def __call__(
        self,
        q,
        k=None,
        v=None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        kv_cache: Optional[KVCache] = None,
        identity_band: bool = False,
    ):
        B, Lq, _ = q.shape
        if identity_band and not self.is_initializing():
            if kv_cache is not None:
                kh, vh = kv_cache
            else:
                kh = self.k_proj(k).reshape(B, k.shape[1], self.n_heads, self.head_dim)
                vh = self.v_proj(k if v is None else v).reshape(B, k.shape[1], self.n_heads, self.head_dim)
            assert kh.shape[1] == Lq - 1, (kh.shape, Lq)
            return self._identity_band(q, kh, vh, deterministic)
        self_attention = (k is None or k is q) and (v is None or v is k or v is q)
        if self_attention and kv_cache is None and not self.is_initializing():
            qp, kp, vp = self._fused_qkv(q)
            import os as _os

            _kernel_ok = False
            if (
                mask is None
                and deterministic
                and self.softmax_dtype is None
                and _os.environ.get("MSMD_ATTN_KERNEL", "0") == "1"
            ):
                # shape guard (ADVICE r3): the knob is global, but the
                # kernel is only viable/measured for 8-aligned row tiles
                # and sublane-aligned head dims — e.g. the style/audio
                # TransformerEncoderLayers also reach this branch with
                # geometries far from the probed decoder shapes
                from msmd_tpu.ops.pallas.attn_kernel import attn_middle_viable

                _kernel_ok = attn_middle_viable(B, Lq, self.dim, self.n_heads)
            if _kernel_ok:
                # hybrid serving mode: XLA keeps the peak-MXU projections,
                # the attention middle runs as a per-entry Pallas kernel so
                # the (B, H, Lq, Lq) score tensors never touch HBM
                # (ops/pallas/attn_kernel.py; measured via attn_probe.py)
                import jax as _jax

                from msmd_tpu.ops.pallas.attn_kernel import attention_middle

                out = attention_middle(
                    qp, kp, vp, self.n_heads,
                    interpret=_jax.default_backend() == "cpu",
                )
                return self.out_proj(out)
            qh = qp.reshape(B, Lq, self.n_heads, self.head_dim)
            kh = kp.reshape(B, Lq, self.n_heads, self.head_dim)
            vh = vp.reshape(B, Lq, self.n_heads, self.head_dim)
        else:
            qh = self.q_proj(q).reshape(B, Lq, self.n_heads, self.head_dim)
            if kv_cache is not None:
                kh, vh = kv_cache
            else:
                k = q if k is None else k
                v = k if v is None else v
                kh = self.k_proj(k).reshape(B, k.shape[1], self.n_heads, self.head_dim)
                vh = self.v_proj(v).reshape(B, v.shape[1], self.n_heads, self.head_dim)

        scale = jnp.asarray(1.0 / self.head_dim ** 0.5, self.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh)
        if mask is not None:
            # torch convention: boolean True = masked out.
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
            logits = jnp.where(mask, neg, logits)
        # softmax in >= f32 (upcast bf16, but never downcast f64) unless
        # an explicit softmax_dtype is configured
        sm_dt = self.softmax_dtype or jnp.promote_types(logits.dtype, jnp.float32)
        weights = nn.softmax(logits.astype(sm_dt), axis=-1).astype(self.dtype)
        weights = self.attn_drop(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(B, Lq, self.dim)
        return self.out_proj(out)


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
    softmax_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.self_attn = MultiHeadAttention(self.dim, self.n_heads, self.dropout, self.dtype, self.param_dtype, self.softmax_dtype, name="self_attn")
        self.cross_attn = MultiHeadAttention(self.dim, self.n_heads, self.dropout, self.dtype, self.param_dtype, self.softmax_dtype, name="cross_attn")
        self.ffn = FeedForward(self.dim, self.ffn_dim, self.dropout, self.dtype, self.param_dtype, name="ffn")
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        self.norm1 = ln("norm1")
        self.norm2 = ln("norm2")
        self.norm3 = ln("norm3")
        self.drop = nn.Dropout(self.dropout)

    def memory_kv(self, memory: jnp.ndarray) -> KVCache:
        return self.cross_attn.project_kv(memory)

    def _fused_ffn_ln(self, x):
        """LayerNorm(x + FFN(x)) as one Pallas program — the FFN hidden
        state ((rows, 4F), the largest unfused intermediate in the
        sampling step) never touches HBM. Inference-only (dropout-free);
        see ops/pallas/ffn_kernel.py for the measured motivation."""
        import jax

        from msmd_tpu.ops.pallas.ffn_kernel import _pick_tile, fused_ffn_ln

        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if _pick_tile(rows) > 2048:
            # no VMEM-sized row tile divides this batch shape — the
            # whole-array fallback would blow the VMEM budget; keep XLA
            ff = self.ffn(x, deterministic=True)
            return self.norm3(x + ff)

        p1 = self.ffn.variables["params"]["linear1"]
        p2 = self.ffn.variables["params"]["linear2"]
        ln = self.norm3.variables["params"]
        return fused_ffn_ln(
            x,
            jnp.asarray(p1["kernel"]).astype(self.dtype), jnp.asarray(p1["bias"]).astype(self.dtype),
            jnp.asarray(p2["kernel"]).astype(self.dtype), jnp.asarray(p2["bias"]).astype(self.dtype),
            jnp.asarray(ln["scale"]), jnp.asarray(ln["bias"]),
            interpret=jax.default_backend() == "cpu",
        )

    def _fused_ffn_ln_train(self, x):
        """TRAINING FFN block — LayerNorm(x + drop(FFN_drop(x))) — as one
        Pallas program per direction with a recompute-based custom VJP:
        the (rows, 4F) hidden state and the dropout masks never touch
        HBM in either pass (ops/pallas/ffn_train_kernel.py). Dropout
        masks come from the in-kernel TPU PRNG — statistically (not
        bitwise) equivalent to flax dropout; opt-in via
        cfg.fused_ffn_train."""
        import jax

        from msmd_tpu.ops.pallas.ffn_kernel import _pick_tile
        from msmd_tpu.ops.pallas.ffn_train_kernel import fused_ffn_ln_train

        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if _pick_tile(rows) > 2048:
            ff = self.ffn(x, deterministic=False)
            return self.norm3(x + self.drop(ff, deterministic=False))

        p1 = self.ffn.variables["params"]["linear1"]
        p2 = self.ffn.variables["params"]["linear2"]
        ln = self.norm3.variables["params"]
        seed = jax.random.randint(
            self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        return fused_ffn_ln_train(
            x.astype(self.dtype),
            jnp.asarray(p1["kernel"]).astype(self.dtype), jnp.asarray(p1["bias"]).astype(self.dtype),
            jnp.asarray(p2["kernel"]).astype(self.dtype), jnp.asarray(p2["bias"]).astype(self.dtype),
            jnp.asarray(ln["scale"]), jnp.asarray(ln["bias"]),
            seed, float(self.dropout), jax.default_backend() == "cpu",
        )

    def _fused_tail(self, x, kv_cache: KVCache):
        """Self-attention einsums in XLA (they run at peak as batched
        einsums), then EVERYTHING after them for the MOTION rows —
        out-proj, residual+LN1, identity-band cross V-gather + out-proj,
        residual+LN2, FFN, LN3 — as ONE row-tiled Pallas program with
        all intermediates VMEM-resident
        (ops/pallas/layer_tail_kernel.py). The person rows (one per
        entry) take the identical algebra here in XLA — a handful of
        (B, 1, F)-sized ops — and are concatenated back."""
        import jax

        from msmd_tpu.ops.pallas.layer_tail_kernel import fused_layer_tail

        B, Lq, F = x.shape
        sa_pre = self.self_attn.self_attn_preproj(x)

        # ---- person rows (XLA, tiny) ---------------------------------
        pso = self.self_attn.out_proj(sa_pre[:, :1])
        x1_p = self.norm1(x[:, :1] + pso)
        kh, vh = kv_cache
        Lm, H, Dh = kh.shape[1], kh.shape[2], kh.shape[3]
        q0 = self.cross_attn.q_proj(x1_p).reshape(B, 1, H, Dh)
        scale = jnp.asarray(1.0 / Dh ** 0.5, self.dtype)
        logits0 = jnp.einsum("bqhd,bkhd->bhqk", q0 * scale, kh)
        sm_dt = self.softmax_dtype or jnp.promote_types(logits0.dtype, jnp.float32)
        w0 = nn.softmax(logits0.astype(sm_dt), axis=-1).astype(self.dtype)
        person = jnp.einsum("bhqk,bkhd->bqhd", w0, vh).reshape(B, 1, F)
        x2_p = self.norm2(x1_p + self.cross_attn.out_proj(person))
        out_p = self.norm3(x2_p + self.ffn(x2_p, deterministic=True))

        # ---- motion rows (Pallas tail kernel) ------------------------
        sp = self.self_attn.variables["params"]["out_proj"]
        cp = self.cross_attn.variables["params"]["out_proj"]
        fp = self.ffn.variables["params"]
        ln_scale = jnp.stack([
            jnp.asarray(self.norm1.variables["params"]["scale"]),
            jnp.asarray(self.norm2.variables["params"]["scale"]),
            jnp.asarray(self.norm3.variables["params"]["scale"]),
        ]).astype(jnp.float32)
        ln_bias = jnp.stack([
            jnp.asarray(self.norm1.variables["params"]["bias"]),
            jnp.asarray(self.norm2.variables["params"]["bias"]),
            jnp.asarray(self.norm3.variables["params"]["bias"]),
        ]).astype(jnp.float32)
        cast = lambda a: jnp.asarray(a).astype(self.dtype)
        out_m = fused_layer_tail(
            sa_pre[:, 1:], x[:, 1:],
            vh.reshape(B * Lm, H * Dh).astype(self.dtype),
            cast(sp["kernel"]), cast(sp["bias"]),
            cast(cp["kernel"]), cast(cp["bias"]),
            cast(fp["linear1"]["kernel"]), cast(fp["linear1"]["bias"]),
            cast(fp["linear2"]["kernel"]), cast(fp["linear2"]["bias"]),
            ln_scale, ln_bias,
            interpret=jax.default_backend() == "cpu",
        )
        return jnp.concatenate([out_p.astype(out_m.dtype), out_m], axis=1)

    def __call__(
        self,
        x,
        memory: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        memory_kv: Optional[KVCache] = None,
        cross_identity_band: bool = False,
        fused_ffn: bool = False,
        fused_tail: bool = False,
        fused_ffn_train: bool = False,
    ):
        # Fused Pallas paths are dropout-free: they are only valid in
        # deterministic (eval/sampling) mode. Gating on `deterministic`
        # here (not just in the denoiser caller) means a direct caller
        # passing fused flags with deterministic=False falls through to
        # the exact dropout-carrying algebra instead of silently
        # dropping attention/FFN/residual dropout.
        if (
            fused_tail
            and deterministic
            and cross_identity_band
            and memory_kv is not None
            and not self.is_initializing()
        ):
            return self._fused_tail(x, memory_kv)
        sa = self.self_attn(x, x, x, deterministic=deterministic)
        x = self.norm1(x + self.drop(sa, deterministic=deterministic))

        ca = self.cross_attn(
            x, memory, memory, mask=memory_mask, deterministic=deterministic,
            kv_cache=memory_kv, identity_band=cross_identity_band,
        )
        x = self.norm2(x + self.drop(ca, deterministic=deterministic))

        if fused_ffn and deterministic and not self.is_initializing():
            return self._fused_ffn_ln(x)
        if fused_ffn_train and not deterministic and not self.is_initializing():
            return self._fused_ffn_ln_train(x)
        ff = self.ffn(x, deterministic=deterministic)
        x = self.norm3(x + self.drop(ff, deterministic=deterministic))
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
    softmax_dtype: Optional[jnp.dtype] = None
    remat: bool = False

    def setup(self):
        cls = TransformerDecoderLayer
        if self.remat:
            # gradient checkpointing: recompute each layer's activations
            # in the backward pass instead of storing them (cuts training
            # activation memory ~n_layers-fold for large batches).
            # static_argnums = deterministic + the python-bool fused
            # flags (argnum 0 = self in flax lifted transforms).
            cls = nn.remat(TransformerDecoderLayer, static_argnums=(4, 6, 7, 8, 9))
        self.layers = [
            cls(
                self.dim, self.n_heads, self.ffn_dim, self.dropout, self.dtype, self.param_dtype,
                self.softmax_dtype, name=f"layers_{i}"
            )
            for i in range(self.n_layers)
        ]

    def cache_memory(self, memory: jnp.ndarray) -> List[KVCache]:
        """Per-layer K/V of a fixed cross-attention memory."""
        return [layer.memory_kv(memory) for layer in self.layers]

    def __call__(
        self,
        x,
        memory: Optional[jnp.ndarray] = None,
        memory_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        memory_kv: Optional[List[KVCache]] = None,
        cross_identity_band: bool = False,
        fused_ffn: bool = False,
        fused_tail: bool = False,
        fused_ffn_train: bool = False,
    ):
        for i, layer in enumerate(self.layers):
            kv = memory_kv[i] if memory_kv is not None else None
            # positional call: nn.remat static_argnums address these slots
            x = layer(x, memory, memory_mask, deterministic, kv,
                      cross_identity_band, fused_ffn, fused_tail, fused_ffn_train)
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
