#!/usr/bin/env python
"""Attribute the batch-48 decoder "glue" gap (non-matmul per-step time).

throughput_probe.py shows: big matmuls alone 3.3 ms/step (MXU at peak),
attention math 0.94 ms/step, production decoder stack ~6.6-7.4 ms/step.
This probe pins down the remaining ~2-3 ms by timing a MANUAL decoder
implementation (same post-LN algebra as msmd_tpu.models.transformer,
weights pre-packed/pre-cast exactly like the production sampler) and
then ablating one suspect at a time:

  manual_base      production algebra: f32 softmax, f32 LN stats,
                   boolean where() cross mask, unrolled layers
  bf16_softmax     softmax entirely in bf16
  bf16_ln          LayerNorm entirely in bf16 (stats included)
  additive_mask    cross mask as a precomputed additive f32 bias
  scan_layers      lax.scan over stacked per-layer weights
  all_wins         every ablation that helped, combined

Each prints one JSON line. Run on the real chip (JAX_PLATFORMS=axon).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _timing import configure_cache, timeit  # noqa: E402


def main():
    import jax

    configure_cache()
    import jax.numpy as jnp

    n_steps = int(os.environ.get("MSMD_BENCH_STEPS", "500"))
    Be = int(os.environ.get("MSMD_PROBE_BE", "96"))
    R, F, H, L, FFN = 126, 512, 8, 8, 2048
    M = 125
    dh = F // H
    scale = 1.0 / dh ** 0.5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    bf = jnp.bfloat16
    w = {
        "wqkv": jax.random.normal(ks[0], (L, F, 3 * F), bf) * 0.02,
        "bqkv": jax.random.normal(ks[1], (L, 3 * F), bf) * 0.02,
        "wso": jax.random.normal(ks[2], (L, F, F), bf) * 0.02,
        "bso": jax.random.normal(ks[3], (L, F), bf) * 0.02,
        "wcq": jax.random.normal(ks[4], (L, F, F), bf) * 0.02,
        "bcq": jax.random.normal(ks[5], (L, F), bf) * 0.02,
        "wco": jax.random.normal(ks[6], (L, F, F), bf) * 0.02,
        "bco": jax.random.normal(ks[7], (L, F), bf) * 0.02,
        "wf1": jax.random.normal(ks[8], (L, F, FFN), bf) * 0.02,
        "bf1": jax.random.normal(ks[9], (L, FFN), bf) * 0.02,
        "wf2": jax.random.normal(ks[10], (L, FFN, F), bf) * 0.02,
        "bf2": jax.random.normal(ks[11], (L, F), bf) * 0.02,
        "g": jnp.ones((L, 3, F), jnp.float32),
        "b": jnp.zeros((L, 3, F), jnp.float32),
    }
    kmem = jax.random.normal(ks[12], (L, Be, M, H, dh), bf)
    vmem = jax.random.normal(ks[13], (L, Be, M, H, dh), bf)
    x0 = jax.random.normal(ks[14], (Be, R, F), bf)
    # banded alignment-style cross mask (True = disallowed), ~production shape
    rows = jnp.arange(R)[:, None]
    cols = jnp.arange(M)[None, :]
    cross_bool = jnp.abs(rows - cols) > 2
    cross_add = jnp.where(cross_bool, jnp.float32(-1e30), jnp.float32(0.0))
    NEGF = jnp.float32(jnp.finfo(jnp.float32).min)

    def ln(x, g, b, bf16_ln):
        if bf16_ln:
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + bf(1e-5)) * g.astype(bf) + b.astype(bf)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(bf)

    def softmax(logits, bf16_sm):
        if bf16_sm:
            return jax.nn.softmax(logits, axis=-1)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(bf)

    def make_layer(bf16_sm=False, bf16_ln=False, additive=False, identity=False,
                   no_softmax=False, no_attn=False):
        def layer(x, wl, kml, vml):
            qkv = x @ wl["wqkv"] + wl["bqkv"]
            if no_attn:
                # ablation: skip the whole attention middle (head split,
                # einsums, softmax, merge) — measures its in-context cost
                sa = qkv[..., :F]
            else:
                qh = qkv[..., :F].reshape(Be, R, H, dh)
                kh = qkv[..., F:2 * F].reshape(Be, R, H, dh)
                vh = qkv[..., 2 * F:].reshape(Be, R, H, dh)
                logits = jnp.einsum("bqhd,bkhd->bhqk", qh * bf(scale), kh)
                if no_softmax:
                    w_attn = logits * bf(1e-3)  # ablation: no exp/normalize
                else:
                    w_attn = softmax(logits, bf16_sm)
                sa = jnp.einsum("bhqk,bkhd->bqhd", w_attn, vh).reshape(Be, R, F)
            sa = sa @ wl["wso"] + wl["bso"]
            x = ln(x + sa, wl["g"][0], wl["b"][0], bf16_ln)

            if no_attn:
                ca = (x @ wl["wcq"] + wl["bcq"])[:, :, :F]
            elif no_softmax:
                qc = (x @ wl["wcq"] + wl["bcq"]).reshape(Be, R, H, dh)
                logits = jnp.einsum("bqhd,bkhd->bhqk", qc * bf(scale), kml)
                ca = jnp.einsum("bhqk,bkhd->bqhd", logits * bf(1e-3), vml).reshape(Be, R, F)
            elif identity:
                # width-1 band: motion rows gather V; person row attends
                q0 = (x[:, :1] @ wl["wcq"] + wl["bcq"]).reshape(Be, 1, H, dh)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q0 * bf(scale), kml)
                p = softmax(logits, bf16_sm)
                person = jnp.einsum("bhqk,bkhd->bqhd", p, vml).reshape(Be, 1, F)
                ca = jnp.concatenate([person, vml.reshape(Be, M, F)], axis=1)
            else:
                qc = (x @ wl["wcq"] + wl["bcq"]).reshape(Be, R, H, dh)
                logits = jnp.einsum("bqhd,bkhd->bhqk", qc * bf(scale), kml)
                if additive:
                    logits = (logits.astype(jnp.float32) + cross_add).astype(
                        bf if bf16_sm else jnp.float32)
                    p = jax.nn.softmax(logits, axis=-1).astype(bf)
                else:
                    logits = jnp.where(cross_bool, NEGF.astype(logits.dtype), logits)
                    p = softmax(logits, bf16_sm)
                ca = jnp.einsum("bhqk,bkhd->bqhd", p, vml).reshape(Be, R, F)
            ca = ca @ wl["wco"] + wl["bco"]
            x = ln(x + ca, wl["g"][1], wl["b"][1], bf16_ln)

            h = jax.nn.gelu(x @ wl["wf1"] + wl["bf1"], approximate=False)
            x = ln(x + h @ wl["wf2"] + wl["bf2"], wl["g"][2], wl["b"][2], bf16_ln)
            return x
        return layer

    kmlT = jnp.swapaxes(kmem, 2, 3)  # (L, Be, H, M, dh) — transposed ONCE
    vmlT = jnp.swapaxes(vmem, 2, 3)

    def make_layer_layout(bf16_sm=False):
        """Head-native (b,h,q,d) layouts end-to-end: the head split rides
        on the qkv projections' output, the head merge is contracted
        (h,d) directly inside the out-projections — no standalone
        (B,R,H,dh)<->(B,H,R,dh) relayout copies between matmuls."""
        def layer(x, wl, l):
            w4 = lambda w: w.reshape(F, H, dh)
            b4 = lambda b: b.reshape(1, H, 1, dh)
            qh = jnp.einsum("brf,fhd->bhrd", x, w4(wl["wqkv"][:, :F])) + b4(wl["bqkv"][:F])
            kh = jnp.einsum("brf,fhd->bhrd", x, w4(wl["wqkv"][:, F:2 * F])) + b4(wl["bqkv"][F:2 * F])
            vh = jnp.einsum("brf,fhd->bhrd", x, w4(wl["wqkv"][:, 2 * F:])) + b4(wl["bqkv"][2 * F:])
            logits = jnp.einsum("bhqd,bhkd->bhqk", qh * bf(scale), kh)
            p = softmax(logits, bf16_sm)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
            sa = jnp.einsum("bhqd,hdf->bqf", o, wl["wso"].reshape(H, dh, F)) + wl["bso"]
            x = ln(x + sa, wl["g"][0], wl["b"][0], False)

            qc = jnp.einsum("brf,fhd->bhrd", x, w4(wl["wcq"])) + b4(wl["bcq"])
            logits = jnp.einsum("bhqd,bhkd->bhqk", qc * bf(scale), kmlT[l])
            logits = jnp.where(cross_bool, NEGF.astype(logits.dtype), logits)
            p = softmax(logits, bf16_sm)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vmlT[l])
            ca = jnp.einsum("bhqd,hdf->bqf", o, wl["wco"].reshape(H, dh, F)) + wl["bco"]
            x = ln(x + ca, wl["g"][1], wl["b"][1], False)

            h = jax.nn.gelu(x @ wl["wf1"] + wl["bf1"], approximate=False)
            x = ln(x + h @ wl["wf2"] + wl["bf2"], wl["g"][2], wl["b"][2], False)
            return x
        return layer

    def run_variant(name, layer_fn, use_scan=False, wants_layer_idx=False):
        if use_scan:
            def step(x):
                def body(c, wl_kv):
                    wl, kml, vml = wl_kv
                    return layer_fn(c, wl, kml, vml), None
                y, _ = jax.lax.scan(body, x, (w, kmem, vmem))
                return y / (jnp.abs(y).max() + 1.0)
        else:
            def step(x):
                for l in range(L):
                    wl = {k: v[l] for k, v in w.items()}
                    if wants_layer_idx:
                        x = layer_fn(x, wl, l)
                    else:
                        x = layer_fn(x, wl, kmem[l], vmem[l])
                return x / (jnp.abs(x).max() + 1.0)

        @jax.jit
        def run(x0):
            y, _ = jax.lax.scan(lambda c, _: (step(c), None), x0, None, length=n_steps)
            return y[..., 0].astype(jnp.float32).sum()

        dt = timeit(run, x0)
        print(json.dumps({"probe": name, "wall_s": round(dt, 4),
                          "per_step_ms": round(dt / n_steps * 1e3, 3)}), flush=True)
        return dt

    variants = {
        "manual_base": (make_layer(), {}),
        "identity_cross": (make_layer(identity=True), {}),
        "bf16_softmax": (make_layer(bf16_sm=True), {}),
        "bf16_ln": (make_layer(bf16_ln=True), {}),
        "additive_mask": (make_layer(additive=True), {}),
        "scan_layers": (make_layer(), {"use_scan": True}),
        "all_wins": (make_layer(bf16_sm=True, bf16_ln=True, additive=True), {}),
        "identity_all": (make_layer(bf16_sm=True, bf16_ln=True, identity=True), {}),
        "no_softmax": (make_layer(no_softmax=True), {}),
        "no_attn": (make_layer(no_attn=True), {}),
        "layout_attn": (make_layer_layout(), {"wants_layer_idx": True}),
        "layout_attn_bf16sm": (make_layer_layout(bf16_sm=True), {"wants_layer_idx": True}),
    }
    only = [v for v in os.environ.get("MSMD_PROBE_ONLY", "").split(",") if v]
    for name, (fn, kw) in variants.items():
        if only and name not in only:
            continue
        run_variant(name, fn, **kw)


if __name__ == "__main__":
    main()
