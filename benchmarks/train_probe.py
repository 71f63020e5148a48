#!/usr/bin/env python
"""On-silicon validation of the training-side fused FFN kernel
(msmd_tpu/ops/pallas/ffn_train_kernel.py).

The CPU interpreters stub the TPU PRNG (all-zero bits), so the dropout
mask STATISTICS and the fwd/bwd mask agreement can only be checked on
the real chip. This probe checks, at production-like shapes:

1. keep fraction ~= 1-p for both masks (binomial tolerance),
2. same seed -> bit-identical forward output; different seed differs,
3. the custom VJP's directional derivative matches a central finite
   difference of the kernel's own forward (same seed = same masks) —
   proving the backward pass regenerates the masks bit-identically,
4. p=0 forward matches the pure-jax reference on-chip.

Prints one JSON line per check. Run on the axon TPU.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from _timing import configure_cache  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    configure_cache()
    from msmd_tpu.ops.pallas.ffn_train_kernel import fused_ffn_ln_train

    rs = np.random.RandomState(0)
    T, F, FFN = 512, 512, 2048
    p = 0.5
    x = jnp.asarray(rs.randn(T, F).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rs.randn(F, FFN).astype(np.float32) * 0.05)
    b1 = jnp.asarray(np.zeros(FFN, np.float32))
    # w2 = 0, b2 = 0: the FFN output is then EXACTLY b2*m2 = 0, so
    # out = LN(x) regardless of masks — instead use w2=identity-ish to
    # expose m1 through the output. For the keep-fraction check we use
    # the sparsity pattern of gelu-h * m1 via w2 = I block.
    w2 = jnp.asarray(rs.randn(FFN, F).astype(np.float32) * 0.05)
    b2 = jnp.asarray(np.zeros(F, np.float32))
    g = jnp.ones(F, jnp.float32)
    b = jnp.zeros(F, jnp.float32)

    # ---- 1+2: determinism + seed variation + implied keep fraction ----
    o1 = np.asarray(fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, jnp.int32(1), p, False))
    o1b = np.asarray(fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, jnp.int32(1), p, False))
    o2 = np.asarray(fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, jnp.int32(2), p, False))
    det_ok = bool((o1 == o1b).all())
    var_ok = bool(np.abs(o1 - o2).max() > 1e-4)
    print(json.dumps({"probe": "determinism", "same_seed_identical": det_ok,
                      "diff_seed_differs": var_ok}), flush=True)

    # keep fraction via the SECOND mask: with b2=0 and w2 != 0, the m2
    # mask zeros columns of y; estimate through y = out*sigma + mu - x
    # is awkward post-LN, so measure m1 directly: set w2 rows so that
    # y_j = h_j (w2 = I on the first F columns of h)
    w2_eye = jnp.zeros((FFN, F), jnp.float32).at[:F, :].set(jnp.eye(F))
    o_eye = np.asarray(fused_ffn_ln_train(
        10.0 + 0.0 * x, w1 * 0.0, b1 + 3.0, w2_eye, b2, g, b, jnp.int32(7), p, False))
    # with x const and w1=0: h = gelu(3)*m1 (rows x FFN); y_j = h_j for
    # j < F; y then gets m2. nonzero fraction of (pre-LN) y ~ (1-p)^2;
    # LN makes zeros -> identical values, so count the mode
    vals, counts = np.unique(np.round(o_eye, 5), return_counts=True)
    frac_mode = counts.max() / o_eye.size
    # mode value = the dropped entries (both masks) => frac ~ 1-(1-p)^2
    keep2 = 1.0 - frac_mode
    print(json.dumps({"probe": "keep_fraction", "expected_keep_sq": round((1 - p) ** 2, 4),
                      "measured": round(float(keep2), 4),
                      "ok": bool(abs(keep2 - (1 - p) ** 2) < 0.03)}), flush=True)

    # ---- 3: VJP vs finite difference on-chip --------------------------
    seed = jnp.int32(11)

    def f(xx):
        return jnp.sum(jnp.cos(fused_ffn_ln_train(xx, w1, b1, w2, b2, g, b, seed, 0.3, False)))

    gx = jax.grad(f)(x)
    d = jnp.asarray(rs.randn(T, F).astype(np.float32))
    d = d / jnp.linalg.norm(d)
    eps = 3e-2  # large eps: f32 sum over 262k terms has ~1e-4 roundoff
    fd = (float(f(x + eps * d)) - float(f(x - eps * d))) / (2 * eps)
    an = float(jnp.vdot(gx, d))
    rel = abs(an - fd) / max(abs(fd), 1e-9)
    print(json.dumps({"probe": "vjp_vs_fd", "analytic": round(an, 5), "fd": round(fd, 5),
                      "rel_err": round(rel, 5), "ok": bool(rel < 0.02)}), flush=True)

    # ---- 4: p=0 exactness on-chip -------------------------------------
    def ref(x):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        y = h @ w2 + b2
        r = x + y
        mu = r.mean(-1, keepdims=True)
        var = ((r - mu) ** 2).mean(-1, keepdims=True)
        return (r - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    o_k = np.asarray(fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, jnp.int32(0), 0.0, False))
    o_r = np.asarray(jax.jit(ref)(x))
    md = float(np.abs(o_k - o_r).max())
    print(json.dumps({"probe": "p0_exact", "max_diff": md, "ok": bool(md < 1e-4)}), flush=True)


if __name__ == "__main__":
    main()
