"""Training-side fused FFN+LN kernel with custom VJP
(msmd_tpu/ops/pallas/ffn_train_kernel.py; interpret mode on CPU).

Three properties:
1. dropout_rate=0: forward AND grads exactly match the pure-jax post-LN
   FFN block (the flax TransformerDecoderLayer algebra).
2. dropout_rate>0: the custom VJP matches finite differences of the
   kernel's OWN forward (same seed -> same in-kernel masks), validating
   the recompute-based backward including mask regeneration.
3. dropout masks have the right keep statistics and fresh seeds give
   fresh masks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.ops.pallas.ffn_train_kernel import fused_ffn_ln_train


def _ref_ffn_ln(x, w1, b1, w2, b2, g, b):
    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    y = h @ w2 + b2
    r = x + y
    mu = r.mean(-1, keepdims=True)
    var = ((r - mu) ** 2).mean(-1, keepdims=True)
    return (r - mu) * jax.lax.rsqrt(var + 1e-5) * g + b


def _setup(T=24, F=32, FFN=64, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(T, F).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rs.randn(F, FFN).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rs.randn(FFN).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rs.randn(FFN, F).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rs.randn(F).astype(np.float32) * 0.1)
    g = jnp.asarray(1.0 + 0.1 * rs.randn(F).astype(np.float32))
    b = jnp.asarray(0.1 * rs.randn(F).astype(np.float32))
    return x, w1, b1, w2, b2, g, b


def test_p0_matches_reference_fwd_and_grad():
    x, w1, b1, w2, b2, g, b = _setup()
    seed = jnp.int32(7)

    out = fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, seed, 0.0, True)
    want = _ref_ffn_ln(x, w1, b1, w2, b2, g, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-5)

    def loss_k(x, w1, b1, w2, b2, g, b):
        o = fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, seed, 0.0, True)
        return jnp.sum(jnp.sin(o))

    def loss_r(x, w1, b1, w2, b2, g, b):
        return jnp.sum(jnp.sin(_ref_ffn_ln(x, w1, b1, w2, b2, g, b)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4, 5, 6))(x, w1, b1, w2, b2, g, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4, 5, 6))(x, w1, b1, w2, b2, g, b)
    for a, want, name in zip(gk, gr, "x w1 b1 w2 b2 g b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=3e-4, rtol=2e-3,
                                   err_msg=f"grad {name}")


def _det_masks_np(T, FFN, F, p, seed=0, tile_i=0):
    """numpy replica of ffn_train_kernel._det_bits -> keep masks
    (including the per-step seed/tile offset mixed into the hash)."""
    with np.errstate(over="ignore"):
        off = np.uint32(seed) * np.uint32(2946901) + np.uint32(tile_i) * np.uint32(83492791)

        def bits(shape, salt):
            i0 = np.arange(shape[0], dtype=np.uint32)[:, None] * np.uint32(2654435761)
            i1 = np.arange(shape[1], dtype=np.uint32)[None, :] * np.uint32(40503)
            r = (i0 + i1 + np.uint32(salt * 97) + off) * np.uint32(2246822519)
            return r ^ (r >> np.uint32(13))

        thr = np.uint32(int(p * 2.0**32))
        m1 = (bits((T, FFN), 1) >= thr).astype(np.float32) / np.float32(1 - p)
        m2 = (bits((T, F), 2) >= thr).astype(np.float32) / np.float32(1 - p)
    return jnp.asarray(m1), jnp.asarray(m2)


def test_dropout_vjp_matches_masked_reference():
    """With p>0, both dropout masks and their gradient plumbing must be
    exact. The CPU interpreters stub the TPU PRNG, so this test routes
    the mask bits through the deterministic test hook and compares fwd +
    all 7 grads against a pure-jax replica using the SAME masks —
    validating the recompute-based backward including mask placement.
    (On-silicon PRNG statistics: benchmarks/train_probe.py.)"""
    from msmd_tpu.ops.pallas import ffn_train_kernel as K

    x, w1, b1, w2, b2, g, b = _setup(T=16, F=16, FFN=32, seed=3)
    seed = jnp.int32(11)
    p = 0.3
    m1, m2 = _det_masks_np(16, 32, 16, p, seed=11, tile_i=0)
    assert 0.5 < float((np.asarray(m1) > 0).mean()) < 0.9  # nondegenerate

    def pure(x, w1, b1, w2, b2, g, b):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False) * m1
        y = (h @ w2 + b2) * m2
        r = x + y
        mu = r.mean(-1, keepdims=True)
        var = ((r - mu) ** 2).mean(-1, keepdims=True)
        return (r - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    K._TEST_DET_MASKS[0] = True
    try:
        out = fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, seed, p, True)
        want = pure(x, w1, b1, w2, b2, g, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5, rtol=1e-5)

        def lk(*a):
            return jnp.sum(jnp.cos(fused_ffn_ln_train(*a, seed, p, True)))

        def lp(*a):
            return jnp.sum(jnp.cos(pure(*a)))

        gk = jax.grad(lk, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, b)
        gp = jax.grad(lp, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, b)
        for a, want, name in zip(gk, gp, "x w1 b1 w2 b2 g b".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=5e-4, rtol=5e-3,
                                       err_msg=f"grad {name}")
    finally:
        K._TEST_DET_MASKS[0] = False


@pytest.mark.slow
def test_model_train_forward_with_fused_ffn_train():
    """cfg.fused_ffn_train wires through denoiser -> transformer ->
    kernel in the TRAINING (deterministic=False) path: forward and
    grads are finite and params receive gradients. (On CPU interpret
    mode routes dropout through the deterministic seed-hash masks —
    statistically meaningful, ADVICE r3; exact mask/grad math is covered
    by the det-mask kernel tests above, PRNG statistics on-silicon.)"""
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.audio import AudioEncoderConfig
    from msmd_tpu.models.diffusion import MSMD, get_diffusion_model

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2,
        use_indicator=True, compute_dtype="float32", fused_ffn_train=True,
    )
    audio_cfg = AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
    )
    model = get_diffusion_model(cfg, audio_config=audio_cfg, dtype=jnp.float32)
    rs = np.random.RandomState(0)
    motion = jnp.asarray(rs.randn(2, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    audio = jnp.asarray(rs.randn(2, cfg.n_audio_samples).astype(np.float32) * 0.1)
    shape = jnp.zeros((2, 100))
    style = jnp.asarray(rs.randn(2, cfg.d_style).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "spec_augment": jax.random.PRNGKey(5)}
    variables = model.init(rngs, motion, audio, shape, style, deterministic=False)

    def loss_fn(params):
        eps, target, *_ = model.apply(
            {"params": params}, motion, audio, shape, style, deterministic=False,
            rngs={"diffusion": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4),
                  "spec_augment": jax.random.PRNGKey(6)},
        )
        return jnp.mean((eps[:, -8:] - target[:, -8:]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the non-FFN transformer params still receive nonzero grads
    g_attn = grads["denoising_net"]["transformer"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert float(jnp.abs(g_attn).max()) > 0


def test_multi_tile_weight_grad_accumulation():
    """Weight grads accumulate across row tiles (revisited constant-index
    output blocks): a 2-tile run must equal the pure reference (p=0)."""
    x, w1, b1, w2, b2, g, b = _setup(T=32, F=32, FFN=64, seed=9)
    # _pick_tile(32) = 32 (single tile) — force 2 tiles via rows=512
    xb = jnp.tile(x, (16, 1))  # 512 rows -> tile 512? no: _pick_tile(512)=512
    # instead reshape to (2, 256, F): rows=512, tile=512 single... use 544
    x2 = jnp.concatenate([xb, xb[:32]], axis=0)  # 544 rows: tile 272? 544%16==0
    seed = jnp.int32(5)

    def lk(x, w1, b1, w2, b2, g, b):
        return jnp.sum(jnp.sin(fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, seed, 0.0, True)))

    def lp(x, w1, b1, w2, b2, g, b):
        return jnp.sum(jnp.sin(_ref_ffn_ln(x, w1, b1, w2, b2, g, b)))

    gk = jax.grad(lk, argnums=(1, 3, 5))(x2, w1, b1, w2, b2, g, b)
    gp = jax.grad(lp, argnums=(1, 3, 5))(x2, w1, b1, w2, b2, g, b)
    for a, want, name in zip(gk, gp, "w1 w2 g".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(want), atol=2e-3, rtol=5e-3,
                                   err_msg=f"grad {name}")

def test_tanh_gelu_mode_fwd_and_grad_consistent(monkeypatch):
    """MSMD_GELU=tanh switches BOTH the kernel forward and its custom-VJP
    backward to the tanh-approximation formula: fwd matches the tanh-gelu
    reference, and the kernel's grads match jax autodiff of that same
    reference (a fwd/bwd mismatch would show up here as an erf-grad)."""
    monkeypatch.setenv("MSMD_GELU", "tanh")
    x, w1, b1, w2, b2, g, b = _setup(seed=5)
    seed = jnp.int32(11)

    def ref_tanh(x, w1, b1, w2, b2, g, b):
        h = jax.nn.gelu(x @ w1 + b1, approximate=True)
        y = h @ w2 + b2
        r = x + y
        mu = r.mean(-1, keepdims=True)
        var = ((r - mu) ** 2).mean(-1, keepdims=True)
        return (r - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    out = fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, seed, 0.0, True)
    want = ref_tanh(x, w1, b1, w2, b2, g, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=5e-5, rtol=1e-4)

    def loss_kernel(args):
        return jnp.sum(fused_ffn_ln_train(*args, seed, 0.0, True) ** 2)

    def loss_ref(args):
        return jnp.sum(ref_tanh(*args) ** 2)

    args = (x, w1, b1, w2, b2, g, b)
    gk = jax.grad(loss_kernel)(args)
    gr = jax.grad(loss_ref)(args)
    for a, bb, name in zip(gk, gr, "x w1 b1 w2 b2 g b".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4, rtol=1e-3,
                                   err_msg=name)


def test_interpret_dropout_not_degenerate():
    """ADVICE r3: interpret-mode (CPU) dropout must NOT silently zero
    the FFN branch (InterpretParams' stub PRNG returns all-zero bits ->
    keep masks all 0). The kernel now routes interpret-mode masks
    through the seed-hash: the FFN contribution survives, keep rates
    are near 1-p, and fresh seeds give fresh masks."""
    x, w1, b1, w2, b2, g, b = _setup(T=32, F=32, FFN=64, seed=4)
    p = 0.4

    # zero-FFN reference = LayerNorm(x): what the degenerate masks gave
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    ln_x = (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

    o1 = fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, jnp.int32(1), p, True)
    o2 = fused_ffn_ln_train(x, w1, b1, w2, b2, g, b, jnp.int32(2), p, True)
    assert float(jnp.abs(o1 - ln_x).max()) > 1e-2  # FFN branch alive
    assert float(jnp.abs(o1 - o2).max()) > 1e-4    # seed changes masks

    # keep statistics near 1-p (via the replica masks for seed 1)
    m1, m2 = _det_masks_np(32, 64, 32, p, seed=1, tile_i=0)
    for m in (m1, m2):
        keep = float((np.asarray(m) > 0).mean())
        assert abs(keep - (1 - p)) < 0.12, keep
