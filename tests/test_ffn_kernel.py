"""Fused FFN+LN Pallas kernel == flax FeedForward + LayerNorm
(msmd_tpu/ops/pallas/ffn_kernel.py; interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from msmd_tpu.models.transformer import TransformerDecoder
from msmd_tpu.ops.pallas.ffn_kernel import _pick_tile, fused_ffn_ln


def test_pick_tile():
    assert _pick_tile(252) == 252  # whole array always legal
    assert _pick_tile(1024) == 512
    assert _pick_tile(7) == 7
    # production row counts: tiles must divide rows AND be 16-multiples
    # (bf16 sublane tiling); 10656 = 96 entries x 111 tokens
    for rows in (10656, 12096, 7104):
        t = _pick_tile(rows)
        assert rows % t == 0 and t % 16 == 0 and t <= 512, (rows, t)


def test_fused_ffn_matches_flax_f32():
    import flax.linen as nn

    from msmd_tpu.models.transformer import FeedForward

    F, FFN = 32, 64
    ffn = FeedForward(F, FFN)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 14, F).astype(np.float32))
    variables = ffn.init(jax.random.PRNGKey(0), x)
    ln = nn.LayerNorm(epsilon=1e-5)
    ln_vars = ln.init(jax.random.PRNGKey(1), x)
    # randomize LN affine params
    ln_vars = {"params": {"scale": jnp.asarray(rs.randn(F).astype(np.float32) * 0.1 + 1.0),
                          "bias": jnp.asarray(rs.randn(F).astype(np.float32) * 0.1)}}

    want = ln.apply(ln_vars, x + ffn.apply(variables, x))
    p = variables["params"]
    got = fused_ffn_ln(
        x,
        p["linear1"]["kernel"], p["linear1"]["bias"],
        p["linear2"]["kernel"], p["linear2"]["bias"],
        ln_vars["params"]["scale"], ln_vars["params"]["bias"],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6, rtol=1e-5)


def test_decoder_fused_ffn_path_matches():
    """TransformerDecoder(fused_ffn=True) == the plain flax path."""
    B, Lq, Lm, F, H, L = 2, 10, 9, 32, 4, 2
    dec = TransformerDecoder(L, F, H, 64)
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(B, Lq, F).astype(np.float32))
    mem = jnp.asarray(rs.randn(B, Lm, F).astype(np.float32))
    variables = dec.init(jax.random.PRNGKey(0), x, mem)

    want = dec.apply(variables, x, mem, None, True)
    got = dec.apply(variables, x, mem, None, True, fused_ffn=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_decoder_fused_ffn_untileable_rows_falls_back():
    """Row counts with no 16-multiple divisor must fall back to the flax
    FFN instead of a VMEM-oversized whole-array kernel tile."""
    B, Lq, Lm, F, H, L = 1, 10, 9, 32, 4, 1
    dec = TransformerDecoder(L, F, H, 64)
    rs = np.random.RandomState(9)
    # rows = 1 * 4243 (prime) -> _pick_tile falls back to rows
    x = jnp.asarray(rs.randn(1, 4243, F).astype(np.float32))
    mem = jnp.asarray(rs.randn(1, Lm, F).astype(np.float32))
    variables = dec.init(jax.random.PRNGKey(0), x, mem)
    want = dec.apply(variables, x, mem, None, True)
    got = dec.apply(variables, x, mem, None, True, fused_ffn=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_layer_tail_matches_flax():
    """fused_tail (motion-row layer-tail kernel + XLA person tail) ==
    identity-band flax path, single and multi row tile."""
    Lq, Lm, F, H, L = 13, 12, 32, 4, 2
    for Be in (2, 8):  # rows = Be*12: 24 (1 tile) and 96 (16-mult tiles)
        dec = TransformerDecoder(L, F, H, 64)
        rs = np.random.RandomState(11 + Be)
        x = jnp.asarray(rs.randn(Be, Lq, F).astype(np.float32))
        mem = jnp.asarray(rs.randn(Be, Lm, F).astype(np.float32))
        variables = dec.init(jax.random.PRNGKey(0), x, mem)
        kv = dec.apply(variables, mem, method=TransformerDecoder.cache_memory)

        want = dec.apply(variables, x, None, None, True, memory_kv=kv,
                         cross_identity_band=True)
        got = dec.apply(variables, x, None, None, True, memory_kv=kv,
                        cross_identity_band=True, fused_tail=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4, err_msg=f"Be={Be}")


def test_tail_rows_tile():
    from msmd_tpu.ops.pallas.layer_tail_kernel import tail_rows_tile

    t = tail_rows_tile(96 * 110)  # production batch-48 shapes
    assert t and 10560 % t == 0 and t % 16 == 0 and t <= 512
    assert tail_rows_tile(24) == 24  # whole-array tile (small batch)
    assert tail_rows_tile(4243) == 0  # prime rows -> fallback
