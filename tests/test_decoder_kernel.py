"""Fused decoder-stack Pallas kernel == the flax TransformerDecoder
(msmd_tpu/ops/pallas/decoder_kernel.py; interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.models.transformer import TransformerDecoder
from msmd_tpu.ops.pallas.decoder_kernel import (
    build_masks,
    fused_decoder_forward,
    pack_decoder_weights,
    pack_memory_kv,
)
from msmd_tpu.ops.seq import alignment_mask


def _setup(B=2, Lq=14, Lm=13, F=32, H=4, n_layers=3, ffn=64, seed=0):
    dec = TransformerDecoder(n_layers, F, H, ffn, dropout=0.1)
    rs = np.random.RandomState(seed)
    x = rs.randn(B, Lq, F).astype(np.float32)
    mem = rs.randn(B, Lm, F).astype(np.float32)
    variables = dec.init(jax.random.PRNGKey(seed), jnp.asarray(x), jnp.asarray(mem))
    return dec, variables, x, mem


@pytest.mark.parametrize("use_align", [False, True])
def test_fused_decoder_matches_flax(use_align):
    B, Lq, Lm, F, H, L = 2, 14, 13, 32, 4, 3
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L)
    align = np.asarray(alignment_mask(4, 9, 1)) if use_align else None  # (1+13, 13)? shaped below
    if use_align:
        # alignment_mask(n_prev, n_cur, w) -> (1 + n_prev + n_cur, n_prev + n_cur)
        assert align.shape == (Lq, Lm)

    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(
        variables, jnp.asarray(x), None,
        jnp.asarray(align) if use_align else None, True, memory_kv=kv,
    )

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    sm, cm = build_masks(B, Lq, Lm, align)
    got = fused_decoder_forward(pack, km, vm, jnp.asarray(x), sm, cm, n_heads=H, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5)


def test_fused_decoder_bf16_close():
    """bf16 weight pack (the production config) stays within bf16 noise
    of the f32 flax decoder."""
    B, Lq, Lm, F, H, L = 1, 10, 9, 32, 4, 2
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=3)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(variables, jnp.asarray(x), None, None, True, memory_kv=kv)

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.bfloat16)
    km, vm = pack_memory_kv(kv, dtype=jnp.bfloat16)
    sm, cm = build_masks(B, Lq, Lm, None)
    got = fused_decoder_forward(pack, km, vm, jnp.asarray(x), sm, cm, n_heads=H, interpret=True)
    # bf16 matmuls with f32 accumulation: ~1e-2 worst-case over 2 layers
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2, rtol=3e-2)


def test_batch_isolation():
    """flattened-batch masking: each batch entry's output must be
    independent of the other's content."""
    B, Lq, Lm, F, H, L = 2, 8, 7, 32, 4, 2
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=5)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    sm, cm = build_masks(B, Lq, Lm, None)
    out1 = fused_decoder_forward(pack, km, vm, jnp.asarray(x), sm, cm, n_heads=H, interpret=True)

    x2 = x.copy()
    x2[1] += 100.0  # perturb ONLY batch entry 1
    out2 = fused_decoder_forward(pack, km, vm, jnp.asarray(x2), sm, cm, n_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]), atol=1e-6)
    assert np.abs(np.asarray(out1[1]) - np.asarray(out2[1])).max() > 1.0


def test_sampler_fused_vs_xla_decoder():
    """The full sampler with the fused decoder (auto-enabled for bf16 at
    small batch) matches the XLA-decoder sampler to bf16 noise."""
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.audio import AudioEncoderConfig
    from msmd_tpu.models.diffusion import get_diffusion_model, sample

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2,
        use_indicator=True, compute_dtype="bfloat16",
    )
    audio_cfg = AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
    )
    model = get_diffusion_model(cfg, audio_config=audio_cfg, dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    motion = jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.asarray(rs.randn(1, cfg.n_audio_samples).astype(np.float32) * 0.1)
    shape = jnp.asarray(rs.randn(1, 100).astype(np.float32) * 0.1)
    style = jnp.asarray(rs.randn(1, cfg.d_style).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, shape, style, deterministic=True,
    )
    mT = jnp.asarray(rs.randn(1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    z = jnp.asarray(rs.randn(cfg.n_diff_steps, 1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))

    kw = dict(motion_at_T=mT, noise_override=z)
    m_fused, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                           fused_decoder=True, **kw)
    m_xla, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                         fused_decoder=False, **kw)
    a, b = np.asarray(m_fused, np.float32), np.asarray(m_xla, np.float32)
    assert np.isfinite(a).all()
    # both paths are bf16 programs; agreement within bf16 noise amplified
    # over 4 diffusion steps
    np.testing.assert_allclose(a, b, atol=0.15, rtol=0.1)
    assert float(np.mean((a - b) ** 2)) < 2e-3


def test_fused_decoder_row_tiling():
    """Tiled (throughput) mode == single-tile mode == flax decoder."""
    B, Lq, Lm, F, H, L = 4, 10, 9, 32, 4, 2
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=7)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(variables, jnp.asarray(x), None, None, True, memory_kv=kv)

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    for tile in (1, 2, 4):
        sm, cm = build_masks(tile, Lq, Lm, None)
        got = fused_decoder_forward(
            pack, km, vm, jnp.asarray(x), sm, cm, n_heads=H, tile_entries=tile, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile={tile}")


def test_fused_decoder_identity_band():
    """identity-band (width-1) kernel mode == flax decoder with the
    width-1 alignment mask, across row tilings."""
    from msmd_tpu.ops.pallas.decoder_kernel import build_identity_band_aux

    B, Lq, Lm, F, H, L = 4, 14, 13, 32, 4, 3
    n_prev, n_cur = 4, 9
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=11)
    align = alignment_mask(n_prev, n_cur, 1)  # (1+13, 13), width-1 band
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(variables, jnp.asarray(x), None, align, True, memory_kv=kv)

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    for tile in (1, 2, 4):
        sm, _ = build_masks(tile, Lq, Lm, None)
        aux = build_identity_band_aux(tile, Lq, Lm, dtype=jnp.float32)
        got = fused_decoder_forward(
            pack, km, vm, jnp.asarray(x), sm, aux, n_heads=H, tile_entries=tile, interpret=True
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile={tile}")


def test_fused_decoder_per_entry_attention():
    """per-entry self-attention mode (no flattened score waste, no
    self_mask) == flax decoder with the width-1 alignment mask, across
    row tilings."""
    from msmd_tpu.ops.pallas.decoder_kernel import build_identity_band_aux

    B, Lq, Lm, F, H, L = 4, 14, 13, 32, 4, 3
    n_prev, n_cur = 4, 9
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=13)
    align = alignment_mask(n_prev, n_cur, 1)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(variables, jnp.asarray(x), None, align, True, memory_kv=kv)

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    for tile in (1, 2, 4):
        aux = build_identity_band_aux(tile, Lq, Lm, dtype=jnp.float32)
        got = fused_decoder_forward(
            pack, km, vm, jnp.asarray(x), None, aux, n_heads=H, tile_entries=tile,
            per_entry_attention=True, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile={tile}")


def test_fused_decoder_merged_person_cross(monkeypatch):
    """MSMD_MERGED_PERSON=1 (merged-head person cross-attention in the
    throughput kernels; requires the fast softmax) == flax decoder, in
    both grid orders. Caches cleared per call: the knob is read at trace
    time inside module-level jits."""
    from msmd_tpu.ops.pallas.decoder_kernel import (
        build_identity_band_aux, fused_decoder_forward_resident,
    )

    B, Lq, Lm, F, H, L = 4, 14, 13, 32, 4, 3
    n_prev, n_cur = 4, 9
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=29)
    align = alignment_mask(n_prev, n_cur, 1)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = np.asarray(dec.apply(variables, jnp.asarray(x), None, align, True, memory_kv=kv))

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    monkeypatch.setenv("MSMD_MERGED_PERSON", "1")
    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")
    for tile in (2, 4):
        jax.clear_caches()
        aux = build_identity_band_aux(tile, Lq, Lm, dtype=jnp.float32)
        got = fused_decoder_forward(
            pack, km, vm, jnp.asarray(x), None, aux, n_heads=H, tile_entries=tile,
            per_entry_attention=True, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4,
                                   err_msg=f"tile-outer tile={tile}")
    jax.clear_caches()
    aux = build_identity_band_aux(2, Lq, Lm, dtype=jnp.float32)
    got = fused_decoder_forward_resident(
        pack, km, vm, jnp.asarray(x), aux, n_heads=H, tile_entries=2, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4,
                               err_msg="layer-outer resident")
    # without the fast softmax the merged path must auto-disable and
    # still match (the unrolled per-head branch runs)
    monkeypatch.delenv("MSMD_FAST_SOFTMAX")
    jax.clear_caches()
    got = fused_decoder_forward(
        pack, km, vm, jnp.asarray(x), None, aux, n_heads=H, tile_entries=2,
        per_entry_attention=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)
    jax.clear_caches()


def test_fused_decoder_layer_outer_resident():
    """layer-outer resident-activation grid (weights streamed once per
    layer, full-batch activations in one VMEM block) == flax decoder
    with the width-1 alignment mask, across row tilings."""
    from msmd_tpu.ops.pallas.decoder_kernel import (
        build_identity_band_aux, fused_decoder_forward_resident,
    )

    B, Lq, Lm, F, H, L = 4, 14, 13, 32, 4, 3
    n_prev, n_cur = 4, 9
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=17)
    align = alignment_mask(n_prev, n_cur, 1)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(variables, jnp.asarray(x), None, align, True, memory_kv=kv)

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    for tile in (1, 2, 4):
        aux = build_identity_band_aux(tile, Lq, Lm, dtype=jnp.float32)
        got = fused_decoder_forward_resident(
            pack, km, vm, jnp.asarray(x), aux, n_heads=H, tile_entries=tile,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile={tile}")


def test_fused_decoder_pad_lq():
    """sublane-padded per-entry mode (each entry padded to pad_lq rows,
    pad keys masked out of self-attention) == flax decoder, across tiles
    that are only viable WITH padding, in both grid orders."""
    from msmd_tpu.ops.pallas.decoder_kernel import (
        build_identity_band_aux, fused_decoder_forward_resident,
    )

    B, Lq, Lm, F, H, L = 4, 14, 13, 32, 4, 3
    n_prev, n_cur = 4, 9
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=19)
    align = alignment_mask(n_prev, n_cur, 1)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = dec.apply(variables, jnp.asarray(x), None, align, True, memory_kv=kv)

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    pad = 16  # next 8-multiple above Lq=14
    for tile in (1, 2, 4):
        aux = build_identity_band_aux(tile, pad, Lm, dtype=jnp.float32)
        got = fused_decoder_forward(
            pack, km, vm, jnp.asarray(x), None, aux, n_heads=H, tile_entries=tile,
            per_entry_attention=True, pad_lq=pad, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile={tile}")
        got_r = fused_decoder_forward_resident(
            pack, km, vm, jnp.asarray(x), aux, n_heads=H, tile_entries=tile,
            pad_lq=pad, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"resident tile={tile}")


def test_fused_sampler_step_f32_three_way(monkeypatch):
    """Mega sampler-step kernel (f32 pack) == fused decoder-stack path ==
    XLA path, to tight f32 tolerance, including the DDPM update, CFG mix
    and style-basis epilogue."""
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.audio import AudioEncoderConfig
    from msmd_tpu.models.diffusion import get_diffusion_model, sample

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2,
        use_indicator=True, compute_dtype="float32", regularize_alpha="sigmoid",
    )
    audio_cfg = AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
    )
    model = get_diffusion_model(cfg, audio_config=audio_cfg, dtype=jnp.float32)
    rs = np.random.RandomState(3)
    motion = jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.asarray(rs.randn(1, cfg.n_audio_samples).astype(np.float32) * 0.1)
    shape = jnp.asarray(rs.randn(1, 100).astype(np.float32) * 0.1)
    style = jnp.asarray(rs.randn(1, cfg.d_style).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, shape, style, deterministic=True,
    )
    mT = jnp.asarray(rs.randn(1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    z = jnp.asarray(rs.randn(cfg.n_diff_steps, 1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    kw = dict(motion_at_T=mT, noise_override=z)

    # weight-resident whole-scan kernel (default when available)
    m_scan, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                          fused_decoder=True, **kw)
    # per-step mega kernel (scan kernel disabled)
    monkeypatch.setenv("MSMD_FUSED_SCAN", "0")
    m_mega, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                          fused_decoder=True, **kw)
    monkeypatch.setenv("MSMD_FUSED_STEP", "0")
    m_stack, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                           fused_decoder=True, **kw)
    m_xla, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                         fused_decoder=False, **kw)
    s = np.asarray(m_scan, np.float32)
    a = np.asarray(m_mega, np.float32)
    b = np.asarray(m_stack, np.float32)
    c = np.asarray(m_xla, np.float32)
    assert np.isfinite(a).all()
    # scan kernel == per-step mega kernel: identical math + f32 carry in
    # both (f32 model), so exact agreement up to instruction scheduling
    np.testing.assert_allclose(s, a, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(a, c, atol=5e-4, rtol=1e-4)


def test_scan_kernel_merged_heads_and_concat(monkeypatch):
    """The latency-regime scan-kernel rewrites — merged-head attention
    (MSMD_MERGED_HEADS, requires the fast softmax) and concat/slice row
    builds (MSMD_SCAN_CONCAT) — match the selector-matmul / unrolled-head
    baseline to f32 tolerance through the full 4-step sampler."""
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.audio import AudioEncoderConfig
    from msmd_tpu.models.diffusion import get_diffusion_model, sample

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2,
        use_indicator=True, compute_dtype="float32",
    )
    audio_cfg = AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
    )
    model = get_diffusion_model(cfg, audio_config=audio_cfg, dtype=jnp.float32)
    rs = np.random.RandomState(5)
    motion = jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.asarray(rs.randn(1, cfg.n_audio_samples).astype(np.float32) * 0.1)
    shape = jnp.asarray(rs.randn(1, 100).astype(np.float32) * 0.1)
    style = jnp.asarray(rs.randn(1, cfg.d_style).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, shape, style, deterministic=True,
    )
    mT = jnp.asarray(rs.randn(1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    z = jnp.asarray(rs.randn(cfg.n_diff_steps, 1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    kw = dict(motion_at_T=mT, noise_override=z)

    def run():
        # the scan kernel lives inside a module-level jit; env knobs are
        # read at TRACE time, so a same-shape re-call would silently hit
        # the cache and compare the old trace to itself (vacuous)
        jax.clear_caches()
        m, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                         fused_decoder=True, **kw)
        return np.asarray(m, np.float32)

    monkeypatch.setenv("MSMD_SCAN_CONCAT", "0")
    monkeypatch.setenv("MSMD_MERGED_HEADS", "0")
    base = run()
    assert np.isfinite(base).all()

    monkeypatch.setenv("MSMD_SCAN_CONCAT", "1")
    np.testing.assert_allclose(run(), base, atol=5e-5, rtol=1e-4)

    # merged heads need the fast softmax (per-head-block normalization)
    monkeypatch.setenv("MSMD_MERGED_HEADS", "1")
    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")
    np.testing.assert_allclose(run(), base, atol=5e-4, rtol=5e-4)

    # without fast softmax the merged path must auto-disable (not crash,
    # and still match: the unrolled safe-softmax branch runs)
    monkeypatch.delenv("MSMD_FAST_SOFTMAX")
    np.testing.assert_allclose(run(), base, atol=5e-5, rtol=1e-4)

    # pad path exercised too: lq = 13 is odd, MSMD_SCAN_PAD defaults on;
    # force it off to cover the unpadded layout with both knobs
    monkeypatch.setenv("MSMD_SCAN_PAD", "0")
    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")
    np.testing.assert_allclose(run(), base, atol=5e-4, rtol=5e-4)
    jax.clear_caches()  # don't leak knob-flipped traces to later tests


def test_attention_middle_kernel_matches_einsum():
    """Hybrid attention-middle kernel == the XLA einsum attention (no
    mask, per-entry isolation structural)."""
    from msmd_tpu.ops.pallas.attn_kernel import attention_middle

    B, Lq, F, H = 4, 10, 32, 4
    dh = F // H
    rs = np.random.RandomState(17)
    q = jnp.asarray(rs.randn(B, Lq, F).astype(np.float32))
    k = jnp.asarray(rs.randn(B, Lq, F).astype(np.float32))
    v = jnp.asarray(rs.randn(B, Lq, F).astype(np.float32))

    qh = q.reshape(B, Lq, H, dh)
    kh = k.reshape(B, Lq, H, dh)
    vh = v.reshape(B, Lq, H, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh / np.sqrt(dh), kh)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, Lq, F)

    for tile in (1, 2, 4):
        got = attention_middle(q, k, v, H, tile_entries=tile, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5,
                                   err_msg=f"tile={tile}")

    # perturbing one entry must not affect the others (structural isolation)
    q2 = q.at[2].add(10.0)
    got2 = attention_middle(q2, k, v, H, tile_entries=2, interpret=True)
    got1 = attention_middle(q, k, v, H, tile_entries=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2[0]), np.asarray(got1[0]), atol=1e-6)
    assert np.abs(np.asarray(got2[2]) - np.asarray(got1[2])).max() > 1e-3

def test_fast_softmax_and_tanh_gelu_knobs(monkeypatch):
    """MSMD_FAST_SOFTMAX=1 (no max-subtraction) is numerically ~exact for
    moderate logits; MSMD_GELU=tanh stays within the tanh-approximation
    error budget end-to-end (|err| <= 3e-4 per activation, amplified
    through L layers). Both knobs route through every kernel via the
    module-level _softmax/_gelu dispatchers."""
    from msmd_tpu.ops.pallas.decoder_kernel import build_identity_band_aux

    B, Lq, Lm, F, H, L = 4, 14, 13, 32, 4, 3
    n_prev, n_cur = 4, 9
    dec, variables, x, mem = _setup(B, Lq, Lm, F, H, L, seed=23)
    align = alignment_mask(n_prev, n_cur, 1)
    kv = dec.apply(variables, jnp.asarray(mem), method=TransformerDecoder.cache_memory)
    want = np.asarray(dec.apply(variables, jnp.asarray(x), None, align, True, memory_kv=kv))

    pack = pack_decoder_weights(variables["params"], L, dtype=jnp.float32)
    km, vm = pack_memory_kv(kv, dtype=jnp.float32)
    aux = build_identity_band_aux(2, Lq, Lm, dtype=jnp.float32)

    def run():
        # fused_decoder_forward is a module-level jit and the knobs are
        # read at trace time — clear the cache so each flip retraces
        jax.clear_caches()
        return np.asarray(fused_decoder_forward(
            pack, km, vm, jnp.asarray(x), None, aux, n_heads=H, tile_entries=2,
            per_entry_attention=True, interpret=True,
        ))

    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")
    np.testing.assert_allclose(run(), want, atol=5e-5, rtol=1e-4)
    monkeypatch.delenv("MSMD_FAST_SOFTMAX")

    monkeypatch.setenv("MSMD_GELU", "tanh")
    np.testing.assert_allclose(run(), want, atol=5e-3, rtol=5e-3)
    diff = np.abs(run() - want).max()
    assert diff > 1e-6  # the knob actually switched implementations

    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")  # both together
    np.testing.assert_allclose(run(), want, atol=5e-3, rtol=5e-3)
    # don't leak the tanh+fast trace: monkeypatch restores the env at
    # teardown but the jit cache would keep serving the knob-flipped
    # trace to later same-shape tests
    jax.clear_caches()


def test_fast_softmax_extreme_logits_guard(monkeypatch):
    """ADVICE r3 (medium): the no-max-subtraction fast softmax must not
    emit inf/NaN for checkpoint-dependent extreme logits. A row whose
    real logits all sit below ~-83 underflowed every exp(s-20) to 0
    (reciprocal of the zero row-sum -> inf); logits above ~108
    overflowed. _clamp_unmasked degrades such rows to the correct
    uniform / saturated limits while masked scores stay exactly 0."""
    from msmd_tpu.ops.pallas.decoder_kernel import _attn_pv, _softmax_fast

    def dot(a, b):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    v = jnp.asarray(np.random.RandomState(0).randn(6, 4), jnp.bfloat16)

    # all-underflow row (< -83), mixed row, overflow row; one masked col
    s = np.full((3, 6), -200.0, np.float32)
    s[1] = [0.0, -1.0, 2.0, -3.0, 1.0, 0.5]
    s[2] = [150.0, 140.0, 0.0, 0.0, 0.0, 0.0]
    s[:, -1] = -1e30  # structural mask
    s = jnp.asarray(s)

    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "auto")
    out = np.asarray(_attn_pv(s, v, dot, jnp.bfloat16))
    assert np.isfinite(out).all(), out

    # the all-underflow row must be the uniform average of the UNMASKED
    # value rows (the exact softmax limit for equal logits)
    want_row0 = np.asarray(v[:-1], np.float32).mean(axis=0)
    np.testing.assert_allclose(out[0], want_row0, atol=0.05)

    # moderate logits are untouched by the clamp: matches safe softmax
    p = jax.nn.softmax(s[1:2], axis=-1)
    want_row1 = np.asarray(dot(p, v))
    np.testing.assert_allclose(out[1], want_row1[0], atol=1e-2)

    # explicit-1 row-softmax form is guarded too
    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")
    p = np.asarray(_softmax_fast(s))
    assert np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-5)
    assert p[:, -1].max() == 0.0  # masked column contributes nothing


def test_attn_middle_viability_gate():
    """ADVICE r3: MSMD_ATTN_KERNEL=1 must not reach attention_middle for
    shapes whose rows cannot form an 8-aligned tile (Mosaic sublane
    failures on silicon). The viability predicate admits the probed
    decoder geometry and rejects unalignable ones."""
    from msmd_tpu.ops.pallas.attn_kernel import attn_middle_viable

    assert attn_middle_viable(96, 126, 512, 8)   # decoder geometry (tile 4)
    assert attn_middle_viable(8, 111, 512, 8)    # odd lq, 8-divisible batch
    assert not attn_middle_viable(3, 10, 512, 8)  # no 8-aligned tile exists
    assert not attn_middle_viable(8, 111, 96, 8)  # head dim 12: not sublane-aligned


def test_scan_kernel_blockdiag_and_merged_person(monkeypatch):
    """The round-5 latency-regime scan-kernel rewrites — block-diagonal
    two-entry self-attention (MSMD_SCAN_BLOCKDIAG: one masked dot per
    head over the flattened rows instead of per-entry dots) and
    merged-head person cross-attention (MSMD_MERGED_PERSON, requires the
    fast softmax) — match the per-entry/unrolled baseline through the
    full 4-step sampler. Block-diag is exact in f32 (masked scores exp
    to exactly 0, and x*0 terms accumulate exactly)."""
    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.audio import AudioEncoderConfig
    from msmd_tpu.models.diffusion import get_diffusion_model, sample

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2,
        use_indicator=True, compute_dtype="float32",
    )
    audio_cfg = AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
    )
    model = get_diffusion_model(cfg, audio_config=audio_cfg, dtype=jnp.float32)
    rs = np.random.RandomState(7)
    motion = jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.asarray(rs.randn(1, cfg.n_audio_samples).astype(np.float32) * 0.1)
    shape = jnp.asarray(rs.randn(1, 100).astype(np.float32) * 0.1)
    style = jnp.asarray(rs.randn(1, cfg.d_style).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        motion, audio, shape, style, deterministic=True,
    )
    mT = jnp.asarray(rs.randn(1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    z = jnp.asarray(rs.randn(cfg.n_diff_steps, 1, cfg.n_motions, cfg.motion_feat_dim).astype(np.float32))
    kw = dict(motion_at_T=mT, noise_override=z)

    def run():
        jax.clear_caches()  # knobs are read at trace time
        m, _, _ = sample(model, variables, jax.random.PRNGKey(2), audio, shape, style,
                         fused_decoder=True, **kw)
        return np.asarray(m, np.float32)

    base = run()
    assert np.isfinite(base).all()

    # block-diag self-attention, padded layout (lq=13 odd -> pad on)
    monkeypatch.setenv("MSMD_SCAN_BLOCKDIAG", "1")
    np.testing.assert_allclose(run(), base, atol=5e-5, rtol=1e-4)

    # and the unpadded layout
    monkeypatch.setenv("MSMD_SCAN_PAD", "0")
    np.testing.assert_allclose(run(), base, atol=5e-5, rtol=1e-4)
    monkeypatch.delenv("MSMD_SCAN_PAD")

    # merged-head person cross-attention (fast softmax required)
    monkeypatch.setenv("MSMD_MERGED_PERSON", "1")
    monkeypatch.setenv("MSMD_FAST_SOFTMAX", "1")
    np.testing.assert_allclose(run(), base, atol=5e-4, rtol=5e-4)

    # both together
    monkeypatch.setenv("MSMD_SCAN_BLOCKDIAG", "1")
    np.testing.assert_allclose(run(), base, atol=5e-4, rtol=5e-4)

    # without the fast softmax merged-person must auto-disable
    monkeypatch.delenv("MSMD_FAST_SOFTMAX")
    monkeypatch.delenv("MSMD_SCAN_BLOCKDIAG")
    np.testing.assert_allclose(run(), base, atol=5e-5, rtol=1e-4)
    jax.clear_caches()
