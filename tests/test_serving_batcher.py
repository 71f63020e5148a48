"""StreamingBatcher tests: slot isolation (a stream's output is
independent of which other streams share its batch), exact parity with
the offline `infer_coeffs` path on single-window clips given the same
noise, multi-window carry semantics, and scheduler bookkeeping
(partial final windows, round-robin oversubscription)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmd_tpu.inference_lib import infer_coeffs
from msmd_tpu.models.diffusion import get_diffusion_model
from msmd_tpu.serving import StreamingBatcher

from test_train_step import TINY_AUDIO, tiny_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg(do_ignore_cfg=False)
    model = get_diffusion_model(cfg, audio_config=TINY_AUDIO)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2), "spec_augment": jax.random.PRNGKey(3)},
        jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim)),
        jnp.zeros((1, cfg.n_audio_samples)),
        jnp.zeros((1, cfg.shape_feat_dim)),
        jnp.zeros((1, cfg.d_style)),
        deterministic=True,
    )
    return cfg, model, {"params": variables["params"]}


def _audio(cfg, n_windows, seed, extra_samples=0):
    rng = np.random.RandomState(seed)
    n = int(cfg.n_audio_samples * n_windows + extra_samples)
    return rng.randn(n).astype(np.float32)


def _style(cfg, seed):
    return np.random.RandomState(100 + seed).randn(cfg.d_style).astype(np.float32)


def test_single_window_matches_infer_coeffs(setup):
    """Batcher output == offline infer_coeffs when fed the batcher's
    slot-local noise derivation explicitly."""
    cfg, model, variables = setup
    bat = StreamingBatcher(model, variables, max_slots=2)
    key = jax.random.PRNGKey(42)
    audio = _audio(cfg, 1, seed=5)
    style = _style(cfg, 0)
    bat.add_stream("a", key, style=style)
    bat.push_audio("a", audio, final=True)
    assert bat.step() == 1
    assert bat.finished("a")
    out = bat.output("a")
    assert out.shape == (cfg.n_motions, cfg.motion_feat_dim)

    # replicate the documented slot-local derivation for window 0
    k_w = jax.random.fold_in(key, 0)
    mT = jax.random.normal(jax.random.fold_in(k_w, 0), (cfg.n_motions, cfg.motion_feat_dim))
    z = jax.random.normal(
        jax.random.fold_in(k_w, 1), (cfg.n_diff_steps, cfg.n_motions, cfg.motion_feat_dim)
    )
    ref = infer_coeffs(
        model, variables, jax.random.PRNGKey(0), jnp.asarray(audio),
        jnp.zeros((1, cfg.shape_feat_dim)), audio_unit=cfg.audio_unit,
        style_feats=jnp.asarray(style)[None], dynamic_threshold=None,
        motion_at_T=mT[None], noise_override=z[:, None],
    )
    np.testing.assert_allclose(out, np.asarray(ref)[0], rtol=1e-5, atol=1e-5)


def test_stream_isolation(setup):
    """The same stream produces identical output alone vs sharing its
    batch with other streams (slot-local RNG + row-wise programs)."""
    cfg, model, variables = setup
    key = jax.random.PRNGKey(7)
    audio = _audio(cfg, 2, seed=9)
    style = _style(cfg, 1)

    def run(with_others):
        bat = StreamingBatcher(model, variables, max_slots=3)
        bat.add_stream("x", key, style=style)
        bat.push_audio("x", audio, final=True)
        if with_others:
            for j, sid in enumerate(["o1", "o2"]):
                bat.add_stream(sid, jax.random.PRNGKey(200 + j), style=_style(cfg, 10 + j))
                bat.push_audio(sid, _audio(cfg, 2, seed=20 + j), final=True)
        bat.run_until_drained()
        return bat.output("x")

    alone, mixed = run(False), run(True)
    np.testing.assert_allclose(alone, mixed, rtol=1e-5, atol=1e-6)


def test_multi_window_carry_and_noise_reuse(setup):
    """Window 1 must consume window 0's last n_prev frames + audio-feature
    rows and REUSE window 0's motion_at_T (reference inference.py:64-69);
    corrupting any of those carries must change the output."""
    cfg, model, variables = setup
    key = jax.random.PRNGKey(3)
    audio = _audio(cfg, 2, seed=11)
    style = _style(cfg, 2)

    bat = StreamingBatcher(model, variables, max_slots=1)
    bat.add_stream("s", key, style=style)
    bat.push_audio("s", audio, final=True)
    assert bat.step() == 1 and not bat.finished("s")
    w0 = bat.output("s").copy()
    prev_motion, _, motion_at_T = bat.stream_carry("s")
    # the carry IS the last n_prev generated frames
    np.testing.assert_array_equal(prev_motion, w0[-cfg.n_prev_motions:])
    # motion_at_T is reused, not redrawn, across windows
    k_w = jax.random.fold_in(key, 0)
    mT0 = jax.random.normal(jax.random.fold_in(k_w, 0), (cfg.n_motions, cfg.motion_feat_dim))
    np.testing.assert_allclose(motion_at_T, np.asarray(mT0), rtol=1e-6, atol=1e-6)

    assert bat.step() == 1 and bat.finished("s")
    full = bat.output("s")
    assert full.shape == (2 * cfg.n_motions, cfg.motion_feat_dim)

    # corrupted carry -> different window-1 output
    bat2 = StreamingBatcher(model, variables, max_slots=1)
    bat2.add_stream("s", key, style=style)
    bat2.push_audio("s", audio, final=True)
    bat2.step()
    pm2, _, _ = bat2.stream_carry("s")
    bat2.set_stream_carry("s", prev_motion=pm2 + 1.0)
    bat2.step()
    assert not np.allclose(bat2.output("s")[cfg.n_motions:], full[cfg.n_motions:])


def test_partial_final_window_trim(setup):
    """A final partial window pads audio, masks the indicator tail and
    trims the output to the real frame count (inference.py:41-44)."""
    cfg, model, variables = setup
    extra = int(cfg.audio_unit * 3)  # 3 frames into a second window
    audio = _audio(cfg, 1, seed=13, extra_samples=extra)
    bat = StreamingBatcher(model, variables, max_slots=2)
    bat.add_stream("p", jax.random.PRNGKey(5), style=_style(cfg, 3))
    bat.push_audio("p", audio, final=True)
    bat.run_until_drained()
    assert bat.finished("p")
    assert bat.output("p").shape == (cfg.n_motions + 3, cfg.motion_feat_dim)


def test_round_robin_oversubscription(setup):
    """5 streams on 2 slots all complete; per-round work is capped."""
    cfg, model, variables = setup
    bat = StreamingBatcher(model, variables, max_slots=2)
    for i in range(5):
        bat.add_stream(f"s{i}", jax.random.PRNGKey(i), style=_style(cfg, i))
        bat.push_audio(f"s{i}", _audio(cfg, 1, seed=i), final=True)
    rounds = 0
    while any(not bat.finished(f"s{i}") for i in range(5)):
        n = bat.step()
        assert 0 < n <= 2
        rounds += 1
        assert rounds <= 10
    assert rounds == 3  # ceil(5/2)
    for i in range(5):
        assert bat.output(f"s{i}").shape == (cfg.n_motions, cfg.motion_feat_dim)


def test_eviction_carry_roundtrip_exact(setup):
    """Multi-window streams oversubscribed on fewer slots: slot eviction
    (device -> host carry export) and re-admission (host -> device
    restore) must preserve every stream's output vs the same stream
    served alone. The comparison crosses two program shapes (2-slot vs
    1-slot batch), so it is tolerance-based like test_stream_isolation;
    the BIT-exactness of the carry roundtrip itself is proven at equal
    program shape by test_stream_carry_migration."""
    cfg, model, variables = setup
    n_streams, n_windows = 3, 2

    def run_alone(i):
        bat = StreamingBatcher(model, variables, max_slots=1)
        bat.add_stream("s", jax.random.PRNGKey(40 + i), style=_style(cfg, 40 + i))
        bat.push_audio("s", _audio(cfg, n_windows, seed=40 + i), final=True)
        bat.run_until_drained()
        return bat.output("s")

    bat = StreamingBatcher(model, variables, max_slots=2)
    for i in range(n_streams):
        bat.add_stream(f"s{i}", jax.random.PRNGKey(40 + i), style=_style(cfg, 40 + i))
        bat.push_audio(f"s{i}", _audio(cfg, n_windows, seed=40 + i), final=True)
    total = bat.run_until_drained()
    assert total == n_streams * n_windows
    evicted_ever = any(s.prev_motion is not None for s in bat._streams.values())
    assert evicted_ever, "test setup failed to exercise the eviction path"
    for i in range(n_streams):
        np.testing.assert_allclose(bat.output(f"s{i}"), run_alone(i), rtol=1e-5, atol=1e-6)


def test_stream_carry_migration(setup):
    """Export a mid-clip stream from one batcher and import it into a
    fresh one (process migration); the migrated stream's remaining
    output is identical to staying put."""
    cfg, model, variables = setup
    key, style = jax.random.PRNGKey(77), _style(cfg, 77)
    audio = _audio(cfg, 2, seed=77)
    n_a = cfg.n_audio_samples

    bat = StreamingBatcher(model, variables, max_slots=1)
    bat.add_stream("s", key, style=style)
    bat.push_audio("s", audio, final=True)
    assert bat.step() == 1
    stay = bat
    carry = stay.stream_carry("s")

    mig = StreamingBatcher(model, variables, max_slots=1)
    mig.add_stream("s", key, style=style)
    mig._streams["s"].window_idx = stay._streams["s"].window_idx
    mig.set_stream_carry("s", *carry)  # import before the first step
    mig.push_audio("s", audio[n_a:], final=True)
    mig.step()

    stay.step()
    np.testing.assert_array_equal(
        stay.output("s")[cfg.n_motions:], mig.output("s")
    )


def test_pipeline_depth_output_equality(setup):
    """pipeline_depth only reorders host fetches (compute consumes the
    device-resident carries): outputs are BIT-identical to the
    synchronous depth-1 batcher, and finished/flush bookkeeping holds."""
    cfg, model, variables = setup

    def run(depth):
        bat = StreamingBatcher(model, variables, max_slots=2, pipeline_depth=depth)
        for i in range(2):
            bat.add_stream(f"s{i}", jax.random.PRNGKey(60 + i), style=_style(cfg, 60 + i))
            bat.push_audio(f"s{i}", _audio(cfg, 3, seed=60 + i), final=True)
        assert bat.run_until_drained() == 6
        assert all(bat.finished(f"s{i}") for i in range(2))
        return [bat.output(f"s{i}") for i in range(2)]

    sync, piped = run(1), run(3)
    for a, b in zip(sync, piped):
        np.testing.assert_array_equal(a, b)
