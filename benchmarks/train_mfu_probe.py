#!/usr/bin/env python
"""Attribute the training-step MFU gap (VERDICT r4 item 4).

The full train step (two_clip_loss fwd + bwd + Adam; reference
training_script.py:49-241 semantics) runs at ~0.25-0.31 MFU against the
v5e bf16 peak. This probe times the step's constituent programs at the
paper config so the gap is attributable to a component instead of
hand-waved:

  full_step      fwd+bwd+Adam (the production program, bench_train's)
  loss_fwd       two_clip_loss forward only (no grad)
  audio_fwd      ONE hubert-base forward at the 2B clip batch
  denoiser_fwd   ONE denoiser forward at the 2B window batch
  matmul_peak    a (4096, 4096) @ (4096, 4096) bf16 chain — what this
                 chip actually sustains on ideal shapes (control row)

Each row reports wall time, XLA's own FLOP count for the compiled
program, and the achieved TFLOP/s. All timings are pipelined
(dispatch-all, fetch-once — how Trainer.fit runs) with a warmup fetch
first (the axon tunnel executes lazily). Prints one JSON line per row.
Run on the real chip: python benchmarks/train_mfu_probe.py
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _timing import configure_cache  # noqa: E402

REPS = int(os.environ.get("MSMD_PROBE_REPS", "5"))


def _flops_of(fn, *args):
    try:
        import jax

        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _time_pipelined(fn, fetch, *args):
    """Median-of-3 pipelined wall time for REPS dispatches + one fetch."""
    import jax

    fetch(fn(*args))  # warmup/compile (forces the lazy tunnel)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):
            out = fn(*args)
        fetch(out)
        walls.append((time.perf_counter() - t0) / REPS)
    return sorted(walls)[1]


def _row(name, wall, flops, extra=None):
    rec = {
        "metric": f"train_mfu_probe:{name}",
        "value": round(wall * 1e3, 3),
        "unit": "ms",
        "tflops_achieved": round(flops / wall / 1e12, 1) if flops else None,
        "mfu_vs_197tflops": round(flops / wall / 197e12, 3) if flops else None,
        "program_tflop": round(flops / 1e12, 3) if flops else None,
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def main():
    import jax

    configure_cache()
    import jax.numpy as jnp
    import numpy as np

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.models.diffusion import get_diffusion_model
    from msmd_tpu.models.style_encoder import get_style_encoder
    from msmd_tpu.parallel.mesh import make_mesh, replicate_sharding, shard_batch
    from msmd_tpu.train.loop import create_train_state, make_train_step, two_clip_loss

    batch = int(os.environ.get("MSMD_TRAIN_BENCH_BATCH", "16"))
    cfg = MSMDConfig(batch_size=batch, compute_dtype="bfloat16")
    model = get_diffusion_model(cfg, dtype=jnp.bfloat16)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)
    mesh = make_mesh(("data",))
    state = jax.device_put(state, replicate_sharding(mesh))

    rng = np.random.RandomState(0)
    L_a = cfg.n_audio_samples
    batch_data = shard_batch(
        {
            "audio_0": rng.randn(batch, L_a).astype(np.float32),
            "audio_1": rng.randn(batch, L_a).astype(np.float32),
            "motion_0": rng.randn(batch, cfg.n_motions, 67).astype(np.float32),
            "motion_1": rng.randn(batch, cfg.n_motions, 67).astype(np.float32),
            "shape_0": np.zeros((batch, cfg.n_motions, 100), np.float32),
            "shape_1": np.zeros((batch, cfg.n_motions, 100), np.float32),
        },
        mesh,
    )
    key = jax.random.PRNGKey(1)

    # ---- full production step ------------------------------------------
    # (state is donated, so each dispatch chain rebinds it)
    step = make_train_step(cfg, model, style_enc, tx)
    state2, _ = step(state, batch_data, key)  # compile (donates `state`)

    walls = []
    for _ in range(3):
        s = state2
        t0 = time.perf_counter()
        m = None
        for i in range(REPS):
            s, m = step(s, batch_data, jax.random.fold_in(key, i))
        float(m["loss"])
        walls.append((time.perf_counter() - t0) / REPS)
        state2 = s
    wall_full = sorted(walls)[1]
    # FLOPs: reuse bench_train's approach on a fresh (undonated) state
    s3 = jax.device_put(create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)[0], replicate_sharding(mesh))
    fl_full = _flops_of(step, s3, batch_data, key)
    _row("full_step", wall_full, fl_full, {"batch": batch})

    # ---- forward-only loss ----------------------------------------------
    params = s3.params

    @jax.jit
    def loss_fwd(params, batch_d, key):
        total, _ = two_clip_loss(cfg, model, style_enc, params, batch_d, key, train=True)
        return total

    wall = _time_pipelined(loss_fwd, float, params, batch_data, key)
    _row("loss_fwd", wall, _flops_of(loss_fwd, params, batch_data, key))

    # ---- audio encoder forward at the 2B clip batch ----------------------
    # (the same call the train forward makes: diffusion.py MSMD.__call__,
    # hubert-base at 2*batch rows, 200 output frames)
    from msmd_tpu.models.audio import AudioEncoder
    from msmd_tpu.ops.seq import pad_audio

    audio2 = jnp.concatenate([batch_data["audio_0"], batch_data["audio_1"]], 0)
    avars = {"params": params["model"]["audio_encoder"]}
    amodel = AudioEncoder(dtype=jnp.bfloat16)

    @jax.jit
    def audio_fwd(avars, audio):
        return jnp.sum(
            amodel.apply(avars, pad_audio(audio), cfg.fps, cfg.n_motions * 2,
                         deterministic=True).astype(jnp.float32)
        )

    try:
        wall = _time_pipelined(audio_fwd, float, avars, audio2)
        _row("audio_fwd_2B", wall, _flops_of(audio_fwd, avars, audio2), {"rows": int(audio2.shape[0])})
    except Exception as e:  # keep the probe usable if the subtree moves
        print(json.dumps({"metric": "train_mfu_probe:audio_fwd_2B", "error": str(e)[:200]}), flush=True)

    # ---- denoiser forward at the 2B window batch --------------------------
    # (the hot module: n_layers decoder blocks over 1+L_p+L tokens; this is
    # the per-invocation cost inside the train forward, reference
    # model.py:914-996 semantics)
    from msmd_tpu.models.diffusion import MSMD

    B2 = 2 * batch
    mvars = {"params": params["model"]}
    motion = jnp.asarray(rng.randn(B2, cfg.n_motions, cfg.motion_feat_dim), jnp.float32)
    afeat = jnp.asarray(rng.randn(B2, cfg.n_motions, cfg.feature_dim), jnp.float32)
    person = jnp.asarray(rng.randn(B2, 1, cfg.shape_feat_dim + cfg.d_style), jnp.float32)
    style_f = jnp.asarray(rng.randn(B2, 1, cfg.d_style), jnp.float32)
    prev_m = jnp.asarray(rng.randn(B2, cfg.n_prev_motions, cfg.motion_feat_dim), jnp.float32)
    prev_a = jnp.asarray(rng.randn(B2, cfg.n_prev_motions, cfg.feature_dim), jnp.float32)
    steps = jnp.zeros((B2,), jnp.int32)

    @jax.jit
    def denoiser_fwd(mvars, motion, afeat, person, style_f, prev_m, prev_a, steps):
        out = model.apply(
            mvars, motion, afeat, person, style_f, prev_m, prev_a, steps,
            method=MSMD.denoise,
        )
        return jnp.sum(out.astype(jnp.float32))

    try:
        d_args = (mvars, motion, afeat, person, style_f, prev_m, prev_a, steps)
        wall = _time_pipelined(denoiser_fwd, float, *d_args)
        _row("denoiser_fwd_2B", wall, _flops_of(denoiser_fwd, *d_args), {"rows": B2})
    except Exception as e:
        print(json.dumps({"metric": "train_mfu_probe:denoiser_fwd_2B", "error": str(e)[:200]}), flush=True)

    # ---- MXU control row --------------------------------------------------
    a = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    b = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(8):
            x = jax.lax.dot(x, b, precision=None, preferred_element_type=jnp.bfloat16)
        return jnp.float32(x[0, 0])

    wall = _time_pipelined(chain, float, a, b)
    fl = 8 * 2 * 4096**3
    _row("matmul_peak_4096", wall, float(fl))


if __name__ == "__main__":
    main()
