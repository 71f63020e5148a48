#!/usr/bin/env python
"""Does XLA DCE the backward work for FROZEN params?

The reference freezes the audio-encoder conv extractor (+ hubert
feature projection and encoder layers 0-1, model.py:93-110). Our step
computes the FULL grad tree and lets optax.multi_transform zero the
frozen leaves — inside one jit, so XLA *could* DCE the frozen-subtree
backward. This probe compares XLA's own FLOP count for

  (a) the shipped step (full-tree grad + optax set_to_zero mask)
  (b) a trainable-only grad (frozen leaves closed over, grads rebuilt
      as zeros) — semantically identical updates

Platform-independent (FLOP counts), so it runs on CPU.

Usage: [MSMD_PROBE_BATCH=2] python benchmarks/frozen_grad_probe.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import json

import jax

from msmd_tpu.platform import apply_platform_env

apply_platform_env()

import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.diffusion import get_diffusion_model
from msmd_tpu.models.style_encoder import get_style_encoder
from msmd_tpu.train.loop import (
    TrainState,
    create_train_state,
    make_train_step,
    trainable_mask,
    two_clip_loss,
)


def flops_of(fn, *args):
    compiled = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def main():
    batch_size = int(os.environ.get("MSMD_PROBE_BATCH", "2"))
    cfg = MSMDConfig(batch_size=batch_size)
    model = get_diffusion_model(cfg)
    style_enc = get_style_encoder(cfg, "vae2")
    state, tx = create_train_state(cfg, jax.random.PRNGKey(0), model, style_enc)

    rng = np.random.RandomState(0)
    L_a = cfg.n_audio_samples
    batch = {
        "audio_0": jnp.asarray(rng.randn(batch_size, L_a), jnp.float32),
        "audio_1": jnp.asarray(rng.randn(batch_size, L_a), jnp.float32),
        "motion_0": jnp.asarray(rng.randn(batch_size, cfg.n_motions, 67), jnp.float32),
        "motion_1": jnp.asarray(rng.randn(batch_size, cfg.n_motions, 67), jnp.float32),
        "shape_0": jnp.zeros((batch_size, cfg.n_motions, 100), jnp.float32),
        "shape_1": jnp.zeros((batch_size, cfg.n_motions, 100), jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    # (a) shipped step
    def step_full(state, batch, key):
        def loss_fn(params):
            return two_clip_loss(cfg, model, style_enc, params, batch, key, train=True)

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    # (b) trainable-only grad
    mask = traverse_util.flatten_dict(trainable_mask(cfg, state.params))

    def split(params):
        flat = traverse_util.flatten_dict(params)
        train = {p: v for p, v in flat.items() if mask[p]}
        frozen = {p: v for p, v in flat.items() if not mask[p]}
        return train, frozen

    def step_trainable(state, batch, key):
        train_flat, frozen_flat = split(state.params)

        def loss_fn(train_part):
            params = traverse_util.unflatten_dict({**frozen_flat, **train_part})
            return two_clip_loss(cfg, model, style_enc, params, batch, key, train=True)

        (_, metrics), g_train = jax.value_and_grad(loss_fn, has_aux=True)(train_flat)
        g_flat = {**{p: jnp.zeros_like(v) for p, v in frozen_flat.items()}, **g_train}
        grads = traverse_util.unflatten_dict(g_flat)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    f_full = flops_of(step_full, state, batch, key)
    f_train = flops_of(step_trainable, state, batch, key)
    n_frozen = sum(1 for v in mask.values() if not v)
    print(
        json.dumps(
            {
                "metric": f"frozen-grad DCE probe (batch {batch_size}, hubert-base)",
                "full_grad_tflop": round(f_full / 1e12, 4),
                "trainable_only_tflop": round(f_train / 1e12, 4),
                "savings_pct": round(100 * (1 - f_train / f_full), 2) if f_full else None,
                "frozen_leaves": n_frozen,
                "value": round(f_full / f_train, 4) if f_train else None,
                "unit": "x fewer FLOPs with trainable-only grad",
            }
        )
    )


if __name__ == "__main__":
    main()
