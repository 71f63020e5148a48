"""Learning-rate schedules as optax schedule functions.

Replicates the reference's GradualWarmupScheduler semantics (reference:
utils/scheduler.py:8-67 with multiplier=1, wired at
training_script.py:572-581): lr ramps linearly 0 -> base over
``warm_iter`` steps; 'WarmupThenDecay' then cosine-anneals to
``lr * min_lr_ratio`` over ``cos_max_iter - warm_iter`` steps and holds
(the reference stops stepping the scheduler at cos_max_iter,
training_script.py:222-224)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_schedule(lr: float, warm_iter: int):
    if warm_iter <= 0:  # no warmup requested -> constant lr
        return lambda step: jnp.full_like(jnp.asarray(step, jnp.float32), lr)

    def schedule(step):
        frac = jnp.minimum(step / warm_iter, 1.0)
        return lr * frac

    return schedule


def warmup_then_cosine_schedule(lr: float, warm_iter: int, cos_max_iter: int, min_lr_ratio: float):
    min_lr = lr * min_lr_ratio

    def schedule(step):
        warm = lr * jnp.minimum(step / max(warm_iter, 1), 1.0)
        progress = jnp.clip((step - warm_iter) / max(cos_max_iter - warm_iter, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step <= warm_iter, warm, cos)

    return schedule


def make_schedule(cfg):
    if cfg.scheduler == "Warmup":
        return warmup_schedule(cfg.lr, cfg.warm_iter)
    if cfg.scheduler == "WarmupThenDecay":
        return warmup_then_cosine_schedule(cfg.lr, cfg.warm_iter, cfg.cos_max_iter, cfg.min_lr_ratio)
    return lambda step: cfg.lr
