"""DDPM noise schedule tables (reference: model.py:20-71).

The schedule is a frozen pytree of jnp arrays so it can be closed over by
jitted train/sample steps or passed as an argument; nothing here is
stateful. All four beta modes of the reference are supported, including
its exact quirks: the beta_0 = 0 padding (model.py:41) and the alpha-bar
computed via a cumulative log-sum (model.py:44-47).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(num_steps: int, mode: str = "linear", beta_1: float = 1e-4, beta_T: float = 0.02, s: float = 0.008) -> np.ndarray:
    if mode == "linear":
        betas = np.linspace(beta_1, beta_T, num_steps, dtype=np.float64)
    elif mode == "quadratic":
        betas = np.linspace(beta_1 ** 0.5, beta_T ** 0.5, num_steps, dtype=np.float64) ** 2
    elif mode == "sigmoid":
        x = np.linspace(-5.0, 5.0, num_steps, dtype=np.float64)
        betas = 1.0 / (1.0 + np.exp(-x)) * (beta_T - beta_1) + beta_1
    elif mode == "cosine":
        steps = num_steps + 1
        x = np.linspace(0, num_steps, steps, dtype=np.float64)
        alpha_bars = np.cos(((x / num_steps) + s) / (1 + s) * np.pi * 0.5) ** 2
        alpha_bars = alpha_bars / alpha_bars[0]
        betas = 1 - (alpha_bars[1:] / alpha_bars[:-1])
        betas = np.clip(betas, 0.0001, 0.999)
    else:
        raise ValueError(f"Unknown diffusion schedule {mode}!")
    return betas.astype(np.float32)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DiffusionSchedule:
    """Tables indexed by t in [0, num_steps]; index 0 is the padded
    no-noise step (beta_0 = 0, reference model.py:41)."""

    num_steps: int
    betas: jnp.ndarray  # (T+1,)
    alphas: jnp.ndarray  # (T+1,)
    alpha_bars: jnp.ndarray  # (T+1,)
    sigmas_flex: jnp.ndarray  # (T+1,)
    sigmas_inflex: jnp.ndarray  # (T+1,)

    @classmethod
    def create(cls, num_steps: int, mode: str = "linear", beta_1: float = 1e-4, beta_T: float = 0.02, s: float = 0.008) -> "DiffusionSchedule":
        # Build in float32 NumPy to mirror the torch-float32 reference
        # tables bit-for-bit in spirit (the cumulative log-sum included).
        betas = np.concatenate([np.zeros(1, np.float32), make_betas(num_steps, mode, beta_1, beta_T, s)])
        alphas = 1.0 - betas
        log_alphas = np.log(alphas)
        log_alphas = np.cumsum(log_alphas)  # matches the in-place loop at model.py:44-46
        alpha_bars = np.exp(log_alphas).astype(np.float32)

        sigmas_flex = np.sqrt(betas).astype(np.float32)
        sigmas_inflex = np.zeros_like(sigmas_flex)
        sigmas_inflex[1:] = ((1 - alpha_bars[:-1]) / (1 - alpha_bars[1:])) * betas[1:]
        sigmas_inflex = np.sqrt(sigmas_inflex).astype(np.float32)

        return cls(
            num_steps=num_steps,
            betas=jnp.asarray(betas),
            alphas=jnp.asarray(alphas.astype(np.float32)),
            alpha_bars=jnp.asarray(alpha_bars),
            sigmas_flex=jnp.asarray(sigmas_flex),
            sigmas_inflex=jnp.asarray(sigmas_inflex),
        )

    def uniform_sample_t(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Uniform timestep in [1, num_steps] (reference: model.py:63-65)."""
        return jax.random.randint(key, (batch_size,), 1, self.num_steps + 1)

    def get_sigmas(self, t, flexibility: float = 0.0) -> jnp.ndarray:
        """sigma(t) blended between the flexible (sqrt beta) and inflexible
        (posterior) variants (reference: model.py:68-71)."""
        return self.sigmas_flex[t] * flexibility + self.sigmas_inflex[t] * (1.0 - flexibility)

    # -- pytree plumbing --------------------------------------------------
    def tree_flatten(self):
        children = (self.betas, self.alphas, self.alpha_bars, self.sigmas_flex, self.sigmas_inflex)
        return children, self.num_steps

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux, *children)
