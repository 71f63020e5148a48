"""DiffusionSchedule parity vs an independent torch oracle implementing
the published DDPM table formulas (reference behavior: model.py:20-71)."""

import numpy as np
import pytest
import torch

from msmd_tpu.ops.schedule import DiffusionSchedule


def torch_oracle(num_steps, mode, beta_1=1e-4, beta_T=0.02, s=0.008):
    # Independent torch implementation of the same published formulas.
    if mode == "linear":
        betas = torch.linspace(beta_1, beta_T, num_steps)
    elif mode == "quadratic":
        betas = torch.linspace(beta_1 ** 0.5, beta_T ** 0.5, num_steps) ** 2
    elif mode == "sigmoid":
        betas = torch.sigmoid(torch.linspace(-5, 5, num_steps)) * (beta_T - beta_1) + beta_1
    elif mode == "cosine":
        x = torch.linspace(0, num_steps, num_steps + 1)
        ab = torch.cos(((x / num_steps) + s) / (1 + s) * torch.pi * 0.5) ** 2
        ab = ab / ab[0]
        betas = torch.clip(1 - ab[1:] / ab[:-1], 0.0001, 0.999)
    betas = torch.cat([torch.zeros(1), betas])
    alphas = 1 - betas
    log_alphas = torch.log(alphas)
    for i in range(1, len(log_alphas)):
        log_alphas[i] += log_alphas[i - 1]
    alpha_bars = log_alphas.exp()
    sigmas_flex = torch.sqrt(betas)
    sigmas_inflex = torch.zeros_like(sigmas_flex)
    for i in range(1, len(sigmas_flex)):
        sigmas_inflex[i] = ((1 - alpha_bars[i - 1]) / (1 - alpha_bars[i])) * betas[i]
    sigmas_inflex = torch.sqrt(sigmas_inflex)
    return betas, alphas, alpha_bars, sigmas_flex, sigmas_inflex


@pytest.mark.parametrize("mode", ["linear", "quadratic", "sigmoid", "cosine"])
def test_schedule_matches_oracle(mode):
    n = 50
    sched = DiffusionSchedule.create(n, mode)
    ob, oa, oab, osf, osi = torch_oracle(n, mode)
    np.testing.assert_allclose(np.asarray(sched.betas), ob.numpy(), rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(sched.alphas), oa.numpy(), rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(sched.alpha_bars), oab.numpy(), rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.sigmas_flex), osf.numpy(), rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(np.asarray(sched.sigmas_inflex), osi.numpy(), rtol=3e-4, atol=1e-6)


def test_schedule_properties():
    sched = DiffusionSchedule.create(500, "cosine")
    assert sched.betas.shape == (501,)
    assert float(sched.betas[0]) == 0.0  # beta_0 = 0 padding
    assert float(sched.alpha_bars[0]) == pytest.approx(1.0)
    # alpha_bar monotonically decreasing
    ab = np.asarray(sched.alpha_bars)
    assert (np.diff(ab) <= 0).all()


def test_uniform_sample_t_range(rng_key):
    sched = DiffusionSchedule.create(10, "linear")
    ts = np.asarray(sched.uniform_sample_t(rng_key, 1000))
    assert ts.min() >= 1 and ts.max() <= 10


def test_get_sigmas_blend():
    sched = DiffusionSchedule.create(10, "linear")
    t = 5
    s0 = float(sched.get_sigmas(t, 0.0))
    s1 = float(sched.get_sigmas(t, 1.0))
    assert s0 == pytest.approx(float(sched.sigmas_inflex[t]))
    assert s1 == pytest.approx(float(sched.sigmas_flex[t]))
