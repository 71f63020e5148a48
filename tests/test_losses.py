"""Loss suite vs independent torch/numpy oracles implementing the same
masked-mean/shifted-mask semantics the reference training loop relies on."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from msmd_tpu.config import MSMDConfig
from msmd_tpu.losses import (
    _masked_mean,
    compute_kl_loss,
    compute_loss,
    compute_loss_no_vert,
    get_coef_dict,
    get_motion_coef,
    load_loss_weights,
    nt_xent_loss,
    style_adherence_loss,
    truncate_motion_coef_and_audio,
)
from msmd_tpu.models.flame import synthetic_flame


def cfg_for_loss(**kw):
    base = dict(n_motions=10, n_prev_motions=4, target="sample", criterion="l2")
    base.update(kw)
    return MSMDConfig(**base)


def torch_loss_no_vert_oracle(cfg, is_starting, gt, target, prev, end_idx):
    """Independent oracle of the documented param-space loss semantics."""
    gt, target = torch.from_numpy(gt), torch.from_numpy(target)
    prev = torch.from_numpy(prev)
    crit = lambda a, b: F.mse_loss(a, b, reduction="none")

    if is_starting:
        target = target[:, cfg.n_prev_motions :]
    else:
        gt = torch.cat([prev, gt], dim=1)

    loss_noise = crit(gt, target)
    exp_gt, pose_gt = gt[..., :-3], gt[..., -3:]
    exp_p, pose_p = target[..., :-3], target[..., -3:]

    vel_gt, vel_p = exp_gt[:, 1:] - exp_gt[:, :-1], exp_p[:, 1:] - exp_p[:, :-1]
    vel_gt_pose, vel_p_pose = pose_gt[:, 1:] - pose_gt[:, :-1], pose_p[:, 1:] - pose_p[:, :-1]
    loss_vel = crit(vel_gt, vel_p).mean(-1) + crit(vel_gt_pose, vel_p_pose).mean(-1)
    sm_e, sm_pz = vel_p[:, 1:] - vel_p[:, :-1], vel_p_pose[:, 1:] - vel_p_pose[:, :-1]
    loss_smooth = crit(sm_e, torch.zeros_like(sm_e)).mean(-1) + crit(sm_pz, torch.zeros_like(sm_pz)).mean(-1)

    loss_head_angle = crit(pose_gt, pose_p)
    loss_head_vel = crit(vel_gt_pose, vel_p_pose).mean(-1)
    hs = vel_p_pose[:, 1:] - vel_p_pose[:, :-1]
    loss_head_smooth = crit(hs, torch.zeros_like(hs)).mean(-1)

    if end_idx is None:
        mask = torch.ones(target.shape[0], cfg.n_motions, dtype=torch.bool)
    else:
        mask = torch.arange(cfg.n_motions).expand(target.shape[0], -1) < torch.from_numpy(end_idx).unsqueeze(1)
    if not is_starting:
        mask = torch.cat([torch.ones_like(mask[:, : cfg.n_prev_motions]), mask], dim=1)

    out = {
        "noise": loss_noise[mask].mean() / 2,
        "vel": loss_vel[mask[:, 1:]].mean() / 2,
        "smooth": loss_smooth[mask[:, 2:]].mean() / 2,
        "head_angle": loss_head_angle[mask].mean() / 2,
        "head_vel": loss_head_vel[mask[:, 1:]].mean() / 2,
        "head_smooth": loss_head_smooth[mask[:, 2:]].mean() / 2,
    }
    if not is_starting:
        trans = torch.cat(
            [pose_gt[:, cfg.n_prev_motions - 3 : cfg.n_prev_motions], pose_p[:, cfg.n_prev_motions : cfg.n_prev_motions + 3]],
            dim=1,
        )
        v = trans[:, 1:] - trans[:, :-1]
        a = v[:, 1:] - v[:, :-1]
        lv = crit(v[:, 2:4], v[:, 1:3])
        la = crit(a[:, 1:], a[:, :-1])
        # param-space head_trans is UNMASKED per-batch means
        # (reference: utils/common.py:352-368, 417)
        out["head_trans"] = (lv.mean(-1).mean(-1) + la.mean(-1).mean(-1)).mean()
    return {k: float(v) for k, v in out.items()}


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_no_vert_starting_matches_oracle():
    cfg = cfg_for_loss()
    B, L, Lp, D = 3, cfg.n_motions, cfg.n_prev_motions, 67
    gt, target, prev = _rand((B, L, D), 0), _rand((B, Lp + L, D), 1), _rand((B, Lp, D), 2)
    got = compute_loss_no_vert(cfg, True, None, jnp.asarray(gt), None, jnp.asarray(target), jnp.asarray(prev))
    want = torch_loss_no_vert_oracle(cfg, True, gt, target, prev, None)
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), v, rtol=2e-5, atol=1e-7, err_msg=k)


def test_no_vert_continuation_with_end_idx_matches_oracle():
    cfg = cfg_for_loss()
    B, L, Lp, D = 4, cfg.n_motions, cfg.n_prev_motions, 67
    gt, target, prev = _rand((B, L, D), 3), _rand((B, Lp + L, D), 4), _rand((B, Lp, D), 5)
    end_idx = np.array([3, 10, 7, 1])
    got = compute_loss_no_vert(
        cfg, False, None, jnp.asarray(gt), None, jnp.asarray(target), jnp.asarray(prev), end_idx=jnp.asarray(end_idx)
    )
    want = torch_loss_no_vert_oracle(cfg, False, gt, target, prev, end_idx)
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), v, rtol=2e-5, atol=1e-7, err_msg=k)


def test_vertex_space_loss_runs_and_masks():
    cfg = cfg_for_loss(use_vertex_space=True, rot_repr="aa")
    flame = synthetic_flame(n_verts=64)
    B, L, Lp = 2, cfg.n_motions, cfg.n_prev_motions
    gt, target, prev = _rand((B, L, 54), 6), _rand((B, Lp + L, 54), 7), _rand((B, Lp, 54), 8)
    shape = _rand((B, 100), 9) * 0.1
    out = compute_loss(
        cfg, False, jnp.asarray(shape), jnp.asarray(gt), None, jnp.asarray(target), jnp.asarray(prev), None, flame
    )
    for k in ("noise", "vert", "vel", "smooth", "head_angle", "head_trans"):
        assert np.isfinite(float(out[k])), k
        assert float(out[k]) >= 0 or k == "noise"


def test_kl_matches_torch():
    mu, logvar = _rand((4, 16), 10), _rand((4, 16), 11)
    got = float(compute_kl_loss(jnp.asarray(mu), jnp.asarray(logvar)))
    tmu, tlv = torch.from_numpy(mu), torch.from_numpy(logvar)
    want = float(-0.5 * torch.sum(1 + tlv - tmu.pow(2) - tlv.exp()))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_mean_equals_fancy_indexing():
    x = _rand((3, 7, 5), 12)
    mask = np.random.RandomState(13).rand(3, 7) > 0.5
    got = float(_masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    want = float(torch.from_numpy(x)[torch.from_numpy(mask)].mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_style_adherence_matches_torch():
    xp, s = _rand((2, 6, 8), 14), _rand((2, 4, 8), 15)
    got = float(style_adherence_loss(jnp.asarray(xp), jnp.asarray(s)))
    # torch oracle
    X, S = torch.from_numpy(xp), torch.from_numpy(s)
    d = torch.mean((X.unsqueeze(2) - S.unsqueeze(1)) ** 2, dim=-1)
    w = F.softmax(-10.0 * d, dim=-1)
    want = float(torch.sum(w * d, dim=-1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nt_xent_is_finite_and_ordered():
    # aligned pairs should score lower loss than mismatched pairs
    a = _rand((8, 16), 16)
    aligned = float(nt_xent_loss(jnp.asarray(a), jnp.asarray(a * 1.01), 0.5))
    shuffled = float(nt_xent_loss(jnp.asarray(a), jnp.asarray(np.roll(a, 1, axis=0)), 0.5))
    assert np.isfinite(aligned) and np.isfinite(shuffled)
    assert aligned < shuffled


def test_truncation_zero_and_replicate():
    key = jax.random.PRNGKey(0)
    B, L, D = 3, 10, 67
    audio = jnp.asarray(_rand((B, L * 640), 17))
    motion = jnp.asarray(_rand((B, L, D), 18))

    a_t, m_t, end = truncate_motion_coef_and_audio(key, audio, motion, L, 640.0, "zero")
    end = np.asarray(end)
    assert ((end >= 1) & (end < L)).all()
    for i in range(B):
        assert np.abs(np.asarray(m_t[i, end[i] :])).sum() == 0
        np.testing.assert_allclose(np.asarray(m_t[i, : end[i]]), np.asarray(motion[i, : end[i]]))
        assert np.abs(np.asarray(a_t[i, end[i] * 640 :])).sum() == 0

    a_r, m_r, end2 = truncate_motion_coef_and_audio(key, audio, motion, L, 640.0, "replicate")
    end2 = np.asarray(end2)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(m_r[i, end2[i] :]), np.broadcast_to(np.asarray(motion[i, end2[i] - 1]), (L - end2[i], D))
        )


def test_get_motion_coef_roundtrip():
    coef = {"exp": jnp.asarray(_rand((2, 5, 50), 19)), "pose": jnp.asarray(_rand((2, 5, 6), 20))}
    mc = get_motion_coef(coef, "aa", with_global_pose=False)
    assert mc.shape == (2, 5, 51)
    d = get_coef_dict(mc, rot_repr="aa", with_global_pose=False)
    np.testing.assert_allclose(np.asarray(d["exp"]), np.asarray(coef["exp"]))
    assert d["pose"].shape == (2, 5, 6)
    # global rot zeroed; jaw x carried through
    assert np.abs(np.asarray(d["pose"][..., :3])).sum() == 0
    np.testing.assert_allclose(np.asarray(d["pose"][..., 3]), np.asarray(mc[..., -1]))


def test_load_loss_weights_rescaling():
    cfg = MSMDConfig(use_vertex_space=False)
    w = load_loss_weights(cfg)
    np.testing.assert_allclose(w["vel"], 0.5 * 4.5e-8)
    np.testing.assert_allclose(w["smooth"], 10.0 * 4e-7)
    assert w["kl_div"] == cfg.l_kl_div

    cfg2 = MSMDConfig(use_vertex_space=True)  # non-HDTF dataset + vertex space
    w2 = load_loss_weights(cfg2)
    np.testing.assert_allclose(w2["vert"], 1.0 * 1e-7)
    np.testing.assert_allclose(w2["vel"], 0.5 * 1e-7)
    np.testing.assert_allclose(w2["smooth"], 10.0 * 2e-8)

    cfg3 = MSMDConfig(use_vertex_space=True, dataset_type="flame_mead_ravdess")
    w3 = load_loss_weights(cfg3)
    assert w3["vert"] == 1.0 and w3["vel"] == 0.5
