"""Windowed autoregressive long-form inference.

Rebuild of the reference's ``infer_coeffs`` (reference:
inference.py:35-75): audio features for the whole clip are extracted
ONCE, then fixed 100-frame windows slide with stride ``n_motions``; each
window is conditioned on the previous window's last ``n_prev_motions``
frames of motion + audio features, the initial noise is reused across
windows, and the padded tail is masked via the indicator and trimmed.

TPU design: the per-window samplers (first window and continuation
window) are two jit-compiled programs reused across windows — each is a
single on-device ``lax.scan`` over all diffusion steps (no per-step host
sync). ``n_repetitions`` (the reference's sequential seed loop,
inference.py:265-270) is batched into one sampler call.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.diffusion import MSMD, sample


def infer_coeffs(
    model: MSMD,
    variables,
    key: jax.Array,
    audio: jnp.ndarray,  # (L_audio,) 16 kHz, z-scored
    shape_coef: jnp.ndarray,  # (1 or R, 100)
    audio_unit: float = 640.0,
    style_feats: Optional[jnp.ndarray] = None,  # (1 or R, d_style) or list per window
    n_repetitions: int = 1,
    cfg_mode: Optional[str] = None,
    cfg_cond: Optional[Sequence[str]] = None,
    cfg_scale: float = 1.15,
    include_shape: bool = False,
    dynamic_threshold: Optional[Tuple[float, float, float]] = (0, 1, 4),
    motion_at_T: Optional[jnp.ndarray] = None,
    noise_override: Optional[jnp.ndarray] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> jnp.ndarray:
    """Returns motion coefficients (n_repetitions, clip_frames, 67).

    ``motion_at_T`` / ``noise_override`` optionally pin the initial noise
    and the (T, R, n_motions, D) per-step z (reused across windows, like
    the reference's noise reuse) for cross-framework parity runs.

    ``mesh``: optional 1-axis device mesh — the ``n_repetitions`` batch
    is sharded over its first axis (multi-chip serving; XLA keeps the
    whole windowed sampler data-parallel, carries included).
    ``n_repetitions`` must then be a multiple of the mesh size."""
    cfg = model.cfg
    clip_len = int(len(audio) / 16000 * cfg.fps)
    stride = cfg.n_motions
    n_audio_samples = round(audio_unit * cfg.n_motions)
    n_subdivision = 1 if clip_len <= cfg.n_motions else math.ceil(clip_len / stride)
    n_padding_audio_samples = n_audio_samples * n_subdivision - len(audio)
    n_padding_frames = math.ceil(n_padding_audio_samples / audio_unit)
    if n_padding_audio_samples > 0:
        audio = jnp.pad(audio, (0, n_padding_audio_samples))

    # one audio-feature extraction for the whole clip (inference.py:46)
    audio_feat = model.apply(
        variables, audio[None], cfg.n_motions * n_subdivision, method=MSMD.extract_audio_feature
    )  # (1, n_motions * n_sub, F)

    R = n_repetitions
    expand = lambda x: jnp.broadcast_to(x, (R,) + x.shape[1:]) if x.shape[0] == 1 and R > 1 else x
    if mesh is not None:
        axis = mesh.axis_names[0]
        assert R % mesh.devices.size == 0, (R, mesh.devices.size)
        _sharding = lambda x: jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(axis, *([None] * (x.ndim - 1)))
        )
        shard = lambda x: jax.device_put(x, _sharding(x))
        expand_ = expand
        expand = lambda x: shard(expand_(x))
    shape_in = expand(shape_coef)

    sample_fn = partial(
        sample, model,
        cfg_mode=cfg_mode, cfg_cond=cfg_cond, cfg_scale=cfg_scale, dynamic_threshold=dynamic_threshold,
        noise_override=noise_override,
        # the Pallas kernel is not SPMD-partitionable; sharded serving
        # keeps the XLA decoder
        fused_decoder=False if mesh is not None else None,
    )
    # Two compiled programs, reused across all windows (same shapes).
    # `variables` is a jit ARGUMENT: closed-over params would be baked
    # into the HLO as literals, blowing past the axon tunnel's
    # remote-compile request-size limit (HTTP 413) at flagship size.
    first_fn = jax.jit(lambda v, k, a, s, st, ind: sample_fn(v, k, a, s, st, indicator=ind, motion_at_T=motion_at_T))
    cont_fn = jax.jit(
        lambda v, k, a, s, st, pm, pa, nz, ind: sample_fn(
            v, k, a, s, st, prev_motion_feat=pm, prev_audio_feat=pa, motion_at_T=nz, indicator=ind
        )
    )

    coef_list = []
    prev_motion = prev_audio = noise = None
    for i in range(n_subdivision):
        start = i * stride
        audio_in = expand(audio_feat[:, start : start + cfg.n_motions])
        indicator = None
        if cfg.use_indicator:
            indicator = jnp.ones((R, cfg.n_motions))
            if i == n_subdivision - 1 and n_padding_frames > 0:
                indicator = indicator.at[:, -n_padding_frames:].set(0)
        style = style_feats[i] if isinstance(style_feats, (list, tuple)) else style_feats
        if style is not None:
            style = expand(style)

        key, sub = jax.random.split(key)
        if i == 0:
            motion, noise, prev_audio_full = first_fn(variables, sub, audio_in, shape_in, style, indicator)
        else:
            # noise reuses the first window's draw (inference.py:64-69)
            motion, noise, prev_audio_full = cont_fn(
                variables, sub, audio_in, shape_in, style, prev_motion, prev_audio, noise, indicator
            )
        prev_motion = motion[:, -cfg.n_prev_motions :]
        prev_audio = prev_audio_full[:, -cfg.n_prev_motions :]
        if i == n_subdivision - 1 and n_padding_frames > 0:
            motion = motion[:, :-n_padding_frames]
        coef_list.append(motion)
    return jnp.concatenate(coef_list, axis=1)


# ---------------------------------------------------------------------------
# model loading (reference: inference.py:85-103 load_model)
# ---------------------------------------------------------------------------

def load_model(model_root, model_name: str, iter_num: str, audio_config=None):
    """Load args.json + checkpoint from the reference experiment layout
    ``<root>/DPT/<name>/{args.json, checkpoints/iter_<it>.pt}``. Accepts
    both reference torch checkpoints and this framework's exports.

    Returns (model, style_enc, model_vars, style_vars, cfg)."""
    from pathlib import Path

    from msmd_tpu.interop.msmd_checkpoint import reference_msmd_to_flax, reference_style_enc_to_flax
    from msmd_tpu.models.style_encoder import get_style_encoder
    from msmd_tpu.train.checkpoint import load_reference_pt

    exp_dir = Path(model_root) / "DPT" / model_name
    if not exp_dir.exists():
        exp_dir = Path(model_root) / model_name  # plain layout fallback
    cfg = MSMDConfig.load_args_json(exp_dir)
    if audio_config is None and cfg.audio_encoder_config is not None:
        from msmd_tpu.models.audio import AudioEncoderConfig

        audio_config = AudioEncoderConfig(
            **{k: tuple(v) if isinstance(v, list) else v for k, v in cfg.audio_encoder_config.items()}
        )

    ckpt_path = exp_dir / "checkpoints" / f"iter_{iter_num}.pt"
    if not ckpt_path.exists():
        available = sorted(p.name for p in (exp_dir / "checkpoints").glob("iter_*.pt"))
        raise FileNotFoundError(
            f"Checkpoint not found: {ckpt_path}"
            + (f" — available: {available}" if available else " — no iter_*.pt checkpoints in this experiment")
        )
    _, model_sd, style_sd, _ = load_reference_pt(ckpt_path)

    from msmd_tpu.models.diffusion import get_diffusion_model

    model = get_diffusion_model(cfg, audio_config=audio_config)
    style_enc = get_style_encoder(cfg, cfg.style_enc_model_style)
    model_vars = {"params": reference_msmd_to_flax(model_sd, cfg)}
    style_vars = {"params": reference_style_enc_to_flax(style_sd)}
    return model, style_enc, model_vars, style_vars, cfg


# ---------------------------------------------------------------------------
# style clip loading (reference: inference.py:109-183)
# ---------------------------------------------------------------------------

def load_style_clip(
    expression_code_path,
    head_rot_path,
    coef_stats: dict,
    original_fps: float = 30,
    target_fps: float = 25,
):
    """Load + normalize + fps-resample a style clip. Returns
    (motion (1, T, 67) np.float32, shape (1, 100) zeros)."""
    import pickle

    def load_arr(path):
        with open(path, "rb") as f:
            arr = pickle.load(f)
        if hasattr(arr, "detach"):
            arr = arr.detach().cpu().numpy()
        return np.asarray(arr, np.float32)

    exp = load_arr(expression_code_path)
    head = load_arr(head_rot_path)

    to_np = lambda v: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
    exp = (exp - to_np(coef_stats["exp_mean"])) / (to_np(coef_stats["exp_std"]) + 1e-9)
    head = (head - to_np(coef_stats["pose_mean"])) / (to_np(coef_stats["pose_std"]) + 1e-9)

    if original_fps is not None and original_fps != target_fps:
        n = exp.shape[0]
        new_n = int(round(n / original_fps * target_fps))
        x = np.linspace(0, 1, n)
        xnew = np.linspace(0, 1, new_n)
        interp = lambda a: np.stack([np.interp(xnew, x, a[:, j]) for j in range(a.shape[1])], axis=1)
        exp, head = interp(exp), interp(head)

    motion = np.concatenate([exp, head], axis=-1)[None].astype(np.float32)
    shape = np.zeros((1, 100), np.float32)
    return motion, shape


def load_audio_16k(path) -> np.ndarray:
    """Load audio at 16 kHz mono (librosa if present, else soundfile,
    else scipy wavfile with naive resampling)."""
    try:
        import librosa

        return librosa.load(path, sr=16000)[0].astype(np.float32)
    except ImportError:
        pass
    try:
        import soundfile as sf

        data, sr = sf.read(path, dtype="float32")
    except ImportError:
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype.kind == "i":
            data = data.astype(np.float32) / np.iinfo(data.dtype).max
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    if sr != 16000:
        n_new = int(round(len(data) / sr * 16000))
        x = np.linspace(0, 1, len(data))
        data = np.interp(np.linspace(0, 1, n_new), x, data).astype(np.float32)
    return data
