"""Production serving API: a warmed-up speech->motion generator.

Wraps model loading, style encoding, windowed autoregressive sampling,
and denormalization into one object suitable for a serving process —
the programmatic twin of the `inference.py` CLI. Window programs
compile once (per subdivision-count) and are reused across requests;
`warmup` pre-compiles for given audio lengths so first-request latency
is flat.

Example:
    gen = MotionGenerator.from_experiment(root, name, "0470000", coef_stats)
    gen.warmup(max_seconds=20)
    exp_code, head_rot = gen.generate(audio_16k, style_motion, seed=0)
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msmd_tpu.inference_lib import infer_coeffs, load_model


class MotionGenerator:
    def __init__(self, model, style_enc, model_vars, style_vars, cfg, coef_stats: Dict[str, np.ndarray]):
        self.model = model
        self.style_enc = style_enc
        self.model_vars = model_vars
        self.style_vars = style_vars
        self.cfg = cfg
        to_np = lambda v: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        self.coef_stats = {k: to_np(v) for k, v in coef_stats.items()}

    @classmethod
    def from_experiment(cls, model_root, model_name: str, iter_num: str, coef_stats, audio_config=None) -> "MotionGenerator":
        model, style_enc, mv, sv, cfg = load_model(model_root, model_name, iter_num, audio_config=audio_config)
        return cls(model, style_enc, mv, sv, cfg, coef_stats)

    # ------------------------------------------------------------------
    def encode_style(self, style_motion: np.ndarray, seed: int = 0, normalized: bool = False) -> jnp.ndarray:
        """Style embedding from a motion clip (T, 67). Uses the first 100
        frames, like the reference (inference.py:239)."""
        m = np.asarray(style_motion, np.float32)
        if not normalized:
            s = self.coef_stats
            exp = (m[:, :-3] - s["exp_mean"]) / (s["exp_std"] + 1e-9)
            rot = (m[:, -3:] - s["pose_mean"]) / (s["pose_std"] + 1e-9)
            m = np.concatenate([exp, rot], axis=-1)
        return self.style_enc.apply(
            self.style_vars, jnp.asarray(m[None, :100]),
            rngs={"style": jax.random.PRNGKey(seed)}, method=type(self.style_enc).sample,
        )

    def generate(
        self,
        audio_16k: np.ndarray,
        style_motion: Optional[np.ndarray] = None,
        n_repetitions: int = 1,
        cfg_scale: float = 1.4,
        seed: int = 0,
        style_normalized: bool = False,
        mesh=None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """16 kHz audio (L,) -> (denormalized expression codes
        (R, T, 64), head rotations (R, T, 3)).

        ``mesh``: optional 1-axis jax.sharding.Mesh — shards the
        ``n_repetitions`` batch over chips (multi-chip serving)."""
        audio = np.asarray(audio_16k, np.float32)
        audio = (audio - audio.mean()) / (audio.std() + 1e-5)
        style = self.encode_style(style_motion, seed, style_normalized) if style_motion is not None else None

        coefs = infer_coeffs(
            self.model, self.model_vars, jax.random.PRNGKey(seed), jnp.asarray(audio),
            jnp.zeros((1, 100)), audio_unit=self.cfg.audio_unit, style_feats=style,
            n_repetitions=n_repetitions, cfg_scale=cfg_scale, dynamic_threshold=None, mesh=mesh,
        )
        coefs = np.asarray(coefs)
        s = self.coef_stats
        exp_code = coefs[..., :-3] * s["exp_std"] + s["exp_mean"]
        head_rot = coefs[..., -3:] * s["pose_std"] + s["pose_mean"]
        return exp_code, head_rot

    def warmup(self, max_seconds: float = 12.0, n_repetitions: int = 1) -> None:
        """Pre-compile window programs for every subdivision count up to
        ``max_seconds`` of audio."""
        cfg = self.cfg
        max_frames = int(max_seconds * cfg.fps)
        max_sub = max(1, math.ceil(max_frames / cfg.n_motions))
        # one window and the continuation program cover every clip length;
        # run a 2-window clip (or 1 if max_sub == 1) to compile both paths.
        n_sub = min(2, max_sub)
        samples = int(cfg.n_audio_samples * n_sub)
        _ = self.generate(np.zeros(samples, np.float32), None, n_repetitions=n_repetitions, seed=0)
