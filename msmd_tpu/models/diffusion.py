"""MSMD: the conditional diffusion model for speech-driven facial motion.

Rebuild of the reference wrapper (reference: model.py:73-818), TPU-first:

- **Training forward** (`MSMD.__call__`): audio feature extraction, CFG
  condition dropout, the q-sample forward-diffusion step, and one
  denoiser pass — all one jittable function of (params, batch, rngs)
  (reference: model.py:146-248).
- **Sampling** (`sample`, `sample_separate`, `sample_with_guide`): the
  reference runs a Python loop over t = T..1 with a per-step
  ``traj[t].cpu()`` host transfer (model.py:377-435) — the canonical TPU
  anti-pattern. Here the whole reverse process is ONE ``lax.scan`` with
  the classifier-free-guidance entries stacked on the batch axis, so the
  entire denoising trajectory stays on device and the n_diff_steps
  denoiser invocations compile into a single XLA while-loop.

CFG semantics match the reference exactly: entry stacking order
(null, +audio, +style), 'independent' vs 'incremental' combination
(model.py:339-417), train-time dropout probabilities (0.1/0.5
independent, 0.45/0.45/0.1 incremental — model.py:190-218), and
optional dynamic thresholding (model.py:396-402).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from msmd_tpu.config import MSMDConfig
from msmd_tpu.models.audio import AudioEncoder, AudioEncoderConfig
from msmd_tpu.models.denoiser import DenoisingNetwork
from msmd_tpu.ops.schedule import DiffusionSchedule
from msmd_tpu.ops.seq import linear_interpolate, pad_audio


class MSMD(nn.Module):
    cfg: MSMDConfig
    use_head_alpha: bool = False  # the MSMD factory default (model.py:17)
    audio_config: Optional[AudioEncoderConfig] = None  # None -> base (768/12L)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.audio_encoder = AudioEncoder(
            self.audio_config or AudioEncoderConfig(),
            dtype=self.dtype, param_dtype=self.param_dtype, name="audio_encoder",
        )
        self.audio_feature_map = nn.Dense(
            cfg.feature_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="audio_feature_map"
        )
        normal = nn.initializers.normal(stddev=1.0)
        self.start_motion_feat = self.param(
            "start_motion_feat", normal, (1, cfg.n_prev_motions, cfg.motion_feat_dim), self.param_dtype
        )
        self.start_audio_feat = self.param(
            "start_audio_feat", normal, (1, cfg.n_prev_motions, cfg.feature_dim), self.param_dtype
        )
        self.denoising_net = DenoisingNetwork(
            cfg, use_head_alpha=self.use_head_alpha, dtype=self.dtype, param_dtype=self.param_dtype, name="denoising_net"
        )
        conds = cfg.guiding_condition_list
        if "style" in conds:
            self.null_style_feat = self.param("null_style_feat", normal, (1, 1, cfg.d_style), self.param_dtype)
        if "audio" in conds:
            self.null_audio_feat = self.param("null_audio_feat", normal, (1, 1, cfg.feature_dim), self.param_dtype)
        self.schedule = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)

    # ------------------------------------------------------------------
    # audio feature extraction (the "BackResample" head, model.py:250-264)
    # ------------------------------------------------------------------
    def _extract_768(self, audio: jnp.ndarray, frame_num: Optional[int], deterministic: bool) -> jnp.ndarray:
        cfg = self.cfg
        frame_num = frame_num or cfg.n_motions
        hidden = self.audio_encoder(pad_audio(audio), cfg.fps, frame_num * 2, deterministic)  # (N, 2L, 768)
        hidden = jnp.transpose(linear_interpolate(jnp.transpose(hidden, (0, 2, 1)), frame_num), (0, 2, 1))
        return hidden

    def extract_audio_feature(self, audio: jnp.ndarray, frame_num: Optional[int] = None, deterministic: bool = True):
        """Raw 16 kHz audio (N, L_a) -> (N, frame_num, feature_dim)."""
        return self.audio_feature_map(self._extract_768(audio, frame_num, deterministic))

    def extract_audio_768_feature(self, audio: jnp.ndarray, frame_num: Optional[int] = None, deterministic: bool = True):
        """The 768-dim pre-projection features (reference: model.py:266-280).
        Callers wrap in ``jax.lax.stop_gradient`` for the no-grad variant."""
        return self._extract_768(audio, frame_num, deterministic)

    # ------------------------------------------------------------------
    # single denoiser invocation (used by the scan-based samplers)
    # ------------------------------------------------------------------
    def denoise(
        self,
        motion_feat,
        audio_feat,
        person_feat,
        style_feat,
        prev_motion_feat,
        prev_audio_feat,
        step,
        indicator=None,
        keep_separate: bool = False,
        deterministic: bool = True,
        memory_kv=None,
        fused_decoder=None,
        fused_ffn: bool = False,
        fused_tail: bool = False,
        step_emb_table=None,
    ):
        return self.denoising_net(
            motion_feat, audio_feat, person_feat, style_feat, prev_motion_feat, prev_audio_feat, step,
            indicator, keep_separate, deterministic, memory_kv=memory_kv, fused_decoder=fused_decoder,
            fused_ffn=fused_ffn, fused_tail=fused_tail, step_emb_table=step_emb_table,
        )

    def precompute_step_emb(self):
        return self.denoising_net.precompute_step_emb()

    def cache_denoiser_memory_kv(self, prev_audio_feat, audio_feat):
        """Precompute per-layer cross-attention K/V of the audio memory —
        constant across all diffusion steps of one sampling run."""
        return self.denoising_net.cache_memory_kv(prev_audio_feat, audio_feat)

    # ------------------------------------------------------------------
    # training forward (reference: model.py:146-248)
    # ------------------------------------------------------------------
    def __call__(
        self,
        motion_feat: jnp.ndarray,  # (N, L, d_motion)
        audio_or_feat: jnp.ndarray,  # (N, L_a) raw or (N, L, F) features
        shape_feat: jnp.ndarray,  # (N, 100) or (N, 1, 100)
        style_feat: Optional[jnp.ndarray] = None,  # (N, d_style)
        prev_motion_feat: Optional[jnp.ndarray] = None,
        prev_audio_feat: Optional[jnp.ndarray] = None,
        time_step: Optional[jnp.ndarray] = None,
        indicator: Optional[jnp.ndarray] = None,
        train_with_cfg: bool = True,
        keep_separate: bool = False,
        deterministic: bool = False,
        noise: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        batch_size = motion_feat.shape[0]

        if audio_or_feat.ndim == 2:
            assert audio_or_feat.shape[1] == cfg.n_audio_samples, (
                f"Incorrect audio length {audio_or_feat.shape[1]} (expected {cfg.n_audio_samples})"
            )
            audio_feat_saved = self.extract_audio_feature(audio_or_feat, deterministic=deterministic)
        elif audio_or_feat.ndim == 3:
            assert audio_or_feat.shape[1] == cfg.n_motions, f"Incorrect audio feature length {audio_or_feat.shape[1]}"
            audio_feat_saved = audio_or_feat
        else:
            raise ValueError(f"Incorrect audio input shape {audio_or_feat.shape}")
        audio_feat = audio_feat_saved

        if shape_feat.ndim == 2:
            shape_feat = shape_feat[:, None]
        if style_feat is not None and style_feat.ndim == 2:
            style_feat = style_feat[:, None]

        if prev_motion_feat is None:
            prev_motion_feat = jnp.broadcast_to(
                self.start_motion_feat, (batch_size,) + self.start_motion_feat.shape[1:]
            )
        if prev_audio_feat is None:
            prev_audio_feat = jnp.broadcast_to(self.start_audio_feat, (batch_size,) + self.start_audio_feat.shape[1:])

        conds = cfg.guiding_condition_list
        if len(conds) > 0 and train_with_cfg:
            assert len(conds) <= 2, "Only support 1 or 2 CFG conditions!"
            cfg_key = self.make_rng("diffusion")
            if len(conds) == 1 or cfg.cfg_mode == "independent":
                null_cond_prob = 0.5 if len(conds) >= 2 else 0.1
                k_style, k_audio = jax.random.split(cfg_key)
                if "style" in conds:
                    mask_style = jax.random.uniform(k_style, (batch_size,)) < null_cond_prob
                    style_feat = jnp.where(
                        mask_style[:, None, None],
                        jnp.broadcast_to(self.null_style_feat, style_feat.shape),
                        style_feat,
                    )
                if "audio" in conds:
                    mask_audio = jax.random.uniform(k_audio, (batch_size,)) < null_cond_prob
                    audio_feat = jnp.where(
                        mask_audio[:, None, None],
                        jnp.broadcast_to(self.null_audio_feat, audio_feat.shape),
                        audio_feat,
                    )
            else:
                # incremental: full 0.45 / w/o style 0.45 / w/o both 0.1
                mask_flag = jax.random.uniform(cfg_key, (batch_size,))
                if "style" in conds:
                    style_feat = jnp.where(
                        (mask_flag > 0.55)[:, None, None],
                        jnp.broadcast_to(self.null_style_feat, style_feat.shape),
                        style_feat,
                    )
                if "audio" in conds:
                    audio_feat = jnp.where(
                        (mask_flag > 0.9)[:, None, None],
                        jnp.broadcast_to(self.null_audio_feat, audio_feat.shape),
                        audio_feat,
                    )

        person_feat = shape_feat if style_feat is None else jnp.concatenate([shape_feat, style_feat], axis=-1)

        if time_step is None:
            time_step = self.schedule.uniform_sample_t(self.make_rng("diffusion"), batch_size)

        # q-sample: x_t = sqrt(ab) x_0 + sqrt(1-ab) eps (model.py:231-236)
        alpha_bar = self.schedule.alpha_bars[time_step]
        c0 = jnp.sqrt(alpha_bar)[:, None, None]
        c1 = jnp.sqrt(1.0 - alpha_bar)[:, None, None]
        # noise override: deterministic q-sample for equivalence tests and
        # RNG-replay harnesses (mirrors the samplers' motion_at_T hook)
        eps = noise if noise is not None else jax.random.normal(
            self.make_rng("diffusion"), motion_feat.shape, motion_feat.dtype
        )
        motion_feat_noisy = c0 * motion_feat + c1 * eps

        if keep_separate:
            dynamic, static, alpha_t = self.denoising_net(
                motion_feat_noisy, audio_feat, person_feat, style_feat, prev_motion_feat, prev_audio_feat,
                time_step, indicator, keep_separate=True, deterministic=deterministic,
            )
            # NOTE: the keep_separate recombine intentionally applies alpha to
            # ALL channels (reference: model.py:239-241 does the same).
            alphas_e = alpha_t[..., None]
            target = dynamic + (static * alphas_e).sum(axis=2)
            return (
                eps, target, jax.lax.stop_gradient(motion_feat), jax.lax.stop_gradient(audio_feat_saved),
                dynamic, static, alpha_t,
            )

        target = self.denoising_net(
            motion_feat_noisy, audio_feat, person_feat, style_feat, prev_motion_feat, prev_audio_feat,
            time_step, indicator, deterministic=deterministic,
        )
        return eps, target, jax.lax.stop_gradient(motion_feat), jax.lax.stop_gradient(audio_feat_saved)


# ===========================================================================
# Sampling — the reverse diffusion as one lax.scan.
# ===========================================================================

def _normalize_cfg(cfg: MSMDConfig, cfg_mode, cfg_cond, cfg_scale):
    """Sort conditions ('audio' before 'style') and align scales
    (reference: model.py:294-303)."""
    if cfg_mode is None:
        cfg_mode = cfg.cfg_mode
    if cfg_cond is None:
        cfg_cond = cfg.guiding_condition_list
    cfg_cond = [c for c in cfg_cond if c in ("audio", "style")]
    if not isinstance(cfg_scale, (list, tuple)):
        cfg_scale = [cfg_scale] * len(cfg_cond)
    if cfg_cond:
        order = sorted(zip(cfg_cond, cfg_scale), key=lambda x: ["audio", "style"].index(x[0]))
        cfg_cond, cfg_scale = [c for c, _ in order], [s for _, s in order]
    else:
        cfg_cond, cfg_scale = [], []
    return cfg_mode, tuple(cfg_cond), tuple(float(s) for s in cfg_scale)


def _cfg_coefficients(cfg_mode: str, cfg_scale: Sequence[float], n_entries: int) -> Tuple[float, ...]:
    """Rewrite the reference's sequential guidance mix (model.py:406-417)
    as one linear combination target = sum_i c_i * r_i:

      incremental: c_0 = 1-s_0; c_j = s_{j-1}-s_j (middle); c_last = s_last
      independent: nested/aliased update (see below)

    The torch reference's `target_theta = results[0][:, -n_motions:]`
    is a VIEW, so `target_theta += s_i*(results[i+1] - results[0])`
    mutates results[0] in place — after step i, "results[0]" IS the
    accumulated target. The independent loop therefore computes the
    nested mix t <- (1-s_i)*t + s_i*r_{i+1}, giving
      c_0 = prod_k (1-s_k);  c_j = s_{j-1} * prod_{k>=j} (1-s_k)
    (for one condition both forms coincide: (1-s_0, s_0)).

    Entries with c_i == 0 contribute NOTHING — notably the middle entry
    whenever consecutive incremental scales are equal, which is the
    reference's own default (one scalar cfg_scale for both conditions,
    model.py:294-296) — so the sampler can skip their denoiser compute
    entirely while producing the exact same result.
    """
    if n_entries == 1:
        return (1.0,)
    s = list(cfg_scale)
    if cfg_mode == "incremental":
        c = [1.0 - s[0]] + [s[j - 1] - s[j] for j in range(1, n_entries - 1)] + [s[-1]]
    elif cfg_mode == "independent":
        c = [1.0]
        for s_i in s:
            c = [cj * (1.0 - s_i) for cj in c] + [s_i]
    else:
        raise NotImplementedError(f"Unknown cfg_mode {cfg_mode}")
    return tuple(c)


def _build_cfg_stacks(model_cfg, params, audio_feat, shape_feat, style_feat, cfg_mode, cfg_cond, cfg_scale):
    """Stack the CFG entries on the batch axis: [null, (+audio), (+style)]
    (reference: model.py:336-374), DROPPING entries whose combination
    coefficient is exactly zero (dead compute in the reference).
    Returns (audio_in, person_in, n_entries_kept, coefficients_kept)."""
    batch_size = audio_feat.shape[0]
    n_motions = audio_feat.shape[1]
    null_audio = jnp.broadcast_to(params["null_audio_feat"], (batch_size, n_motions, params["null_audio_feat"].shape[-1])) if "audio" in cfg_cond else audio_feat
    if "style" in cfg_cond:
        null_style = jnp.broadcast_to(params["null_style_feat"], (batch_size, 1, params["null_style_feat"].shape[-1]))
        person_null = jnp.concatenate([shape_feat, null_style], axis=-1)
    else:
        person_null = (
            jnp.concatenate([shape_feat, style_feat], axis=-1) if style_feat is not None else shape_feat
        )

    audio_in = [null_audio]
    person_in = [person_null]
    for cond in cfg_cond:
        if cond == "audio":
            audio_in.append(audio_feat)
            person_in.append(person_null)
        elif cond == "style":
            audio_in.append(null_audio if cfg_mode == "independent" else audio_feat)
            person_in.append(jnp.concatenate([shape_feat, style_feat], axis=-1))

    coeffs = _cfg_coefficients(cfg_mode, cfg_scale, len(audio_in))
    kept = [i for i, c in enumerate(coeffs) if c != 0.0] or [len(coeffs) - 1]
    audio_in = [audio_in[i] for i in kept]
    person_in = [person_in[i] for i in kept]
    return (
        jnp.concatenate(audio_in, axis=0),
        jnp.concatenate(person_in, axis=0),
        len(kept),
        tuple(coeffs[i] for i in kept),
    )


def _cfg_combine(results_entries: jnp.ndarray, coefficients: Sequence[float], n_motions: int):
    """results_entries: (n_kept, B, L_p+L, D) -> guided target
    (B, n_motions, D): sum_i c_i * r_i (exactly the reference's
    sequential mix at model.py:406-417, see _cfg_coefficients)."""
    tail = results_entries[:, :, -n_motions:]
    target = coefficients[0] * tail[0]
    for i in range(1, len(coefficients)):
        target = target + coefficients[i] * tail[i]
    return target


def _dynamic_threshold(results: jnp.ndarray, n_motions: int, dynamic_threshold):
    """Per-sample quantile clamp (reference: model.py:396-402)."""
    dt_ratio, dt_min, dt_max = dynamic_threshold
    flat = jnp.abs(results[:, -n_motions:].reshape(results.shape[0], -1))
    s = jnp.quantile(flat, float(dt_ratio), axis=1)
    s = jnp.clip(s, dt_min, dt_max)[:, None, None]
    return jnp.clip(results, -s, s)


def _prepare_sample_inputs(
    model: "MSMD", variables, key, audio_or_feat, shape_feat, style_feat,
    prev_motion_feat, prev_audio_feat, motion_at_T, indicator, cfg_mode, cfg_cond, cfg_scale,
):
    cfg = model.cfg
    params = variables["params"]
    batch_size = audio_or_feat.shape[0]

    cfg_mode, cfg_cond, cfg_scale = _normalize_cfg(cfg, cfg_mode, cfg_cond, cfg_scale)

    if style_feat is None:
        # Null-style fallback (reference: model.py:308-310). The null
        # embedding only exists when 'style' is a guiding condition
        # (model.py:132-134) — without it the reference AttributeErrors;
        # we raise a clear error instead.
        if "null_style_feat" not in params:
            raise ValueError(
                "style_feat is required: this model has no null style embedding "
                "('style' is not in guiding_conditions)"
            )
        style_feat = jnp.broadcast_to(params["null_style_feat"], (batch_size, 1, cfg.d_style))
    if audio_or_feat.ndim == 2:
        audio_feat = model.apply(variables, audio_or_feat, method=MSMD.extract_audio_feature)
    else:
        audio_feat = audio_or_feat
    n_motions = audio_feat.shape[1]

    if shape_feat.ndim == 2:
        shape_feat = shape_feat[:, None]
    if style_feat.ndim == 2:
        style_feat = style_feat[:, None]
    if prev_motion_feat is None:
        prev_motion_feat = jnp.broadcast_to(
            params["start_motion_feat"], (batch_size,) + params["start_motion_feat"].shape[1:]
        )
    if prev_audio_feat is None:
        prev_audio_feat = jnp.broadcast_to(
            params["start_audio_feat"], (batch_size,) + params["start_audio_feat"].shape[1:]
        )
    if motion_at_T is None:
        key, sub = jax.random.split(key)
        motion_at_T = jax.random.normal(sub, (batch_size, n_motions, cfg.motion_feat_dim))

    audio_in, person_in, n_entries, coefficients = _build_cfg_stacks(
        cfg, params, audio_feat, shape_feat, style_feat, cfg_mode, cfg_cond, cfg_scale
    )
    tile = lambda x: jnp.concatenate([x] * n_entries, axis=0)
    stacks = dict(
        audio_in=audio_in,
        person_in=person_in,
        prev_motion_in=tile(prev_motion_feat),
        prev_audio_in=tile(prev_audio_feat),
        indicator_in=tile(indicator) if indicator is not None else None,
        style_in=tile(style_feat),
        n_entries=n_entries,
        coefficients=coefficients,
        # Untiled single-entry sources of the tile() stacks above. The
        # fused sampler-step constant build reads THESE (not entry 0 of
        # the tiled stacks), so a future per-entry change in
        # _build_cfg_stacks cannot silently diverge from the mega path:
        # prev/indicator/style are entry-invariant by this construction.
        prev_motion_src=prev_motion_feat,
        indicator_src=indicator,
        style_src=style_feat,
    )
    return key, audio_feat, motion_at_T, stacks, (cfg_mode, cfg_cond, cfg_scale)


def sample(
    model: "MSMD",
    variables,
    key: jax.Array,
    audio_or_feat: jnp.ndarray,
    shape_feat: jnp.ndarray,
    style_feat: Optional[jnp.ndarray] = None,
    prev_motion_feat: Optional[jnp.ndarray] = None,
    prev_audio_feat: Optional[jnp.ndarray] = None,
    motion_at_T: Optional[jnp.ndarray] = None,
    indicator: Optional[jnp.ndarray] = None,
    cfg_mode: Optional[str] = None,
    cfg_cond: Optional[Sequence[str]] = None,
    cfg_scale=1.15,
    flexibility: float = 0.0,
    dynamic_threshold: Optional[Tuple[float, float, float]] = None,
    ret_traj: bool = False,
    guidance_indice: Optional[jnp.ndarray] = None,
    guidance_values: Optional[jnp.ndarray] = None,
    scan_unroll: int = 1,
    noise_override: Optional[jnp.ndarray] = None,
    fused_decoder: Optional[bool] = None,
    precompute_noise: Optional[bool] = None,
):
    """DDPM sampling as one ``lax.scan`` over t = T..1.

    Covers both ``MSMD.sample`` (reference model.py:282-440) and — when
    ``guidance_indice``/``guidance_values`` are given — the naive
    inpainting ``sample_with_guide`` (reference model.py:653-818, write
    at :765-766).

    ``noise_override``: optional (T, B, n_motions, D) per-step z used in
    place of the internal PRNG draws (index 0 is the first scan step,
    t = T). Enables bit-identical cross-framework parity runs
    (scripts/fidelity_certificate.py).

    Returns (motion (B, n_motions, D), motion_at_T, audio_feat), with the
    full trajectory (T+1, B, L, D; index t holds x_t) instead of the
    motion when ``ret_traj``.
    """
    cfg = model.cfg
    sched: DiffusionSchedule = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
    key, audio_feat, motion_at_T, stacks, (cfg_mode_n, cfg_cond_n, cfg_scale_n) = _prepare_sample_inputs(
        model, variables, key, audio_or_feat, shape_feat, style_feat,
        prev_motion_feat, prev_audio_feat, motion_at_T, indicator, cfg_mode, cfg_cond, cfg_scale,
    )
    batch_size = motion_at_T.shape[0]
    n_motions = motion_at_T.shape[1]
    n_entries = stacks["n_entries"]

    # When the model computes in bf16, pre-cast the f32 weights ONCE
    # outside the scan: flax casts params at every use anyway (so this is
    # numerically identical), but doing it here halves the per-step HBM
    # weight traffic — at batch 1 the 500-step scan is weight-bandwidth
    # bound (measured: benchmarks/latency_probe.py).
    if model.dtype == jnp.bfloat16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, variables
        )

    # cross-attention K/V of the audio memory: computed ONCE, reused in
    # every scan step (the memory never changes during sampling)
    memory_kv = model.apply(
        variables, stacks["prev_audio_in"], stacks["audio_in"], method=MSMD.cache_denoiser_memory_kv
    )

    # Fused Pallas decoder stack for the latency regime: at small batch
    # the XLA decoder is per-op-latency bound (~100 ops/step); the kernel
    # runs all n_layers as one program with layer-streamed weights.
    # Weights/masks are packed HERE, outside the scan. The flattened-row
    # masking is quadratic in batch, so it is gated to small batches; the
    # throughput path (large batch) keeps the XLA decoder.
    Be = batch_size * n_entries
    if fused_decoder is None:

        # auto-on for the small-batch latency regime AND (round 3) for the
        # large-batch throughput regime when the per-entry-attention row
        # tiling is available (identity band + a tile whose row count
        # satisfies the sublane constraint): measured 76.6x vs 69.7x at
        # batch 48 (BENCH.md r3). MSMD_FUSED_DECODER=0 forces the XLA
        # decoder; =1 forces the kernel even where it measured slower.
        env = os.environ.get("MSMD_FUSED_DECODER", "")
        _lq = 1 + stacks["prev_motion_in"].shape[1] + n_motions
        _cap = int(os.environ.get("MSMD_DECODER_TILE", "8"))
        # MSMD_PER_ENTRY_ATTN=0 must also veto the throughput auto-enable:
        # without per-entry mode the large-batch kernel would be the flat
        # masked variant, which measured SLOWER than the XLA decoder
        # (BENCH.md r2) — disabling the mode should fall back to XLA, not
        # silently select the worse kernel. (env == "1" still forces.)
        # MSMD_DECODER_PAD frees the sublane constraint (every entry's
        # rows are padded to an 8-multiple in-kernel), so the auto-enable
        # check must mirror the in-path tile-selection rule below — with
        # padding on, ANY divisor tile is viable (ADVICE r3).
        _pad = os.environ.get("MSMD_DECODER_PAD", "0") == "1"
        per_entry_viable = (
            cfg.align_mask_width == 1
            and os.environ.get("MSMD_PER_ENTRY_ATTN", "1") != "0"
            and any(
                Be % d == 0 and (_pad or (d * _lq) % 8 == 0)
                for d in range(1, _cap + 1)
            )
        )
        fused_decoder = (
            model.dtype == jnp.bfloat16
            and guidance_indice is None
            and env != "0"
            and (Be <= 4 or per_entry_viable or env == "1")
        )
    fused = None
    if fused_decoder:

        from msmd_tpu.ops.pallas.decoder_kernel import (
            build_identity_band_aux, build_masks, pack_decoder_weights, pack_memory_kv,
        )
        from msmd_tpu.ops.seq import alignment_mask

        # row tile = whole batch entries (attention stays tile-local).
        # Per-entry-attention mode (identity-band only): self-attention
        # runs per entry inside the kernel — no flattened score waste —
        # so larger tiles are free; pick the largest divisor of Be up to
        # MSMD_DECODER_TILE (default 8 — the measured batch-48 optimum,
        # BENCH.md r3). Flat (masked) mode keeps the tile small (8): its
        # score matrix is quadratic in the tile.
        # (gated to the throughput regime: at Be <= 4 the flattened-score
        # waste is negligible and the latency-regime mega kernels use the
        # flat self_mask layout)
        per_entry = (
            cfg.align_mask_width == 1 and Be > 4
            and os.environ.get("MSMD_PER_ENTRY_ATTN", "1") != "0"
        )
        lq_rows = 1 + stacks["prev_motion_in"].shape[1] + n_motions
        # sublane padding (per-entry mode): pad each entry's rows to the
        # next 8-multiple (126 -> 128 at the flagship geometry) so every
        # per-entry slice is 8-aligned inside the kernel and ANY tile
        # dividing Be is viable (not just 8-multiples). Opt-in pending
        # on-silicon measurement (MSMD_DECODER_PAD=1).
        pad_env = os.environ.get("MSMD_DECODER_PAD", "0") == "1"
        lq_pad = ((lq_rows + 7) // 8) * 8 if (pad_env and lq_rows % 8) else 0
        if Be <= 4:
            tile = Be
        elif per_entry:
            # measured optimum: the SMALLEST viable tile wins (8 at the
            # batch-48 flagship config: 76.6x vs 66.5x at 16, BENCH.md).
            # Pallas sublane constraint: tile*lq rows must be 8-divisible
            # (lq is odd at the default geometry, so tiles are 8-multiples
            # — unless lq is padded, which frees the tile choice).
            cap = int(os.environ.get("MSMD_DECODER_TILE", "8"))
            viable = [
                d for d in range(1, cap + 1)
                if Be % d == 0 and (lq_pad or (d * lq_rows) % 8 == 0)
            ]
            if viable:
                tile = max(viable)
            else:
                per_entry = False
                tile = max(d for d in range(1, 9) if Be % d == 0)
        else:
            tile = max(d for d in range(1, 9) if Be % d == 0)
        n_prev = stacks["prev_motion_in"].shape[1]
        lq, lm = 1 + n_prev + n_motions, n_prev + n_motions
        if not per_entry:
            lq_pad = 0
        if cfg.align_mask_width == 1:
            # width-1 band: cross-attention is an exact V-gather for all
            # motion rows (one-hot softmax); only person rows attend
            sm = None if per_entry else build_masks(tile, lq, lm, None)[0]
            cm = build_identity_band_aux(tile, lq_pad or lq, lm, dtype=model.dtype)
        else:
            per_entry = False
            align = alignment_mask(n_prev, n_motions, cfg.align_mask_width) if cfg.align_mask_width > 0 else None
            sm, cm = build_masks(tile, lq, lm, align)
        km, vm = pack_memory_kv(memory_kv, dtype=model.dtype)
        # layer-outer resident-activation grid (see
        # fused_decoder_forward_resident): full-batch activations stay in
        # one VMEM block, weights stream once per LAYER instead of once
        # per (tile, layer). Opt-in (MSMD_DECODER_RESIDENT=1) pending
        # on-silicon measurement; per-entry mode only, and the f32
        # activation block must fit VMEM (~25 MB at the flagship config).
        layer_outer = (
            per_entry
            and Be > 4
            and os.environ.get("MSMD_DECODER_RESIDENT", "0") == "1"
            and Be * lq_rows * cfg.feature_dim * 4 <= 40 * 1024 * 1024
        )
        fused = dict(
            pack=pack_decoder_weights(
                variables["params"]["denoising_net"]["transformer"], cfg.n_layers, dtype=model.dtype
            ),
            kmem=km, vmem=vm, self_mask=sm, cross_mask=cm, tile_entries=tile,
            per_entry_attention=per_entry, layer_outer=layer_outer,
            pad_lq=lq_pad,
            interpret=jax.default_backend() == "cpu",
        )

    # Fused FFN+LN Pallas kernel for the XLA (large-batch) decoder path:
    # the FFN hidden state is the largest unfused HBM intermediate of the
    # step (measured, benchmarks/glue_probe.py). The full fused-decoder
    # kernel already covers it in the latency regime.
    fused_ffn = (
        fused is None
        and model.dtype == jnp.bfloat16
        and os.environ.get("MSMD_FUSED_FFN", "1") != "0"
    )
    # Fused layer-TAIL kernel (supersedes the FFN kernel when usable):
    # out-proj + residual/LN1 + identity-band cross + residual/LN2 + FFN
    # + LN3 as one program per layer — only the self-attention einsums
    # and the per-entry person-row cross attention stay in XLA.
    # Measured at batch 48: 65.3x vs 69.9x for the FFN-kernel path — the
    # person-row split costs more than the extra fused round-trips save
    # (see layer_tail_kernel.py docstring). Opt-in only.
    fused_tail = False
    if (
        fused_ffn
        and cfg.align_mask_width == 1
        and os.environ.get("MSMD_FUSED_TAIL", "0") == "1"
    ):
        from msmd_tpu.ops.pallas.layer_tail_kernel import tail_rows_tile

        _lm = stacks["prev_motion_in"].shape[1] + n_motions
        fused_tail = bool(tail_rows_tile(Be * _lm))
        if fused_tail:
            fused_ffn = False

    # step-embedding MLP precomputed for all T steps (exact rowwise
    # rewrite): the in-scan per-step embedding becomes one gather
    step_emb_table = model.apply(variables, method=MSMD.precompute_step_emb)

    # Latency regime: hoist the per-step PRNG (split + normal) out of the
    # scan by precomputing the noise for all T steps with the IDENTICAL
    # sequential key-split chain the scan body would use — bit-identical
    # outputs, ~4 fewer ops inside the per-op-latency-bound hot loop.
    # Gated to small batches: the (T, B, L, D) buffer is 13 MB at batch 1
    # but would be ~650 MB at the batch-48 throughput config.
    if precompute_noise is None:
        precompute_noise = batch_size <= 4
    if noise_override is None and precompute_noise:
        def _chain(k, _):
            k2, kz = jax.random.split(k)
            return k2, kz

        _, _kzs = jax.lax.scan(_chain, key, None, length=sched.num_steps)
        noise_override = jax.vmap(
            lambda kk: jax.random.normal(kk, motion_at_T.shape, motion_at_T.dtype)
        )(_kzs)

    # --- fully-fused sampler step (batch-1 latency regime): the ENTIRE
    # DDPM step — token-row build, decoder stack, motion decode with
    # style-basis combine, CFG mix, x_t -> x_{t-1} update — as ONE Pallas
    # program per scan iteration (ops/pallas/decoder_kernel.py
    # fused_sampler_step). The XLA scan body shrinks to two table
    # gathers + the kernel call.
    mega = None
    if (
        fused is not None
        and batch_size == 1
        and cfg.align_mask_width == 1
        and fused["tile_entries"] == n_entries
        and guidance_indice is None
        and dynamic_threshold is None
        and not cfg.no_use_learnable_pe
        and not model.use_head_alpha
        and noise_override is not None  # per-step noise precomputed
        and os.environ.get("MSMD_FUSED_STEP", "1") != "0"
    ):
        from msmd_tpu.ops.pallas.decoder_kernel import build_sampler_step_aux

        dn = variables["params"]["denoising_net"]
        E, P, N, D = n_entries, stacks["prev_motion_in"].shape[1], n_motions, cfg.motion_feat_dim
        lq, lm = 1 + P + N, P + N
        f32 = jnp.float32
        # Read the UNTILED sources (see _prepare_sample_inputs): prev
        # motion / indicator are entry-invariant by construction there,
        # so the mega path shares the exact same tensors the tiled XLA
        # stacks are built from.
        ind = stacks["indicator_src"]
        ind_row = (ind[0] if ind is not None else jnp.ones((N,), f32)).astype(f32)
        prev_rows = stacks["prev_motion_src"][0].astype(f32)
        if cfg.use_indicator:
            # prev rows carry indicator channel 0 (denoiser.py concat)
            prev_rows = jnp.concatenate([prev_rows, jnp.zeros((P, 1), f32)], axis=1)
        persons_pre = (
            stacks["person_in"][:, 0, :].astype(f32) @ jnp.asarray(dn["person_proj"]["kernel"], f32)
            + jnp.asarray(dn["person_proj"]["bias"], f32)
        )  # (E, F)
        pe_flat = jnp.tile(jnp.asarray(dn["PE"], f32)[0], (E, 1))  # (E*lq, F)
        style_e = stacks["style_in"][:, 0, :].astype(f32)
        statics = []
        for kb in range(cfg.num_of_basis):
            mp = dn[f"static_feature_mapping_{kb}"]
            hh = jax.nn.gelu(
                style_e @ jnp.asarray(mp["linear1"]["kernel"], f32) + jnp.asarray(mp["linear1"]["bias"], f32),
                approximate=False,
            )
            statics.append(hh @ jnp.asarray(mp["linear2"]["kernel"], f32) + jnp.asarray(mp["linear2"]["bias"], f32))
        statics_rows = jnp.stack([jnp.repeat(s, N, axis=0) for s in statics])  # (K, E*N, D)
        pose_sum_rows = jnp.repeat(sum(statics)[:, -3:], N, axis=0)  # (E*N, 3)
        person_mask_a, sel_pq_a, sel_ps_a, sel_vm_a = fused["cross_mask"]
        sel_pp, sel_mm, sel_tail = build_sampler_step_aux(E, lq, lm, P, N, dtype=model.dtype)
        mega_const = dict(
            prev_rows=prev_rows, ind_col=ind_row[:, None],
            wfp=jnp.asarray(dn["feature_proj"]["kernel"]).astype(model.dtype),
            bfp=jnp.asarray(dn["feature_proj"]["bias"], f32)[None, :],
            persons_pre=persons_pre, pe_flat=pe_flat,
            self_mask=fused["self_mask"], person_mask=person_mask_a,
            sel_pq=sel_pq_a, sel_ps=sel_ps_a, sel_vm=sel_vm_a,
            sel_pp=sel_pp, sel_mm=sel_mm, sel_tail=sel_tail,
            wd1=jnp.asarray(dn["motion_dec_1"]["kernel"]).astype(model.dtype),
            bd1=jnp.asarray(dn["motion_dec_1"]["bias"], f32)[None, :],
            wd2=jnp.asarray(dn["motion_dec_2"]["kernel"]).astype(model.dtype),
            bd2=jnp.asarray(dn["motion_dec_2"]["bias"], f32)[None, :],
            statics_rows=statics_rows, pose_sum_rows=pose_sum_rows,
        )
        # per-step DDPM scalars [A, B, sigma]: motion_next =
        # A*x_t + B*target + sigma*z covers both target modes exactly
        t_all = jnp.arange(sched.num_steps + 1)
        al = sched.alphas[t_all]
        ab = sched.alpha_bars[t_all]
        ab_prev = sched.alpha_bars[jnp.maximum(t_all - 1, 0)]
        sig = sched.get_sigmas(t_all, flexibility)
        denom = jnp.where(t_all > 0, 1.0 - ab, 1.0)
        if cfg.target == "sample":
            A_t = (1.0 - ab_prev) * jnp.sqrt(al) / denom
            B_t = (1.0 - al) * jnp.sqrt(ab_prev) / denom
        else:  # noise
            A_t = 1.0 / jnp.sqrt(al)
            B_t = -A_t * (1.0 - al) / jnp.sqrt(denom)
        sc_tab = jnp.stack([A_t, B_t, sig] + [jnp.zeros_like(A_t)] * 5, axis=1).astype(f32)
        mega = dict(const=mega_const, sc_tab=sc_tab)

    # --- weight-RESIDENT whole-scan kernel: all T steps as ONE Pallas
    # program with the decoder weights loaded into VMEM once (they fit:
    # ~59 MB bf16 at the flagship config vs 128 MB/core on v5e). Removes
    # the per-step 59 MB weight-streaming DMA floor that bounds batch-1
    # latency (BENCH.md). Falls back to the per-step mega path for
    # ret_traj (the trajectory needs per-step outputs).
    if (
        mega is not None
        and not ret_traj
        and os.environ.get("MSMD_FUSED_SCAN", "1") != "0"
    ):
        from msmd_tpu.ops.pallas.decoder_kernel import (
            build_identity_band_aux as _band_aux,
            build_sampler_step_aux as _step_aux,
            build_vmw as _build_vmw,
            fused_sampler_scan,
        )

        ts_scan = jnp.arange(sched.num_steps, 0, -1)
        emb_scan = step_emb_table[ts_scan][:, None, :].astype(jnp.float32)  # (T, 1, F)
        sc_scan = mega["sc_tab"][ts_scan][:, None, :]  # (T, 1, 8)
        zmask = (ts_scan > 1).astype(jnp.float32)[:, None, None]
        z_scan = noise_override[:, 0].astype(jnp.float32) * zmask  # (T, N, D)
        # The scan kernel runs per-entry self-attention; self_mask (flat
        # layout, per-step mega kernel only) is dropped from its consts.
        scan_const = {k: v for k, v in mega["const"].items() if k != "self_mask"}
        # Sublane padding: pad each entry's token rows to the next
        # 8-multiple (126 -> 128 at the flagship geometry) so every
        # per-entry row slice is 8-aligned and the (lq, lq) attention
        # dots are exactly MXU-tile-shaped. Pad rows carry zero input
        # (all selectors/PE are zero there), are hidden from attention
        # keys by key_mask, and are never gathered by sel_tail.
        E, P, N = n_entries, stacks["prev_motion_in"].shape[1], n_motions
        lq, lm = 1 + P + N, P + N
        if lq % 8 and os.environ.get("MSMD_SCAN_PAD", "1") != "0":
            lqp = ((lq + 7) // 8) * 8
            pm_p, spq_p, sps_p, svm_p = _band_aux(E, lqp, lm, dtype=model.dtype)
            spp_p, smm_p, stl_p = _step_aux(E, lqp, lm, P, N, dtype=model.dtype)
            dn = variables["params"]["denoising_net"]
            pe0 = jnp.asarray(dn["PE"], jnp.float32)[0]  # (lq, F)
            pe_pad = jnp.pad(pe0, ((0, lqp - lq), (0, 0)))
            scan_const.update(
                pe_flat=jnp.tile(pe_pad, (E, 1)),
                person_mask=pm_p, sel_pq=spq_p, sel_ps=sps_p, sel_vm=svm_p,
                sel_pp=spp_p, sel_mm=smm_p, sel_tail=stl_p,
                key_mask=jnp.where(
                    jnp.arange(lqp) < lq, jnp.float32(0.0), jnp.float32(-1e30)
                )[None, :],
            )
        # Block-diagonal self-attention (MSMD_SCAN_BLOCKDIAG=1): fold
        # both CFG entries' self-attention into one (E*lqp, E*lqp)
        # masked dot per head — halves the self-attention dot issues per
        # layer at E=2 for ~2x MAC waste on the tiny score blocks
        # (latency-regime tradeoff; exact — masked scores exp to 0).
        if os.environ.get("MSMD_SCAN_BLOCKDIAG", "0") == "1":
            from msmd_tpu.ops.pallas.decoder_kernel import build_scan_self_mask

            lqp_eff = scan_const["pe_flat"].shape[0] // E
            scan_const["self_mask_bd"] = build_scan_self_mask(E, lqp_eff, lq)
        # Hoist the PROJECTED identity-band V-gather out of the kernel:
        # sel_vm is one-hot and the memory V is step-invariant, so
        # (sel_vm @ vm) @ wco is an exact per-layer constant (L, R, F);
        # its rows are disjoint from the person-row contribution, so
        # distributing wco is row-exact (see _layer_compute). Removes
        # the (R, Mt) gather matmul AND shrinks the wco projection to
        # the person rows — per layer per step. Stored f32 (resident,
        # ~4 MB): no new rounding vs the in-kernel f32-accumulated dots.
        if os.environ.get("MSMD_VMW_HOIST", "1") != "0":
            scan_const["vmw"] = _build_vmw(
                scan_const["sel_vm"], fused["vmem"], fused["pack"]["wco"], 1
            )
        m0 = fused_sampler_scan(
            fused["pack"], fused["kmem"], fused["vmem"],
            motion_at_T[0].astype(jnp.float32), emb_scan, sc_scan, z_scan,
            scan_const,
            n_heads=cfg.n_heads, n_entries=n_entries, n_cur=n_motions,
            d_motion=cfg.motion_feat_dim, num_basis=cfg.num_of_basis,
            use_indicator=cfg.use_indicator,
            sigmoid_alpha=cfg.regularize_alpha == "sigmoid",
            coefficients=tuple(float(c) for c in stacks["coefficients"]),
            interpret=fused["interpret"],
        )
        motion_0 = m0[None].astype(motion_at_T.dtype)
        return motion_0, motion_at_T, audio_feat

    # Hoist the PROJECTED identity-band V-gather out of the DDPM hot
    # loop: (sel_vm @ vm) @ wco is step-invariant (the memory V cache
    # is built once per window), so precomputing it removes a dense
    # (Rt, Mt) one-hot-gather matmul AND shrinks the (Rt, F) wco
    # projection to the person rows — per layer per tile per step
    # (~150 GFLOP/step at the batch-48 flagship shapes). Row-exact
    # rewrite (disjoint supports, see _layer_compute); stored in the
    # kernel matmul dtype (streamed per (tile, layer) like K/V;
    # MSMD_VMW_F32=1 stores f32 at 2x the DMA). Built only HERE, after
    # the mega/scan decisions: the batch-1 mega paths never read
    # fused["vmw"] (the scan kernel hoists its own f32 copy above).
    if (
        fused is not None
        and mega is None
        and cfg.align_mask_width == 1
        and os.environ.get("MSMD_VMW_HOIST", "1") != "0"
    ):
        from msmd_tpu.ops.pallas.decoder_kernel import build_vmw

        vmw_dt = (
            jnp.float32
            if os.environ.get("MSMD_VMW_F32", "0") == "1"
            else model.dtype
        )
        fused["vmw"] = build_vmw(
            fused["cross_mask"][3], fused["vmem"], fused["pack"]["wco"],
            Be // fused["tile_entries"], out_dtype=vmw_dt,
        )

    def denoise_apply(motion_in, step_in):
        return model.apply(
            variables,
            motion_in,
            stacks["audio_in"],
            stacks["person_in"],
            stacks["style_in"],
            stacks["prev_motion_in"],
            stacks["prev_audio_in"],
            step_in,
            stacks["indicator_in"],
            memory_kv=memory_kv,
            fused_decoder=fused,
            fused_ffn=fused_ffn,
            fused_tail=fused_tail,
            step_emb_table=step_emb_table,
            method=MSMD.denoise,
        )

    def body(carry, xs):
        t = xs[0] if noise_override is not None else xs
        motion_at_t, k = carry
        if noise_override is not None:
            z = xs[1]
        else:
            k, kz = jax.random.split(k)
            z = jax.random.normal(kz, motion_at_t.shape, motion_at_t.dtype)
        z = jnp.where(t > 1, z, jnp.zeros_like(z))

        if mega is not None:
            from msmd_tpu.ops.pallas.decoder_kernel import fused_sampler_step

            m_next = fused_sampler_step(
                fused["pack"], fused["kmem"], fused["vmem"],
                motion_at_t[0].astype(jnp.float32),
                step_emb_table[t][None, :].astype(jnp.float32),
                mega["sc_tab"][t][None, :],
                z[0].astype(jnp.float32),
                mega["const"],
                n_heads=cfg.n_heads, n_entries=n_entries, n_cur=n_motions,
                d_motion=cfg.motion_feat_dim, num_basis=cfg.num_of_basis,
                use_indicator=cfg.use_indicator,
                sigmoid_alpha=cfg.regularize_alpha == "sigmoid",
                coefficients=tuple(float(c) for c in stacks["coefficients"]),
                interpret=fused["interpret"],
            )
            motion_next = m_next[None].astype(motion_at_t.dtype)
            return (motion_next, k), motion_next if ret_traj else None

        alpha = sched.alphas[t]
        alpha_bar = sched.alpha_bars[t]
        alpha_bar_prev = sched.alpha_bars[t - 1]
        sigma = sched.get_sigmas(t, flexibility)

        motion_in = jnp.concatenate([motion_at_t] * n_entries, axis=0)
        if guidance_indice is not None:
            motion_in = motion_in.at[:, guidance_indice, :].set(guidance_values)
        step_in = jnp.full((batch_size * n_entries,), t, jnp.int32)

        results = denoise_apply(motion_in, step_in)
        if dynamic_threshold:
            results = _dynamic_threshold(results, n_motions, dynamic_threshold)
        results = results.reshape((n_entries, batch_size) + results.shape[1:])
        target_theta = _cfg_combine(results, stacks["coefficients"], n_motions)

        if cfg.target == "noise":
            c0 = 1.0 / jnp.sqrt(alpha)
            c1 = (1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)
            motion_next = c0 * (motion_at_t - c1 * target_theta) + sigma * z
        elif cfg.target == "sample":
            c0 = (1.0 - alpha_bar_prev) * jnp.sqrt(alpha) / (1.0 - alpha_bar)
            c1 = (1.0 - alpha) * jnp.sqrt(alpha_bar_prev) / (1.0 - alpha_bar)
            motion_next = c0 * motion_at_t + c1 * target_theta + sigma * z
        else:
            raise ValueError(f"Unknown target type: {cfg.target}")
        return (motion_next, k), motion_next if ret_traj else None

    ts = jnp.arange(sched.num_steps, 0, -1)
    xs = ts if noise_override is None else (ts, noise_override.astype(motion_at_T.dtype))
    (motion_0, _), traj_tail = jax.lax.scan(body, (motion_at_T, key), xs, unroll=scan_unroll)

    if ret_traj:
        # traj_tail is ordered t = T-1 .. 0; prepend x_T and flip so that
        # index t holds x_t, mirroring the reference's traj dict.
        traj = jnp.concatenate([traj_tail[::-1], motion_at_T[None]], axis=0)
        return traj, motion_at_T, audio_feat
    return motion_0, motion_at_T, audio_feat


def sample_with_guide(model, variables, key, audio_or_feat, shape_feat, *, guidance_indice, guidance_values, **kw):
    """Naive inpainting guidance (reference: model.py:653-818)."""
    return sample(
        model, variables, key, audio_or_feat, shape_feat,
        guidance_indice=guidance_indice, guidance_values=guidance_values, **kw,
    )


def sample_separate(
    model: "MSMD",
    variables,
    key: jax.Array,
    audio_or_feat: jnp.ndarray,
    shape_feat: jnp.ndarray,
    style_feat: Optional[jnp.ndarray] = None,
    prev_motion_feat: Optional[jnp.ndarray] = None,
    prev_audio_feat: Optional[jnp.ndarray] = None,
    motion_at_T: Optional[jnp.ndarray] = None,
    indicator: Optional[jnp.ndarray] = None,
    cfg_mode: Optional[str] = None,
    cfg_cond: Optional[Sequence[str]] = None,
    cfg_scale=1.15,
    flexibility: float = 0.0,
    dynamic_threshold: Optional[Tuple[float, float, float]] = None,
    alpha_t_modification=None,
    return_all_alpha: bool = False,
    noise_override: Optional[jnp.ndarray] = None,
):
    """Style-basis introspection sampler (reference: model.py:442-651):
    like `sample` but the denoiser returns (dynamic, static, alpha)
    separately; alpha can be modified in-flight; returns the final
    dynamic part, the accumulated static contribution, and the guided
    alpha trajectory.

    ``noise_override``: optional (T, B, n_motions, D) per-step z used in
    place of the internal PRNG draws (index 0 = the t=T step), enabling
    bit-identical cross-framework parity runs like ``sample``'s."""
    cfg = model.cfg
    sched = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
    key, audio_feat, motion_at_T, stacks, (cfg_mode_n, cfg_cond_n, cfg_scale_n) = _prepare_sample_inputs(
        model, variables, key, audio_or_feat, shape_feat, style_feat,
        prev_motion_feat, prev_audio_feat, motion_at_T, indicator, cfg_mode, cfg_cond, cfg_scale,
    )
    batch_size = motion_at_T.shape[0]
    n_motions = motion_at_T.shape[1]
    n_entries = stacks["n_entries"]
    d_motion = cfg.motion_feat_dim
    memory_kv = model.apply(
        variables, stacks["prev_audio_in"], stacks["audio_in"], method=MSMD.cache_denoiser_memory_kv
    )

    def combine_static(static, alpha_e):
        if model.use_head_alpha:
            return (static * alpha_e).sum(axis=2)
        face = (static[..., :-3] * alpha_e).sum(axis=2)
        pose = static[..., -3:].sum(axis=2)
        return jnp.concatenate([face, pose], axis=-1)

    def body(carry, t_z):
        motion_at_t, cum_static, k = carry
        if noise_override is None:
            t = t_z
            k, kz = jax.random.split(k)
            z = jax.random.normal(kz, motion_at_t.shape, motion_at_t.dtype)
        else:
            t, z = t_z
        z = jnp.where(t > 1, z, jnp.zeros_like(z))

        alpha = sched.alphas[t]
        alpha_bar = sched.alpha_bars[t]
        alpha_bar_prev = sched.alpha_bars[t - 1]
        sigma = sched.get_sigmas(t, flexibility)

        motion_in = jnp.concatenate([motion_at_t] * n_entries, axis=0)
        step_in = jnp.full((batch_size * n_entries,), t, jnp.int32)
        dynamic, static, alpha_t = model.apply(
            variables, motion_in, stacks["audio_in"], stacks["person_in"], stacks["style_in"],
            stacks["prev_motion_in"], stacks["prev_audio_in"], step_in, stacks["indicator_in"],
            keep_separate=True, memory_kv=memory_kv, method=MSMD.denoise,
        )
        if alpha_t_modification is not None:
            alpha_t = alpha_t_modification(alpha_t)
        static_sum = combine_static(static, alpha_t[..., None])
        results = dynamic + static_sum
        if dynamic_threshold:
            results = _dynamic_threshold(results, n_motions, dynamic_threshold)

        reshape_e = lambda x: x.reshape((n_entries, batch_size) + x.shape[1:])
        coeffs = stacks["coefficients"]
        target_theta = _cfg_combine(reshape_e(results), coeffs, n_motions)
        target_dynamic = _cfg_combine(reshape_e(dynamic), coeffs, n_motions)
        target_static = _cfg_combine(reshape_e(static_sum), coeffs, n_motions)
        target_alpha = _cfg_combine(reshape_e(alpha_t), coeffs, n_motions)

        if cfg.target == "noise":
            c0 = 1.0 / jnp.sqrt(alpha)
            c1 = (1.0 - alpha) / jnp.sqrt(1.0 - alpha_bar)
            motion_next = c0 * (motion_at_t - c1 * target_theta) + sigma * z
        else:
            c0 = (1.0 - alpha_bar_prev) * jnp.sqrt(alpha) / (1.0 - alpha_bar)
            c1 = (1.0 - alpha) * jnp.sqrt(alpha_bar_prev) / (1.0 - alpha_bar)
            motion_next = c0 * motion_at_t + c1 * target_theta + sigma * z
        cum_static = cum_static + c1 * target_static
        return (motion_next, cum_static, k), (target_dynamic, target_alpha)

    ts = jnp.arange(sched.num_steps, 0, -1)
    xs = ts if noise_override is None else (ts, noise_override.astype(motion_at_T.dtype))
    (motion_0, cum_static, _), (dyn_traj, alpha_traj) = jax.lax.scan(
        body, (motion_at_T, jnp.zeros_like(motion_at_T), key), xs
    )
    final_dynamic = dyn_traj[-1]
    final_alpha = alpha_traj[-1]
    if return_all_alpha:
        return motion_0, motion_at_T, audio_feat, final_dynamic, cum_static, alpha_traj
    return motion_0, motion_at_T, audio_feat, final_dynamic, cum_static, final_alpha


def get_diffusion_model(cfg: MSMDConfig, audio_config: Optional[AudioEncoderConfig] = None, dtype=jnp.float32, param_dtype=jnp.float32) -> MSMD:
    """Factory mirroring the reference's defensive defaults
    (reference: model.py:7-17): use_head_alpha=False, regularize_alpha
    from config. ``audio_config`` overrides the base-size wav2vec2/hubert
    architecture (tests/benchmarks use tiny ones)."""
    return MSMD(cfg=cfg, use_head_alpha=False, audio_config=audio_config, dtype=dtype, param_dtype=param_dtype)
