"""A full PyTorch oracle of the reference MSMD — assembled from the
public torch/HF API to the documented reference architecture
(reference: model.py:73-440, utils/wav2vec2.py:57-85). Used ONLY for
parity testing: tests/test_interop.py checks per-module equality and
scripts/fidelity_certificate.py runs the complete generation path
(audio -> windowed CFG DDPM -> coefficients) in both frameworks with
identical weights and noise.

The oracle intentionally reproduces reference quirks bit-for-bit:
- the truthy `if dynamic_threshold:` gate (a (0, 1, 4) tuple clamps
  results to +-max(min|r|, 1) — reference model.py:396-402),
- the in-place, view-aliasing CFG guidance mix (model.py:406-417):
  `target_theta` aliases `results[0]`, so independent-mode updates after
  the first use the *mutated* unconditional entry,
- noise reuse across inference windows (inference.py:64-69).
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(*self.dims)


class TorchPE(nn.Module):
    """Sinusoidal table + the single-row quirk (adds pe[:, seq_len, :])."""

    def __init__(self, d_model, dropout=0.1, max_len=600):
        super().__init__()
        self.dropout = nn.Dropout(p=dropout)
        pe = torch.zeros(max_len, d_model)
        position = torch.arange(0, max_len, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, d_model, 2).float() * (-math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe.unsqueeze(0))

    def forward(self, x):
        return self.dropout(x + self.pe[:, x.shape[1], :])


def build_torch_vae2(d_style=16, input_dim=67, conv_dim=512):
    """Reference StyleEncoder_VAE2 (style_encoder.py:119-213)."""
    out_size = d_style * 2
    pre, post = Permute((0, 2, 1)), Permute((0, 2, 1))
    m = nn.Module()
    m.input_layers = nn.Sequential(
        pre, nn.Conv1d(input_dim, conv_dim, 3, padding=1), post, nn.Dropout(0.2), nn.ELU(), nn.LayerNorm(conv_dim),
        pre, nn.Conv1d(conv_dim, conv_dim, 3, padding=1), post, nn.Dropout(0.2), nn.ELU(), nn.LayerNorm(conv_dim),
    )
    m.PE = TorchPE(conv_dim)
    m.encoder = nn.TransformerEncoderLayer(conv_dim, 8, conv_dim, activation="gelu", batch_first=True)
    m.output_layers = nn.Sequential(
        pre, nn.Conv1d(conv_dim, out_size, 3, padding=1), post, nn.Dropout(0.1), nn.ELU(), nn.LayerNorm(out_size),
        pre, nn.Conv1d(out_size, out_size, 3, padding=1), post,
    )

    def forward(motion):
        h = m.input_layers(motion)
        h = m.PE(h)
        h = m.encoder(h)
        h = m.output_layers(h)
        out = h.mean(dim=1)
        return out[:, : out_size // 2], out[:, out_size // 2 :]

    m.encode = forward
    return m


def build_torch_denoiser(cfg, motion_feat_dim=67):
    """Reference DenoisingNetwork_MSMD (model.py:450-640 architecture)."""
    m = nn.Module()
    Fd = cfg.feature_dim
    m.TE = TorchPE(Fd, max_len=cfg.n_diff_steps + 1)
    m.diff_step_map = nn.Sequential(nn.Linear(Fd, Fd), nn.GELU(), nn.Linear(Fd, Fd))
    m.PE = nn.Parameter(torch.randn(1, 1 + cfg.n_prev_motions + cfg.n_motions, Fd))
    m.person_proj = nn.Linear(100 + cfg.d_style, Fd)
    m.feature_proj = nn.Linear(motion_feat_dim + 1, Fd)
    layer = nn.TransformerDecoderLayer(Fd, cfg.n_heads, cfg.mlp_ratio * Fd, activation="gelu", batch_first=True)
    m.transformer = nn.TransformerDecoder(layer, num_layers=cfg.n_layers)
    m.static_feature_mapping = nn.ModuleList(
        [
            nn.Sequential(nn.Linear(cfg.d_style, Fd), nn.GELU(), nn.Linear(Fd, motion_feat_dim))
            for _ in range(cfg.num_of_basis)
        ]
    )
    m.motion_dec = nn.Sequential(nn.Linear(Fd, Fd // 2), nn.GELU(), nn.Linear(Fd // 2, motion_feat_dim + cfg.num_of_basis))

    # banded alignment mask with unmasked person row
    motion_len = cfg.n_prev_motions + cfg.n_motions
    mask = torch.ones(motion_len, motion_len, dtype=torch.bool)
    for i in range(motion_len):
        mask[i, max(0, i - (cfg.align_mask_width - 1)) : i + cfg.align_mask_width] = False
    m.register_buffer("alignment_mask", torch.cat([torch.zeros(1, motion_len, dtype=torch.bool), mask], dim=0))

    def _decompose(motion, audio, person, style, prev_m, prev_a, step, indicator):
        """Shared denoiser chain up to the (dynamic, static, alphas)
        decomposition (reference model.py:914-1003, use_head_alpha=False),
        including the batch-mismatch tile guard (model.py:985-986) that
        ``sample_separate`` relies on when ``style`` has fewer rows than
        the CFG-stacked motion batch."""
        emb = m.diff_step_map(m.TE.pe[0, step]).unsqueeze(1)
        person_f = m.person_proj(person) + emb
        ind = torch.cat([torch.zeros(indicator.shape[0], cfg.n_prev_motions), indicator], dim=1).unsqueeze(-1)
        feats = torch.cat([prev_m, motion], dim=1)
        feats = torch.cat([feats, ind], dim=-1)
        feats = m.feature_proj(feats)
        feats = torch.cat([person_f, feats], dim=1) + m.PE
        mem = torch.cat([prev_a, audio], dim=1)
        out = m.transformer(feats, mem, memory_mask=m.alignment_mask)
        dec = m.motion_dec(out[:, 1:])
        alphas = dec[:, :, -cfg.num_of_basis :]
        dynamic = dec[:, :, : -cfg.num_of_basis]
        statics = []
        for k in range(cfg.num_of_basis):
            s = m.static_feature_mapping[k](style)
            statics.append(torch.tile(s, (1, dec.shape[1], 1)).unsqueeze(2))
        static = torch.cat(statics, dim=2)  # (N_style, L, K, D)
        if static.shape[0] != alphas.shape[0]:
            # reference tile guard: only consistent when style has ONE
            # row (B=1) — exactly the reference's usable envelope
            static = torch.tile(static, (alphas.shape[0], 1, 1, 1))
        return dynamic, static, alphas

    def _combine(static, alphas):
        a = alphas.unsqueeze(-1)
        face = (static[..., :-3] * a).sum(2)
        pose = static[..., -3:].sum(2)
        return torch.cat([face, pose], dim=-1)

    def forward(motion, audio, person, style, prev_m, prev_a, step, indicator):
        dynamic, static, alphas = _decompose(motion, audio, person, style, prev_m, prev_a, step, indicator)
        return dynamic + _combine(static, alphas)

    m.run = forward
    m.run_separate = _decompose
    m.combine_static = _combine
    return m


# ---------------------------------------------------------------------------
# full end-to-end MSMD oracle
# ---------------------------------------------------------------------------

class _SchedBuffers(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        from msmd_tpu.ops.schedule import DiffusionSchedule

        sched = DiffusionSchedule.create(cfg.n_diff_steps, cfg.diff_schedule)
        for name in ("betas", "alphas", "alpha_bars", "sigmas_flex", "sigmas_inflex"):
            self.register_buffer(name, torch.from_numpy(np.asarray(getattr(sched, name))))

    def get_sigmas(self, t, flexibility=0.0):
        return self.sigmas_flex[t] * flexibility + self.sigmas_inflex[t] * (1 - flexibility)


def build_torch_msmd(cfg, hf_kwargs, motion_feat_dim=67, audio_model="wav2vec2"):
    """The complete torch MSMD (reference model.py:73-143): HF wav2vec2
    or hubert audio encoder with the 50 Hz-truncate + linear-resample
    head (utils/wav2vec2.py:57-85 / utils/hubert.py:9-51), the 768->F
    feature map, CFG null/start embeddings, the denoiser, and the
    diffusion schedule buffers. State-dict names match
    ``flax_to_reference_msmd`` exactly. ``audio_model='hubert'`` builds
    the HF HubertModel backbone (the reference's default,
    training_script.py:467) for real-checkpoint parity runs."""
    m = nn.Module()
    if audio_model == "hubert":
        from transformers import HubertConfig, HubertModel

        m.audio_encoder = HubertModel(HubertConfig(**hf_kwargs))
    else:
        from transformers import Wav2Vec2Config, Wav2Vec2Model

        m.audio_encoder = Wav2Vec2Model(Wav2Vec2Config(**hf_kwargs))
    m.audio_feature_map = nn.Linear(hf_kwargs["hidden_size"], cfg.feature_dim)
    m.start_motion_feat = nn.Parameter(torch.zeros(1, cfg.n_prev_motions, motion_feat_dim))
    m.start_audio_feat = nn.Parameter(torch.zeros(1, cfg.n_prev_motions, cfg.feature_dim))
    conds = cfg.guiding_condition_list
    if "audio" in conds:
        m.null_audio_feat = nn.Parameter(torch.zeros(1, 1, cfg.feature_dim))
    if "style" in conds:
        m.null_style_feat = nn.Parameter(torch.zeros(1, 1, cfg.d_style))
    m.denoising_net = build_torch_denoiser(cfg, motion_feat_dim)
    m.diffusion_sched = _SchedBuffers(cfg)

    def pad_audio(audio, audio_unit=320, pad_threshold=80):
        """reference utils/model_common.py:110-123."""
        audio_len = audio.shape[1]
        n_units = audio_len // audio_unit
        side_len = math.ceil((audio_unit * n_units + pad_threshold - audio_len) / 2)
        if side_len >= 0:
            reflect_len = side_len // 2
            replicate_len = side_len % 2
            a = audio.unsqueeze(1)
            if reflect_len > 0:
                a = F.pad(a, (reflect_len, reflect_len), mode="reflect")
                a = F.pad(a, (reflect_len, reflect_len), mode="reflect")
            if replicate_len > 0:
                a = F.pad(a, (1, 1), mode="replicate")
            audio = a.squeeze(1)
        return audio

    def extract_audio_feature(audio, frame_num):
        """The reference's two-stage resampling head (model.py:250-264):
        pad_audio -> modified wav2vec2 at 2x frame rate (conv features
        truncated to round(2*frame_num*50/fps) and resampled to
        2*frame_num, then projection + transformer) -> second linear
        resample of the 768-dim features down to frame_num -> 768->F map."""
        enc = m.audio_encoder
        audio = pad_audio(audio)
        feats = enc.feature_extractor(audio)  # (B, C, T)
        keep = round(2 * frame_num * 50 / cfg.fps)
        feats = feats[:, :, :keep]
        feats = F.interpolate(feats, size=2 * frame_num, mode="linear", align_corners=False)
        feats = feats.transpose(1, 2)  # (B, 2L, C)
        proj = enc.feature_projection(feats)
        # wav2vec2's feature_projection returns (hidden, pre-norm feats);
        # hubert's returns just hidden
        hidden = proj[0] if isinstance(proj, tuple) else proj
        hidden = enc.encoder(hidden).last_hidden_state  # (B, 2L, 768)
        hidden = F.interpolate(
            hidden.transpose(1, 2), size=frame_num, mode="linear", align_corners=False
        ).transpose(1, 2)
        return m.audio_feature_map(hidden)

    m.extract_audio_feature = extract_audio_feature
    return m


@torch.no_grad()
def torch_sample(
    m,
    cfg,
    audio_feat,  # (B, n_motions, F) — already extracted
    shape_feat,  # (B, 1, 100)
    style_feat,  # (B, 1, d_style)
    motion_at_T,  # (B, n_motions, D)
    z_seq,  # (T, B, n_motions, D) per-step noise, index 0 = step t=T
    prev_motion_feat=None,
    prev_audio_feat=None,
    indicator=None,
    cfg_mode=None,
    cfg_scale=1.15,
    flexibility: float = 0.0,
    dynamic_threshold=None,
    guidance_indice=None,
    guidance_values=None,
):
    """The reference MSMD.sample loop (model.py:282-440) verbatim in
    semantics: full CFG entry stack (no dead-entry elimination), the
    sequential in-place guidance mix, per-step DDPM update.

    ``guidance_indice``/``guidance_values``: the naive inpainting write
    of ``sample_with_guide`` (reference model.py:765-766) — the listed
    motion rows of the denoiser INPUT are overwritten each step. NOTE:
    the released reference's sample_with_guide also drops the style arg
    from its denoiser call (model.py:770 passes 7 of 8 positional args),
    which crashes at the step-embedding lookup; this oracle implements
    the evident intent (same call as MSMD.sample plus the write), which
    is what msmd_tpu.models.diffusion.sample_with_guide implements."""
    B, n_motions, D = motion_at_T.shape
    cfg_mode = cfg_mode or cfg.cfg_mode
    conds = [c for c in cfg.guiding_condition_list if c in ("audio", "style")]
    conds = sorted(conds, key=["audio", "style"].index)
    scales = list(cfg_scale) if isinstance(cfg_scale, (list, tuple)) else [cfg_scale] * len(conds)

    if prev_motion_feat is None:
        prev_motion_feat = m.start_motion_feat.expand(B, -1, -1)
    if prev_audio_feat is None:
        prev_audio_feat = m.start_audio_feat.expand(B, -1, -1)
    if indicator is None:
        indicator = torch.ones(B, n_motions)

    # CFG stacks (reference model.py:336-374): entry 0 = all-null
    null_audio = m.null_audio_feat.expand(B, n_motions, -1) if "audio" in conds else audio_feat
    if "style" in conds:
        person_null = torch.cat([shape_feat, m.null_style_feat.expand(B, -1, -1)], dim=-1)
    else:
        person_null = torch.cat([shape_feat, style_feat], dim=-1)
    audio_in, person_in = [null_audio], [person_null]
    for cond in conds:
        if cond == "audio":
            audio_in.append(audio_feat)
            person_in.append(person_null)
        else:  # style
            audio_in.append(null_audio if cfg_mode == "independent" else audio_feat)
            person_in.append(torch.cat([shape_feat, style_feat], dim=-1))
    n_entries = len(audio_in)
    audio_in = torch.cat(audio_in, dim=0)
    person_in = torch.cat(person_in, dim=0)
    tile = lambda x: torch.cat([x] * n_entries, dim=0)
    style_in, prev_m_in, prev_a_in, ind_in = tile(style_feat), tile(prev_motion_feat), tile(prev_audio_feat), tile(indicator)

    sched = m.diffusion_sched
    motion_at_t = motion_at_T.clone()
    for i, t in enumerate(range(cfg.n_diff_steps, 0, -1)):
        z = z_seq[i] if t > 1 else torch.zeros_like(motion_at_t)
        alpha = sched.alphas[t]
        alpha_bar = sched.alpha_bars[t]
        sigma = sched.get_sigmas(t, flexibility)

        motion_in = torch.cat([motion_at_t] * n_entries, dim=0)
        if guidance_indice is not None:
            motion_in[:, guidance_indice, :] = guidance_values
        step_in = torch.full((B * n_entries,), t, dtype=torch.long)
        results = m.denoising_net.run(motion_in, audio_in, person_in, style_in, prev_m_in, prev_a_in, step_in, ind_in)

        if dynamic_threshold:  # truthy gate, exactly as the reference
            dt_ratio, dt_min, dt_max = dynamic_threshold
            abs_results = results[:, -n_motions:].reshape(B * n_entries, -1).abs()
            s = torch.quantile(abs_results, dt_ratio, dim=1)
            s = torch.clamp(s, min=dt_min, max=dt_max)[..., None, None]
            results = torch.clamp(results, min=-s, max=s)

        results = list(results.chunk(n_entries))
        target_theta = results[0][:, -n_motions:]
        for j in range(n_entries - 1):
            if cfg_mode == "independent":
                target_theta += scales[j] * (results[j + 1][:, -n_motions:] - results[0][:, -n_motions:])
            elif cfg_mode == "incremental":
                target_theta += scales[j] * (results[j + 1][:, -n_motions:] - results[j][:, -n_motions:])
            else:
                raise NotImplementedError(cfg_mode)

        if cfg.target == "noise":
            c0 = 1.0 / torch.sqrt(alpha)
            c1 = (1.0 - alpha) / torch.sqrt(1.0 - alpha_bar)
            motion_at_t = c0 * (motion_at_t - c1 * target_theta) + sigma * z
        else:  # sample
            alpha_bar_prev = sched.alpha_bars[t - 1]
            c0 = (1.0 - alpha_bar_prev) * torch.sqrt(alpha) / (1.0 - alpha_bar)
            c1 = (1.0 - alpha) * torch.sqrt(alpha_bar_prev) / (1.0 - alpha_bar)
            motion_at_t = c0 * motion_at_t + c1 * target_theta + sigma * z
    return motion_at_t


@torch.no_grad()
def torch_sample_separate(
    m,
    cfg,
    audio_feat,  # (B, n_motions, F) — already extracted
    shape_feat,  # (B, 1, 100)
    style_feat,  # (B, 1, d_style)
    motion_at_T,  # (B, n_motions, D)
    z_seq,  # (T, B, n_motions, D) per-step noise, index 0 = step t=T
    prev_motion_feat=None,
    prev_audio_feat=None,
    indicator=None,
    cfg_mode=None,
    cfg_scale=1.15,
    flexibility: float = 0.0,
    dynamic_threshold=None,
    alpha_t_modification=None,
    return_all_alpha=False,
):
    """The reference MSMD.sample_separate loop (model.py:442-651)
    verbatim in semantics: the denoiser's (dynamic, static, alpha)
    decomposition is recombined OUTSIDE the net (with an optional alpha
    modification hook), every component is CFG-mixed with the same
    in-place sequential rule as the motion target, and the c1-weighted
    static contribution is accumulated across steps
    (``cumulative_static_pose``, model.py:627-633). The denoiser receives
    the UNSTACKED style rows for the static mapping (model.py:557 passes
    ``style_feat``, not a CFG stack) and relies on the tile guard at
    model.py:985-986 — only consistent at batch size 1, the reference's
    usable envelope for this sampler."""
    B, n_motions, D = motion_at_T.shape
    cfg_mode = cfg_mode or cfg.cfg_mode
    conds = [c for c in cfg.guiding_condition_list if c in ("audio", "style")]
    conds = sorted(conds, key=["audio", "style"].index)
    scales = list(cfg_scale) if isinstance(cfg_scale, (list, tuple)) else [cfg_scale] * len(conds)

    if prev_motion_feat is None:
        prev_motion_feat = m.start_motion_feat.expand(B, -1, -1)
    if prev_audio_feat is None:
        prev_audio_feat = m.start_audio_feat.expand(B, -1, -1)
    if indicator is None:
        indicator = torch.ones(B, n_motions)

    null_audio = m.null_audio_feat.expand(B, n_motions, -1) if "audio" in conds else audio_feat
    if "style" in conds:
        person_null = torch.cat([shape_feat, m.null_style_feat.expand(B, -1, -1)], dim=-1)
    else:
        person_null = torch.cat([shape_feat, style_feat], dim=-1)
    audio_in, person_in = [null_audio], [person_null]
    for cond in conds:
        if cond == "audio":
            audio_in.append(audio_feat)
            person_in.append(person_null)
        else:
            audio_in.append(null_audio if cfg_mode == "independent" else audio_feat)
            person_in.append(torch.cat([shape_feat, style_feat], dim=-1))
    n_entries = len(audio_in)
    audio_in = torch.cat(audio_in, dim=0)
    person_in = torch.cat(person_in, dim=0)
    tile = lambda x: torch.cat([x] * n_entries, dim=0)
    prev_m_in, prev_a_in, ind_in = tile(prev_motion_feat), tile(prev_audio_feat), tile(indicator)

    sched = m.diffusion_sched
    motion_at_t = motion_at_T.clone()
    cumulative_static = torch.zeros_like(motion_at_T)
    alpha_traj = []
    target_dynamic = target_alpha = None
    for i, t in enumerate(range(cfg.n_diff_steps, 0, -1)):
        z = z_seq[i] if t > 1 else torch.zeros_like(motion_at_t)
        alpha = sched.alphas[t]
        alpha_bar = sched.alpha_bars[t]
        alpha_bar_prev = sched.alpha_bars[t - 1]
        sigma = sched.get_sigmas(t, flexibility)

        motion_in = torch.cat([motion_at_t] * n_entries, dim=0)
        step_in = torch.full((B * n_entries,), t, dtype=torch.long)
        # model.py:557: style_feat is passed UNSTACKED (B rows)
        dynamic, static, alpha_t = m.denoising_net.run_separate(
            motion_in, audio_in, person_in, style_feat, prev_m_in, prev_a_in, step_in, ind_in,
        )
        if alpha_t_modification is not None:
            alpha_t = alpha_t_modification(alpha_t)
        static_sum = m.denoising_net.combine_static(static, alpha_t)  # model.py:569-574
        results = dynamic + static_sum

        if dynamic_threshold:
            dt_ratio, dt_min, dt_max = dynamic_threshold
            abs_results = results[:, -n_motions:].reshape(B * n_entries, -1).abs()
            s = torch.quantile(abs_results, dt_ratio, dim=1)
            s = torch.clamp(s, min=dt_min, max=dt_max)[..., None, None]
            results = torch.clamp(results, min=-s, max=s)

        results = list(results.chunk(n_entries))
        static_c = list(static_sum.chunk(n_entries))
        dynamic_c = list(dynamic.chunk(n_entries))
        alpha_c = list(alpha_t.chunk(n_entries))

        # in-place sequential CFG mix over every component (model.py:592-619)
        target_theta = results[0][:, -n_motions:]
        target_static = static_c[0][:, -n_motions:]
        target_dynamic = dynamic_c[0][:, -n_motions:]
        target_alpha = alpha_c[0][:, -n_motions:]
        for j in range(n_entries - 1):
            base = 0 if cfg_mode == "independent" else j
            target_theta += scales[j] * (results[j + 1][:, -n_motions:] - results[base][:, -n_motions:])
            target_dynamic += scales[j] * (dynamic_c[j + 1][:, -n_motions:] - dynamic_c[base][:, -n_motions:])
            target_static += scales[j] * (static_c[j + 1][:, -n_motions:] - static_c[base][:, -n_motions:])
            target_alpha += scales[j] * (alpha_c[j + 1][:, -n_motions:] - alpha_c[base][:, -n_motions:])

        if cfg.target == "noise":
            c0 = 1.0 / torch.sqrt(alpha)
            c1 = (1.0 - alpha) / torch.sqrt(1.0 - alpha_bar)
            motion_at_t = c0 * (motion_at_t - c1 * target_theta) + sigma * z
        else:  # sample
            c0 = (1.0 - alpha_bar_prev) * torch.sqrt(alpha) / (1.0 - alpha_bar)
            c1 = (1.0 - alpha) * torch.sqrt(alpha_bar_prev) / (1.0 - alpha_bar)
            motion_at_t = c0 * motion_at_t + c1 * target_theta + sigma * z
        cumulative_static = cumulative_static + c1 * target_static
        alpha_traj.append(target_alpha.clone())

    alpha_traj = torch.cat(alpha_traj, dim=0)  # model.py:643 (cat on batch dim)
    last_alpha = alpha_traj if return_all_alpha else target_alpha
    return motion_at_t, target_dynamic, cumulative_static, last_alpha


@torch.no_grad()
def torch_infer_coeffs(
    m,
    cfg,
    audio,  # (L_audio,) numpy/tensor 16 kHz z-scored
    shape_coef,  # (1, 100)
    style_feat,  # (1, d_style)
    motion_at_T,  # (1, n_motions, D) — reused across windows (inference.py:64-69)
    z_seq,  # (T, 1, n_motions, D) — reused across windows
    audio_unit: float = 640.0,
    cfg_mode=None,
    cfg_scale=1.15,
    dynamic_threshold=(0, 1, 4),
):
    """The reference windowed inference loop (inference.py:35-75)."""
    audio = torch.as_tensor(np.asarray(audio), dtype=torch.get_default_dtype())
    clip_len = int(len(audio) / 16000 * cfg.fps)
    stride = cfg.n_motions
    n_audio_samples = round(audio_unit * cfg.n_motions)
    n_subdivision = 1 if clip_len <= cfg.n_motions else math.ceil(clip_len / stride)
    n_pad = n_audio_samples * n_subdivision - len(audio)
    n_pad_frames = math.ceil(n_pad / audio_unit)
    if n_pad > 0:
        audio = F.pad(audio, (0, n_pad))

    audio_feat = m.extract_audio_feature(audio[None], cfg.n_motions * n_subdivision)

    shape_in = torch.as_tensor(np.asarray(shape_coef), dtype=torch.get_default_dtype())[:, None]  # (1,1,100)
    style_in = torch.as_tensor(np.asarray(style_feat), dtype=torch.get_default_dtype())[:, None]  # (1,1,S)

    coef_list = []
    prev_motion = prev_audio = None
    for i in range(n_subdivision):
        start = i * stride
        a_in = audio_feat[:, start : start + cfg.n_motions]
        indicator = torch.ones(1, cfg.n_motions)
        if cfg.use_indicator and i == n_subdivision - 1 and n_pad_frames > 0:
            indicator[:, -n_pad_frames:] = 0
        motion = torch_sample(
            m, cfg, a_in, shape_in, style_in, motion_at_T, z_seq,
            prev_motion_feat=prev_motion, prev_audio_feat=prev_audio, indicator=indicator,
            cfg_mode=cfg_mode, cfg_scale=cfg_scale, dynamic_threshold=dynamic_threshold,
        )
        prev_motion = motion[:, -cfg.n_prev_motions :]
        prev_audio = a_in[:, -cfg.n_prev_motions :]
        out = motion
        if i == n_subdivision - 1 and n_pad_frames > 0:
            out = out[:, :-n_pad_frames]
        coef_list.append(out)
    return torch.cat(coef_list, dim=1)
