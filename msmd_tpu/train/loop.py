"""The jitted two-clip training step and the host training loop.

Rebuild of the reference training loop (reference:
training_script.py:49-241) as ONE fixed-shape jitted function per step:

- VAE style extraction for both windows (+ KL), cross-style swap with
  p = prob_cross_style (reference :115-118; the reference draws one
  np.random flag per batch, reproduced as a batch-level bernoulli inside
  jit)
- per-clip random end-truncation with indicator masks (reference
  :123-137); the branchy torch version becomes a masked select, and the
  no-grad full-audio re-extract for the previous-window carry
  (reference :148-162) becomes a ``lax.cond``
- two chained MSMD forwards: clip 0 seeds ``prev_motion/prev_audio`` for
  clip 1 (windowed-autoregression training)
- the weighted loss sum and one (optionally multi-step-accumulated)
  Adam update with the audio-encoder freezing mask applied
  (reference: model.py:93-110, training_script.py:548-551)

Data parallelism: the step function is jit-compiled with the batch
sharded over the mesh's 'data' axis and params replicated; XLA inserts
the gradient psum over ICI (no hand-written collectives — see
msmd_tpu.parallel.mesh).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from msmd_tpu.config import MSMDConfig
from msmd_tpu.losses import (
    compute_kl_loss,
    compute_loss,
    compute_loss_no_vert,
    load_loss_weights,
    truncate_motion_coef_and_audio,
)
from msmd_tpu.models.audio import audio_param_trainable
from msmd_tpu.models.diffusion import MSMD
from msmd_tpu.train.scheduler import make_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # {'model': ..., 'style_enc': ...}
    opt_state: Any


def trainable_mask(cfg: MSMDConfig, params) -> Any:
    """True = trainable. Freezes the audio-encoder subtree per the
    reference policy (model.py:93-110)."""
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        if len(path) > 2 and path[0] == "model" and path[1] == "audio_encoder":
            mask[path] = audio_param_trainable(cfg.audio_model, path[2:])
        else:
            mask[path] = True
    return traverse_util.unflatten_dict(mask)


def stretched_schedule(inner, accum: int):
    """Map MultiSteps' per-update count onto the reference's
    per-micro-iteration scheduler stepping (training_script.py:199-224):
    the scheduler steps at the end of EVERY micro-iteration while the
    optimizer steps every ``accum``, so the u-th optimizer update
    (0-based) runs with the LR after ``u*accum + accum - 1`` scheduler
    steps."""
    return lambda count: inner(count * accum + (accum - 1))


def make_optimizer(cfg: MSMDConfig, params) -> optax.GradientTransformation:
    """Adam (torch defaults) on the warmup(+cosine) schedule, with frozen
    subtrees masked out and optional gradient accumulation.

    The reference accumulates gradient SUMS over
    ``gradient_accumulation_steps`` (plain ``loss.backward()`` per iter,
    no loss scaling — training_script.py:195-201). optax.MultiSteps
    *averages* the k micro-grads, so we pre-scale by k inside the inner
    transform: Adam then sees k * mean == sum, exactly the reference."""
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "freeze", trainable_mask(cfg, params))
    accum = cfg.gradient_accumulation_steps
    schedule = make_schedule(cfg)
    if accum > 1:
        schedule = stretched_schedule(schedule, accum)
    adam = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)
    if accum > 1:
        adam = optax.chain(optax.scale(float(accum)), adam)
    tx = optax.multi_transform({"train": adam, "freeze": optax.set_to_zero()}, labels)
    if accum > 1:
        tx = optax.MultiSteps(tx, accum)
    return tx


def init_models(cfg: MSMDConfig, key: jax.Array, model: MSMD, style_enc) -> Dict[str, Any]:
    """Initialize both param trees. The MSMD init runs one forward with
    RAW audio so the audio-encoder params exist in the tree."""
    k_model, k_style, k_rngs = jax.random.split(key, 3)
    B = 1
    motion = jnp.zeros((B, cfg.n_motions, cfg.motion_feat_dim))
    audio = jnp.zeros((B, cfg.n_audio_samples))
    shape = jnp.zeros((B, cfg.shape_feat_dim))
    style = jnp.zeros((B, cfg.d_style))
    model_vars = model.init(
        {"params": k_model, "diffusion": k_rngs, "dropout": k_rngs, "spec_augment": k_rngs},
        motion, audio, shape, style, deterministic=True,
    )
    se_vars = style_enc.init({"params": k_style, "style": k_rngs}, motion, deterministic=True)
    return {"model": model_vars["params"], "style_enc": se_vars["params"]}


def create_train_state(cfg: MSMDConfig, key: jax.Array, model: MSMD, style_enc) -> Tuple[TrainState, optax.GradientTransformation]:
    params = init_models(cfg, key, model, style_enc)
    tx = make_optimizer(cfg, params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)), tx


# ---------------------------------------------------------------------------
# the two-clip loss (shared by train and eval)
# ---------------------------------------------------------------------------

def two_clip_loss(
    cfg: MSMDConfig,
    model: MSMD,
    style_enc,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    flame=None,
    train: bool = True,
    do_ignore_style: bool = False,
    eval_always_cross_style: bool = False,
    coef_stats: Optional[Dict[str, jnp.ndarray]] = None,
    noise_pair: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """Returns (total_loss, per-term dict). Mirrors the two-clip loop of
    train() (training_script.py:109-196) / test() (:270-340).

    ``noise_pair`` optionally fixes the per-clip q-sample noise (testing /
    RNG-replay hook). With ``cfg.two_clip_batch`` both clips run as one
    2B-row forward (see :func:`_two_clip_loss_batched`)."""
    if getattr(cfg, "two_clip_batch", False):
        return _two_clip_loss_batched(
            cfg, model, style_enc, params, batch, key, flame, train,
            do_ignore_style, eval_always_cross_style, coef_stats, noise_pair,
        )
    weights = load_loss_weights(cfg)
    deterministic = not train
    mvars = {"params": params["model"]}
    svars = {"params": params["style_enc"]}
    batch_size = batch["motion_0"].shape[0]

    keys = jax.random.split(key, 20)
    kidx = iter(range(20))
    nk = lambda: keys[next(kidx)]

    # ---- style extraction (both windows) -----------------------------
    motions = [batch["motion_0"], batch["motion_1"]]
    style_in = [jnp.zeros_like(m) if do_ignore_style else m for m in motions]
    style_out = [
        style_enc.apply(
            svars, style_in[i], deterministic=deterministic,
            rngs={"style": nk(), "dropout": nk()},
        )
        for i in range(2)
    ]
    style_pair = [s[0] for s in style_out]
    mu_pair = [s[1] for s in style_out]
    logvar_pair = [s[2] for s in style_out]

    shape_coef = batch["shape_0"][:, 0]  # first frame (training_script.py:91-93)
    input_shape = jnp.zeros_like(shape_coef) if cfg.do_ignore_shape else shape_coef
    use_cfg = not cfg.do_ignore_cfg

    losses = {k: jnp.zeros(()) for k in list(weights.keys())}
    prev_motion = prev_audio = None

    for i in range(2):
        audio = batch[f"audio_{i}"]
        motion = motions[i]

        # cross-style swap, one flag per batch (training_script.py:115-118)
        style = style_pair[i]
        if cfg.use_cross_style:
            if train:
                swap = jax.random.bernoulli(nk(), cfg.prob_cross_style)
                style = jnp.where(swap, style_pair[1 - i], style)
            elif eval_always_cross_style:
                style = style_pair[1 - i]

        # truncation augmentation, one flag per batch (training_script.py:123-128).
        # TRAIN ONLY: the reference test() never truncates (audio_in=audio,
        # end_idx=None, indicator all ones — training_script.py:317-323).
        if train:
            trunc_prob = cfg.trunc_prob1 if i == 0 else cfg.trunc_prob2
            audio_t, motion_t, end_rand = truncate_motion_coef_and_audio(
                nk(), audio, motion, cfg.n_motions, cfg.audio_unit, cfg.pad_mode, expression_code_size=64
            )
            do_trunc = jax.random.bernoulli(nk(), trunc_prob)
            audio_in = jnp.where(do_trunc, audio_t, audio)
            motion_in = jnp.where(do_trunc, motion_t, motion)
            # end_idx == n_motions encodes "not truncated" (mask = all ones)
            end_idx = jnp.where(do_trunc, end_rand, jnp.full_like(end_rand, cfg.n_motions))
        else:
            audio_in, motion_in = audio, motion
            end_idx = jnp.full((batch_size,), cfg.n_motions, jnp.int32)

        indicator = None
        if cfg.use_indicator:
            indicator = (jnp.arange(cfg.n_motions)[None, :] < end_idx[:, None]).astype(jnp.float32)

        rngs = {"diffusion": nk()}
        if train:
            rngs["dropout"] = nk()
            rngs["spec_augment"] = nk()

        fwd_kw = dict(indicator=indicator, train_with_cfg=use_cfg, deterministic=deterministic)
        if noise_pair is not None:
            fwd_kw["noise"] = noise_pair[i]
        if i == 0:
            eps, target, motion_det, audio_feat_det = model.apply(
                mvars, motion_in, audio_in, input_shape, style, rngs=rngs, **fwd_kw
            )
            # prev-window carry (training_script.py:148-158): always the
            # FULL window's last n_prev frames; audio features re-extracted
            # from the untruncated audio only when truncation happened
            # (eval never truncates, so the carry is the forward's output).
            prev_motion = jax.lax.stop_gradient(motion[:, -cfg.n_prev_motions :])
            if train:
                full_audio_feat = jax.lax.cond(
                    do_trunc,
                    lambda a: jax.lax.stop_gradient(
                        model.apply(mvars, a, method=MSMD.extract_audio_feature, deterministic=True)
                    ),
                    lambda a: audio_feat_det,
                    audio,
                )
            else:
                full_audio_feat = audio_feat_det
            prev_audio = full_audio_feat[:, -cfg.n_prev_motions :]
        else:
            eps, target, _, _ = model.apply(
                mvars, motion_in, audio_in, input_shape, style,
                prev_motion_feat=prev_motion, prev_audio_feat=prev_audio, rngs=rngs, **fwd_kw
            )

        is_hdtf = cfg.dataset_type[:9] == "HDTF_TFHP" or cfg.dataset_type == "flame_mead_ravdess"
        if cfg.use_vertex_space and is_hdtf:
            # coef_stats denormalizes before the FLAME decode
            # (reference: training_script.py:63-66 -> utils/common.py:487-489)
            loss_dict = compute_loss(
                cfg, i == 0, shape_coef, motion_in, eps, target, prev_motion, coef_stats, flame, end_idx
            )
        else:
            loss_dict = compute_loss_no_vert(
                cfg, i == 0, shape_coef, motion_in, eps, target, prev_motion, None, None, end_idx
            )
        loss_dict = dict(loss_dict)
        loss_dict["kl_div"] = compute_kl_loss(mu_pair[i], logvar_pair[i])

        for k, v in loss_dict.items():
            if k in weights and weights[k] > 0:
                losses[k] = losses[k] + v

    total = sum(losses[k] * weights[k] for k in losses if weights[k] > 0)
    metrics = {k: v for k, v in losses.items() if weights[k] > 0}
    metrics["loss"] = total
    return total, metrics


def _two_clip_loss_batched(
    cfg: MSMDConfig,
    model: MSMD,
    style_enc,
    params,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    flame=None,
    train: bool = True,
    do_ignore_style: bool = False,
    eval_always_cross_style: bool = False,
    coef_stats: Optional[Dict[str, jnp.ndarray]] = None,
    noise_pair: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
):
    """The two-clip loss as ONE 2B-row forward (``cfg.two_clip_batch``).

    Same loss function as the sequential path in :func:`two_clip_loss`
    (exact equivalence proven in tests/test_two_clip_batch.py), but the
    style encoder, the audio encoder and the denoiser each run once on
    both clips stacked along batch. This is legal because clip 1's
    prev-window carry uses clip 0's AUDIO features only (reference:
    training_script.py:148-158) — never clip 0's denoiser output — so
    the two forwards have no model dependency. Clip 0's learned start
    features (model.py:57-62 start_motion/audio_feat) are materialized
    explicitly for the first B rows; gradients flow to them through the
    params tree exactly as through the in-module broadcast.

    RNG draw ORDER differs from the sequential path (one (2B,...) draw
    replaces two (B,...) draws per stochastic site), so the stochastic
    augmentations are statistically — not bitwise — equivalent.
    """
    weights = load_loss_weights(cfg)
    deterministic = not train
    mvars = {"params": params["model"]}
    svars = {"params": params["style_enc"]}
    B = batch["motion_0"].shape[0]
    n_prev = cfg.n_prev_motions

    keys = jax.random.split(key, 16)
    kidx = iter(range(16))
    nk = lambda: keys[next(kidx)]

    # ---- style extraction: both windows, one 2B-row pass --------------
    motions = [batch["motion_0"], batch["motion_1"]]
    motion_cat = jnp.concatenate(motions, axis=0)
    style_in = jnp.zeros_like(motion_cat) if do_ignore_style else motion_cat
    style_cat, mu_cat, logvar_cat = style_enc.apply(
        svars, style_in, deterministic=deterministic,
        rngs={"style": nk(), "dropout": nk()},
    )
    style_pair = [style_cat[:B], style_cat[B:]]
    mu_pair = [mu_cat[:B], mu_cat[B:]]
    logvar_pair = [logvar_cat[:B], logvar_cat[B:]]

    shape_coef = batch["shape_0"][:, 0]
    input_shape = jnp.zeros_like(shape_coef) if cfg.do_ignore_shape else shape_coef
    use_cfg = not cfg.do_ignore_cfg

    # ---- per-clip input prep (cheap elementwise work, order-preserving)
    styles, audio_ins, motion_ins, end_idxs, do_truncs = [], [], [], [], []
    for i in range(2):
        style = style_pair[i]
        if cfg.use_cross_style:
            if train:
                swap = jax.random.bernoulli(nk(), cfg.prob_cross_style)
                style = jnp.where(swap, style_pair[1 - i], style)
            elif eval_always_cross_style:
                style = style_pair[1 - i]
        styles.append(style)

        audio, motion = batch[f"audio_{i}"], motions[i]
        if train:
            trunc_prob = cfg.trunc_prob1 if i == 0 else cfg.trunc_prob2
            audio_t, motion_t, end_rand = truncate_motion_coef_and_audio(
                nk(), audio, motion, cfg.n_motions, cfg.audio_unit, cfg.pad_mode, expression_code_size=64
            )
            do_trunc = jax.random.bernoulli(nk(), trunc_prob)
            audio_ins.append(jnp.where(do_trunc, audio_t, audio))
            motion_ins.append(jnp.where(do_trunc, motion_t, motion))
            end_idxs.append(jnp.where(do_trunc, end_rand, jnp.full_like(end_rand, cfg.n_motions)))
            do_truncs.append(do_trunc)
        else:
            audio_ins.append(audio)
            motion_ins.append(motion)
            end_idxs.append(jnp.full((B,), cfg.n_motions, jnp.int32))
            do_truncs.append(jnp.zeros((), bool))

    # ---- audio features: both clips, one 2B-row encoder pass ----------
    feat_rngs = {"dropout": nk(), "spec_augment": nk()} if train else {}
    audio_feat_cat = model.apply(
        mvars, jnp.concatenate(audio_ins, axis=0),
        deterministic=deterministic, rngs=feat_rngs, method=MSMD.extract_audio_feature,
    )

    # ---- clip-1 carry (training_script.py:148-158): FULL-window last
    # n_prev frames; audio features re-extracted (no-grad) from the
    # untruncated audio only when clip 0 was truncated ------------------
    prev_motion = jax.lax.stop_gradient(batch["motion_0"][:, -n_prev:])
    feat0 = jax.lax.stop_gradient(audio_feat_cat[:B])
    if train:
        full_audio_feat = jax.lax.cond(
            do_truncs[0],
            lambda a: jax.lax.stop_gradient(
                model.apply(mvars, a, method=MSMD.extract_audio_feature, deterministic=True)
            ),
            lambda a: feat0,
            batch["audio_0"],
        )
    else:
        full_audio_feat = feat0
    prev_audio = full_audio_feat[:, -n_prev:]

    # clip 0 rows get the learned start features (model.py:164-169's
    # in-module default, materialized from the params tree)
    start_m = jnp.broadcast_to(
        params["model"]["start_motion_feat"], (B,) + params["model"]["start_motion_feat"].shape[1:]
    )
    start_a = jnp.broadcast_to(
        params["model"]["start_audio_feat"], (B,) + params["model"]["start_audio_feat"].shape[1:]
    )
    prev_motion_cat = jnp.concatenate([start_m, prev_motion], axis=0)
    prev_audio_cat = jnp.concatenate([start_a, prev_audio], axis=0)

    indicator_cat = None
    if cfg.use_indicator:
        end_cat = jnp.concatenate(end_idxs, axis=0)
        indicator_cat = (jnp.arange(cfg.n_motions)[None, :] < end_cat[:, None]).astype(jnp.float32)

    # ---- the single 2B-row denoiser forward ----------------------------
    rngs = {"diffusion": nk()}
    if train:
        rngs["dropout"] = nk()
    fwd_kw = dict(
        indicator=indicator_cat, train_with_cfg=use_cfg, deterministic=deterministic,
        prev_motion_feat=prev_motion_cat, prev_audio_feat=prev_audio_cat,
    )
    if noise_pair is not None:
        fwd_kw["noise"] = jnp.concatenate(list(noise_pair), axis=0)
    eps_cat, target_cat, _, _ = model.apply(
        mvars,
        jnp.concatenate(motion_ins, axis=0),
        audio_feat_cat,
        jnp.concatenate([input_shape, input_shape], axis=0),
        jnp.concatenate(styles, axis=0),
        rngs=rngs,
        **fwd_kw,
    )

    # ---- per-clip losses on the split halves ---------------------------
    losses = {k: jnp.zeros(()) for k in list(weights.keys())}
    is_hdtf = cfg.dataset_type[:9] == "HDTF_TFHP" or cfg.dataset_type == "flame_mead_ravdess"
    for i in range(2):
        eps_i = eps_cat[i * B : (i + 1) * B]
        target_i = target_cat[i * B : (i + 1) * B]
        if cfg.use_vertex_space and is_hdtf:
            loss_dict = compute_loss(
                cfg, i == 0, shape_coef, motion_ins[i], eps_i, target_i, prev_motion, coef_stats, flame, end_idxs[i]
            )
        else:
            loss_dict = compute_loss_no_vert(
                cfg, i == 0, shape_coef, motion_ins[i], eps_i, target_i, prev_motion, None, None, end_idxs[i]
            )
        loss_dict = dict(loss_dict)
        loss_dict["kl_div"] = compute_kl_loss(mu_pair[i], logvar_pair[i])
        for k, v in loss_dict.items():
            if k in weights and weights[k] > 0:
                losses[k] = losses[k] + v

    total = sum(losses[k] * weights[k] for k in losses if weights[k] > 0)
    metrics = {k: v for k, v in losses.items() if weights[k] > 0}
    metrics["loss"] = total
    return total, metrics


def make_train_step(cfg: MSMDConfig, model: MSMD, style_enc, tx: optax.GradientTransformation, flame=None, coef_stats=None):
    """Build the jitted, state-donating train step."""

    def step_fn(state: TrainState, batch, key):
        def loss_fn(params):
            return two_clip_loss(
                cfg, model, style_enc, params, batch, key, flame=flame, train=True, coef_stats=coef_stats
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(cfg: MSMDConfig, model: MSMD, style_enc, flame=None, do_ignore_style: bool = False, coef_stats=None):
    """Jitted eval step (reference test(): training_script.py:244-403 —
    model in eval mode, cross-style always on when enabled)."""

    def step_fn(params, batch, key):
        _, metrics = two_clip_loss(
            cfg, model, style_enc, params, batch, key, flame=flame, train=False,
            do_ignore_style=do_ignore_style, eval_always_cross_style=cfg.use_cross_style,
            coef_stats=coef_stats,
        )
        return metrics

    return jax.jit(step_fn)
