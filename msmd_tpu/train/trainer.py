"""Host-side training orchestration: experiment dirs, logging,
checkpoints, validation — the glue around the jitted step
(reference: training_script.py:49-241 train(), :244-403 test()).
"""

from __future__ import annotations

import json
import time
from collections import defaultdict, deque
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from msmd_tpu.config import MSMDConfig
from msmd_tpu.interop.msmd_checkpoint import (
    flax_to_reference_msmd,
    flax_to_reference_style_enc,
    reference_msmd_to_flax,
    reference_style_enc_to_flax,
)
from msmd_tpu.models.diffusion import get_diffusion_model
from msmd_tpu.models.style_encoder import get_style_encoder
from msmd_tpu.parallel.mesh import make_mesh, replicate_sharding, shard_batch
from msmd_tpu.train import checkpoint as ckpt
from msmd_tpu.train.loop import TrainState, create_train_state, make_eval_step, make_train_step
from msmd_tpu.utils.logging import MetricWriter


class Trainer:
    def __init__(self, cfg: MSMDConfig, exp_dir, audio_config=None, flame=None, use_mesh: bool = True, coef_stats=None):
        if audio_config is not None and cfg.audio_encoder_config is None:
            import dataclasses

            cfg = cfg.replace(audio_encoder_config=dataclasses.asdict(audio_config))
        elif audio_config is None and cfg.audio_encoder_config is not None:
            from msmd_tpu.models.audio import AudioEncoderConfig

            audio_config = AudioEncoderConfig(**{k: tuple(v) if isinstance(v, list) else v for k, v in cfg.audio_encoder_config.items()})
        self.cfg = cfg
        self.exp_dir = Path(exp_dir)
        self.flame = flame
        import jax.numpy as jnp

        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.model = get_diffusion_model(cfg, audio_config=audio_config, dtype=compute_dtype)
        self.style_enc = get_style_encoder(cfg, cfg.style_enc_model_style, dtype=compute_dtype)
        self.state, self.tx = create_train_state(cfg, jax.random.PRNGKey(cfg.seed), self.model, self.style_enc)
        self.start_iter = 0

        if use_mesh:
            devs = jax.devices()
            tp = max(int(getattr(cfg, "tp_size", 1)), 1)
            if tp > 1 and len(devs) % tp != 0:
                raise ValueError(f"tp_size={tp} does not divide {len(devs)} devices")
            # data-parallel over the largest device count that divides
            # the global batch (a 2-sample smoke run on an 8-virtual-CPU
            # host must not demand batch % 8 == 0)
            n = len(devs) // tp
            while n > 1 and cfg.batch_size % n != 0:
                n -= 1
            if n * tp < len(devs):
                print(
                    f"[trainer] batch_size={cfg.batch_size} not divisible by "
                    f"{len(devs) // tp} data shards: data-parallel over {n} "
                    f"shard(s) x tp={tp}, {len(devs) - n * tp} device(s) idle "
                    f"— pick a divisible batch size to use the whole machine",
                    flush=True,
                )
            if tp > 1:
                from msmd_tpu.parallel.tp import make_dp_tp_mesh

                self.mesh = make_dp_tp_mesh(n, tp, devices=devs)
            else:
                self.mesh = make_mesh(("data",), devices=devs[:n])
        else:
            self.mesh = None
        if self.mesh is not None:
            self.state = jax.device_put(self.state, self._state_sharding(self.state))

        if coef_stats is not None:
            coef_stats = {k: jnp.asarray(v) for k, v in coef_stats.items()}
        self.train_step = make_train_step(cfg, self.model, self.style_enc, self.tx, flame=flame, coef_stats=coef_stats)
        self.eval_step = make_eval_step(cfg, self.model, self.style_enc, flame=flame, coef_stats=coef_stats)
        self.writer = MetricWriter(self.exp_dir / "logs")

    # ------------------------------------------------------------------
    def _state_sharding(self, state_like):
        """Sharding tree for the train state on self.mesh: replicated
        under pure DP, Megatron column/row specs when the mesh has a
        model axis (tp_size > 1)."""
        if "model" in self.mesh.shape and self.mesh.shape["model"] > 1:
            from msmd_tpu.parallel.tp import tp_shardings

            return tp_shardings(state_like, self.mesh)
        return replicate_sharding(self.mesh)

    def maybe_resume(self, continue_from: Optional[str]) -> int:
        """Resume from an experiment dir: prefer the Orbax state, fall back
        to the latest reference-format .pt (reference:
        utils/model_common.py:57-81)."""
        if not continue_from:
            return 0
        exp = Path(continue_from)
        step = ckpt.latest_native_step(exp)
        if step is not None:
            restored = ckpt.restore_native(exp, step, self.state)
            self.state = jax.device_put(
                restored, self._state_sharding(restored) if self.mesh else jax.devices()[0]
            )
            self.start_iter = step
            return step
        pt = ckpt.find_latest_pt(exp / "checkpoints")
        if pt is not None:
            _, model_sd, style_sd, it = ckpt.load_reference_pt(pt)
            params = {
                "model": reference_msmd_to_flax(model_sd, self.cfg),
                "style_enc": reference_style_enc_to_flax(style_sd),
            }
            self.state = TrainState(
                step=jax.numpy.asarray(it, jax.numpy.int32), params=params, opt_state=self.tx.init(params)
            )
            if self.mesh is not None:
                self.state = jax.device_put(self.state, self._state_sharding(self.state))
            self.start_iter = it
            return it
        raise ValueError(f"No checkpoints found under {exp}")

    def save_checkpoint(self, iteration: int, write_pt: bool = True):
        ckpt.save_native(self.exp_dir, self.state, iteration)
        if write_pt:
            try:
                params = jax.device_get(self.state.params)
                ckpt.save_reference_pt(
                    self.exp_dir,
                    self.cfg,
                    flax_to_reference_msmd(params["model"], self.cfg),
                    flax_to_reference_style_enc(params["style_enc"]),
                    iteration,
                )
            except ImportError:
                pass  # torch-less host: Orbax checkpoint is authoritative

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader=None, max_iter: Optional[int] = None, log_every: Optional[int] = None, profile_dir: Optional[str] = None, profile_steps=(10, 15)):
        cfg = self.cfg
        max_iter = max_iter if max_iter is not None else cfg.max_iter
        log_every = log_every or cfg.log_iter
        smooth = defaultdict(lambda: deque(maxlen=cfg.log_smooth_win))
        key = jax.random.PRNGKey(cfg.seed + 1)
        t0 = time.time()
        profiling = False

        for it in range(self.start_iter, max_iter + 1):
            if profile_dir is not None:
                if it == profile_steps[0] and not profiling:
                    jax.profiler.start_trace(str(profile_dir))
                    profiling = True
                elif it == profile_steps[1] and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"Wrote profiler trace to {profile_dir}")
            batch = next(train_loader)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            key, sub = jax.random.split(key)
            self.state, metrics = self.train_step(self.state, batch, sub)

            # keep the metric scalars ON DEVICE between log points: a
            # per-iteration float() would force a host sync (one tunnel
            # roundtrip per step on axon) and serialize host data prep
            # with device compute — the async dispatch queue is what
            # overlaps next(train_loader) with the running step
            for k, v in metrics.items():
                smooth[k].append(v)
            if it % log_every == 0:
                fetched = {k: jax.device_get(list(v)) for k, v in smooth.items()}
                means = {k: float(np.mean(v)) for k, v in fetched.items()}
                rate = (it - self.start_iter + 1) / max(time.time() - t0, 1e-9)
                self.writer.scalars("train", means, it)
                self.writer.scalar("opt/steps_per_sec", rate, it)
                print(
                    f"iter {it}: loss={means.get('loss', float('nan')):.4e} "
                    + " ".join(f"{k}={v:.3e}" for k, v in means.items() if k != "loss")
                    + f" [{rate:.2f} it/s]"
                )
            if (it % cfg.save_iter == 0 and it != 0 and it != self.start_iter) or it == max_iter:
                self.save_checkpoint(it)
            # val_iter <= 0 disables validation entirely (TPU extra; the
            # reference always validates at max_iter)
            if val_loader is not None and cfg.val_iter > 0 and (
                (it % cfg.val_iter == 0 and it != 0 and it != self.start_iter) or it == max_iter
            ):
                # reference semantics: one full finite val epoch per
                # periodic validation (training_script.py:241, n_rounds=1);
                # cfg.val_batches_cap > 0 caps it (TPU fast-path extra)
                cap = cfg.val_batches_cap if cfg.val_batches_cap > 0 else None
                self.evaluate(val_loader, it, n_rounds=1, mode="val", n_batches_per_round=cap)
        return self.state

    # ------------------------------------------------------------------
    def evaluate(self, val_loader, iteration: int, n_rounds: int = 10, mode: str = "val", n_batches_per_round: Optional[int] = None, do_save: bool = False, save_path=None) -> Dict[str, float]:
        """Validation over the loader (reference: training_script.py:244-403);
        writes mean/std/n JSON when do_save.

        Per reference semantics, each round iterates one full val epoch
        (len(val_dataset)//batch_size weighted batches,
        training_script.py:265-268). Pass ``n_batches_per_round`` to cap
        it (fast path for periodic in-training validation)."""
        if n_batches_per_round is None:
            try:
                n_batches_per_round = max(len(val_loader), 1)
            except TypeError:
                n_batches_per_round = 8  # loader without a length: fast path
        key = jax.random.PRNGKey(1234 + iteration)
        log = defaultdict(list)
        for _ in range(n_rounds):
            for _ in range(n_batches_per_round):
                batch = next(val_loader)
                if self.mesh is not None:
                    batch = shard_batch(batch, self.mesh)
                key, sub = jax.random.split(key)
                metrics = self.eval_step(self.state.params, batch, sub)
                for k, v in metrics.items():
                    log[k].append(float(v))
        means = {k: float(np.mean(v)) for k, v in log.items()}
        self.writer.scalars(mode, means, iteration)
        print(f"[{mode} @ {iteration}] " + " ".join(f"{k}={v:.4e}" for k, v in means.items()))
        if do_save:
            stats = {k: {"mean": float(np.mean(v)), "std": float(np.std(v)), "n": len(v)} for k, v in log.items()}
            path = Path(save_path or (self.exp_dir / f"eval_{mode}_{iteration}.json"))
            path.parent.mkdir(parents=True, exist_ok=True)
            with open(path, "w") as f:
                json.dump(stats, f, indent=2)
        return means
