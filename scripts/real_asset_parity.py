#!/usr/bin/env python
"""REAL-ASSET fidelity certificate: the BASELINE.json parity metric
(vertex-MSE parity vs the PyTorch reference on Step-6 test pkls) from
user-supplied licensed artifacts, in ONE command.

What it does (see PARITY_CERT.md for the methodology):
  1. loads a real reference experiment (args.json + checkpoints/iter_*.pt,
     the reference training_script.py:227-233 layout) through the
     torch-free checkpoint reader into THIS framework's flax model;
  2. loads the SAME state dict into the in-repo PyTorch oracle of the
     reference architecture (msmd_tpu/interop/torch_oracle.py) — so the
     reference's semantics run here without the reference codebase;
  3. draws test clips from a Step-6 chunked pickle
     (dataset_processing/Step6 output: {key: {audio, expression_code,
     head_orientation}}), normalizes them with the experiment's coef
     stats exactly like inference.py:109-183;
  4. generates coefficients with BOTH frameworks using identical
     weights, identical styles, and identical noise (f64 by default,
     where agreement is semantic, not float-chaos);
  5. reports per-clip + aggregate expression/rotation MSE, and — when
     the tracks are 50-dim FLAME coefficients or head-pose decode is
     requested — FLAME vertex MSE (licensed generic_model.pkl, or
     --synthetic_flame for a structure-identical random model).

Usage (real assets):
  python scripts/real_asset_parity.py \
      --reference_exp_dir $MSMD_ASSETS/reference_ckpt \
      --step6_pkl /data/processed/test.pkl --keys /data/processed/keys_test.txt \
      --coef_stats /data/processed/stats.pkl \
      [--flame_model_path $MSMD_ASSETS/flame/generic_model.pkl] \
      [--n_clips 4] [--n_diff_steps 50] [--f32]

Self-test (no assets; fabricates a tiny experiment + dataset):
  python scripts/real_asset_parity.py --selftest
"""

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _force_cpu_or_env():
    """This is a CPU tool: the oracle side is torch-CPU and the default
    f64 mode is unsupported on TPU — and the environment PRE-SETS
    JAX_PLATFORMS=axon (remote tunnel), so we must overwrite, not
    setdefault, and update jax.config post-import (sitecustomize may
    have imported jax already)."""
    import os

    import jax

    from msmd_tpu.platform import apply_platform_env

    os.environ["JAX_PLATFORMS"] = "cpu"
    apply_platform_env()
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def build_oracle(cfg, audio_config=None):
    """Full-size torch oracle at the experiment's architecture
    (hubert-base by default — reference training_script.py:467)."""
    import msmd_tpu.models.audio as audio_mod
    from msmd_tpu.interop.torch_oracle import build_torch_msmd

    ac = audio_config or audio_mod.AudioEncoderConfig()
    hf_kwargs = dict(
        hidden_size=ac.hidden_size, num_hidden_layers=ac.num_layers,
        num_attention_heads=ac.num_heads, intermediate_size=ac.intermediate_size,
        conv_dim=list(ac.conv_dim), conv_kernel=list(ac.conv_kernel),
        conv_stride=list(ac.conv_stride),
        num_conv_pos_embeddings=ac.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=ac.num_conv_pos_embedding_groups,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
    )
    return build_torch_msmd(cfg, hf_kwargs, audio_model=cfg.audio_model)


def run_parity(cfg, variables, oracle, clips, coef_stats, *, n_clips, f64, seed,
               flame=None, rot_only_vertices=False):
    import jax
    import jax.numpy as jnp
    import torch

    from msmd_tpu.inference_lib import infer_coeffs
    from msmd_tpu.interop.torch_oracle import torch_infer_coeffs
    from msmd_tpu.models.diffusion import get_diffusion_model  # noqa: F401 (docs)

    ndt = np.float64 if f64 else np.float32
    rs = np.random.RandomState(seed)
    exp_mean = np.asarray(coef_stats["exp_mean"], np.float64)
    exp_std = np.asarray(coef_stats["exp_std"], np.float64)
    pose_mean = np.asarray(coef_stats["pose_mean"], np.float64)
    pose_std = np.asarray(coef_stats["pose_std"], np.float64)

    reports = []
    for key, clip in list(clips.items())[:n_clips]:
        audio = np.asarray(clip["audio"], np.float64)
        audio = (audio - audio.mean()) / (audio.std() + 1e-5)  # datasets.py:269-271
        exp = np.asarray(clip["expression_code"], np.float64)
        rot = np.asarray(clip["head_orientation"], np.float64)
        # normalized motion track (inference.py:149-155)
        motion = np.concatenate(
            [(exp - exp_mean) / (exp_std + 1e-9), (rot - pose_mean) / (pose_std + 1e-9)], axis=1
        )
        # identical style for both sides: the clip's own first 100 frames
        # through the experiment's style VAE is covered by the interop
        # suite; here the style VECTOR is pinned so the metric isolates
        # the generation path (the BASELINE metric's subject)
        style = rs.randn(1, cfg.d_style).astype(ndt) * 0.1
        shape = np.zeros((1, 100), ndt)
        motion_at_T = rs.randn(1, cfg.n_motions, cfg.motion_feat_dim).astype(ndt)
        z_seq = rs.randn(cfg.n_diff_steps, 1, cfg.n_motions, cfg.motion_feat_dim).astype(ndt)
        audio = audio.astype(ndt)

        ours = np.asarray(
            infer_coeffs(
                _model_holder[0], variables, jax.random.PRNGKey(seed),
                jnp.asarray(audio), jnp.asarray(shape), style_feats=jnp.asarray(style),
                motion_at_T=jnp.asarray(motion_at_T), noise_override=jnp.asarray(z_seq),
            )[0]
        )
        theirs = torch_infer_coeffs(
            oracle, cfg, audio, shape.astype(np.float64), style.astype(np.float64),
            torch.from_numpy(motion_at_T.astype(np.float64)),
            torch.from_numpy(z_seq.astype(np.float64)),
        )[0].numpy()
        T = min(len(ours), len(theirs))
        ours, theirs = ours[:T], theirs[:T]

        # denormalize (inference.py:274-279)
        def denorm(m):
            e = m[:, :-3] * (exp_std + 1e-9) + exp_mean
            p = m[:, -3:] * (pose_std + 1e-9) + pose_mean
            return e, p

        e_a, p_a = denorm(ours)
        e_b, p_b = denorm(theirs)
        rep = {
            "clip": str(key),
            "frames": int(T),
            "exp_mse": float(np.mean((e_a - e_b) ** 2)),
            "rot_mse_deg2": float(np.mean((p_a - p_b) ** 2)),
            "coef_max_err": float(np.abs(ours - theirs).max()),
        }
        if flame is not None:
            import jax.numpy as jnp

            from msmd_tpu.models.flame import flame_forward

            def decode(e, p):
                if e.shape[1] >= 50 and not rot_only_vertices:
                    expd = jnp.asarray(e[:, :50], jnp.float32)
                else:  # latent codes: decode head pose only (exp zeroed)
                    expd = jnp.zeros((T, 50), jnp.float32)
                pose = jnp.concatenate(
                    [jnp.deg2rad(jnp.asarray(p, jnp.float32)), jnp.zeros((T, 3), jnp.float32)], axis=1
                )
                v, _, _ = flame_forward(flame, jnp.zeros((T, 100)), expd, pose)
                return np.asarray(v)

            va, vb = decode(e_a, p_a), decode(e_b, p_b)
            rep["vertex_mse"] = float(np.mean((va - vb) ** 2))
            rep["vertex_max_err"] = float(np.abs(va - vb).max())
            if rot_only_vertices or e_a.shape[1] < 50:
                rep["vertex_note"] = (
                    "64-dim latent expression codes need the user's facial-reconstruction "
                    "decoder (reference README.MD:79); vertex decode covers head pose"
                )
        reports.append(rep)
    return reports


_model_holder = [None]  # set in main (keeps run_parity's signature tidy)


def main():
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--reference_exp_dir", help="dir with args.json + checkpoints/iter_*.pt")
    ap.add_argument("--step6_pkl", help="Step-6 chunked pickle (test split)")
    ap.add_argument("--keys", help="optional keys_test.txt restricting clips")
    ap.add_argument("--coef_stats", help="exp/pose mean-std pkl (datasets.py:346-350)")
    ap.add_argument("--flame_model_path", default=None)
    ap.add_argument("--synthetic_flame", action="store_true")
    ap.add_argument("--n_clips", type=int, default=4)
    ap.add_argument("--n_diff_steps", type=int, default=0,
                    help="override the experiment's schedule length (0 = keep; "
                    "shorter runs are faster and remain a valid semantic check)")
    ap.add_argument("--f32", action="store_true",
                    help="run in f32 (production dtype; expect float-chaos-scale "
                    "divergence — see PARITY_CERT.md). Default f64 = semantic proof.")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--selftest", action="store_true",
                    help="fabricate a tiny experiment + dataset and run the whole "
                    "pipeline (no licensed assets needed)")
    ap.add_argument("--out", default=None, help="write the JSON report here too")
    args = ap.parse_args()

    _force_cpu_or_env()
    import pickle

    import jax
    import torch

    f64 = not args.f32
    if f64:
        jax.config.update("jax_enable_x64", True)
        torch.set_default_dtype(torch.float64)

    import jax.numpy as jnp

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.interop.msmd_checkpoint import flax_to_reference_msmd, reference_msmd_to_flax
    from msmd_tpu.models.diffusion import get_diffusion_model

    jdt = jnp.float64 if f64 else jnp.float32

    if args.selftest:
        cfg, variables, oracle, clips, coef_stats = _fabricate(jdt)
    else:
        for need in ("reference_exp_dir", "step6_pkl", "coef_stats"):
            if not getattr(args, need):
                ap.error(f"--{need} is required (or use --selftest)")
        from msmd_tpu.data.pickle_dataset import load_chunked_pickle
        from msmd_tpu.train.checkpoint import load_reference_pt

        exp_dir = Path(args.reference_exp_dir)
        cfg = MSMDConfig.load_args_json(str(exp_dir))
        if args.n_diff_steps:
            cfg = cfg.replace(n_diff_steps=args.n_diff_steps)
        ckpts = sorted(exp_dir.glob("checkpoints/iter_*.pt")) or sorted(exp_dir.glob("iter_*.pt"))
        if not ckpts:
            ap.error(f"no iter_*.pt under {exp_dir}")
        _, model_sd, style_sd, it = load_reference_pt(str(ckpts[-1]))
        params = reference_msmd_to_flax(model_sd, cfg)
        model = get_diffusion_model(cfg, dtype=jdt, param_dtype=jdt)
        variables = {"params": jax.tree_util.tree_map(lambda x: jnp.asarray(x, jdt), params)}

        oracle = build_oracle(cfg)
        sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v))) for k, v in model_sd.items()}
        missing, unexpected = oracle.load_state_dict(sd, strict=False)
        if unexpected:
            print(f"WARNING: {len(unexpected)} unexpected tensors (first: {unexpected[:3]})", file=sys.stderr)
        oracle = oracle.double() if f64 else oracle.float()
        oracle.eval()
        _model_holder[0] = model

        clips = load_chunked_pickle(args.step6_pkl)
        if args.keys:
            keys = [k.strip() for k in open(args.keys) if k.strip()]
            clips = {k: clips[k] for k in keys if k in clips}
        with open(args.coef_stats, "rb") as f:
            coef_stats = pickle.load(f)

    flame = None
    if args.synthetic_flame:
        from msmd_tpu.models.flame import synthetic_flame

        flame = synthetic_flame()
    elif args.flame_model_path:
        from msmd_tpu.models.flame import FLAMEConfig, load_flame

        flame = load_flame(FLAMEConfig(flame_model_path=args.flame_model_path))

    reports = run_parity(
        cfg, variables, oracle, clips, coef_stats,
        n_clips=args.n_clips, f64=f64, seed=args.seed, flame=flame,
        rot_only_vertices=cfg.motion_feat_dim - 3 != 50,
    )
    agg = {
        "clips": reports,
        "aggregate": {
            k: float(np.mean([r[k] for r in reports]))
            for k in ("exp_mse", "rot_mse_deg2", "coef_max_err")
        },
        "dtype": "float64" if f64 else "float32",
        "interpretation": (
            "f64 agreement at <1e-6 coef_max_err is the semantic-parity proof "
            "(PARITY_CERT.md); f32 divergence is float-chaos (compare the chaos "
            "control there)" if f64 else
            "f32 production run: divergence is per-step float noise amplified by "
            "the reverse process (~2x/step); use the default f64 mode for the "
            "semantic certificate"
        ),
    }
    if any("vertex_mse" in r for r in reports):
        agg["aggregate"]["vertex_mse"] = float(np.mean([r["vertex_mse"] for r in reports if "vertex_mse" in r]))
    out = json.dumps(agg, indent=2)
    print(out)
    if args.out:
        Path(args.out).write_text(out)


def _fabricate(jdt):
    """Tiny fabricated experiment + Step-6-shaped dataset (selftest)."""
    import jax
    import jax.numpy as jnp
    import torch

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.interop.msmd_checkpoint import flax_to_reference_msmd
    from msmd_tpu.models.audio import AudioEncoderConfig
    from msmd_tpu.models.diffusion import get_diffusion_model

    cfg = MSMDConfig(
        feature_dim=32, n_heads=4, n_layers=2, mlp_ratio=2, d_style=16,
        n_motions=8, n_prev_motions=4, n_diff_steps=4, num_of_basis=2, use_indicator=True,
    )
    audio_cfg = AudioEncoderConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
    )
    model = get_diffusion_model(cfg, audio_config=audio_cfg, dtype=jdt, param_dtype=jdt)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        jnp.zeros((1, cfg.n_motions, cfg.motion_feat_dim), jdt),
        jnp.zeros((1, cfg.n_audio_samples), jdt),
        jnp.zeros((1, 100), jdt), jnp.zeros((1, cfg.d_style), jdt), deterministic=True,
    )
    _model_holder[0] = model

    oracle = build_oracle(cfg, audio_config=audio_cfg)
    params = jax.device_get(variables["params"])
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in flax_to_reference_msmd(params, cfg).items()}
    oracle.load_state_dict(sd, strict=False)
    oracle.eval()

    rs = np.random.RandomState(7)
    clips = {}
    for i in range(2):
        Tm = 20
        clips[f"clip{i}"] = {
            "audio": rs.randn(Tm * 640).astype(np.float32) * 0.1,
            "expression_code": rs.randn(Tm, 64).astype(np.float32),
            "head_orientation": (rs.randn(Tm, 3) * 5).astype(np.float32),
        }
    coef_stats = {
        "exp_mean": np.zeros(64, np.float32), "exp_std": np.ones(64, np.float32),
        "pose_mean": np.zeros(3, np.float32), "pose_std": np.ones(3, np.float32),
    }
    return cfg, variables, oracle, clips, coef_stats


if __name__ == "__main__":
    main()
