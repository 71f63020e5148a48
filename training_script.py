#!/usr/bin/env python3
"""MSMD-TPU training CLI.

Public flag surface matches the reference ``training_script.py``
(reference: training_script.py:446-515) plus the implicit
DiffPoseTalk-lineage knobs it consumes without declaring (SURVEY.md
§2.4) and a few TPU-native extras. Internals: one jitted two-clip train
step, data-parallel over an ICI mesh, Orbax + reference-format
checkpoints (see msmd_tpu.train).
"""

import argparse
from datetime import datetime
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="MSMD training script (TPU)")
    parser.add_argument("--mode", type=str, default="train", choices=["train", "test"])

    # base configuration (reference :449-457)
    parser.add_argument("--exp_name", type=str, required=True, help="experiment name")
    parser.add_argument("--data_root", type=str, required=True, help="path to dataset")
    parser.add_argument("--max_iter", type=int, default=2000000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--num_workers", type=int, default=2)

    # model architecture (reference :459-473)
    parser.add_argument("--generator_model_style", type=str, default="MSMD")
    parser.add_argument("--style_enc_model_style", type=str, default="vae2")
    parser.add_argument("--training_loss_style", type=str, default="MSMD")
    parser.add_argument("--dataset_type", type=str, default="ravdess+celebv-text-medium")
    parser.add_argument("--audio_model", type=str, default="hubert")
    parser.add_argument("--d_style", type=int, default=256)

    # feature options (reference :475-480)
    parser.add_argument("--use_indicator", action="store_true")
    parser.add_argument("--use_cross_style", action="store_true")
    parser.add_argument("--use_vertex_space", action="store_true")
    parser.add_argument("--num_of_basis", type=int, default=4)
    parser.add_argument("--prob_cross_style", type=float, default=0.5)

    # loss weights (reference :482-490)
    parser.add_argument("--l_vert", type=float, default=1.0)
    parser.add_argument("--l_vel", type=float, default=0.5)
    parser.add_argument("--l_smooth", type=float, default=10.0)
    parser.add_argument("--l_kl_div", type=float, default=1e-7)
    parser.add_argument("--l_head_angle", type=float, default=1.0)
    parser.add_argument("--l_head_vel", type=float, default=0.5)
    parser.add_argument("--l_head_smooth", type=float, default=0.5)
    parser.add_argument("--l_head_trans", type=float, default=0.5)

    # training parameters (reference :492-498)
    parser.add_argument("--scheduler", type=str, default="Warmup", choices=["Warmup", "WarmupThenDecay"])
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--warm_iter", type=int, default=5000)
    parser.add_argument("--cos_max_iter", type=int, default=1000000)
    parser.add_argument("--min_lr_ratio", type=float, default=0.1)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)

    # sequence parameters (reference :500-507; see MSMDConfig for why the
    # runnable defaults differ from the reference's broken 750/100/30)
    parser.add_argument("--n_motions", type=int, default=100)
    parser.add_argument("--n_prev_motions", type=int, default=10)
    parser.add_argument("--fps", type=int, default=25)
    parser.add_argument("--trunc_prob1", type=float, default=0.5)
    parser.add_argument("--trunc_prob2", type=float, default=0.5)
    parser.add_argument("--pad_mode", type=str, default="zero")
    parser.add_argument("--rot_repr", type=str, default="euler")

    # other settings (reference :509-517)
    parser.add_argument("--no_head_pose", action="store_true")
    parser.add_argument("--do_ignore_shape", action="store_true")
    parser.add_argument("--do_ignore_cfg", action="store_true")
    parser.add_argument("--log_iter", type=int, default=100)
    parser.add_argument("--save_iter", type=int, default=10000)
    parser.add_argument("--val_iter", type=int, default=10000)
    parser.add_argument("--log_smooth_win", type=int, default=50)
    parser.add_argument("--continue_from", type=str, default=None)

    # implicit DiffPoseTalk-lineage knobs (SURVEY.md §2.4), now explicit
    parser.add_argument("--target", type=str, default="sample", choices=["noise", "sample"])
    parser.add_argument("--criterion", type=str, default="l2", choices=["l1", "l2"])
    parser.add_argument("--architecture", type=str, default="decoder")
    parser.add_argument("--feature_dim", type=int, default=512)
    parser.add_argument("--n_heads", type=int, default=8)
    parser.add_argument("--n_layers", type=int, default=8)
    parser.add_argument("--mlp_ratio", type=int, default=4)
    parser.add_argument("--align_mask_width", type=int, default=1)
    parser.add_argument("--no_use_learnable_pe", action="store_true")
    parser.add_argument("--n_diff_steps", type=int, default=500)
    parser.add_argument("--diff_schedule", type=str, default="cosine")
    parser.add_argument("--cfg_mode", type=str, default="incremental", choices=["independent", "incremental"])
    parser.add_argument("--guiding_conditions", type=str, default="style,audio")
    parser.add_argument("--no_constrain_prev", action="store_true")
    parser.add_argument("--regularize_alpha", type=str, default="None")

    # TPU-native extras
    parser.add_argument("--exp_root", type=str, default="experiments/DPT", help="experiment root dir")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--flame_model_path", type=str, default=None)
    parser.add_argument("--tiny_audio_encoder", action="store_true", help="debug-size audio encoder (tests/CI)")
    parser.add_argument("--audio_weights", type=str, default=None,
                        help="local HF dir (or cache root) with pretrained wav2vec2/hubert weights")
    parser.add_argument("--audio_weights_cache", type=str, default=None, help="HF cache root for --audio_weights")
    parser.add_argument("--profile_dir", type=str, default=None, help="write a jax.profiler trace of steps 10-15 here")
    parser.add_argument("--use_fused_lbs", action="store_true", help="vertex loss via the fused Pallas LBS kernel")
    parser.add_argument("--val_batches_cap", type=int, default=0,
                        help="cap batches per periodic-validation round (<=0 = reference full-epoch semantics)")
    parser.add_argument("--fused_ffn_train", action="store_true",
                        help="training FFN+dropout+LN as a Pallas kernel with custom VJP (in-kernel PRNG dropout)")
    parser.add_argument("--identity_band_train", action=argparse.BooleanOptionalAction, default=True,
                        help="identity-band cross-attention in training too (width-1 band; one-hot weight "
                             "dropout becomes a Bernoulli on the gathered V rows — statistically equivalent; "
                             "DEFAULT since r5, measured +2%% steps/s — --no_identity_band_train restores "
                             "the reference-shaped softmax path)")
    parser.add_argument("--remat_denoiser", action="store_true",
                        help="gradient-checkpoint the decoder layers (recompute activations in backward)")
    parser.add_argument("--two_clip_batch", action="store_true",
                        help="run both training clips as ONE 2B-row style/audio/denoiser forward "
                             "(clip 1's carry only needs clip 0's audio features; statistically equivalent)")
    parser.add_argument("--tp_size", type=int, default=1,
                        help="tensor-parallel degree: devices form a (data, model) mesh and the dense "
                             "kernels shard Megatron-style over the model axis (1 = pure data parallel)")
    parser.add_argument("--batch_overfit_size", type=int, default=-1, help="overfit smoke mode: dataset of k items")
    return parser


def main():
    parser = build_parser()
    args = parser.parse_args()

    from msmd_tpu.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS=cpu effective (see module docstring)

    from msmd_tpu.config import MSMDConfig
    from msmd_tpu.data.pickle_dataset import get_dataset
    from msmd_tpu.train.trainer import Trainer

    cfg = MSMDConfig.from_dict(vars(args))

    flame = None
    if (cfg.l_vert > 0 or cfg.l_vel > 0) and cfg.use_vertex_space:
        is_hdtf = cfg.dataset_type[:9] == "HDTF_TFHP" or cfg.dataset_type == "flame_mead_ravdess"
        if is_hdtf:
            from msmd_tpu.models.flame import FLAMEConfig, load_flame

            flame = load_flame(FLAMEConfig(flame_model_path=cfg.flame_model_path))
            if args.use_fused_lbs:
                from msmd_tpu.ops.pallas.lbs_kernel import FusedFlame

                flame = FusedFlame(flame)

    audio_config = None
    if args.tiny_audio_encoder:
        from msmd_tpu.models.audio import AudioEncoderConfig

        audio_config = AudioEncoderConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            conv_dim=(16, 16, 16), conv_kernel=(10, 3, 3), conv_stride=(5, 4, 4),
        )

    if args.continue_from:
        exp_dir = Path(args.continue_from)
    else:
        exp_dir = Path(args.exp_root) / f"{args.exp_name}-{datetime.now().strftime('%y%m%d_%H%M%S')}"
        exp_dir.mkdir(parents=True, exist_ok=True)

    print(f"Loading dataset {cfg.dataset_type} from {cfg.data_root}")
    train_sets, val_sets, train_loader, val_loader = get_dataset(cfg, batch_overfit_size=args.batch_overfit_size, seed=cfg.seed)
    # coefficient stats denormalize coefs before the FLAME decode in the
    # vertex-space loss (reference: training_script.py:63-66)
    coef_stats = train_sets[0].coef_stats if cfg.use_vertex_space else None

    trainer = Trainer(cfg, exp_dir, audio_config=audio_config, flame=flame, coef_stats=coef_stats)
    if args.audio_weights:
        from msmd_tpu.interop.hf_loader import inject_pretrained_audio

        params = dict(trainer.state.params)
        params["model"] = inject_pretrained_audio(dict(params["model"]), args.audio_weights, args.audio_weights_cache)
        trainer.state = trainer.state.replace(params=params)
        print(f"Loaded pretrained audio-encoder weights from {args.audio_weights}")
    if args.continue_from:
        start = trainer.maybe_resume(args.continue_from)
        print(f"Resumed from {args.continue_from} at iteration {start}")

    n_params = sum(x.size for x in __import__("jax").tree_util.tree_leaves(trainer.state.params))
    print(f"Experiment dir: {exp_dir} | params: {n_params:,}")

    if args.mode == "train":
        trainer.cfg.save_args_json(exp_dir)  # incl. any audio-encoder overrides
        trainer.fit(train_loader, val_loader, profile_dir=args.profile_dir)
    else:
        metrics = trainer.evaluate(val_loader, trainer.start_iter, n_rounds=5, mode="test", do_save=True)
        print("Test results:")
        for k, v in metrics.items():
            print(f"{k}: {v:.4f}")

    train_loader.close()
    val_loader.close()


if __name__ == "__main__":
    main()
