#!/usr/bin/env python
"""Single-pair inference CLI for MSMD-TPU.

Public surface matches the reference ``inference.py`` (reference:
inference.py:189-287): same flags, same style-clip/audio inputs, same
normalized-pkl outputs (expression code + head rotation per seed).

TPU-first internals: the whole denoising loop per window is one
on-device ``lax.scan`` (msmd_tpu.models.diffusion.sample) and the
``--versions_of_render`` seeds are batched into one sampler invocation
instead of the reference's sequential re-seeded loop.

Note: the released reference crashes on import (a nonexistent ``models``
module import at its inference.py:29) and drops an argument at :226 —
both fixed here; behavior otherwise mirrors the reference.
"""

import argparse
import os
import pickle as pkl

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Single inference for MSMD (TPU).")
    parser.add_argument("--model_root", type=str, required=True, help="Root directory for models.")
    parser.add_argument("--model_name", type=str, required=True, help="Name of the model.")
    parser.add_argument("--model_iter", type=str, required=True, help="Checkpoint iteration (as string).")
    parser.add_argument("--style_clip_exp_code_path", type=str, required=True, help="Style clip expression-code pkl.")
    parser.add_argument("--style_clip_head_rot_path", type=str, required=True, help="Style clip head-rotation pkl.")
    parser.add_argument("--audio_clip", type=str, required=True, help="Input audio file (16 kHz wav).")
    parser.add_argument("--coef_dict_path", type=str, default="PATH-TO-COEF-STATS", help="Coefficient statistics pkl.")
    parser.add_argument("--cfg_level", type=float, default=1.4, help="CFG scale.")
    parser.add_argument("--output_dir", type=str, default="/experiments/refactor", help="Output directory.")
    parser.add_argument("--versions_of_render", type=int, default=1, help="Number of seeds to render.")
    # TPU-native extras
    parser.add_argument("--seed", type=int, default=0, help="Base PRNG seed.")
    parser.add_argument("--batch_seeds", action="store_true", help="Batch all seeds into one sampler call.")
    args = parser.parse_args()

    from msmd_tpu.platform import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS=cpu effective (see module docstring)

    import jax

    from msmd_tpu.inference_lib import infer_coeffs, load_audio_16k, load_model, load_style_clip
    from msmd_tpu.models.style_encoder import StyleEncoderVAE2

    model, style_enc, model_vars, style_vars, cfg = load_model(args.model_root, args.model_name, args.model_iter)

    # coef stats (exp/pose mean+std) for normalization round-trip
    with open(args.coef_dict_path, "rb") as f:
        coef_stats = pkl.load(f)
    to_np = lambda v: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
    coef_stats = {k: to_np(v) for k, v in coef_stats.items()}

    motion_coeff, shape_coef = load_style_clip(
        args.style_clip_exp_code_path, args.style_clip_head_rot_path, coef_stats, original_fps=30, target_fps=cfg.fps
    )

    audio_data = load_audio_16k(args.audio_clip)
    audio_data = (audio_data - audio_data.mean()) / (audio_data.std() + 1e-5)

    # style embedding from the first 100 style-clip frames (inference.py:239)
    key = jax.random.PRNGKey(args.seed)
    key, k_style = jax.random.split(key)
    style_coeff = style_enc.apply(
        style_vars, motion_coeff[:, :100, :], rngs={"style": k_style}, method=type(style_enc).sample
    )

    # output layout mirrors the reference (inference.py:243-259)
    style_clip_name = os.path.splitext(os.path.basename(args.style_clip_exp_code_path))[0]
    audio_clip_name = os.path.splitext(os.path.basename(args.audio_clip))[0]
    output_clip_name = f"style=_{style_clip_name}_audio={audio_clip_name}"
    save_dir = os.path.join(args.output_dir, f"{args.model_name}_iter_{args.model_iter}")
    temp_subfolder = os.path.join(save_dir, "temp")
    os.makedirs(temp_subfolder, exist_ok=True)
    os.makedirs(os.path.join(save_dir, output_clip_name), exist_ok=True)

    # save the normalized audio for downstream muxing (reference
    # inference.py:261-262 writes it into temp/)
    try:
        from scipy.io import wavfile

        wavfile.write(os.path.join(temp_subfolder, f"{output_clip_name}.wav"), 16000, audio_data)
    except ImportError:
        pass

    import jax.numpy as jnp

    audio_t = jnp.asarray(audio_data)
    R = args.versions_of_render

    def dump_seed(motion, count_i):
        exp_code = np.asarray(motion[:, :-3]) * coef_stats["exp_std"] + coef_stats["exp_mean"]
        head_rot = np.asarray(motion[:, -3:]) * coef_stats["pose_std"] + coef_stats["pose_mean"]
        pkl.dump(exp_code, open(os.path.join(temp_subfolder, f"overall_exp_code_{output_clip_name}_seed_{count_i}.pkl"), "wb"))
        pkl.dump(head_rot, open(os.path.join(temp_subfolder, f"overall_head_rot_{output_clip_name}_seed_{count_i}.pkl"), "wb"))

    if args.batch_seeds:
        overall = infer_coeffs(
            model, model_vars, jax.random.PRNGKey(args.seed), audio_t, jnp.asarray(shape_coef),
            audio_unit=640.0, style_feats=jnp.asarray(style_coeff), n_repetitions=R,
            cfg_scale=args.cfg_level, dynamic_threshold=None,
        )
        for count_i in range(R):
            dump_seed(overall[count_i], count_i)
    else:
        for count_i in range(R):
            overall = infer_coeffs(
                model, model_vars, jax.random.PRNGKey(count_i), audio_t, jnp.asarray(shape_coef),
                audio_unit=640.0, style_feats=jnp.asarray(style_coeff), n_repetitions=1,
                cfg_scale=args.cfg_level, dynamic_threshold=None,
            )
            dump_seed(overall[0], count_i)
    print(f"Wrote {R} seed(s) to {temp_subfolder}")


if __name__ == "__main__":
    main()
