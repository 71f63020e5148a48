"""Load pretrained wav2vec2 / HuBERT weights from local HF-format files
into the msmd-tpu AudioEncoder param tree.

The reference calls ``from_pretrained('facebook/hubert-base-ls960')``
with a cache_dir (model.py:100-104); on a zero-egress TPU host the
weights must already be on disk. This loader accepts either a model
directory (config.json + pytorch_model.bin / model.safetensors) or an
HF cache root and converts through
``msmd_tpu.interop.torch_params.hf_audio_encoder``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from msmd_tpu.interop.torch_params import hf_audio_encoder


def _find_weight_file(model_dir: Path) -> Path:
    for name in ("model.safetensors", "pytorch_model.bin"):
        p = model_dir / name
        if p.exists():
            return p
    raise FileNotFoundError(f"No weight file (model.safetensors / pytorch_model.bin) under {model_dir}")


def resolve_model_dir(path_or_name: str, cache_dir: Optional[str] = None) -> Path:
    """Resolve a local dir, or an HF-hub cache layout
    (<cache>/models--org--name/snapshots/<rev>/)."""
    p = Path(path_or_name)
    if p.is_dir():
        return p
    if cache_dir is not None:
        hub_name = "models--" + path_or_name.replace("/", "--")
        snaps = Path(cache_dir) / hub_name / "snapshots"
        if snaps.exists():
            revs = sorted(snaps.iterdir())
            if revs:
                return revs[-1]
    raise FileNotFoundError(
        f"Cannot resolve pretrained weights for {path_or_name!r}: provide a local model directory "
        f"(zero-egress hosts cannot download)."
    )


def load_state_dict_file(path: Path) -> dict:
    """Read a .safetensors or torch .bin file into {name: np.ndarray}."""
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def load_hf_audio_encoder_params(path_or_name: str, cache_dir: Optional[str] = None) -> dict:
    """-> flax params for msmd_tpu.models.audio.AudioEncoder."""
    model_dir = resolve_model_dir(path_or_name, cache_dir)
    sd = load_state_dict_file(_find_weight_file(model_dir))
    # HF checkpoints may carry a top-level model prefix
    for prefix in ("wav2vec2.", "hubert."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break
    return hf_audio_encoder(sd)


def inject_pretrained_audio(params: dict, path_or_name: str, cache_dir: Optional[str] = None) -> dict:
    """Replace the ``audio_encoder`` subtree of a params['model'] tree
    with pretrained weights (shape-checked against the existing init)."""
    import jax

    pretrained = load_hf_audio_encoder_params(path_or_name, cache_dir)

    def check(path, old, new):
        assert tuple(old.shape) == tuple(np.asarray(new).shape), (
            f"shape mismatch at {'/'.join(map(str, path))}: init {old.shape} vs pretrained {np.asarray(new).shape}"
        )
        return np.asarray(new, dtype=old.dtype)

    from flax import traverse_util

    old_flat = traverse_util.flatten_dict(params["audio_encoder"])
    new_flat = traverse_util.flatten_dict(pretrained)
    merged = {}
    for k, v in old_flat.items():
        merged[k] = check(k, v, new_flat[k]) if k in new_flat else v
    out = dict(params)
    out["audio_encoder"] = traverse_util.unflatten_dict(merged)
    return out
