"""Checkpoint I/O.

Two formats, mirroring §5.4 of SURVEY.md:

1. **Native (Orbax)**: the full TrainState (params + optimizer state +
   step) under ``<exp_dir>/checkpoints/orbax/<step>`` — the fast,
   sharding-aware path used for --continue_from resume.
2. **Reference-compatible ``.pt``**: ``iter_%07d.pt`` files holding
   {args, model, style_enc, iter} exactly like the reference
   (reference: training_script.py:227-233, loader
   utils/model_common.py:57-81). Written/read with torch when available
   (the CPU wheel is in this image); param-name translation lives in
   msmd_tpu.interop.

Plus the ``args.json`` round-trip (reference: utils/model_common.py:9-55)
via MSMDConfig.save_args_json / load_args_json.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_native(exp_dir, state, step: int) -> Path:
    """Orbax save of the full TrainState."""
    path = Path(exp_dir).resolve() / "checkpoints" / "orbax" / f"{step:07d}"
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_native_step(exp_dir) -> Optional[int]:
    base = Path(exp_dir) / "checkpoints" / "orbax"
    if not base.exists():
        return None
    steps = [int(p.name) for p in base.iterdir() if re.fullmatch(r"\d+", p.name)]
    return max(steps) if steps else None


def restore_native(exp_dir, step: int, template) -> Any:
    path = Path(exp_dir).resolve() / "checkpoints" / "orbax" / f"{step:07d}"
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=jax.device_get(template))
    return restored


# ---------------------------------------------------------------------------
# reference-compatible .pt
# ---------------------------------------------------------------------------

def save_reference_pt(exp_dir, cfg, model_state_dict: dict, style_enc_state_dict: dict, iteration: int) -> Path:
    """Write the reference's checkpoint layout. ``*_state_dict`` are flat
    {torch_name: np.ndarray} dicts (use msmd_tpu.interop converters to
    produce them from flax params)."""
    import torch  # local import: CPU wheel, optional on TPU hosts

    path = Path(exp_dir) / "checkpoints"
    path.mkdir(parents=True, exist_ok=True)
    file = path / f"iter_{iteration:07d}.pt"
    payload = {
        "args": cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
        "model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in model_state_dict.items()},
        "style_enc": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in style_enc_state_dict.items()},
        "iter": iteration,
    }
    torch.save(payload, file)
    return file


def load_reference_pt(path) -> Tuple[dict, dict, dict, int]:
    """Read a reference ``.pt`` into ({args...}, model_sd, style_sd, iter)
    as NumPy dicts. Uses torch when present; otherwise the torch-free
    zip/pickle parser (msmd_tpu.interop.torch_pickle)."""
    try:
        import torch
    except ImportError:
        from msmd_tpu.interop.torch_pickle import load_reference_checkpoint

        return load_reference_checkpoint(path)

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda sd: {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)) for k, v in sd.items()}
    args = ckpt.get("args", {})
    if hasattr(args, "__dict__"):
        args = vars(args)
    return args, to_np(ckpt["model"]), to_np(ckpt["style_enc"]), int(ckpt.get("iter", 0))


def find_latest_pt(checkpoints_dir) -> Optional[Path]:
    """Latest iter_*.pt (reference resume picks the lexicographically last:
    utils/model_common.py:72-77)."""
    files = sorted(Path(checkpoints_dir).glob("iter_*.pt"))
    return files[-1] if files else None
