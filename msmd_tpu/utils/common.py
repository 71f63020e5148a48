"""Small shared helpers (capability parity with reference:
utils/common.py:94-115 and utils/model_common.py:9-55)."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total parameter count of a flax param tree (reference:
    utils/common.py:94-95 counts trainable torch params)."""
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def get_option_text(cfg, defaults=None) -> str:
    """Pretty-print a config, flagging non-default values (reference:
    utils/common.py:98-106)."""
    from msmd_tpu.config import MSMDConfig

    defaults = defaults or MSMDConfig()
    message = ""
    for k, v in sorted(cfg.to_dict().items()):
        comment = ""
        default = getattr(defaults, k, None)
        if v != default:
            comment = f"\t[default: {default}]"
        message += f"{str(k):>30}: {str(v):<30}{comment}\n"
    return message


def get_model_path(exp_name: str, iteration: int, model_type: str = "DPT", exp_root=None):
    """Resolve a checkpoint path from an experiment name prefix
    (reference: utils/common.py:109-115)."""
    exp_root_dir = Path(exp_root) if exp_root else Path(__file__).parent.parent.parent / "experiments" / model_type
    exp_dir = exp_root_dir / exp_name
    if not exp_dir.exists():
        exp_dir = next(exp_root_dir.glob(f"{exp_name}*"))
    model_path = exp_dir / f"checkpoints/iter_{iteration:07}.pt"
    return model_path, exp_dir.relative_to(exp_root_dir)
