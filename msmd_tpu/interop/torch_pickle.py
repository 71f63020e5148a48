"""Torch-free reader for torch ``.pt`` checkpoints.

TPU hosts don't ship torch; the reference's checkpoints are torch
zip-archives (a ``data.pkl`` pickle whose tensors are persistent-ID
references into per-tensor storage files). This module parses that
format with only the stdlib + NumPy (SURVEY.md §7 "hard parts":
*reading torch .pt zip/pickle state_dicts on a torch-less TPU host*).

Covers the modern zipfile serialization (torch >= 1.6). Tensors come
back as NumPy arrays; unknown torch classes (e.g. argparse Namespaces
pickled inside) are returned as plain attribute dicts.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "BFloat16Storage": None,  # handled specially (no native np dtype pre-2.0)
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _FakeClass:
    """Stand-in for unpicklable torch/argparse classes: records state."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self._kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)

    def __call__(self, *a, **k):  # some reduce paths call the class
        return self


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *unused):
    arr, dtype = storage
    if dtype == "bfloat16":
        # upcast bf16 -> f32: expand each 2-byte value to 4 bytes (high half)
        u16 = arr.view(np.uint16)
        u32 = u16.astype(np.uint32) << 16
        arr = u32.view(np.float32)
    itemsize = arr.itemsize
    if not size:
        return arr[storage_offset].copy() if arr.size else np.zeros((), arr.dtype)
    byte_strides = tuple(s * itemsize for s in stride)
    return np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=byte_strides
    ).copy()


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, data: bytes, zf: zipfile.ZipFile, prefix: str):
        super().__init__(io.BytesIO(data))
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name.endswith("Storage"):
            return name  # marker consumed by persistent_load
        if module == "torch.serialization":
            return lambda *a, **k: None
        if module in ("collections",):
            return super().find_class(module, name)
        if module.startswith(("numpy", "builtins", "copyreg")):
            return super().find_class(module, name)
        # anything else (argparse.Namespace, torch dtypes, custom classes)
        if module == "argparse" and name == "Namespace":
            return _FakeClass
        try:
            return super().find_class(module, name)
        except Exception:
            return _FakeClass

    def persistent_load(self, pid):
        kind, storage_type, key, location, numel = pid
        assert kind == "storage", kind
        name = storage_type if isinstance(storage_type, str) else storage_type.__name__
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        if name == "BFloat16Storage":
            return np.frombuffer(raw, dtype=np.uint16).copy(), "bfloat16"
        dtype = _STORAGE_DTYPES.get(name)
        if dtype is None:
            raise ValueError(f"Unsupported storage type {name}")
        return np.frombuffer(raw, dtype=dtype).copy(), str(np.dtype(dtype))


def load_pt(path) -> Any:
    """Load a torch zip-format .pt file without torch. Tensors become
    NumPy arrays; unpicklable objects become attribute-dict stand-ins."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("/data.pkl")]
        return _TorchUnpickler(zf.read(pkl_name), zf, prefix).load()


def load_reference_checkpoint(path):
    """Reference layout {args, model, style_enc, iter} -> NumPy dicts
    (torch-free twin of msmd_tpu.train.checkpoint.load_reference_pt)."""
    ckpt = load_pt(path)
    args = ckpt.get("args", {})
    if hasattr(args, "__dict__") and not isinstance(args, dict):
        args = {k: v for k, v in vars(args).items() if not k.startswith("_")}
    to_np = lambda sd: {k: np.asarray(v) for k, v in sd.items()}
    return args, to_np(ckpt["model"]), to_np(ckpt["style_enc"]), int(ckpt.get("iter", 0))
