"""Profiling / tracing hooks (aux subsystem; the reference has none —
SURVEY.md §5.1 — only ad-hoc GPU-memory prints, training_script.py:33-40).

Provides:
- ``trace(log_dir)``: context manager around ``jax.profiler`` producing
  a TensorBoard-loadable trace of everything inside.
- ``StepTimer``: wall-clock per-step timing with percentile summaries
  (host-side; device work is captured because the step fetches results).
- ``device_memory_stats()``: the TPU equivalent of the reference's
  print_GPU_usage.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "max_s": float(d.max()),
            "steps_per_sec": float(1.0 / max(d.mean(), 1e-12)),
            "n": int(len(d)),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats in MB where the backend reports them
    (reference analogue: print_GPU_usage, training_script.py:33-40)."""
    import jax

    out = {}
    for dev in jax.local_devices():
        stats = {}
        try:
            raw = dev.memory_stats() or {}
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if k in raw:
                    stats[k.replace("bytes", "mb")] = raw[k] / 1024**2
        except Exception:
            pass
        out[str(dev)] = stats
    return out
