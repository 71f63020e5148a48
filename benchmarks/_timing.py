"""Shared timing conventions for the on-chip probes.

The axon TPU tunnel executes lazily: ``block_until_ready()`` returns
immediately and only a HOST FETCH (``float(x)`` / ``jax.device_get``)
forces compile+run. Every probe must therefore warm up with a fetch and
time fetches; ``min`` over reps filters tunnel-roundtrip jitter.
"""

import time


def configure_cache():
    import jax

    try:
        from msmd_tpu.platform import cache_dir_for
        jax.config.update("jax_compilation_cache_dir", cache_dir_for("/tmp/msmd_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass


def timeit(fn, *args, reps: int = 3) -> float:
    float(fn(*args))  # compile + warm (forces execution on axon)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)
