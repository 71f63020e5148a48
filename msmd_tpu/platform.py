"""Make the JAX_PLATFORMS environment variable effective for the CLIs.

This environment pre-imports and pre-registers the remote-TPU ("axon")
backend via sitecustomize before user code runs, which makes a plain
``JAX_PLATFORMS=cpu python training_script.py`` silently target the
TPU tunnel anyway. Tests handle this in tests/conftest.py by updating
``jax.config`` post-import; the CLIs call this helper for the same
effect. Also enables the persistent compilation cache when
``JAX_COMPILATION_CACHE_DIR`` is set (the jitted train/sampler programs
take minutes to compile cold)."""

import hashlib
import os


def machine_fingerprint() -> str:
    """Short hash of the host CPU's feature flags.

    XLA:CPU persists AOT-compiled executables keyed by the *program*,
    not the host it was compiled on; if the VM migrates to a machine
    with different CPU features, loading the stale artifact warns
    ("could lead to execution errors such as SIGILL") and can produce
    silently wrong numerics. Suffixing the cache dir with this hash
    makes each machine generation use its own cache.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


def cache_dir_for(base: str) -> str:
    return f"{base.rstrip('/')}-{machine_fingerprint()}"


def apply_platform_env() -> None:
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir_for(cache))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass
