"""Make the JAX_PLATFORMS environment variable effective for the CLIs.

This environment pre-imports and pre-registers the remote-TPU ("axon")
backend via sitecustomize before user code runs, which makes a plain
``JAX_PLATFORMS=cpu python training_script.py`` silently target the
TPU tunnel anyway. Tests handle this in tests/conftest.py by updating
``jax.config`` post-import; the CLIs call this helper for the same
effect. Also enables the persistent compilation cache when
``JAX_COMPILATION_CACHE_DIR`` is set (the jitted train/sampler programs
take minutes to compile cold)."""

import os


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
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception:
            pass
