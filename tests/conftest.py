"""Test configuration: force an 8-device virtual CPU backend so sharding
and collective tests run without a TPU pod (standard JAX fake-backend
trick — see SURVEY.md §4).

NOTE: the environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel)
and pre-imports jax via sitecustomize, so we must OVERWRITE the env var
and also update jax.config post-import; otherwise every test op crosses
the network to the TPU."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the jitted train/sample programs take
# minutes to compile on CPU; cache them across test runs/processes.
# The dir is suffixed with a host-CPU-feature fingerprint: XLA:CPU AOT
# artifacts are NOT portable across machine generations (the VM can
# migrate between rounds), and loading a stale one can silently corrupt
# numerics (observed: a train step whose param update compiled to zero).
from msmd_tpu.platform import cache_dir_for  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir_for("/tmp/msmd_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
