"""Device-mesh data parallelism.

The reference trains on one CUDA device with no collectives
(SURVEY.md §2.3); the TPU framework instead shards the batch over an ICI
mesh and lets XLA insert the per-step gradient ``psum``
(BASELINE.json config 5). The recipe is the standard jax.sharding one:
one 'data' mesh axis, batch arrays sharded on axis 0, parameters and
optimizer state replicated; ``jax.jit`` with these output shardings
compiles the all-reduce onto ICI.

The 100-frame window is tiny (111-211 tokens), so tensor/sequence
parallelism buys nothing at parity scale — the mesh is 1-D by default
but ``make_mesh`` accepts any axis spec for larger configurations.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",), shape: Optional[Sequence[int]] = None, devices=None) -> Mesh:
    """Build a Mesh over all (or the given) devices. With the default
    1-axis spec every device is data-parallel."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data"):
    """Host batch dict -> device arrays with the batch axis sharded over
    the mesh. Scalars replicate."""
    sharded = batch_sharding(mesh, axis)
    repl = replicate_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, sharded)

    return jax.tree_util.tree_map(put, batch)
