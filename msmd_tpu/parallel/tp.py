"""Tensor parallelism as parameter sharding rules (GSPMD / pjit style).

The reference is single-GPU torch with no model parallelism
(SURVEY.md §2.3); here model parallelism is expressed the TPU-native
way: a 2-D ``("data", "model")`` mesh plus Megatron-style column/row
``PartitionSpec``s on the dense kernels, and XLA's SPMD partitioner
inserts the all-gather / reduce-scatter collectives on ICI. No model
code changes — the specs are derived purely from parameter *names*:

- column-parallel (output dim sharded, activations become
  model-sharded): attention ``q_proj``/``k_proj``/``v_proj`` and the
  first FFN/MLP matmul (``linear1``, ``intermediate_dense``);
- row-parallel (input dim sharded, XLA reduces the partial sums):
  attention ``out_proj`` and the second FFN/MLP matmul (``linear2``,
  ``output_dense``);
- everything else (LayerNorms, convs, embeddings, scalars, optimizer
  counters) replicated.

The same rule pass maps over a whole ``TrainState`` pytree, so Adam's
``mu``/``nu`` moments shard exactly like their parameters (their tree
paths end in the same ``<module>/<kernel|bias>`` names).

Dims that the ``model`` axis does not divide stay replicated (per-leaf
guard), so any mesh size is safe on any geometry. The opt-in Pallas
sampler/decoder kernels are single-chip programs — tensor parallelism
applies to the XLA (default) compute path; the data-parallel axis works
with every path.
"""

from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names whose kernel's OUTPUT dim is sharded (column-parallel)
COL_MODULES = ("q_proj", "k_proj", "v_proj", "linear1", "intermediate_dense")
# module names whose kernel's INPUT dim is sharded (row-parallel);
# their bias adds after the reduction, so it stays replicated
ROW_MODULES = ("out_proj", "linear2", "output_dense")


def _path_names(path) -> list:
    names = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            names.append(k.name)
    return names


def tp_spec(path, leaf, tp_size: int) -> P:
    """PartitionSpec for one pytree leaf under ``tp_size``-way tensor
    parallelism on the ``model`` mesh axis."""
    names = _path_names(path)
    if len(names) < 2 or tp_size <= 1:
        return P()
    mod, leafname = names[-2], names[-1]
    shape = getattr(leaf, "shape", ())
    if leafname == "kernel" and len(shape) == 2:
        if mod in COL_MODULES and shape[1] % tp_size == 0:
            return P(None, "model")
        if mod in ROW_MODULES and shape[0] % tp_size == 0:
            return P("model", None)
    if leafname == "bias" and mod in COL_MODULES and len(shape) == 1 and shape[0] % tp_size == 0:
        return P("model")
    return P()


def tp_shardings(tree, mesh: Mesh):
    """Tree of NamedShardings implementing the TP rules over ``mesh``.

    Works on a params dict or a whole TrainState (optimizer moments
    follow their parameters by name)."""
    tp_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_spec(path, leaf, tp_size)), tree
    )


def shard_state_tp(state, mesh: Mesh):
    """Place a TrainState on the mesh with TP parameter shardings."""
    return jax.device_put(state, tp_shardings(state, mesh))


def count_tp_sharded(tree, mesh: Mesh) -> int:
    """Number of leaves that actually shard over the model axis (useful
    for asserting TP engaged rather than silently replicating)."""
    tp_size = mesh.shape.get("model", 1)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return sum(1 for path, leaf in flat if tp_spec(path, leaf, tp_size) != P())


def make_dp_tp_mesh(dp: int, tp: int, devices: Sequence = None) -> Mesh:
    """A (dp, tp) ``("data", "model")`` mesh over the first dp*tp devices."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[: dp * tp]
    return Mesh(np.asarray(devices).reshape(dp, tp), axis_names=("data", "model"))
