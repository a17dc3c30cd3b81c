"""Device mesh and sharding rules.

The reference's only parallelism is single-process torch DataParallel
(train.py:67; SURVEY.md §2.6).  The TPU-native design is batch-axis data
parallelism over the ICI mesh expressed with `jax.sharding`: the batch is
sharded on the 'data' axis and XLA inserts the gradient all-reduces.  The
'model' axis carries optional tensor parallelism (`param_shardings` /
`place_state`): wide kernels shard their output channels, GSPMD propagates
activation shardings and inserts the collectives.  At the default
model_parallel=1 every rule degenerates to replication, so DP behavior is
byte-identical.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, data_parallel: Optional[int] = None,
              model_parallel: int = 1) -> Mesh:
    """Builds a (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} does not cover {n} devices")
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch_arrays):
    """Places a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch_arrays)


def replicate(mesh: Mesh, tree):
    """Replicates a pytree (params / optimizer / EMA state) on every device."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_shardings(mesh: Mesh, params, min_channels: int = 256):
    """Tensor-parallel sharding rules for the parameter tree.

    Wide convolution/dense kernels shard their OUTPUT-channel axis over the
    'model' mesh axis; everything else replicates.  XLA's GSPMD propagates
    the activation shardings and inserts the ICI collectives — no manual
    communication.  With model axis size 1 (the default) every rule is
    replication, so data-parallel behavior is unchanged.

    :param min_channels: only kernels at least this wide shard; small
        layers gain nothing from splitting and pay collective latency.
    """
    model_size = mesh.shape[MODEL_AXIS]
    replicated = replicated_sharding(mesh)

    def rule(path, leaf):
        last = getattr(path[-1], "key", None)
        if (model_size > 1 and last == "kernel" and leaf.ndim >= 2
                and leaf.shape[-1] >= min_channels
                and leaf.shape[-1] % model_size == 0):
            spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def state_shardings(mesh: Mesh, state, min_channels: int = 256):
    """The sharding pytree `place_state` realizes, as a TrainState-shaped
    tree of NamedShardings.  `state` may hold real arrays OR
    `jax.ShapeDtypeStruct`s (the rules only read shape/ndim), so AOT
    lowering can annotate its avals with the exact shardings the placed
    state will have — keeping compiled executables valid beyond 1 device.

    Params and the Adam moments in opt_state follow the tensor-parallel
    rules; batch_stats, EMA state and scalars replicate.  Optimizer
    moments are matched STRUCTURALLY: any opt_state subtree whose pytree
    structure equals the param tree (optax mu/nu) receives the param
    shardings leaf-for-leaf."""
    shardings = param_shardings(mesh, state.params, min_channels)
    replicated = replicated_sharding(mesh)
    params_treedef = jax.tree_util.tree_structure(state.params)

    def opt_rule(node):
        if jax.tree_util.tree_structure(node) == params_treedef:
            return shardings
        if isinstance(node, tuple):  # optax states are (named)tuples
            mapped = [opt_rule(child) for child in node]
            return type(node)(*mapped) if hasattr(node, "_fields") \
                else tuple(mapped)
        if isinstance(node, (list, dict)):
            items = node.items() if isinstance(node, dict) else enumerate(node)
            out = type(node)()
            for key, child in items:
                if isinstance(node, dict):
                    out[key] = opt_rule(child)
                else:
                    out.append(opt_rule(child))
            return out
        return jax.tree.map(lambda x: replicated, node)

    return state.replace(
        params=shardings,
        opt_state=opt_rule(state.opt_state),
        batch_stats=jax.tree.map(lambda x: replicated, state.batch_stats),
        model_state=jax.tree.map(lambda x: replicated, state.model_state),
        mi_matrix=replicated,
        step=replicated,
    )


def place_state(mesh: Mesh, state, min_channels: int = 256):
    """Places a TrainState on the mesh per `state_shardings`."""
    shardings = state_shardings(mesh, state, min_channels)
    return jax.tree.map(jax.device_put, state, shardings)


def put_batch(mesh: Mesh, array):
    """Places one host batch array with the batch axis sharded on 'data'.

    Single-process: a plain sharded transfer.  Multi-host (DCN, SURVEY.md
    §2.6): each process contributes its local shard of the global batch via
    `make_array_from_process_local_data` — the global batch size is
    per-process batch × process count.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(array))
