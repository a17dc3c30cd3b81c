"""Checkpoint save/restore via orbax, including sharded (TP / multi-host)
states.

Reference: trainer.py:80-122 torch.saves {model, optimizer, lr_scheduler,
step}; SmoothMITrainer additionally persists the MI matrix
(smooth_mi_trainer.py:43-45,65).  Here the whole TrainState pytree
(params, opt_state, batch_stats, centroid state, MI matrix, step) is
checkpointed in one shot.

Sharded states (tensor-parallel kernels over the 'model' mesh axis,
multi-host data parallelism) are saved WITHOUT gathering to one host:
jax.Array leaves go to orbax directly, each process writes its
addressable shards, and restore reads back into the template's shardings
(resharding on the fly if the mesh changed between save and restore).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _has_non_addressable_shards(state: Any) -> bool:
    return any(
        isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
        for leaf in jax.tree.leaves(state))


def save_checkpoint(path: str, state: Any):
    """Saves a (possibly sharded) TrainState.

    Fully-addressable states are materialized on host first (cheap, keeps
    single-chip checkpoints free of device references); cross-host-sharded
    states are handed to orbax as live jax.Arrays so every process writes
    only its own shards — no host has the full state.
    """
    path = os.path.abspath(path)
    if not _has_non_addressable_shards(state):
        state = jax.device_get(state)
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(path, state, force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restores into the structure of `template` (a matching TrainState).

    Template leaves that are sharded jax.Arrays restore AS sharded arrays
    with the template's shardings (each process reads its shards);
    host/numpy template leaves restore as host arrays.
    """
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"No checkpoint found at '{path}'")
    with ocp.PyTreeCheckpointer() as checkpointer:
        if _needs_sharded_restore(template):
            restore_args = ocp.checkpoint_utils.construct_restore_args(template)
            return checkpointer.restore(
                path, args=ocp.args.PyTreeRestore(
                    item=template, restore_args=restore_args))
        return checkpointer.restore(path, item=jax.device_get(template))


def _needs_sharded_restore(template: Any) -> bool:
    """Host-gather restore is only safe when every template leaf is fully
    addressable AND unsharded-or-single-device; otherwise restore with
    explicit shardings."""
    for leaf in jax.tree.leaves(template):
        if isinstance(leaf, jax.Array) and (
                not leaf.is_fully_addressable or len(leaf.sharding.device_set) > 1):
            return True
    return False


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
