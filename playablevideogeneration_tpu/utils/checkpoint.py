"""Checkpoint save/restore via orbax.

Reference: trainer.py:80-122 torch.saves {model, optimizer, lr_scheduler,
step}; SmoothMITrainer additionally persists the MI matrix
(smooth_mi_trainer.py:43-45,65).  Here the whole TrainState pytree
(params, opt_state, batch_stats, centroid state, MI matrix, step) is
checkpointed in one shot.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any):
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(path, jax.device_get(state), force=True)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restores into the structure of `template` (a matching TrainState)."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"No checkpoint found at '{path}'")
    with ocp.PyTreeCheckpointer() as checkpointer:
        target = jax.device_get(template)
        return checkpointer.restore(path, item=target)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
