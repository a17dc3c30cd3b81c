"""Training state pytree.

Gathers everything the reference checkpoints (trainer.py:80-122 plus the
non-optimizer mutable state identified in SURVEY.md §5): parameters,
optimizer state, BatchNorm statistics, centroid estimator state
('model_state' collection), the smooth-MI joint matrix, and the step.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: Any
    batch_stats: Dict[str, Any]
    model_state: Dict[str, Any]  # centroid estimator state
    mi_matrix: jnp.ndarray  # smooth-MI joint matrix estimator
    step: jnp.ndarray  # () int32 global step

    def variables(self) -> Dict[str, Any]:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "model_state": self.model_state,
        }
