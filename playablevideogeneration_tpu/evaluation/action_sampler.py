"""Action / variation samplers plugged into the model forward.

Reference: evaluation/action_sampler.py:6-84, action_variation_sampler.py:6-26.
Implemented as pure callables matching the `ActionSampler` /
`VariationSampler` contracts in models/caddy.py.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def one_hot_action_sampler(log_probabilities: jnp.ndarray,
                           ground_truth: jnp.ndarray) -> jnp.ndarray:
    """argmax one-hot sampling (reference action_sampler.py:14-34)."""
    indexes = jnp.argmax(log_probabilities, axis=-1)
    return jax.nn.one_hot(indexes, log_probabilities.shape[-1],
                          dtype=log_probabilities.dtype)


def make_ground_truth_action_sampler(ground_truth_to_actions_mapping: Dict[int, int]):
    """Maps ground-truth action indices through the Hungarian mapping and
    one-hot encodes them (reference action_sampler.py:37-84)."""
    size = max(ground_truth_to_actions_mapping.keys()) + 1
    table = [ground_truth_to_actions_mapping.get(i, i) for i in range(size)]
    lookup = jnp.asarray(table, jnp.int32)

    def sampler(log_probabilities: jnp.ndarray, ground_truth: jnp.ndarray) -> jnp.ndarray:
        translated = lookup[jnp.clip(ground_truth.astype(jnp.int32), 0, size - 1)]
        return jax.nn.one_hot(translated, log_probabilities.shape[-1],
                              dtype=log_probabilities.dtype)

    return sampler


def zero_action_variation_sampler(sampled_action_directions: jnp.ndarray,
                                  action_samples: jnp.ndarray) -> jnp.ndarray:
    """Zeroes the variation vectors (reference action_variation_sampler.py:15-26)."""
    return sampled_action_directions * 0.0
