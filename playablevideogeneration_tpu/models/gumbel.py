"""Gumbel-softmax sampling as pure functions.

Reference: model/layers/gumbel_softmax.py:7-72.  The reference draws from
the global torch RNG; here sampling takes an explicit PRNG key so it is
deterministic, vmappable and shardable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax_sample(
    key: jax.Array,
    log_probs: jnp.ndarray,
    temperature: jnp.ndarray,
    hard: bool = False,
) -> jnp.ndarray:
    """Samples from a Gumbel-softmax relaxation.

    :param key: PRNG key
    :param log_probs: (..., classes) log-probabilities
    :param temperature: scalar temperature (may be a traced value, enabling
        annealing without recompilation)
    :param hard: straight-through hard sampling
        (reference gumbel_softmax.py:60-70); configs use soft sampling.
    :return: (..., classes) sample vectors summing to 1
    """
    # Matches the reference's -log(-log(U + eps) + eps) construction
    # (gumbel_softmax.py:26-35) through jax.random.gumbel.
    g = jax.random.gumbel(key, log_probs.shape, dtype=log_probs.dtype)
    y = (log_probs + g) / temperature
    soft = jax.nn.softmax(y, axis=-1)
    if hard:
        idx = jnp.argmax(soft, axis=-1)
        y_hard = jax.nn.one_hot(idx, soft.shape[-1], dtype=soft.dtype)
        # Straight-through estimator: forward hard, backward soft.
        return soft + jax.lax.stop_gradient(y_hard - soft)
    return soft
