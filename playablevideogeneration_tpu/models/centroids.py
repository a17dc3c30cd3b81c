"""Action-centroid EMA estimation as explicit functional state.

Reference: model/layers/centroid_estimator.py:5-95 keeps centroids in a
requires_grad=False parameter mutated via ``.data`` inside forward — mutable
training state outside the optimizer.  Here the centroids are an explicit
array threaded through the train step (stored in the 'model_state' flax
collection), so the update is pure, deterministic, and — under pjit with a
batch-sharded input — globally reduced by XLA across data shards.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_centroids(key: jax.Array, centroids_count: int, space_dimensions: int) -> jnp.ndarray:
    """N(0,1) initialization (reference centroid_estimator.py:27-28)."""
    return jax.random.normal(key, (centroids_count, space_dimensions), dtype=jnp.float32)


def update_centroids(
    centroids: jnp.ndarray,
    points_priors: jnp.ndarray,
    centroid_assignments: jnp.ndarray,
    alpha: float,
) -> jnp.ndarray:
    """EMA update from soft-assignment weighted means.

    :param centroids: (K, D) current centroid estimates
    :param points_priors: (..., 2, D) per-point (mean, variance)
    :param centroid_assignments: (..., K) soft assignment probabilities
    :param alpha: EMA coefficient (reference centroid_estimator.py:38-68)
    :return: (K, D) updated centroids (stop-gradient applied)
    """
    k, d = centroids.shape
    # The EMA runs in f32 regardless of the model compute dtype: callers
    # pass bf16 activations under tpu.compute_dtype=bfloat16, and an
    # 8-bit-mantissa estimate would inject percent-level quantization
    # noise into the f32 centroid state every step (the reference
    # estimator is all-f32).
    means = points_priors.reshape((-1, 2, d))[:, 0].astype(jnp.float32)
    assign = centroid_assignments.reshape((-1, k)).astype(jnp.float32)
    weighted = jnp.einsum("nd,nk->kd", means, assign)
    weights = assign.sum(axis=0)[:, None]  # (K, 1)
    estimate = weighted / weights
    new = centroids.astype(jnp.float32) * (1.0 - alpha) + estimate * alpha
    return jax.lax.stop_gradient(new.astype(centroids.dtype))


def compute_variations(
    points: jnp.ndarray,
    centroid_assignments: jnp.ndarray,
    centroids: jnp.ndarray,
) -> jnp.ndarray:
    """Assignment-weighted (point - centroid) variation vectors.

    :param points: (..., D)
    :param centroid_assignments: (..., K)
    :param centroids: (K, D)
    :return: (..., D) variations (reference centroid_estimator.py:70-95)
    """
    k, d = centroids.shape
    lead = points.shape[:-1]
    p = points.reshape((-1, d))
    a = centroid_assignments.reshape((-1, k))
    # sum_k a_k * (p - c_k) = p * sum_k a_k - a @ c
    variations = p * a.sum(axis=-1, keepdims=True) - a @ centroids.astype(p.dtype)
    return variations.reshape(lead + (d,))


def average_centroid_distance(centroids: jnp.ndarray) -> jnp.ndarray:
    """Mean pairwise L2 distance between centroids (reference trainer.py:188-203)."""
    k = centroids.shape[0]
    diff = centroids[None, :, :] - centroids[:, None, :]
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12).sum()
    return dist / (k * (k - 1))
