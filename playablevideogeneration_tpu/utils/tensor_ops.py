"""Small tensor reshaping helpers shared across the framework.

TPU-native counterparts of the reference's tensor utilities
(reference: utils/tensor_folder.py:6, utils/tensor_splitter.py:4,
utils/tensor_resizer.py:8).  All functions are pure and jit-friendly.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


def flatten(x: jnp.ndarray) -> jnp.ndarray:
    """Merges the leading (batch, time) dimensions: (B, T, ...) -> (B*T, ...)."""
    return x.reshape((-1,) + x.shape[2:])


def fold(x: jnp.ndarray, second_dim: int) -> jnp.ndarray:
    """Splits the leading dimension: (B*T, ...) -> (B, T, ...) with T=second_dim."""
    first = x.shape[0]
    if first % second_dim != 0:
        raise ValueError(f"First dimension {first} is not a multiple of {second_dim}")
    return x.reshape((first // second_dim, second_dim) + x.shape[1:])


def predecessor_successor_split(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splits a (B, T, ...) tensor along time into (B, :T-1, ...), (B, 1:, ...)."""
    return x[:, :-1], x[:, 1:]


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear-resizes NHWC images to (height, width).

    Matches torch ``F.interpolate(mode='bilinear', align_corners=False)``
    semantics, which jax.image.resize('linear') implements.
    """
    batch_dims = x.shape[:-3]
    channels = x.shape[-1]
    return jax.image.resize(
        x, batch_dims + (height, width, channels), method="linear"
    )


def resize_as(x: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Resizes NHWC images in ``x`` to the spatial size of ``target``."""
    return resize_bilinear(x, target.shape[-3], target.shape[-2])


def time_major(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (T, B, ...) for lax.scan consumption."""
    return jnp.moveaxis(x, 1, 0)


def batch_major(x: jnp.ndarray) -> jnp.ndarray:
    """(T, B, ...) -> (B, T, ...) after lax.scan."""
    return jnp.moveaxis(x, 0, 1)
