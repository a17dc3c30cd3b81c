"""LPIPS perceptual distance (VGG backbone).

Reference: evaluation/metrics/lpips.py:9 uses the `lpips` pip package with
the VGG backbone: ImageNet-normalized inputs, channel-unit-normalized VGG
features at 5 levels, squared differences projected by learned 1x1 linear
heads, spatially averaged and summed over levels.

The architecture is implemented here in JAX; the learned linear-head
weights (and torchvision VGG weights) load from converted .npz files.
Without them, `make_lpips_fn` can fall back to equal-weight heads
("lpips-like" distance — marked as such by the caller; true LPIPS parity
requires the converted weights).
"""
from __future__ import annotations

from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by the official LPIPS 'scaling layer'.
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _normalize_tensor(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


def make_lpips_fn(
    vgg_apply: Callable[[jnp.ndarray], List[jnp.ndarray]],
    linear_weights: Optional[List[np.ndarray]] = None,
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Builds an LPIPS distance over (B, T, H, W, 3) sequence pairs in [0, 1].

    :param vgg_apply: 5-level VGG19 feature extractor (models/vgg.py); true
        LPIPS uses VGG16 slices — pass a converted-weight extractor for
        metric parity.
    :param linear_weights: per-level (C,) non-negative head weights from
        the official LPIPS checkpoint; None -> uniform 1/C heads.
    :return: fn(ref, gen) -> (B, T) per-observation distances
    """

    def lpips(reference: jnp.ndarray, generated: jnp.ndarray) -> jnp.ndarray:
        b, t = reference.shape[:2]
        x = reference.reshape((-1,) + reference.shape[2:])
        y = generated.reshape((-1,) + generated.shape[2:])
        # [0, 1] -> [-1, 1] then LPIPS scaling layer.
        x = (2.0 * x - 1.0 - _SHIFT) / _SCALE
        y = (2.0 * y - 1.0 - _SHIFT) / _SCALE
        fx = vgg_apply(x)
        fy = vgg_apply(y)
        total = 0.0
        for level, (a, bb) in enumerate(zip(fx, fy)):
            diff = (_normalize_tensor(a) - _normalize_tensor(bb)) ** 2
            if linear_weights is not None:
                w = jnp.asarray(linear_weights[level]).reshape(1, 1, 1, -1)
                level_val = jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
            else:
                level_val = jnp.mean(diff, axis=(1, 2, 3))
            total = total + level_val
        return total.reshape(b, t)

    return lpips


def load_lpips_linear_weights(path: str) -> List[np.ndarray]:
    """Loads converted LPIPS linear-head weights from an .npz with keys
    lin0..lin4 holding (C,) arrays."""
    data = np.load(path)
    return [np.asarray(data[f"lin{i}"]).reshape(-1) for i in range(5)]
