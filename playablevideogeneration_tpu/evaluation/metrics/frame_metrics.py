"""Per-observation frame metrics: MSE, PSNR, SSIM, motion-masked MSE.

Reference: evaluation/metrics/{mse.py:7, psnr.py:5, ssim.py:9,
motion_masked_mse.py:10, motion_mask.py:13-36}.  Each returns a (B, T)
array of per-observation values.  Inputs are NHWC sequences in [0, 1]
(the offline evaluation range; reference transforms.py:67-87).

SSIM follows Wang et al. 2004 with an 11x11 Gaussian window, sigma 1.5,
data_range 1 — the configuration used by piq.ssim in the reference
(dataset_evaluator.py:64).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mse(reference: jnp.ndarray, generated: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) pair -> (B, T) per-observation MSE."""
    return jnp.mean((reference - generated) ** 2, axis=(2, 3, 4))


def psnr(reference: jnp.ndarray, generated: jnp.ndarray,
         max_value: float = 1.0) -> jnp.ndarray:
    """(B, T) per-observation PSNR in dB."""
    err = mse(reference, generated)
    return 10.0 * jnp.log10((max_value**2) / jnp.maximum(err, 1e-12))


def motion_mask(sequence: jnp.ndarray, bias: float = 0.0) -> jnp.ndarray:
    """Frame-difference motion mask, first element replicated
    (reference motion_mask.py:13-36).

    :param sequence: (B, T, H, W, C)
    :return: (B, T, H, W, 1) non-negative weights
    """
    diff = jnp.abs(sequence[:, 1:] - sequence[:, :-1]).sum(axis=-1, keepdims=True)
    first = diff[:, 0:1]
    mask = jnp.concatenate([first, diff], axis=1) + bias
    return mask


def motion_masked_mse(reference: jnp.ndarray, generated: jnp.ndarray,
                      bias: float = 0.0) -> jnp.ndarray:
    """MSE weighted by the reference-sequence motion mask, normalized per
    frame (reference motion_masked_mse.py:10)."""
    mask = motion_mask(reference, bias)
    err = ((reference - generated) ** 2) * mask
    num = err.sum(axis=(2, 3, 4))
    den = mask.sum(axis=(2, 3, 4)) * reference.shape[-1]
    return num / jnp.maximum(den, 1e-12)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' convolution of NHWC images with a 2-D kernel."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel[:, :, None, None], kernel.shape + (1, 1))
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(reference: jnp.ndarray, generated: jnp.ndarray,
         data_range: float = 1.0) -> jnp.ndarray:
    """(B, T, H, W, C) pair -> (B, T) per-observation SSIM."""
    b, t = reference.shape[:2]
    x = reference.reshape((-1,) + reference.shape[2:])
    y = generated.reshape((-1,) + generated.shape[2:])
    kernel = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_x = _filter2d(x, kernel)
    mu_y = _filter2d(y, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _filter2d(x * x, kernel) - mu_xx
    sigma_y = _filter2d(y * y, kernel) - mu_yy
    sigma_xy = _filter2d(x * y, kernel) - mu_xy

    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2))
    values = ssim_map.mean(axis=(1, 2, 3))
    return values.reshape(b, t)


def vgg_cosine_similarity(vgg_apply, reference: jnp.ndarray,
                          generated: jnp.ndarray) -> jnp.ndarray:
    """Mean cosine similarity over the 5 VGG19 feature levels
    (reference vgg_cosine_similarity.py:10).

    :return: (B, T) per-observation similarity
    """
    b, t = reference.shape[:2]
    x = reference.reshape((-1,) + reference.shape[2:])
    y = generated.reshape((-1,) + generated.shape[2:])
    fx = vgg_apply(x)
    fy = vgg_apply(y)
    sims = []
    for a, bb in zip(fx, fy):
        a_flat = a.reshape(a.shape[0], -1)
        b_flat = bb.reshape(bb.shape[0], -1)
        num = (a_flat * b_flat).sum(-1)
        den = jnp.linalg.norm(a_flat, axis=-1) * jnp.linalg.norm(b_flat, axis=-1)
        sims.append(num / jnp.maximum(den, 1e-12))
    return jnp.stack(sims, axis=0).mean(axis=0).reshape(b, t)


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (reference fid.py:24-76,
    numpy/scipy sqrtm path)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))
