"""FID: Fréchet Inception Distance.

Reference: evaluation/metrics/fid.py:19-159 + pytorch_fid/inception.py
(InceptionV3 pool3 activations with TF-FID weights, then Fréchet distance
via scipy sqrtm).

The feature extractor is pluggable: any callable
(N, H, W, 3) in [0, 1] -> (N, D) activations.  A JAX InceptionV3-FID
architecture is provided in inception.py with a weight-conversion hook;
without pretrained weights, FID is reported as unavailable by the dataset
evaluator (numbers from random features would be meaningless).
"""
from __future__ import annotations

from typing import Callable, Iterable, Tuple

import numpy as np

from playablevideogeneration_tpu.evaluation.metrics.frame_metrics import (
    frechet_distance,
)


def compute_statistics_from_frames(
    extractor: Callable[[np.ndarray], np.ndarray],
    frame_batches: Iterable[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """Streams frame batches through the extractor and accumulates
    activation mean/covariance (reference fid.py:79-137)."""
    count = 0
    sum_x = None
    sum_xxt = None
    for frames in frame_batches:
        acts = np.asarray(extractor(np.asarray(frames)), np.float64)
        if sum_x is None:
            d = acts.shape[1]
            sum_x = np.zeros((d,))
            sum_xxt = np.zeros((d, d))
        count += acts.shape[0]
        sum_x += acts.sum(axis=0)
        sum_xxt += acts.T @ acts
    if count < 2:
        raise ValueError("Need at least 2 frames for FID statistics")
    mu = sum_x / count
    # Unbiased covariance (matches np.cov(rowvar=False), reference fid.py:137).
    sigma = (sum_xxt - count * np.outer(mu, mu)) / (count - 1)
    return mu, sigma


def fid_from_statistics(mu1, sigma1, mu2, sigma2) -> float:
    return frechet_distance(mu1, sigma1, mu2, sigma2)


def compute_fid(extractor, reference_frames: Iterable[np.ndarray],
                generated_frames: Iterable[np.ndarray]) -> float:
    mu1, s1 = compute_statistics_from_frames(extractor, reference_frames)
    mu2, s2 = compute_statistics_from_frames(extractor, generated_frames)
    return fid_from_statistics(mu1, s1, mu2, s2)
