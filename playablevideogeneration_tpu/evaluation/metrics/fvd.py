"""FVD: Fréchet Video Distance.

Reference: evaluation/metrics/fvd.py:194-460 — a TensorFlow-1 graph
loading the I3D kinetics-400 network from TF-Hub, resizing videos to
224x224 and [-1, 1], batching by 16, and computing
frechet_classifier_distance_from_activations.

TPU-native redesign: the embedder is a pluggable callable
(N, T, H, W, 3) in [0, 1] -> (N, D) video embeddings (an I3D-JAX port with
converted weights is the production path; a deterministic fallback embedder
exists for pipeline testing).  The Fréchet math is shared with FID.
"""
from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

from playablevideogeneration_tpu.evaluation.metrics.frame_metrics import (
    frechet_distance,
)

EMBED_BATCH = 16  # reference fvd.py:151 fixed batch size


def _statistics(embedder, video_batches: Iterable[np.ndarray]):
    buffer = []
    embeddings = []

    def flush():
        if buffer:
            videos = np.concatenate(buffer, axis=0)
            embeddings.append(np.asarray(embedder(videos), np.float64))
            buffer.clear()

    pending = 0
    for videos in video_batches:
        buffer.append(np.asarray(videos))
        pending += videos.shape[0]
        if pending >= EMBED_BATCH:
            flush()
            pending = 0
    flush()
    acts = np.concatenate(embeddings, axis=0)
    if acts.shape[0] < 2:
        raise ValueError("Need at least 2 videos for FVD statistics")
    mu = acts.mean(axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, np.atleast_2d(sigma)


def compute_fvd(embedder: Callable[[np.ndarray], np.ndarray],
                reference_videos: Iterable[np.ndarray],
                generated_videos: Iterable[np.ndarray]) -> float:
    """Streams both datasets through the embedder and returns the Fréchet
    distance between embedding distributions (reference fvd.py:341-404)."""
    mu1, s1 = _statistics(embedder, reference_videos)
    mu2, s2 = _statistics(embedder, generated_videos)
    return frechet_distance(mu1, s1, mu2, s2)


def naive_video_embedder(videos: np.ndarray, dims: int = 64) -> np.ndarray:
    """Deterministic non-pretrained fallback embedder for pipeline tests:
    multi-scale spatiotemporal statistics (NOT comparable to I3D FVD;
    mirrors the reference's fake_create_id3_embedding test stub,
    fvd.py:128-143)."""
    v = np.asarray(videos, np.float64)
    n, t = v.shape[:2]
    feats = []
    feats.append(v.mean(axis=(1, 2, 3)))  # (N, 3) color means
    feats.append(v.std(axis=(1, 2, 3)))
    diff = np.abs(np.diff(v, axis=1))
    feats.append(diff.mean(axis=(1, 2, 3)))  # motion energy
    # Coarse spatial grid of temporal means
    gh = gw = 4
    h, w = v.shape[2], v.shape[3]
    grid = v[:, :, : h - h % gh, : w - w % gw]
    grid = grid.reshape(n, t, gh, h // gh, gw, w // gw, -1).mean(axis=(1, 3, 5))
    feats.append(grid.reshape(n, -1))
    out = np.concatenate(feats, axis=1)
    if out.shape[1] < dims:
        out = np.pad(out, ((0, 0), (0, dims - out.shape[1])))
    return out[:, :dims]
