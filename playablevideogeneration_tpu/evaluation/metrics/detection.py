"""Object detectors and detection metrics for action-space evaluation.

Reference:
- evaluation/metrics/breakout_platform_position.py:8-110 — platform x
  position by color-band scan (pure math, fully reimplemented).
- evaluation/metrics/tennis_player_detector.py:9-110 — torchvision Faster
  R-CNN person detector.  Pretrained detector weights are not available in
  this environment, so the tennis detector is a pluggable interface: pass
  any callable batch -> (B, T, 2) detections; without one, detection
  metrics are skipped with a recorded reason.
- evaluation/metrics/detection_metric_{1d,2d}.py:10 — per-position
  successful/missed detection counts + average center distance
  (ADD/MDR-style).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def breakout_platform_positions(observations: np.ndarray) -> np.ndarray:
    """Detects the Breakout platform x-position in each frame.

    The platform lives in a fixed bottom band of the frame and has a
    distinctive red-ish color (reference breakout_platform_position.py:42-110).

    :param observations: (B, T, H, W, C) float images in [0, 1]
    :return: (B, T, 1) x positions in pixels, -1 where not detected
    """
    b, t, h, w, c = observations.shape
    # The platform band: bottom ~8% of the frame, excluding the very border.
    band = observations[:, :, int(h * 0.89): int(h * 0.97)]
    # Red-dominant pixels (platform color in the breakout dataset).
    red = (band[..., 0] > 0.55) & (band[..., 1] < 0.45) & (band[..., 2] < 0.45)
    mask = red.any(axis=2)  # (B, T, W): column contains platform color
    xs = np.arange(w, dtype=np.float64)
    counts = mask.sum(axis=-1)
    sums = (mask * xs).sum(axis=-1)
    positions = np.where(counts > 0, sums / np.maximum(counts, 1), -1.0)
    return positions[..., None]


def detection_metric(reference_detections: np.ndarray,
                     generated_detections: np.ndarray,
                     prefix: str) -> Dict[str, float]:
    """ADD/MDR-style detection statistics.

    Works for 1-D and 2-D detections: counts positions where both
    sequences have successful detections, average center distance among
    them, and missed-detection rates per position and globally
    (reference detection_metric_2d.py:10, detection_metric_1d.py:10).

    :param reference_detections: (N, T, D) with -1 marking failures
    :param generated_detections: (N, T, D)
    """
    ref = np.asarray(reference_detections, np.float64)
    gen = np.asarray(generated_detections, np.float64)
    n, t, d = ref.shape
    ref_ok = (ref[..., 0] != -1)
    gen_ok = (gen[..., 0] != -1)
    both = ref_ok & gen_ok

    distances = np.linalg.norm(ref - gen, axis=-1)  # (N, T)

    results: Dict[str, float] = {}
    positional_add = []
    positional_mdr = []
    for i in range(t):
        ok = both[:, i]
        denom = ref_ok[:, i].sum()
        add = float(distances[ok, i].mean()) if ok.sum() else -1.0
        mdr = float(1.0 - (ok.sum() / denom)) if denom else -1.0
        results[f"{prefix}/add/{i}"] = add
        results[f"{prefix}/mdr/{i}"] = mdr
        if add >= 0:
            positional_add.append(add)
        if mdr >= 0:
            positional_mdr.append(mdr)

    results[f"{prefix}/add/avg"] = (
        float(np.mean(positional_add)) if positional_add else -1.0)
    results[f"{prefix}/mdr/avg"] = (
        float(np.mean(positional_mdr)) if positional_mdr else -1.0)
    results[f"{prefix}/detection_rate/reference"] = float(ref_ok.mean())
    results[f"{prefix}/detection_rate/generated"] = float(gen_ok.mean())
    return results


class TennisPlayerDetector:
    """Pluggable tennis player detector interface.

    The reference uses a torchvision Faster R-CNN ResNet50-FPN 'person'
    detector with court-region filtering (tennis_player_detector.py:14-108).
    Pretrained weights cannot be downloaded in this environment; provide a
    `backend` callable (B, T, H, W, C) -> (B, T, 2) to enable detection, or
    detections are reported as failures (-1) and detection metrics carry a
    'detector_unavailable' marker.
    """

    def __init__(self, backend: Optional[callable] = None):
        self.backend = backend

    @property
    def available(self) -> bool:
        return self.backend is not None

    def __call__(self, observations: np.ndarray) -> np.ndarray:
        if self.backend is not None:
            return np.asarray(self.backend(observations))
        b, t = observations.shape[:2]
        return np.full((b, t, 2), -1.0)
