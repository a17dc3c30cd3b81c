"""Frame transforms: crop -> resize -> float tensor -> normalize.

Reference: dataset/transforms.py:12-107.  Training/eval transform maps a
PIL frame to an NHWC float32 array in [-1, 1] (Normalize(0.5, 0.5));
evaluation-dataset transforms skip normalization and stay in [0, 1].
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
from PIL import Image


def check_and_resize(target_crop: Optional[List[int]], target_size: Tuple[int, int]):
    """crop [left, upper, right, lower] then bilinear-resize to
    (width, height) (reference transforms.py:15-32)."""

    def transform(image: Image.Image) -> Image.Image:
        if target_crop is not None:
            image = image.crop(tuple(target_crop))
        if image.size != tuple(target_size):
            image = image.resize(tuple(target_size), Image.BILINEAR)
        return image

    return transform


def to_array(image: Image.Image) -> np.ndarray:
    """PIL -> (H, W, 3) float32 in [0, 1]."""
    return np.asarray(image, dtype=np.float32) / 255.0


def sample_augmentation_transform(batching_config: Dict, rng=None):
    """Samples one random affine augmentation (rotation about the image
    center + translation + scale, bilinear) applicable to multiple frames
    with the same effect (reference transforms.py:39-64 — present but
    unused by the reference's shipped configs; kept for parity).

    :param batching_config: needs ``rotation_range`` (degrees),
        ``translation_range`` (pixels) and ``scale_range``, each a
        (low, high) pair.
    :param rng: optional ``random.Random`` for reproducibility.
    :return: PIL.Image -> PIL.Image applying the sampled transform.
    """
    import math
    import random as random_mod

    rng = rng or random_mod
    tx = rng.uniform(*batching_config["translation_range"])
    ty = rng.uniform(*batching_config["translation_range"])
    angle = rng.uniform(*batching_config["rotation_range"])
    scale = rng.uniform(*batching_config["scale_range"])

    def transform(image: Image.Image) -> Image.Image:
        # PIL's Image.transform wants the OUTPUT->INPUT (inverse) affine
        # map; this is the torchvision inverse matrix for rotation about
        # the center composed with translation and uniform scale
        # (torchvision.transforms.functional.affine semantics, shear 0).
        cx, cy = image.size[0] * 0.5, image.size[1] * 0.5
        rad = math.radians(angle)
        a = math.cos(rad) / scale
        b = math.sin(rad) / scale
        matrix = [a, b, 0.0, -b, a, 0.0]
        matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty) + cx
        matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty) + cy
        return image.transform(image.size, Image.AFFINE, matrix,
                               resample=Image.BILINEAR)

    return transform


def make_train_transform(crop, target_size) -> Callable[[Image.Image], np.ndarray]:
    """[-1, 1]-normalized transform (reference transforms.py:90-105)."""
    resize = check_and_resize(crop, target_size)

    def transform(image: Image.Image) -> np.ndarray:
        return to_array(resize(image)) * 2.0 - 1.0

    return transform


def make_evaluation_transform(crop, target_size) -> Callable[[Image.Image], np.ndarray]:
    """[0, 1] transform for offline metric computation
    (reference transforms.py:67-87)."""
    resize = check_and_resize(crop, target_size)

    def transform(image: Image.Image) -> np.ndarray:
        return to_array(resize(image))

    return transform


def get_final_transforms(config) -> Dict[str, Callable]:
    """Train/validation/test transforms from a run config
    (reference transforms.py:90-107)."""
    t = make_train_transform(
        config["data"]["crop"],
        config["model"]["representation_network"]["target_input_size"],
    )
    return {"train": t, "validation": t, "test": t}


def get_evaluation_transforms(config) -> Tuple[Callable, Callable]:
    """(reference, generated) transforms from an evaluation config
    (reference transforms.py:67-87)."""
    ref = make_evaluation_transform(
        config["reference_data"]["crop"], config["data"]["target_input_size"])
    gen = make_evaluation_transform(
        config["generated_data"]["crop"], config["data"]["target_input_size"])
    return ref, gen
