"""Standalone path-based FID tool.

Equivalent of the reference's `python -m pytorch_fid path1 path2` CLI
(reference pytorch_fid/fid_score.py:217-251): each path is either a
directory of ``*.jpg`` / ``*.jpeg`` / ``*.png`` images or a ``.npz``
statistics file with ``mu`` / ``sigma`` arrays; prints ``FID:  <value>``.

Extras over the reference CLI:
  --save-stats  treat the SECOND path as an output ``.npz`` and write the
                first path's activation statistics there instead of
                computing a distance (useful to cache the reference-set
                statistics once).

The InceptionV3 FID backbone is the JAX rebuild in
``evaluation/metrics/inception.py``; weights resolve exactly like the
offline evaluator's (``tpu.pretrained_weights`` config /
``PVG_PRETRAINED_WEIGHTS`` env / ``--weights``), see
docs/PRETRAINED_WEIGHTS.md.

Usage:
    python -m playablevideogeneration_tpu.cli.fid path_a path_b
    python -m playablevideogeneration_tpu.cli.fid --save-stats path_a out.npz
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Iterator, List

import numpy as np

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp")


def list_images(directory: str) -> List[str]:
    files = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.lower().endswith(IMAGE_EXTENSIONS))
    if not files:
        raise SystemExit(f"No images ({'/'.join(IMAGE_EXTENSIONS)}) in "
                         f"'{directory}'")
    return files


def iter_image_batches(files: List[str], batch_size: int,
                       quiet: bool = False) -> Iterator[np.ndarray]:
    """Yields (N, H, W, 3) float32 [0, 1] batches (reference
    fid_score.py:76-121 feeds ToTensor()-scaled images, no resize — the
    Inception wrapper resizes to 299 internally).  A batch breaks early
    when the next image's resolution differs, so mixed-size directories
    work at the cost of smaller batches."""
    from PIL import Image

    batch: List[np.ndarray] = []
    for i, path in enumerate(files):
        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
        if batch and img.shape != batch[0].shape:
            yield np.stack(batch)
            batch = []
        batch.append(img)
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
        if not quiet and (i + 1) % (batch_size * 4) == 0:
            print(f"  {i + 1}/{len(files)} images", file=sys.stderr)
    if batch:
        yield np.stack(batch)


def statistics_of_path(path: str, extractor, batch_size: int, quiet: bool):
    """mu/sigma for one input path (reference fid_score.py:203-215)."""
    from playablevideogeneration_tpu.evaluation.metrics.fid import (
        compute_statistics_from_frames,
    )

    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    return compute_statistics_from_frames(
        extractor, iter_image_batches(list_images(path), batch_size, quiet))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("path", nargs=2,
                        help="two image directories and/or .npz statistics files")
    parser.add_argument("--batch-size", type=int, default=50)
    parser.add_argument("--weights", default=None,
                        help="fid_inception.npz path (default: resolve via "
                             "PVG_PRETRAINED_WEIGHTS / tpu config)")
    parser.add_argument("--save-stats", action="store_true",
                        help="write path1's statistics to path2 (.npz) "
                             "instead of computing FID")
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    from playablevideogeneration_tpu.utils import pretrained

    config = {"tpu": {"pretrained_weights": {"fid_inception": args.weights}}} \
        if args.weights else {}
    extractor = pretrained.get_fid_extractor(config)
    needs_model = args.save_stats or any(
        not p.endswith(".npz") for p in args.path)
    if extractor is None and needs_model:
        raise SystemExit(
            "No FID InceptionV3 weights found — pass --weights or set "
            "PVG_PRETRAINED_WEIGHTS (docs/PRETRAINED_WEIGHTS.md); FID over "
            "random features would be meaningless.")

    if args.save_stats:
        src, dst = args.path
        if not dst.endswith(".npz"):
            raise SystemExit("--save-stats output path must end in .npz")
        mu, sigma = statistics_of_path(src, extractor, args.batch_size,
                                       args.quiet)
        os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
        np.savez(dst, mu=mu, sigma=sigma)
        print(f"Saved statistics of {src} to {dst}")
        return

    for p in args.path:
        if not os.path.exists(p):
            raise SystemExit(f"Invalid path: {p}")
    from playablevideogeneration_tpu.evaluation.metrics.fid import (
        fid_from_statistics,
    )

    mu1, s1 = statistics_of_path(args.path[0], extractor, args.batch_size,
                                 args.quiet)
    mu2, s2 = statistics_of_path(args.path[1], extractor, args.batch_size,
                                 args.quiet)
    print("FID: ", fid_from_statistics(mu1, s1, mu2, s2))


if __name__ == "__main__":
    main()
