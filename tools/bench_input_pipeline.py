#!/usr/bin/env python3
"""Input-pipeline throughput benchmark: thread vs process decode.

Measures DataLoader batches/sec (and frames/sec decoded) over the
synthetic dataset for both worker modes, so the host pipeline can be
sized against the device step time before real-data training (the
reference uses multi-process loader workers, training/trainer.py:39).

Usage: python tools/bench_input_pipeline.py [--videos 8] [--size 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--videos", type=int, default=8)
    parser.add_argument("--length", type=int, default=48)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--observations", type=int, default=6)
    parser.add_argument("--workers", type=int, default=max(1, (os.cpu_count() or 2) - 1))
    args = parser.parse_args()

    from playablevideogeneration_tpu.data.loader import DataLoader
    from playablevideogeneration_tpu.data.synthetic import build_synthetic_dataset
    from playablevideogeneration_tpu.data.transforms import make_train_transform
    from playablevideogeneration_tpu.data.video_dataset import VideoDataset

    with tempfile.TemporaryDirectory() as root:
        build_synthetic_dataset(root, videos_per_split=args.videos,
                                length=args.length, height=args.size,
                                width=args.size, actions_count=3, flat=True)
        batching = {"batch_size": args.batch_size,
                    "observations_count": args.observations,
                    "skip_frames": 0, "observation_stacking": 1,
                    "num_workers": args.workers}
        transform = make_train_transform(None, (args.size, args.size))
        dataset = VideoDataset(root, batching, transform)

        results = {}
        for mode in ("thread", "process"):
            loader = DataLoader(dataset, batch_size=args.batch_size,
                                shuffle=True, drop_last=True,
                                num_workers=args.workers, worker_mode=mode)
            # Warm-up epoch populates any lazy caches fairly for both modes.
            for _ in loader:
                pass
            start = time.perf_counter()
            batches = frames = 0
            for batch in loader:
                batches += 1
                frames += batch.observations.shape[0] * batch.observations.shape[1]
            elapsed = time.perf_counter() - start
            results[mode] = {
                "batches_per_sec": round(batches / elapsed, 2),
                "frames_per_sec": round(frames / elapsed, 1),
            }
        results["workers"] = args.workers
        print(json.dumps(results))


if __name__ == "__main__":
    main()
