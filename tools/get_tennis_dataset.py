#!/usr/bin/env python3
"""Tennis dataset acquisition pipeline orchestration.

Python port of the reference's get_tennis_dataset.sh:1-33: download the
two Wimbledon source videos, split into segments, extract annotated
sequences, split train/val/test, and fix eval sequence lengths — all via
the acquisition CLIs under playablevideogeneration_tpu/data/acquisition/.

Requires network access, a YouTube downloader (yt-dlp or youtube-dl) and
ffmpeg on PATH; each stage is skipped if its output already exists so the
pipeline is resumable.
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEOS = {
    "djokovic_federer_wimbledon": "https://www.youtube.com/watch?v=TUikJi0Qhhw",
    "nadal_kyrgios_wimbledon": "https://www.youtube.com/watch?v=T4S5YmO0KOU",
}


def _downloader():
    for tool in ("yt-dlp", "youtube-dl"):
        if shutil.which(tool):
            return tool
    raise SystemExit("yt-dlp or youtube-dl is required on PATH "
                     "(reference get_tennis_dataset.sh:7-8)")


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="tmp")
    parser.add_argument("--output", default="data/tennis_v4_256_ours")
    parser.add_argument("--annotations", default="data/tennis_annotations",
                        help="directory with the per-segment CSV annotations")
    args = parser.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    # 1. Download the source videos (get_tennis_dataset.sh:6-12).
    tool = _downloader()
    for name, url in VIDEOS.items():
        target = os.path.join(args.workdir, f"{name}.mp4")
        if not os.path.isfile(target):
            run([tool, "-f", "137", "-o", target, url])

    # 2. Split into shorter segments (get_tennis_dataset.sh:15-18).
    # Segments are named {video}_{idx:05d}.mp4 (reference
    # split_and_resize_video.py:52), so the two videos can share one
    # directory and the annotation CSVs match per segment name.  The
    # skip marker is a per-video .done sentinel written only after ALL of
    # this video's segments landed in the final location: a crash anywhere
    # mid-stage (split or partial move) re-runs the stage idempotently
    # (ffmpeg -y overwrites; re-moves overwrite partial copies).
    segments_dir = os.path.join(args.workdir, "segments")
    os.makedirs(segments_dir, exist_ok=True)
    for name in VIDEOS:
        sentinel = os.path.join(segments_dir, f".{name}.done")
        if os.path.isfile(sentinel):
            continue
        splits_dir = os.path.join(args.workdir, f"{name}_splits")
        run([sys.executable, "-m",
             "playablevideogeneration_tpu.data.acquisition.split_and_resize_video",
             "--video_path", os.path.join(args.workdir, f"{name}.mp4"),
             "--output_directory", splits_dir])
        for f in os.listdir(splits_dir):
            dst = os.path.join(segments_dir, f)
            if os.path.exists(dst):
                os.remove(dst)
            shutil.move(os.path.join(splits_dir, f), dst)
        with open(sentinel, "w") as fh:
            fh.write("ok\n")

    staged = os.path.join(args.workdir, "tennis_v4_256_ours")
    # 3. Extract annotated sequences (get_tennis_dataset.sh:21).
    if not os.path.isdir(staged):
        run([sys.executable, "-m",
             "playablevideogeneration_tpu.data.acquisition."
             "convert_annotated_video_directory",
             "--video_directory", segments_dir,
             "--annotations_directory", args.annotations,
             "--output_directory", staged, "--target_size", "256", "96"])

    # Steps 4-6 gate on the FINAL output too: step 6 moves the staged
    # directories away, so staged-only skip markers would re-run the
    # split after a successful run and crash on the leftovers.
    def done(dst):
        return os.path.isdir(os.path.join(args.output, dst))

    # 4. Train/val/test split (get_tennis_dataset.sh:23).
    if not os.path.isdir(os.path.join(staged, "train")) and not done("train"):
        run([sys.executable, "-m",
             "playablevideogeneration_tpu.data.acquisition.train_val_test_split",
             "--input_directory", staged, "--output_directory", staged,
             "--splits_csv", os.path.join(args.annotations, "splits.csv")])

    # 5. Fixed-length val/test sequences (get_tennis_dataset.sh:25).
    for split in ("val", "test"):
        fixed = os.path.join(staged, f"{split}_fixed_length")
        if not os.path.isdir(fixed) and not done(split):
            run([sys.executable, "-m",
                 "playablevideogeneration_tpu.data.acquisition."
                 "subsample_videos_and_make_fixed_length",
                 "--input_directory", os.path.join(staged, split),
                 "--output_directory", fixed])

    # 6. Final layout (get_tennis_dataset.sh:27-31).
    os.makedirs(args.output, exist_ok=True)
    moves = {"train": "train", "val_fixed_length": "val",
             "test_fixed_length": "test"}
    for src, dst in moves.items():
        target = os.path.join(args.output, dst)
        if not os.path.isdir(target):
            shutil.move(os.path.join(staged, src), target)
    print(f"Tennis dataset ready at {args.output}")


if __name__ == "__main__":
    main()
