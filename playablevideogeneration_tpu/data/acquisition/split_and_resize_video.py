"""Splits long source videos into hour-scale chunks and resizes them.

Reference: dataset/acquisition/split_and_resize_video.py:38-104
(ffmpeg/ffprobe segmenting over a multiprocessing pool).

Usage:
  python -m playablevideogeneration_tpu.data.acquisition.split_and_resize_video \
      --video_path in.mp4 --output_directory out --segment_seconds 3600 \
      [--target_size W H]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess


def probe_duration(video_path: str) -> float:
    ffprobe = shutil.which("ffprobe")
    if ffprobe is None:
        raise RuntimeError("ffprobe is required but was not found")
    out = subprocess.run(
        [ffprobe, "-v", "error", "-show_entries", "format=duration",
         "-of", "default=noprint_wrappers=1:nokey=1", video_path],
        check=True, capture_output=True, text=True)
    return float(out.stdout.strip())


def split_and_resize(video_path: str, output_directory: str,
                     segment_seconds: int = 3600, target_size=None):
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg is required but was not found")
    os.makedirs(output_directory, exist_ok=True)
    cmd = [ffmpeg, "-y", "-i", video_path]
    if target_size is not None:
        cmd += ["-vf", f"scale={target_size[0]}:{target_size[1]}"]
    # Segments carry the SOURCE video's name (reference
    # split_and_resize_video.py:52: '{base_video_name}_{idx:05d}.{ext}'):
    # a generic name would collide across videos staged into one
    # directory, and the annotation CSVs are matched per segment name.
    base = os.path.splitext(os.path.basename(video_path))[0]
    cmd += ["-f", "segment", "-segment_time", str(segment_seconds),
            "-reset_timestamps", "1",
            os.path.join(output_directory, f"{base}_%05d.mp4")]
    subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    segments = sorted(os.listdir(output_directory))
    print(f"Wrote {len(segments)} segments to {output_directory}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_path", required=True)
    parser.add_argument("--output_directory", required=True)
    parser.add_argument("--segment_seconds", type=int, default=3600)
    parser.add_argument("--target_size", type=int, nargs=2, default=None)
    args = parser.parse_args()
    split_and_resize(args.video_path, args.output_directory,
                     args.segment_seconds, args.target_size)


if __name__ == "__main__":
    main()
