"""Converts a directory of video files (mp4 etc.) into the on-disk Video
dataset format by extracting frames with ffmpeg.

Reference: dataset/acquisition/convert_video_directory.py:23-129
(ffmpeg frame extraction over a multiprocessing pool).  ffmpeg is
host-side I/O and remains a subprocess; absence is reported clearly.

Usage:
  python -m playablevideogeneration_tpu.data.acquisition.convert_video_directory \
      --video_directory in_dir --output_directory out_dir [--processes 4] [--extension mp4]
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import tempfile
from concurrent.futures import ProcessPoolExecutor

from playablevideogeneration_tpu.data.video import Video


def convert_one(task):
    video_path, output_path, target_size = task
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError("ffmpeg is required for video conversion but was not found")
    with tempfile.TemporaryDirectory() as tmp:
        cmd = [ffmpeg, "-y", "-i", video_path]
        if target_size is not None:
            cmd += ["-vf", f"scale={target_size[0]}:{target_size[1]}"]
        cmd += [os.path.join(tmp, "%05d.png")]
        subprocess.run(cmd, check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        from PIL import Image

        files = sorted(f for f in os.listdir(tmp) if f.endswith(".png"))
        frames = [Image.open(os.path.join(tmp, f)).convert("RGB") for f in files]
        Video().add_content(frames, None, None, None, None).save(output_path)
    return output_path


def convert_video_directory(video_directory: str, output_directory: str,
                            processes: int = 4, extension: str = "mp4",
                            target_size=None):
    os.makedirs(output_directory, exist_ok=True)
    videos = sorted(f for f in os.listdir(video_directory)
                    if f.endswith("." + extension))
    tasks = [
        (os.path.join(video_directory, name),
         os.path.join(output_directory, f"{idx:05d}"), target_size)
        for idx, name in enumerate(videos)
    ]
    if processes <= 1:
        for task in tasks:
            convert_one(task)
    else:
        with ProcessPoolExecutor(max_workers=processes) as pool:
            list(pool.map(convert_one, tasks))
    print(f"Converted {len(tasks)} videos to {output_directory}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--video_directory", required=True)
    parser.add_argument("--output_directory", required=True)
    parser.add_argument("--processes", type=int, default=4)
    parser.add_argument("--extension", default="mp4")
    parser.add_argument("--target_size", type=int, nargs=2, default=None)
    args = parser.parse_args()
    convert_video_directory(args.video_directory, args.output_directory,
                            args.processes, args.extension, args.target_size)


if __name__ == "__main__":
    main()
