"""Renumbers video directories by an offset.

Reference: dataset/acquisition/shift_video_ids.py.

Usage:
  python -m playablevideogeneration_tpu.data.acquisition.shift_video_ids \
      --directory data/x/train --offset 100
"""
from __future__ import annotations

import argparse
import os


def shift_video_ids(directory: str, offset: int):
    names = sorted(
        (n for n in os.listdir(directory)
         if os.path.isdir(os.path.join(directory, n)) and n.isdigit()),
        key=int, reverse=offset > 0)
    for name in names:
        new_name = f"{int(name) + offset:05d}"
        os.rename(os.path.join(directory, name), os.path.join(directory, new_name))
    print(f"Shifted {len(names)} videos by {offset}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--directory", required=True)
    parser.add_argument("--offset", type=int, required=True)
    args = parser.parse_args()
    shift_video_ids(args.directory, args.offset)


if __name__ == "__main__":
    main()
