"""CSV-driven train/val/test split of a video dataset directory.

Reference: dataset/acquisition/train_val_test_split.py (copies video dirs
into train/ val/ test/ subdirectories according to a CSV listing
`video_name,split`).

Usage:
  python -m playablevideogeneration_tpu.data.acquisition.train_val_test_split \
      --input_directory data/x/all --output_directory data/x \
      --splits_csv splits.csv
"""
from __future__ import annotations

import argparse
import csv
import os
import shutil


def train_val_test_split(input_directory: str, output_directory: str,
                         splits_csv: str):
    counters = {"train": 0, "val": 0, "test": 0}
    with open(splits_csv) as f:
        for row in csv.reader(f):
            if len(row) < 2:
                continue
            name, split = row[0].strip(), row[1].strip()
            if split not in counters:
                raise ValueError(f"Unknown split '{split}' for video '{name}'")
            src = os.path.join(input_directory, name)
            if not os.path.isdir(src):
                print(f"- Skipping missing video '{name}'")
                continue
            dst_dir = os.path.join(output_directory, split)
            os.makedirs(dst_dir, exist_ok=True)
            dst = os.path.join(dst_dir, f"{counters[split]:05d}")
            shutil.copytree(src, dst)
            counters[split] += 1
    print(f"Split complete: {counters}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_directory", required=True)
    parser.add_argument("--output_directory", required=True)
    parser.add_argument("--splits_csv", required=True)
    args = parser.parse_args()
    train_val_test_split(args.input_directory, args.output_directory,
                         args.splits_csv)


if __name__ == "__main__":
    main()
