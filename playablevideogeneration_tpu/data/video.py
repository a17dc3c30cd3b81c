"""On-disk Video object — format-compatible with the reference.

Reference: dataset/video.py:9-286.  A video is a directory of zero-padded
frame images (``00000.png`` ...) plus four pickles: ``actions.pkl``,
``rewards.pkl``, ``metadata.pkl``, ``dones.pkl``.  Frames are loaded
lazily; images with transparency are flattened onto white.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional

import numpy as np
from PIL import Image

_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp")


class Video:
    """Lazy, on-disk video with per-frame actions/rewards/metadata/dones."""

    def __init__(self):
        self.root: Optional[str] = None
        self.frame_paths: List[str] = []
        self.actions: List[int] = []
        self.rewards: List[float] = []
        self.metadata: List[dict] = []
        self.dones: List[bool] = []
        self.extension = "png"
        self._frames: Optional[List] = None  # in-memory frames when not saved

    # ----------------------------- loading ----------------------------- #

    def load(self, path: str):
        """Loads a video directory (reference video.py:95-134)."""
        if not os.path.isdir(path):
            raise FileNotFoundError(f"Video directory '{path}' does not exist")
        self.root = path

        files = sorted(
            f for f in os.listdir(path)
            if os.path.splitext(f)[1].lower() in _EXTENSIONS
        )
        self.frame_paths = [os.path.join(path, f) for f in files]
        if not self.frame_paths:
            raise ValueError(f"Video directory '{path}' contains no frames")

        count = len(self.frame_paths)
        self.actions = self._load_pickle(path, "actions.pkl", count, default=0)
        self.rewards = self._load_pickle(path, "rewards.pkl", count, default=0.0)
        self.metadata = self._load_pickle(path, "metadata.pkl", count, default={})
        self.dones = self._load_pickle(path, "dones.pkl", count, default=False)
        return self

    @staticmethod
    def _load_pickle(path: str, name: str, count: int, default):
        """Loads a per-frame pickle, coercing None entries to defaults
        (reference video.py:73-93)."""
        file_path = os.path.join(path, name)
        if os.path.isfile(file_path):
            with open(file_path, "rb") as f:
                values = pickle.load(f)
            values = [default if v is None else v for v in values]
            if len(values) < count:
                values = values + [default] * (count - len(values))
            return values[:count]
        return [default] * count

    def get_frames_count(self) -> int:
        if self._frames is not None:
            return len(self._frames)
        return len(self.frame_paths)

    def get_frame_at(self, idx: int) -> Image.Image:
        """Lazily loads a frame, flattening transparency onto white
        (reference video.py:136-174)."""
        if self._frames is not None:
            return self._frames[idx]
        image = Image.open(self.frame_paths[idx])
        if image.mode in ("RGBA", "LA", "P"):
            image = image.convert("RGBA")
            background = Image.new("RGB", image.size, (255, 255, 255))
            background.paste(image, mask=image.split()[-1])
            image = background
        elif image.mode != "RGB":
            image = image.convert("RGB")
        return image

    # ----------------------------- building ---------------------------- #

    def add_content(self, frames: List, actions: List[int], rewards: List[float],
                    metadata: List[dict], dones: List[bool]):
        """Populates the video from in-memory content (reference video.py:34-71).
        Frames may be PIL images or HxWx3 uint8 arrays."""
        self._frames = [
            f if isinstance(f, Image.Image) else Image.fromarray(np.asarray(f))
            for f in frames
        ]
        n = len(self._frames)
        self.actions = list(actions) if actions is not None else [0] * n
        self.rewards = list(rewards) if rewards is not None else [0.0] * n
        self.metadata = list(metadata) if metadata is not None else [{}] * n
        self.dones = list(dones) if dones is not None else [False] * n
        self.actions = [0 if a is None else a for a in self.actions]
        self.rewards = [0.0 if r is None else r for r in self.rewards]
        self.metadata = [{} if m is None else m for m in self.metadata]
        self.dones = [False if d is None else d for d in self.dones]
        return self

    def save(self, path: str, extension: str = "png"):
        """Writes frames + pickles in the reference on-disk format
        (reference video.py:262-286)."""
        os.makedirs(path, exist_ok=True)
        if self._frames is None:
            # Re-saving a loaded video: load frames through the lazy path.
            frames = [self.get_frame_at(i) for i in range(self.get_frames_count())]
        else:
            frames = self._frames
        for i, frame in enumerate(frames):
            frame.save(os.path.join(path, f"{i:05d}.{extension}"))
        for name, values in (
            ("actions.pkl", self.actions),
            ("rewards.pkl", self.rewards),
            ("metadata.pkl", self.metadata),
            ("dones.pkl", self.dones),
        ):
            with open(os.path.join(path, name), "wb") as f:
                pickle.dump(list(values), f)
        self.root = path
        return self

    # ----------------------------- editing ----------------------------- #

    def subsample_split_resize(self, frame_skip: int, output_sequence_length: int,
                               target_size=None) -> List["Video"]:
        """Subsamples by frame_skip, splits into fixed-length chunks and
        optionally resizes (reference video.py:176-228)."""
        indexes = list(range(0, self.get_frames_count(), frame_skip + 1))
        chunks: List[Video] = []
        step = output_sequence_length
        for start in range(0, len(indexes) - step + 1, step):
            sel = indexes[start : start + step]
            frames = []
            for i in sel:
                frame = self.get_frame_at(i)
                if target_size is not None and frame.size != tuple(target_size):
                    frame = frame.resize(tuple(target_size), Image.BILINEAR)
                frames.append(frame)
            video = Video().add_content(
                frames,
                [self.actions[i] for i in sel],
                [self.rewards[i] for i in sel],
                [self.metadata[i] for i in sel],
                [self.dones[i] for i in sel],
            )
            chunks.append(video)
        return chunks
