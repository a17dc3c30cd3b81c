"""Sequence dataset over a directory of Video directories.

Reference: dataset/video_dataset.py:14-149.  A sample is
``observations_count`` observations spaced ``skip_frames + 1`` apart; each
observation stacks ``observation_stacking`` frames going back in time,
clamped at the sequence start.  ``set_observations_count`` re-derives the
sample index space mid-training (sequence-length annealing).

This is a host-side component: it returns numpy arrays in NHWC layout,
ready for device transfer by the loader.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Set

import numpy as np

from playablevideogeneration_tpu.data.video import Video


@dataclass
class SequenceSample:
    """One dataset element, pre-collation."""

    observations: np.ndarray  # (T, H, W, 3*stacking) float32, frames newest-first
    actions: np.ndarray  # (T,) int32
    rewards: np.ndarray  # (T,) float32
    dones: np.ndarray  # (T,) bool
    video: Video
    initial_frame_index: int


class VideoDataset:
    def __init__(self, path: str, batching_config: Dict, transform,
                 allowed_videos: Optional[Set[str]] = None):
        """
        :param path: root directory containing one Video directory per child
        :param batching_config: dict with observations_count,
            observation_stacking, skip_frames keys (reference schema)
        :param transform: callable PIL.Image -> (H, W, 3) float32 ndarray
        :param allowed_videos: optional allowlist of child names
        """
        if not os.path.isdir(path):
            raise FileNotFoundError(f"Dataset directory '{path}' is not a directory")
        self.path = path
        self.batching_config = batching_config
        self.observation_stacking = batching_config["observation_stacking"]
        self.skip_frames = batching_config["skip_frames"]
        self.transform = transform

        self.all_videos = self._read_all_videos(path, allowed_videos)
        self.observations_count: Optional[int] = None
        self.set_observations_count(batching_config["observations_count"])

    @staticmethod
    def _read_all_videos(path: str, allowed: Optional[Set[str]]) -> List[Video]:
        videos = []
        contents = sorted(os.listdir(path))
        if allowed is None:
            allowed = set(contents)
        for name in contents:
            full = os.path.join(path, name)
            if os.path.isdir(full) and name in allowed:
                videos.append(Video().load(full))
        if not videos:
            raise ValueError(f"No videos found under '{path}'")
        return videos

    def set_observations_count(self, observations_count: int):
        """Re-derives the sample index space for a new sequence length
        (reference video_dataset.py:49-62)."""
        if self.observations_count == observations_count:
            return
        self.observations_count = observations_count
        block = observations_count + (observations_count - 1) * self.skip_frames
        self.available_samples_list = [
            max(v.get_frames_count() - block + 1, 0) for v in self.all_videos
        ]
        self._cumulative = np.cumsum([0] + self.available_samples_list)
        self.total_available_samples = int(self._cumulative[-1])

    def __len__(self) -> int:
        return self.total_available_samples

    def __getitem__(self, index: int) -> SequenceSample:
        if index < 0:  # list semantics; bare negatives would otherwise
            index += self.total_available_samples  # index a garbage sample
        if not 0 <= index < self.total_available_samples:
            raise IndexError(index)
        # O(log n) index -> (video, start frame) versus the reference's
        # linear scan (video_dataset.py:119-126).
        video_index = int(np.searchsorted(self._cumulative, index, side="right") - 1)
        video_initial_frame = index - int(self._cumulative[video_index])
        video = self.all_videos[video_index]

        stride = self.skip_frames + 1
        observation_indexes = [video_initial_frame + i * stride
                               for i in range(self.observations_count)]
        # The minimum frame whose predecessor would fall outside the video
        # (reference video_dataset.py:130-131).
        min_frame = video_initial_frame % stride

        frames_cache: Dict[int, np.ndarray] = {}

        def frame(i: int) -> np.ndarray:
            if i not in frames_cache:
                frames_cache[i] = self.transform(video.get_frame_at(i))
            return frames_cache[i]

        observations = []
        for obs_index in observation_indexes:
            stack = [frame(max(obs_index - k * stride, min_frame))
                     for k in range(self.observation_stacking)]
            observations.append(np.concatenate(stack, axis=-1))

        actions = np.asarray([video.actions[i] for i in observation_indexes], np.int32)
        rewards = np.asarray(
            [sum(video.rewards[max(i - self.skip_frames, 0): i + 1])
             for i in observation_indexes], np.float32)
        dones = np.asarray([video.dones[i] for i in observation_indexes], bool)

        return SequenceSample(
            observations=np.stack(observations, axis=0).astype(np.float32),
            actions=actions, rewards=rewards, dones=dones,
            video=video, initial_frame_index=video_initial_frame)


@dataclass
class Batch:
    """Collated batch (reference dataset/batching.py:44-95), NHWC layout."""

    observations: np.ndarray  # (B, T, H, W, 3*stacking)
    actions: np.ndarray  # (B, T)
    rewards: np.ndarray  # (B, T)
    dones: np.ndarray  # (B, T)
    videos: List[Video]
    initial_frames: List[int]

    def to_tuple(self):
        return self.observations, self.actions, self.rewards, self.dones


def collate(samples: Sequence[SequenceSample]) -> Batch:
    return Batch(
        observations=np.stack([s.observations for s in samples]),
        actions=np.stack([s.actions for s in samples]),
        rewards=np.stack([s.rewards for s in samples]),
        dones=np.stack([s.dones for s in samples]),
        videos=[s.video for s in samples],
        initial_frames=[s.initial_frame_index for s in samples],
    )
