"""Evaluation dataset builder.

Reference: evaluation/evaluation_dataset_builder.py:18-158.  Reconstructs
the test set autoregressively with one-hot inferred actions, zero action
variations and the final Gumbel temperature, prepends one ground-truth
frame, renormalizes to [0, 1] and writes a Video-format dataset whose
frame metadata records {model, inferred_action, encoded_action} — the
interchange format consumed by the offline metric pipeline.
"""
from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from playablevideogeneration_tpu.data.loader import DataLoader
from playablevideogeneration_tpu.data.video import Video
from playablevideogeneration_tpu.evaluation.action_sampler import (
    one_hot_action_sampler,
    zero_action_variation_sampler,
)
from playablevideogeneration_tpu.utils.logging import Logger


class EvaluationDatasetBuilder:
    def __init__(self, config, model, dataset, logger: Logger, logger_prefix="test"):
        self.config = config
        self.model = model
        self.dataset = dataset
        self.logger = logger
        b = config["evaluation"]["batching"]
        self.dataloader = DataLoader(dataset, batch_size=b["batch_size"],
                                     shuffle=False, drop_last=False,
                                     num_workers=b["num_workers"])
        self.output_path = config["logging"]["evaluation_dataset_directory"]
        self.ground_truth_observations_init = \
            config["evaluation_dataset"]["ground_truth_observations_init"]
        self.temperature = config["training"]["gumbel_temperature_end"]
        self._jitted = {}

    def _forward(self, variables, observations, actions, rng):
        key = observations.shape[:2]
        if key not in self._jitted:
            model = self.model
            gt_init = self.ground_truth_observations_init
            temp = self.temperature

            def fn(variables, observations, actions, rng):
                return model.apply(
                    variables, observations, actions, gt_init, train=False,
                    gumbel_temperature=jnp.asarray(temp),
                    action_sampler=one_hot_action_sampler,
                    variation_sampler=zero_action_variation_sampler,
                    rngs={"sample": rng})

            self._jitted[key] = jax.jit(fn)
        return self._jitted[key](variables, observations, actions, rng)

    def build(self, variables):
        """Builds and writes the evaluation dataset
        (reference builder.py:37-70)."""
        all_videos: List[Video] = []
        rng = jax.random.PRNGKey(0)
        for batch in self.dataloader:
            rng, sub = jax.random.split(rng)
            obs = jnp.asarray(batch.observations)
            acts = jnp.asarray(batch.actions)
            out = self._forward(variables, obs, acts, sub)

            # Prepend one GT frame and renormalize to [0, 1]
            # (reference builder.py:66-69).
            recon = jnp.concatenate(
                [obs[:, 0:1, ..., 0:3], out.reconstructed_observations], axis=1)
            # Unconditional: inputs are [-1, 1] by the transform contract
            # and the decoder is tanh-bounded.  (A data-dependent
            # `if recon.min() < 0` guard would silently skip renormalizing
            # any all-bright batch and skew FID/FVD/MSE for it.)
            recon = (np.asarray(recon) + 1.0) / 2.0

            all_videos.extend(self._predictions_to_videos(
                recon,
                np.asarray(out.selected_actions),
                np.asarray(out.sampled_action_directions)))

        self._create_dataset(self.output_path, all_videos)
        self.logger.print(
            f"- Wrote {len(all_videos)} evaluation sequences to {self.output_path}")
        return self.output_path

    @staticmethod
    def _predictions_to_videos(images: np.ndarray, actions: np.ndarray,
                               encoded_mus: np.ndarray) -> List[Video]:
        """(reference builder.py:87-136)"""
        images = np.clip(images, 0.0, 1.0)
        images = (images * 255).astype(np.uint8)
        batch_size, sequence_length = images.shape[:2]
        videos = []
        for b in range(batch_size):
            frames = [Image.fromarray(f) for f in images[b]]
            metadata = [
                {"model": "ours", "inferred_action": int(a),
                 "encoded_action": list(map(float, np.atleast_1d(m)))}
                for a, m in zip(actions[b].tolist(), encoded_mus[b].tolist())
            ]
            metadata.append({"model": "ours"})  # last frame has no action
            video = Video().add_content(
                frames, [0] * sequence_length, [0] * sequence_length,
                metadata, [False] * sequence_length)
            videos.append(video)
        return videos

    @staticmethod
    def _create_dataset(path: str, videos: List[Video], extension: str = "png"):
        os.makedirs(path, exist_ok=True)
        for idx, video in enumerate(videos):
            video.save(os.path.join(path, f"{idx:05d}"), extension)


def make_builder(config, model, dataset, logger, **kw) -> EvaluationDatasetBuilder:
    return EvaluationDatasetBuilder(config, model, dataset, logger, **kw)
