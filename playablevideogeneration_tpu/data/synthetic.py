"""Synthetic "moving square" dataset.

A deterministic action-conditioned video generator used as a test fixture
and smoke-train workload: a colored square moves on a background under
discrete actions (left / right / stay or + up / down).  Written in the
reference's on-disk Video format so the full data pipeline, training and
evaluation stack run end-to-end without real data (SURVEY.md §4 test plan).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from playablevideogeneration_tpu.data.video import Video

_ACTION_DELTAS = [(0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)]


def make_moving_square_video(
    length: int,
    height: int = 48,
    width: int = 48,
    square: int = 8,
    actions_count: int = 3,
    seed: int = 0,
    step_pixels: int = 3,
    fixed_y: Optional[int] = None,
) -> Video:
    """Generates one video with per-frame ground-truth actions.

    ``fixed_y`` pins the square's row globally (breakout-style: the
    reference's breakout platform moves on one fixed row).  Without it,
    3-action (x-only) videos each carry a random constant y — a nuisance
    stratum a 1-D direction latent can legally sign-flip across, which
    caps Hungarian accuracy near 50% on the moving classes."""
    rng = np.random.default_rng(seed)
    x = int(rng.integers(0, width - square))
    y = int(rng.integers(0, height - square)) if fixed_y is None else fixed_y
    frames, actions, rewards, metadata, dones = [], [], [], [], []
    for t in range(length):
        # Reference action convention (gym-style recordings): actions[t]
        # is taken AT frame t and causes the transition to frame t+1 —
        # the in-training evaluator's Hungarian accuracy labels
        # transitions with actions[:, :-1] (reference evaluator.py:207),
        # and the GT-action sampler feeds actions[t] to transition t.
        # (An earlier version recorded the action on the frame it moved
        # INTO, shifting every accuracy label by one step — iid actions
        # made the metric read ~chance no matter how good the model.)
        frame = np.full((height, width, 3), 32, dtype=np.uint8)
        frame[y : y + square, x : x + square] = (220, 60, 60)
        action = int(rng.integers(0, actions_count))
        frames.append(frame)
        actions.append(action)
        rewards.append(0.0)
        metadata.append({"state": [float(x), float(y)]})
        dones.append(t == length - 1)
        dx, dy = _ACTION_DELTAS[action % len(_ACTION_DELTAS)]
        x = int(np.clip(x + dx * step_pixels, 0, width - square))
        y = int(np.clip(y + dy * step_pixels, 0, height - square))
    return Video().add_content(frames, actions, rewards, metadata, dones)


def build_synthetic_dataset(
    root: str,
    videos_per_split: int = 3,
    length: int = 32,
    height: int = 48,
    width: int = 48,
    actions_count: int = 3,
    seed: int = 0,
    flat: bool = False,
    square: int = 8,
    step_pixels: int = 3,
    fixed_y: Optional[int] = None,
) -> str:
    """Writes a splitted (train/ val/ test/) or flat synthetic dataset."""
    splits = [""] if flat else ["train", "val", "test"]
    idx = 0
    for split in splits:
        split_dir = os.path.join(root, split) if split else root
        os.makedirs(split_dir, exist_ok=True)
        for v in range(videos_per_split):
            video = make_moving_square_video(
                length=length, height=height, width=width,
                actions_count=actions_count, seed=seed + idx,
                square=square, step_pixels=step_pixels, fixed_y=fixed_y)
            video.save(os.path.join(split_dir, f"{idx:05d}"))
            idx += 1
    return root


def make_synthetic_config(
    data_root: str,
    output_root: str,
    height: int = 48,
    width: int = 48,
    actions_count: int = 3,
    batch_size: int = 2,
    observations_count: int = 5,
    observation_stacking: int = 2,
    hidden_state_size: int = 16,
    state_features: int = 16,
    pretraining_steps: int = 2,
    max_steps: int = 6,
    action_space_dimension: int = 2,
) -> dict:
    """A minimal-but-complete run config for the synthetic dataset,
    following the reference YAML schema (configs/02_breakout.yaml)."""
    return {
        "logging": {
            "run_name": "synthetic",
            "output_root": os.path.join(output_root, "results"),
            "save_root": os.path.join(output_root, "checkpoints"),
        },
        "data": {
            "data_root": data_root,
            "crop": None,
            "actions_count": actions_count,
            "ground_truth_available": True,
        },
        "model": {
            "architecture": "model.reduced_model.model",
            "representation_network": {
                "target_input_size": [width, height],
                "state_features": state_features,
                "state_resolution": [height // 8, width // 8],
            },
            "dynamics_network": {
                "hidden_state_size": hidden_state_size,
                "embedding_mlp_size": 16,
                "random_noise_size": 4,
            },
            "rendering_network": {
                "input_shape": [hidden_state_size, height // 8, width // 8],
            },
            "action_network": {
                "use_gumbel": True,
                "hard_gumbel": False,
                "ensamble_size": 1,
                "gumbel_temperature": 1.0,
                # The reference uses 1 for 1-D motion (breakout,
                # 02_breakout.yaml:56) and 2 for 2-D motion (tennis).
                "action_space_dimension": action_space_dimension,
            },
            "centroid_estimator": {"alpha": 0.1},
        },
        "training": {
            "trainer": "training.smooth_mi_trainer",
            "use_ground_truth_actions": False,
            "learning_rate": 0.0004,
            "weight_decay": 0.000001,
            "pretraining_steps": pretraining_steps,
            "pretraining_detach": False,
            "lr_schedule": [300000, 10000000000],
            "lr_gamma": 0.3333,
            "max_steps": max_steps,
            "save_freq": 1000,
            "ground_truth_observations_start": 4,
            "ground_truth_observations_end": 2,
            "ground_truth_observations_steps": 4,
            "gumbel_temperature_start": 1.0,
            "gumbel_temperature_end": 0.4,
            "gumbel_temperature_steps": 4,
            "mutual_information_estimation_alpha": 0.2,
            "batching": {
                "batch_size": batch_size,
                "observations_count": observations_count,
                "observations_count_start": observations_count,
                "observations_count_steps": 10,
                "skip_frames": 0,
                "observation_stacking": observation_stacking,
                "num_workers": 1,
            },
            "loss_weights": {
                "reconstruction_loss_lambda": 1.0,
                "reconstruction_loss_lambda_pretraining": 1.0,
                "perceptual_loss_lambda": 1.0,
                "perceptual_loss_lambda_pretraining": 1.0,
                "action_divergence_lambda": 0.0,
                "action_divergence_lambda_pretraining": 0.0,
                "states_rec_lambda": 0.2,
                "states_rec_lambda_pretraining": 0.2,
                "hidden_states_rec_lambda_pretraining": 1.0,
                "entropy_lambda": 0.0,
                "entropy_lambda_pretraining": 0.0,
                "action_directions_kl_lambda": 0.0001,
                "action_directions_kl_lambda_pretraining": 0.0001,
                "action_mutual_information_lambda": 0.15,
                "action_mutual_information_lambda_pretraining": 0.15,
                "action_state_distribution_kl_lambda": 0.0,
                "action_state_distribution_kl_lambda_pretraining": 0.0,
            },
            "action_direction_plotting_freq": 1000000,
        },
        "evaluation": {
            "evaluator": "evaluation.evaluator",
            "max_evaluation_batches": 2,
            "eval_freq": 1000000,
            "batching": {
                "batch_size": 2,
                "observations_count": 6,
                "skip_frames": 0,
                "observation_stacking": observation_stacking,
                "num_workers": 1,
            },
        },
        "evaluation_dataset": {
            "ground_truth_observations_init": 2,
            "builder": "evaluation.evaluation_dataset_builder",
        },
    }
