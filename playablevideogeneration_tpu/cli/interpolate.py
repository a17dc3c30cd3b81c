"""Action-interpolation rollouts.

Reference: interpolate.py:32-161 — for interpolation factors between two
actions, generates fixed-length sequences via centroid-line variation
vectors and saves them per factor.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from playablevideogeneration_tpu.cli.play import load_play_session, save_session
from playablevideogeneration_tpu.config.configuration import Configuration
from playablevideogeneration_tpu.inference.play_session import frame_to_uint8


def interpolate(config_dict, first_action: int, second_action: int,
                factors=None, frames_per_sequence: int = 10):
    """Generates one sequence per interpolation factor
    (reference interpolate.py:110-157)."""
    if factors is None:
        factors = [i / 10.0 for i in range(11)]
    session, observation, logger = load_play_session(config_dict)
    output_dir = config_dict["logging"]["interpolated_sequences"]

    for factor in factors:
        session.start(observation)
        frames = []
        for _ in range(frames_per_sequence):
            frame = session.generate_next_interpolation(
                first_action, second_action, factor)
            frames.append(frame)
        seq_dir = os.path.join(
            output_dir, f"interp_{first_action}_{second_action}_{factor:.1f}")
        # One action PER FRAME (the overlay/session writers zip frames
        # with actions): every frame of this sequence used the factor's
        # selected action (reference model.py:631-637 selection rule).
        selected = second_action if factor > 0.5 else first_action
        save_session(frames, [selected] * len(frames), seq_dir, logger)
    logger.print(f"- Interpolations written to {output_dir}")


def main():
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--first-action", type=int, required=True)
    parser.add_argument("--second-action", type=int, required=True)
    parser.add_argument("--frames", type=int, default=10)
    args = parser.parse_args()

    configuration = Configuration(args.config)
    configuration.check_config()
    configuration.create_directory_structure()
    interpolate(configuration.get_config(), args.first_action,
                args.second_action, frames_per_sequence=args.frames)


if __name__ == "__main__":
    main()
