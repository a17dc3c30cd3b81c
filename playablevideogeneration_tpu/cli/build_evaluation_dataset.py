"""Builds the evaluation dataset from a trained checkpoint.

Reference: build_evaluation_dataset.py:21-68.
Usage: python -m playablevideogeneration_tpu.cli.build_evaluation_dataset \
           --config configs/02_breakout.yaml
"""
from __future__ import annotations

import argparse

from playablevideogeneration_tpu.config import registry
from playablevideogeneration_tpu.config.configuration import Configuration
from playablevideogeneration_tpu.data.splitter import generate_splits
from playablevideogeneration_tpu.data.transforms import get_final_transforms
from playablevideogeneration_tpu.data.video_dataset import VideoDataset, collate
from playablevideogeneration_tpu.utils.logging import Logger


def build_evaluation_dataset(config_dict, reference_checkpoint: str = None):
    registry._register_defaults()
    logger = Logger(config_dict)

    model_factory = registry.resolve("model", config_dict["model"]["architecture"])
    model = model_factory(config_dict)

    transforms = get_final_transforms(config_dict)
    splits = generate_splits(config_dict)
    path, batching, allowed = splits["test"]
    test_dataset = VideoDataset(path, batching, transforms["test"],
                                allowed_videos=allowed)

    # Trainer only to restore the checkpointed variables
    # (reference build_evaluation_dataset.py:54-62).
    trainer_factory = registry.resolve("trainer", config_dict["training"]["trainer"])
    trainer = trainer_factory(config_dict, model, test_dataset, logger)
    trainer.init_state(collate([test_dataset[0]]))
    if reference_checkpoint:
        trainer.load_reference_weights(reference_checkpoint)
    else:
        trainer.load_checkpoint()
        logger.print(f"- Loaded checkpoint at step {trainer.global_step}")

    builder_factory = registry.resolve(
        "builder", config_dict["evaluation_dataset"]["builder"])
    builder = builder_factory(config_dict, model, test_dataset, logger)
    return builder.build(trainer.state.variables())


def main():
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--reference-checkpoint", type=str, default=None,
                        help="import weights from a reference .pth.tar "
                             "(released CADDY checkpoints) instead of an "
                             "orbax checkpoint")
    args = parser.parse_args()
    configuration = Configuration(args.config)
    configuration.check_config()
    configuration.create_directory_structure()
    build_evaluation_dataset(configuration.get_config(),
                             reference_checkpoint=args.reference_checkpoint)


if __name__ == "__main__":
    main()
