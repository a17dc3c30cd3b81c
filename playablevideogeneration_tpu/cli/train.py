"""Training entry point.

Reference: train.py:21-109.  Usage:
    python -m playablevideogeneration_tpu.cli.train --config configs/02_breakout.yaml
"""
from __future__ import annotations

import argparse
import os

from playablevideogeneration_tpu.config import registry
from playablevideogeneration_tpu.config.configuration import Configuration
from playablevideogeneration_tpu.data.splitter import generate_splits
from playablevideogeneration_tpu.data.transforms import get_final_transforms
from playablevideogeneration_tpu.data.video_dataset import VideoDataset
from playablevideogeneration_tpu.evaluation.action_sampler import (
    make_ground_truth_action_sampler,
    one_hot_action_sampler,
)
from playablevideogeneration_tpu.utils import checkpoint as ckpt_lib
from playablevideogeneration_tpu.utils.logging import Logger


def build_run(config_dict, use_wandb: bool = False, logger=None):
    """Constructs (model, datasets, trainer, evaluators) from a config.

    `logger` substitutes a custom Logger (e.g. the convergence soak's
    metric-recording logger, tools/convergence_soak.py)."""
    registry._register_defaults()
    if logger is None:
        logger = Logger(config_dict, use_wandb=use_wandb)

    model_factory = registry.resolve("model", config_dict["model"]["architecture"])
    model = model_factory(config_dict)

    transforms = get_final_transforms(config_dict)
    splits = generate_splits(config_dict)
    datasets = {}
    for name, (path, batching, allowed) in splits.items():
        datasets[name] = VideoDataset(path, batching, transforms[name],
                                      allowed_videos=allowed)

    trainer_factory = registry.resolve("trainer", config_dict["training"]["trainer"])
    trainer = trainer_factory(config_dict, model, datasets["train"], logger)

    evaluator_factory = registry.resolve(
        "evaluator", config_dict["evaluation"]["evaluator"])
    evaluators = {
        "validation": evaluator_factory(config_dict, model, datasets["validation"],
                                        logger, action_sampler=None,
                                        logger_prefix="validation"),
        # Constructed for API completeness like the reference's unused
        # third evaluator (reference train.py:56-58 builds three, training
        # only ever drives the validation ones, train.py:91-106); callers
        # (e.g. tests, notebooks) can run the test split explicitly.
        "test": evaluator_factory(config_dict, model, datasets["test"], logger,
                                  action_sampler=None, logger_prefix="test"),
    }
    return model, datasets, trainer, evaluators, logger


def train(config_dict, use_wandb: bool = False, max_steps=None):
    """Main training loop (reference train.py:61-109)."""
    model, datasets, trainer, evaluators, logger = build_run(config_dict, use_wandb)

    # Resume if a checkpoint exists (reference train.py:61-65).
    latest = os.path.join(config_dict["logging"]["save_root_directory"], "latest")
    first = datasets["train"][0]
    from playablevideogeneration_tpu.data.video_dataset import collate

    trainer.init_state(collate([first]))
    if ckpt_lib.checkpoint_exists(latest):
        logger.print(f"- Resuming from checkpoint '{latest}'")
        trainer.load_checkpoint()
    else:
        logger.print("- No checkpoint found, starting from scratch")

    if max_steps is None:
        max_steps = config_dict["training"]["max_steps"]
    save_freq = config_dict["training"]["save_freq"]
    eval_freq = config_dict["evaluation"]["eval_freq"]
    last_eval = trainer.global_step
    last_periodic_save = trainer.global_step

    while trainer.global_step < max_steps:
        step_before = trainer.global_step
        trainer.train_epoch(max_steps=max_steps)
        if trainer.global_step == step_before:
            # Zero batches this epoch (dataset smaller than the batch
            # size, or annealing shrank the sample space below it with
            # drop_last): without this guard the while-loop would spin
            # forever, writing a checkpoint per spin.
            raise RuntimeError(
                "train_epoch performed no steps: the train split yields "
                "no full batch at the current sequence length/batch size")
        trainer.state = trainer.state.replace(
            step=trainer.state.step * 0 + trainer.global_step)
        trainer.save_checkpoint()
        if trainer.global_step - last_periodic_save >= save_freq:
            trainer.save_checkpoint(f"checkpoint_{trainer.global_step}")
            last_periodic_save = trainer.global_step

        if eval_freq and trainer.global_step - last_eval >= eval_freq:
            last_eval = trainer.global_step
            variables = trainer.state.variables()
            evaluators["validation"].set_action_sampler(None)
            evaluators["validation"].evaluate(variables, trainer.global_step)
            # Hungarian mapping drives GT-action evaluation
            # (reference train.py:99-106).
            if config_dict["data"]["ground_truth_available"]:
                evaluators["validation"].set_action_sampler(
                    one_hot_action_sampler, label="one_hot")
                evaluators["validation"].evaluate(variables, trainer.global_step,
                                                  save_images=False)
                mapping = evaluators["validation"].get_best_action_mappings()
                evaluators["validation"].set_action_sampler(
                    make_ground_truth_action_sampler(mapping), label="gt_actions")
                evaluators["validation"].evaluate(variables, trainer.global_step,
                                                  save_images=False)
    logger.print("- Training complete")
    return trainer


def main():
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--wandb", action="store_true")
    args = parser.parse_args()

    configuration = Configuration(args.config)
    configuration.check_config()
    configuration.create_directory_structure()
    train(configuration.get_config(), use_wandb=args.wandb)


if __name__ == "__main__":
    main()
