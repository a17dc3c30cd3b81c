"""Offline metric computation over (reference, generated) dataset pairs.

Reference: evaluate_dataset.py:22-58.
Usage: python -m playablevideogeneration_tpu.cli.evaluate_dataset \
           --config configs/evaluation/02_breakout.yaml
"""
from __future__ import annotations

import argparse
import os

import yaml

from playablevideogeneration_tpu.config import registry
from playablevideogeneration_tpu.config.configuration import EvaluationConfiguration
from playablevideogeneration_tpu.data.transforms import get_evaluation_transforms
from playablevideogeneration_tpu.data.video_dataset import VideoDataset
from playablevideogeneration_tpu.utils.logging import Logger


def evaluate_dataset(config_dict, **evaluator_kwargs):
    registry._register_defaults()
    logger = Logger(config_dict)

    ref_transform, gen_transform = get_evaluation_transforms(config_dict)
    batching = config_dict["evaluation"]["batching"]
    reference_dataset = VideoDataset(
        config_dict["reference_data"]["data_root"], batching, ref_transform)
    generated_dataset = VideoDataset(
        config_dict["generated_data"]["data_root"], batching, gen_transform)

    # Pretrained metric backbones (LPIPS / FID Inception / FVD I3D / VGG):
    # resolved from config or PVG_PRETRAINED_WEIGHTS; absent backbones
    # degrade to '*_unavailable' markers (docs/PRETRAINED_WEIGHTS.md).
    from playablevideogeneration_tpu.utils import pretrained

    backbones = pretrained.evaluation_backbones(config_dict, logger)
    backbones.update(evaluator_kwargs)

    evaluator_factory = registry.resolve(
        "dataset_evaluator", config_dict["evaluation"]["evaluator"])
    evaluator = evaluator_factory(config_dict, logger, reference_dataset,
                                  generated_dataset, **backbones)
    metrics = evaluator.compute_metrics()

    output_dir = config_dict["logging"]["output_directory"]
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "data.yml")
    with open(out_path, "w") as f:
        yaml.safe_dump(metrics, f)
    logger.print(f"- Wrote metrics to {out_path}")
    return metrics


def main():
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    configuration = EvaluationConfiguration(args.config)
    configuration.check_config()
    configuration.create_directory_structure()
    evaluate_dataset(configuration.get_config())


if __name__ == "__main__":
    main()
