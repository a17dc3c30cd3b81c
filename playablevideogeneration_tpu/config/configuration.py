"""YAML configuration system.

Keeps the exact YAML schema of the reference so that its config files run
unchanged (reference: utils/configuration.py:8-110, configs/*.yaml).  The
defaulting logic mirrors utils/configuration.py:46-93; component selection by
dotted module path is replaced by a registry (see registry.py) keyed on the
same config strings.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import yaml


class Configuration:
    """Loads, validates and augments a run configuration from a YAML file."""

    def __init__(self, path: Optional[str] = None, config: Optional[Dict] = None):
        if config is None:
            with open(path) as f:
                config = yaml.safe_load(f)
        self.config: Dict[str, Any] = config

    def get_config(self) -> Dict[str, Any]:
        return self.config

    def check_config(self, check_data_root: bool = True) -> bool:
        """Validates the configuration and injects defaults + derived paths.

        Mirrors reference utils/configuration.py:28-93 key-for-key.
        """
        c = self.config

        if check_data_root and not os.path.isdir(c["data"]["data_root"]):
            raise ValueError(f"Data directory {c['data']['data_root']} does not exist")

        log = c["logging"]
        log["output_directory"] = os.path.join(log["output_root"], log["run_name"])
        log["save_root_directory"] = os.path.join(log["save_root"], log["run_name"])
        log["output_images_directory"] = os.path.join(log["output_directory"], "images")
        log["amt_sequences"] = os.path.join(log["output_directory"], "amt_sequences")
        log["interpolated_sequences"] = os.path.join(log["output_directory"], "interpolated_sequences")
        log["evaluation_dataset_directory"] = os.path.join(log["output_directory"], "evaluation_dataset")
        log["evaluation_images_directory"] = os.path.join(log["output_directory"], "evaluation_images")

        # Dataset style: a flat directory with fractional splits, or pre-split
        # train/ val/ test/ subdirectories (reference configuration.py:46-54).
        if "dataset_splits" not in c["data"]:
            c["data"]["dataset_style"] = "splitted"
        else:
            c["data"]["dataset_style"] = "flat"
            if len(c["data"]["dataset_splits"]) != 3:
                raise ValueError("Dataset splits must specify exactly 3 elements")
            if abs(sum(c["data"]["dataset_splits"]) - 1.0) > 1e-6:
                raise ValueError("Dataset splits must sum to 1.0")

        c["data"].setdefault("crop", None)
        c["evaluation"].setdefault("eval_freq", 0)
        c["training"].setdefault("use_motion_weights", False)
        c["training"].setdefault("motion_weights_bias", 0.0)
        c["data"].setdefault("ground_truth_available", True)
        c["training"].setdefault("action_direction_plotting_freq", 1000)
        c["training"].setdefault("action_mutual_information_entropy_lambda", 1.0)
        c["evaluation"].setdefault("max_evaluation_batches", None)
        c["training"].setdefault("max_steps_per_epoch", 10000)
        c["model"]["action_network"].setdefault("use_variations", True)

        # TPU-specific knobs (new to this framework, all optional).
        # An empty `tpu:` YAML block parses as None, not {}.
        if c.get("tpu") is None:
            c["tpu"] = {}
        c["tpu"].setdefault("compute_dtype", "float32")  # or "bfloat16"
        c["tpu"].setdefault("data_parallel_devices", None)  # None = all
        c["tpu"].setdefault("model_parallel", 1)  # tensor-parallel axis size
        c["tpu"].setdefault("tp_min_channels", 256)  # narrower kernels replicate
        c["tpu"].setdefault("donate_state", True)
        c["tpu"].setdefault("prefetch_batches", 2)
        # Rematerialize scan activations (jax.checkpoint over time): ~1/3
        # more forward FLOPs for O(T)-fold less activation memory.
        c["tpu"].setdefault("remat", False)
        # Pretrained backbone weights (see docs/PRETRAINED_WEIGHTS.md):
        # directory of canonical .npz files, or per-backbone path overrides.
        c["tpu"].setdefault("pretrained_weights_dir", None)
        c["tpu"].setdefault("pretrained_weights", {})

        if c["training"]["use_ground_truth_actions"] and not c["data"]["ground_truth_available"]:
            raise ValueError(
                "Requested to use ground truth data, but no annotations are present in the dataset"
            )

        return True

    def create_directory_structure(self):
        log = self.config["logging"]
        for key in (
            "output_directory",
            "save_root_directory",
            "output_images_directory",
            "amt_sequences",
            "interpolated_sequences",
            "evaluation_dataset_directory",
            "evaluation_images_directory",
        ):
            Path(log[key]).mkdir(parents=True, exist_ok=True)


class EvaluationConfiguration:
    """Configuration for the offline evaluation pipeline.

    Mirrors reference utils/evaluation_configuration.py:10-56: pairs a
    reference (ground truth) dataset with a generated dataset.
    """

    def __init__(self, path: Optional[str] = None, config: Optional[Dict] = None):
        if config is None:
            with open(path) as f:
                config = yaml.safe_load(f)
        self.config = config

    def get_config(self) -> Dict[str, Any]:
        return self.config

    def check_config(self, check_data_root: bool = True) -> bool:
        c = self.config
        for key in ("reference_data", "generated_data"):
            if check_data_root and not os.path.isdir(c[key]["data_root"]):
                raise ValueError(f"Data directory {c[key]['data_root']} does not exist")
            c[key].setdefault("crop", None)

        log = c["logging"]
        log["output_directory"] = os.path.join(log["output_root"], log["run_name"])
        c["evaluation"].setdefault("max_evaluation_batches", None)
        c["evaluation"].setdefault("detector", "none")
        # Off by default: the reference constructs the Inception Score but
        # excludes it from the metric run (dataset_evaluator.py:74).
        c["evaluation"].setdefault("compute_inception_score", False)
        c.setdefault("tpu", {})
        c["tpu"].setdefault("pretrained_weights_dir", None)
        c["tpu"].setdefault("pretrained_weights", {})
        return True

    def create_directory_structure(self):
        Path(self.config["logging"]["output_directory"]).mkdir(parents=True, exist_ok=True)
