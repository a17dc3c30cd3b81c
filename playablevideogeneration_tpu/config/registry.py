"""Component registry.

The reference composes components by importing the dotted python module named
in the YAML (reference: train.py:38-39,54-58, evaluate_dataset.py:48-50).  A
registry keyed on the same strings keeps those YAML files working while
avoiding runtime importlib reflection.
"""
from __future__ import annotations

from typing import Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Callable]] = {
    "model": {},
    "trainer": {},
    "evaluator": {},
    "builder": {},
    "dataset_evaluator": {},
}


def register(kind: str, name: str):
    def deco(fn):
        _REGISTRIES[kind][name] = fn
        return fn

    return deco


def resolve(kind: str, name: str) -> Callable:
    reg = _REGISTRIES[kind]
    if name in reg:
        return reg[name]
    # Accept both reference-style dotted paths and bare names, e.g.
    # "model.main_model.model" == "main_model" and "training.trainer" == "trainer".
    def shorten(dotted):
        parts = dotted.split(".")
        return parts[-2] if len(parts) >= 3 else parts[-1]

    short = shorten(name)
    for key, fn in reg.items():
        if key == short or shorten(key) == short:
            return fn
    raise KeyError(f"No {kind} registered under '{name}'. Known: {sorted(reg)}")


def _register_defaults():
    """Registers the built-in components lazily to avoid import cycles."""
    from playablevideogeneration_tpu.models.caddy import make_main_model, make_reduced_model
    from playablevideogeneration_tpu.training.trainer import make_trainer
    from playablevideogeneration_tpu.training.smooth_mi import make_smooth_mi_trainer

    _REGISTRIES["model"].setdefault("model.main_model.model", make_main_model)
    _REGISTRIES["model"].setdefault("model.reduced_model.model", make_reduced_model)
    _REGISTRIES["trainer"].setdefault("training.trainer", make_trainer)
    _REGISTRIES["trainer"].setdefault("training.smooth_mi_trainer", make_smooth_mi_trainer)

    try:
        from playablevideogeneration_tpu.evaluation.evaluator import make_evaluator

        _REGISTRIES["evaluator"].setdefault("evaluation.evaluator", make_evaluator)
    except ImportError:  # pragma: no cover - partial builds
        pass
    try:
        from playablevideogeneration_tpu.evaluation.builder import make_builder

        _REGISTRIES["builder"].setdefault(
            "evaluation.evaluation_dataset_builder", make_builder
        )
    except ImportError:  # pragma: no cover
        pass
    try:
        from playablevideogeneration_tpu.evaluation.dataset_evaluator import (
            make_dataset_evaluator,
            make_dataset_evaluator_bair,
            make_dataset_evaluator_breakout,
        )

        _REGISTRIES["dataset_evaluator"].setdefault(
            "evaluation.dataset_evaluator", make_dataset_evaluator
        )
        _REGISTRIES["dataset_evaluator"].setdefault(
            "evaluation.dataset_evaluator_bair", make_dataset_evaluator_bair
        )
        _REGISTRIES["dataset_evaluator"].setdefault(
            "evaluation.dataset_evaluator_breakout", make_dataset_evaluator_breakout
        )
    except ImportError:  # pragma: no cover
        pass
