"""Smooth-MI trainer variant.

Reference: training/smooth_mi_trainer.py:12-71 — replaces the MI loss with
the EMA-smoothed joint-matrix estimator and persists the matrix in
checkpoints.  Here the matrix lives in TrainState.mi_matrix, so
checkpointing is automatic; the only difference from the base trainer is
the `smooth_mi` flag.
"""
from __future__ import annotations

from playablevideogeneration_tpu.training.trainer import Trainer


def make_smooth_mi_trainer(config, model, dataset, logger, **kw) -> Trainer:
    return Trainer(config, model, dataset, logger, smooth_mi=True, **kw)
