"""Annealing schedules, pure functions of the global step.

Reference: training/trainer.py:124-165 (ground-truth-observation count,
Gumbel temperature, sequence length) and trainer.py:37 (MultiStepLR).
All are host-side scalar computations; the first two feed the jitted step
as *traced* scalars, so annealing never recompiles.  Sequence length
changes batch shapes and therefore selects among a small set of compiled
programs (one per length; reference anneals 7..12).
"""
from __future__ import annotations

import math

import optax


def ground_truth_observations_count(step: int, start: int, end: int,
                                    anneal_steps: int) -> int:
    """ceil(linear anneal start -> end), floored at `end`
    (reference trainer.py:124-137)."""
    value = start - (start - end) * step / anneal_steps
    return max(end, math.ceil(value))


def gumbel_temperature(step: int, start: float, end: float,
                       anneal_steps: int) -> float:
    """Linear anneal start -> end, floored at `end`
    (reference trainer.py:139-150)."""
    value = start - (start - end) * step / anneal_steps
    return max(end, value)


def observations_count(step: int, start: int, end: int, anneal_steps: int) -> int:
    """floor(linear anneal start -> end), capped at `end`
    (reference trainer.py:152-165)."""
    value = start + (end - start) * step / anneal_steps
    return min(end, math.floor(value))


def multistep_lr(base_lr: float, milestones, gamma: float):
    """torch MultiStepLR equivalent: lr * gamma^(milestones passed).

    Reference configs use a sentinel milestone of 1e10 ("never"); clamp to
    int32 range since optax schedules index with int32 step counters."""
    max_step = 2**31 - 2
    boundaries = {int(m): gamma for m in milestones if int(m) < max_step}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(config):
    """Adam with torch-style L2 weight decay added to the raw gradient
    before the moment updates (torch Adam(weight_decay=...) semantics,
    reference trainer.py:36), plus MultiStepLR (trainer.py:37).

    Returns (optimizer, lr_schedule): the schedule instance embedded in
    the optimizer is exposed so callers log the lr actually applied
    instead of rebuilding a parallel copy that could drift."""
    t = config["training"]
    schedule = multistep_lr(t["learning_rate"], t["lr_schedule"], t["lr_gamma"])
    tx = optax.chain(
        optax.add_decayed_weights(t["weight_decay"]),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
    return tx, schedule
