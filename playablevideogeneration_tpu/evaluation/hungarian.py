"""Hungarian matching of predicted vs ground-truth action labels.

Reference: evaluation/evaluator.py:438-494 (sklearn's removed
linear_assignment).  Host-side scipy implementation.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment


def hungarian_match(predictions: np.ndarray, ground_truth: np.ndarray,
                    actions_count: int) -> List[Tuple[int, int]]:
    """Best (model_action, ground_truth_action) assignment maximizing
    agreement counts (reference evaluator.py:466-494)."""
    num_correct = np.zeros((actions_count, actions_count))
    for c1 in range(actions_count):
        for c2 in range(actions_count):
            num_correct[c1, c2] = int(((predictions == c1) & (ground_truth == c2)).sum())
    rows, cols = linear_sum_assignment(len(ground_truth) - num_correct)
    return list(zip(rows.tolist(), cols.tolist()))


def compute_actions_accuracy(predictions: np.ndarray, ground_truth: np.ndarray,
                             actions_count: int) -> Tuple[float, Dict[int, int]]:
    """Accuracy of the best mapping + the ground-truth -> model-action map
    used to drive GroundTruthActionSampler evaluation
    (reference evaluator.py:438-463, train.py:99-106)."""
    predictions = np.asarray(predictions).reshape(-1)
    ground_truth = np.asarray(ground_truth).reshape(-1)
    match = hungarian_match(predictions, ground_truth, actions_count)

    reordered = np.zeros_like(predictions)
    for pred_i, target_i in match:
        reordered[predictions == pred_i] = target_i
    accuracy = float((reordered == ground_truth).mean()) if len(ground_truth) else 0.0

    gt_to_model = {gt: int(model) for model, gt in match}
    return accuracy, gt_to_model
