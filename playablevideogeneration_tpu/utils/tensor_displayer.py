"""Action-space visualization: TSNE-projected direction/centroid scatter
plots and action-state trajectory plots.

Reference: utils/tensor_displayer.py:14-167.  Host-side matplotlib +
scikit-learn; saved as images for the logger.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def _get_plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def _project_2d(points: np.ndarray) -> np.ndarray:
    """Projects (N, D) points to 2-D: identity for D<=2, TSNE otherwise
    (reference tensor_displayer.py:50-80)."""
    d = points.shape[-1]
    if d == 1:
        return np.concatenate([points, np.zeros_like(points)], axis=-1)
    if d == 2:
        return points
    from sklearn.manifold import TSNE

    perplexity = min(30.0, max(2.0, points.shape[0] / 4.0))
    return TSNE(n_components=2, perplexity=perplexity,
                init="random", random_state=0).fit_transform(points)


def show_action_directions(estimated_centroids: np.ndarray,
                           action_directions_distribution: np.ndarray,
                           action_probabilities: np.ndarray,
                           filename: str):
    """Scatter of sampled action-direction means colored by the most likely
    action, with centroids overlaid (reference tensor_displayer.py:50-110)."""
    plt = _get_plt()
    if plt is None:
        return
    centroids = np.asarray(estimated_centroids)
    dirs = np.asarray(action_directions_distribution)
    means = dirs.reshape((-1,) + dirs.shape[-2:])[:, 0]  # (N, D)
    probs = np.asarray(action_probabilities).reshape(-1, centroids.shape[0])
    labels = probs.argmax(-1)

    stacked = np.concatenate([means, centroids], axis=0)
    projected = _project_2d(stacked)
    p_means, p_cents = projected[: len(means)], projected[len(means):]

    fig, ax = plt.subplots(figsize=(6, 6))
    scatter = ax.scatter(p_means[:, 0], p_means[:, 1], c=labels, s=8,
                         cmap="tab10", alpha=0.6)
    ax.scatter(p_cents[:, 0], p_cents[:, 1], c=np.arange(len(p_cents)),
               cmap="tab10", marker="X", s=200, edgecolors="black")
    fig.colorbar(scatter, ax=ax, label="action")
    ax.set_title("action direction space")
    fig.savefig(filename)
    plt.close(fig)


def show_action_states(action_states: np.ndarray,
                       action_probabilities: np.ndarray,
                       filename: str, max_sequences: int = 16):
    """Action-state trajectories over time, colored per sequence
    (reference tensor_displayer.py:112-167)."""
    plt = _get_plt()
    if plt is None:
        return
    states = np.asarray(action_states)
    if states.ndim == 4:  # (B, T, 2, D) distribution -> means
        states = states[:, :, 0]
    b = min(states.shape[0], max_sequences)
    fig, ax = plt.subplots(figsize=(6, 6))
    for i in range(b):
        traj = states[i]
        if traj.shape[-1] == 1:
            ax.plot(np.arange(len(traj)), traj[:, 0], alpha=0.7)
        else:
            proj = traj[:, :2]
            ax.plot(proj[:, 0], proj[:, 1], alpha=0.7, marker="o", markersize=2)
    ax.set_title("action state trajectories")
    fig.savefig(filename)
    plt.close(fig)
