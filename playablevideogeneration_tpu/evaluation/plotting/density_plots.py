"""Action-space plots: per-action movement densities and mean vectors.

Reference: evaluation/plotting/{density_plot.py:7, density_plot_2d.py:10,
density_plot_2d_merged.py:10, mean_vector_plot_2d.py:10}.  Host-side
matplotlib; degrades to a no-op when matplotlib is unavailable.
"""
from __future__ import annotations

import os
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


def plot_density_1d(actions: np.ndarray, movements: np.ndarray,
                    actions_count: int, output_dir: str):
    """1-D KDE-style histograms of movements per action
    (reference density_plot.py:7)."""
    plt = _get_plt()
    if plt is None:
        return
    movements = np.reshape(movements, (len(actions), -1))
    fig, axes = plt.subplots(1, actions_count, figsize=(4 * actions_count, 3),
                             squeeze=False)
    for a in range(actions_count):
        sel = movements[actions == a]
        ax = axes[0][a]
        if len(sel):
            ax.hist(sel[:, 0], bins=30, density=True, alpha=0.7)
        ax.set_title(f"action {a} (n={len(sel)})")
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "movement_density_1d.pdf"))
    plt.close(fig)


def plot_density_2d(actions: np.ndarray, movements: np.ndarray,
                    actions_count: int, output_dir: str, merged: bool = False):
    """2-D scatter/density of movement vectors per action
    (reference density_plot_2d.py:10, density_plot_2d_merged.py:10)."""
    plt = _get_plt()
    if plt is None or movements.shape[-1] < 2:
        return
    if merged:
        fig, ax = plt.subplots(figsize=(5, 5))
        for a in range(actions_count):
            sel = movements[actions == a]
            if len(sel):
                ax.scatter(sel[:, 0], sel[:, 1], s=4, alpha=0.5, label=f"a{a}")
        ax.legend()
        fig.savefig(os.path.join(output_dir, "movement_density_2d_merged.pdf"))
        plt.close(fig)
    else:
        fig, axes = plt.subplots(1, actions_count, figsize=(4 * actions_count, 4),
                                 squeeze=False)
        for a in range(actions_count):
            sel = movements[actions == a]
            ax = axes[0][a]
            if len(sel):
                ax.scatter(sel[:, 0], sel[:, 1], s=4, alpha=0.5)
            ax.set_title(f"action {a}")
        fig.tight_layout()
        fig.savefig(os.path.join(output_dir, "movement_density_2d.pdf"))
        plt.close(fig)


def plot_mean_vectors(actions: np.ndarray, movements: np.ndarray,
                      actions_count: int, output_dir: str):
    """Mean movement vector per action as arrows from the origin
    (reference mean_vector_plot_2d.py:10)."""
    plt = _get_plt()
    if plt is None or movements.shape[-1] < 2:
        return
    fig, ax = plt.subplots(figsize=(5, 5))
    for a in range(actions_count):
        sel = movements[actions == a]
        if len(sel):
            m = sel.mean(axis=0)
            ax.arrow(0, 0, m[0], m[1], head_width=0.02, length_includes_head=True)
            ax.annotate(f"a{a}", (m[0], m[1]))
    fig.savefig(os.path.join(output_dir, "mean_vectors_2d.pdf"))
    plt.close(fig)


def plot_all(actions: np.ndarray, movements: np.ndarray, actions_count: int,
             output_dir: str):
    os.makedirs(output_dir, exist_ok=True)
    movements = np.atleast_2d(movements)
    if movements.shape[-1] == 1:
        plot_density_1d(actions, movements, actions_count, output_dir)
    else:
        plot_density_2d(actions, movements, actions_count, output_dir)
        plot_density_2d(actions, movements, actions_count, output_dir, merged=True)
        plot_mean_vectors(actions, movements, actions_count, output_dir)
