"""Structured model outputs.

Replaces the reference's fragile 20-positional-tuple forward results
(reference: model/main_model/model.py:280-287, 462-468) with a named
pytree.  Shapes documented per-field; all are batch-major.
"""
from __future__ import annotations

from typing import List, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class ModelOutput:
    """Outputs of a CADDY forward pass (full or pretraining mode).

    B = batch, T = observations_count, A = actions_count,
    D = action_space_dimension, (h, w) = state resolution.
    """

    # (B, T-1, H, W, 3) highest-resolution reconstructed observations
    reconstructed_observations: jnp.ndarray
    # list over resolutions [(B, T-1, H/2^i, W/2^i, 3)], high-res first
    multiresolution_reconstructed_observations: List[jnp.ndarray]
    # (B, T, h, w, state_features) states of the autoregressive/reconstructed sequence
    reconstructed_states: jnp.ndarray
    # (B, T, h, w, state_features) states of the ground truth observations
    states: jnp.ndarray
    # (B, T-1, h, w, hidden) dynamics-network hidden states
    hidden_states: jnp.ndarray
    # (B, T-1) int action indices selected by sampling
    selected_actions: jnp.ndarray
    # (B, T-1, A) action logits
    action_logits: jnp.ndarray
    # (B, T-1, A) sampled action probability vectors (e.g. gumbel samples)
    action_samples: jnp.ndarray
    # (B, T, 1 ... ) ground-truth attention maps (B, T, h, w, 1)
    attention: jnp.ndarray
    # (B, T-1, 2, D) mean/variance of action directions
    action_directions_distribution: jnp.ndarray
    # (B, T-1, D) sampled action directions
    sampled_action_directions: jnp.ndarray
    # (B, T, 2, D) mean/variance of action states
    action_states_distribution: jnp.ndarray
    # (B, T, D) sampled action states
    sampled_action_states: jnp.ndarray
    # (B, T-1, D) action variation vectors
    action_variations: jnp.ndarray
    # (B, T-1, A) logits re-estimated on the reconstructed sequence
    reconstructed_action_logits: jnp.ndarray
    # (B, T-1, 2, D)
    reconstructed_action_directions_distribution: jnp.ndarray
    # (B, T-1, D)
    reconstructed_sampled_action_directions: jnp.ndarray
    # (B, T, 2, D)
    reconstructed_action_states_distribution: jnp.ndarray
    # (B, T, D)
    reconstructed_sampled_action_states: jnp.ndarray
    # (B, T-1, h, w, 1) attention on the reconstructed sequence (full mode only)
    reconstructed_attention: Optional[jnp.ndarray] = None
    # (B, T, h, w, hidden) hidden states decoded from GT states (pretraining only)
    reconstructed_hidden_states: Optional[jnp.ndarray] = None
