"""Action network A: state sequence -> discrete action posterior.

Reference: model/main_model/action_network.py:9-118.
Attention-weighted states -> two residual blocks (x2 channels, /2 spatial)
-> global average pool -> (mean, |variance|) posterior per frame in the
action latent space; action directions = successor - predecessor Gaussians
(mean difference, variance sum); reparameterized samples of the direction
are classified into `actions_count` logits by a final linear layer.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from playablevideogeneration_tpu.models.layers import ResidualBlock
from playablevideogeneration_tpu.utils import tensor_ops as tops


def reparameterized_sample(key: jax.Array, mean: jnp.ndarray, variance: jnp.ndarray) -> jnp.ndarray:
    """noise * sqrt(variance) + mean (reference action_network.py:36-48)."""
    noise = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    return noise * jnp.sqrt(variance) + mean


class ActionNetwork(nn.Module):
    state_features: int
    actions_count: int
    action_space_dimension: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, states: jnp.ndarray, states_attention: jnp.ndarray,
                 train: bool = True) -> Tuple[jnp.ndarray, ...]:
        """
        :param states: (B, T, h, w, state_features)
        :param states_attention: (B, T, h, w, 1)
        :return: action_logits (B, T-1, A),
                 action_directions_distribution (B, T-1, 2, D),
                 sampled_action_directions (B, T-1, D),
                 action_states_distribution (B, T, 2, D),
                 sampled_action_states (B, T, D)
        """
        observations_count = states.shape[1]
        attentive_states = states * states_attention
        x = tops.flatten(attentive_states)

        x = ResidualBlock(out_planes=2 * self.state_features, downsample_factor=2,
                          train=train, dtype=self.dtype, name="res0")(x)
        x = ResidualBlock(out_planes=2 * self.state_features, downsample_factor=1,
                          train=train, dtype=self.dtype, name="res1")(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B*T, 2*sf)

        # The distribution heads run in float32 even under a bfloat16
        # compute dtype: as training sharpens the posterior, per-sample
        # variances reach ~1e-8 where bf16's 8-bit mantissa rounds them to
        # exactly 0, and the KL's log(variance) then NaNs the whole step
        # (observed at step ~6.1k of the convergence soak).  These heads
        # are (N, D)-tiny, so f32 here costs nothing.
        x = x.astype(jnp.float32)
        mean = nn.Dense(self.action_space_dimension, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="mean_fc")(x)
        # abs() maps the variance head to positive values (reference a.py:92).
        variance = jnp.abs(nn.Dense(self.action_space_dimension, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name="variance_fc")(x))
        states_distribution = jnp.stack([mean, variance], axis=1)  # (B*T, 2, D)

        sampled_states = reparameterized_sample(self.make_rng("sample"), mean, variance)

        folded_mean = tops.fold(mean, observations_count)
        folded_variance = tops.fold(variance, observations_count)
        folded_states_distribution = tops.fold(states_distribution, observations_count)
        folded_sampled_states = tops.fold(sampled_states, observations_count)

        pred_mean, succ_mean = tops.predecessor_successor_split(folded_mean)
        pred_var, succ_var = tops.predecessor_successor_split(folded_variance)

        # Difference of Gaussians: mean difference, variance sum
        # (reference action_network.py:103-110).
        directions_mean = succ_mean - pred_mean
        directions_variance = succ_var + pred_var
        directions_distribution = jnp.stack([directions_mean, directions_variance], axis=2)
        sampled_directions = reparameterized_sample(
            self.make_rng("sample"), directions_mean, directions_variance
        )

        flat_dirs = tops.flatten(sampled_directions)
        logits = nn.Dense(self.actions_count, dtype=self.dtype,
                          param_dtype=jnp.float32, name="final_fc")(flat_dirs)
        folded_logits = tops.fold(logits, observations_count - 1)

        return (folded_logits, directions_distribution, sampled_directions,
                folded_states_distribution, folded_sampled_states)
