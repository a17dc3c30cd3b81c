"""Recurrent dynamics network R as a pure scan cell.

Reference: model/main_model/conv_dynamics_network.py:14-131.
Three ConvLSTM+BatchNorm blocks interleaved with SameBlock(/2) ->
UpBlock(bilinear, late upscale) -> SameBlock, forming an hourglass at state
resolution /1 -> /2 -> /1.  The soft action vector and the action-variation
vector are broadcast spatially and concatenated at the input of EVERY block
(reference dyn.py:126-131).  The reference accepts a noise vector but never
concatenates it ("Noise is not given", dyn.py:30-31) — we therefore omit it.

The reference mutates LSTM state stored on the module
(convolutional_lstm.py:43-73); here the recurrent state is an explicit
`DynamicsCarry` pytree threaded through `lax.scan`.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from playablevideogeneration_tpu.models.layers import (
    ConvLSTM,
    SameBlock,
    UpBlock,
    channelwise_concat,
)

# ((h0, c0), (h1, c1), (h2, c2)) for the three ConvLSTM blocks
DynamicsCarry = Tuple[
    Tuple[jnp.ndarray, jnp.ndarray],
    Tuple[jnp.ndarray, jnp.ndarray],
    Tuple[jnp.ndarray, jnp.ndarray],
]


class ConvDynamicsNetwork(nn.Module):
    hidden_state_size: int
    state_resolution: Tuple[int, int]  # (height, width) of the state
    dtype: Any = jnp.float32

    def setup(self):
        h, w = self.state_resolution
        hs = self.hidden_state_size
        self.lstm0 = ConvLSTM(out_planes=hs, height=h, width=w, dtype=self.dtype)
        self.lstm1 = ConvLSTM(out_planes=2 * hs, height=h // 2, width=w // 2, dtype=self.dtype)
        self.lstm2 = ConvLSTM(out_planes=hs, height=h, width=w, dtype=self.dtype)

    def init_carry(self, batch_size: int) -> DynamicsCarry:
        """Learnable initial (h, c) per LSTM, expanded over the batch
        (reference convolutional_lstm.py:33-34, 66-69)."""
        return (
            self.lstm0.init_carry(batch_size),
            self.lstm1.init_carry(batch_size),
            self.lstm2.init_carry(batch_size),
        )

    @nn.compact
    def __call__(
        self,
        carry: DynamicsCarry,
        states: jnp.ndarray,
        actions: jnp.ndarray,
        variations: jnp.ndarray,
        train: bool = True,
    ) -> Tuple[DynamicsCarry, jnp.ndarray]:
        """One recurrent step.

        :param states: (B, h, w, state_features)
        :param actions: (B, actions_count) action probability vectors
        :param variations: (B, action_space_dimension)
        :return: (new_carry, hidden_state (B, h, w, hidden_state_size))
        """
        c0, c1, c2 = carry
        hs = self.hidden_state_size
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)

        x = channelwise_concat([states, actions, variations])
        c0, x = self.lstm0(c0, x)
        x = bn("bn0")(x)

        x = SameBlock(out_planes=2 * hs, downsample_factor=2, train=train,
                      dtype=self.dtype, name="same0")(
            channelwise_concat([x, actions, variations]))

        c1, x = self.lstm1(c1, channelwise_concat([x, actions, variations]))
        x = bn("bn1")(x)

        x = UpBlock(out_planes=hs, upscaling_mode="bilinear", late_upscaling=True,
                    train=train, dtype=self.dtype, name="up0")(
            channelwise_concat([x, actions, variations]))

        c2, x = self.lstm2(c2, channelwise_concat([x, actions, variations]))
        x = bn("bn2")(x)

        x = SameBlock(out_planes=hs, downsample_factor=1, train=train,
                      dtype=self.dtype, name="same1")(
            channelwise_concat([x, actions, variations]))

        return (c0, c1, c2), x
