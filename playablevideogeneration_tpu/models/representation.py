"""Representation network E: observation -> (state, spatial attention).

Reference: model/main_model/representation_network.py:8-57.
conv3x3(->16) + avgpool2 + BN + lrelu, then six residual blocks
16->16->32->32->64->64->(state_features+1) with two x2 downsamples; the last
channel becomes a sigmoid spatial attention map, the rest the state.
Total spatial reduction x8.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from playablevideogeneration_tpu.models.layers import (
    BatchNorm,
    ResidualBlock,
    _SubpixelConv,
    avg_pool,
    leaky_relu,
    tag_activation,
)


class RepresentationNetwork(nn.Module):
    state_features: int = 64
    # Space-to-depth factor for the stem conv: a 3->16-channel conv at full
    # resolution fills 3/128 + 16/128 MXU lanes and profiled at 0.9 TF/s /
    # 37 GiB/s inside the autoregressive scan (docs/PROFILE_r4.md); the
    # block-grid formulation (ops/subpixel_conv.py, exact same math) gives
    # f²-wider contraction and output dims in both directions of autodiff.
    # 0 disables; indivisible resolutions fall back to the direct conv.
    # Default 0: the on-chip A/B measured the f=4 formulation 23 ms/step
    # SLOWER on the BAIR-class workload (docs/PROFILE_r4.md "Ablations").
    stem_subpixel: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, observations: jnp.ndarray, train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """
        :param observations: (N, H, W, 3*observation_stacking), frames
            most-recent-first along channels
        :return: state (N, H/8, W/8, state_features),
                 attention (N, H/8, W/8, 1) in (0, 1)
        """
        f = self.stem_subpixel
        if f and observations.shape[1] % f == 0 and observations.shape[2] % f == 0:
            x = _SubpixelConv(features=16, kernel_size=3, factor=f,
                              use_bias=False, dtype=self.dtype,
                              name="conv1")(observations)
        else:
            x = nn.Conv(16, (3, 3), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv1")(observations)
        x = tag_activation(x)
        x = avg_pool(x, 2)
        x = BatchNorm(use_running_average=not train, dtype=self.dtype,
                      activation="leaky_relu", name="bn1")(x)

        sf = self.state_features
        specs = [(16, 1), (32, 2), (32, 1), (sf, 2), (sf, 1), (sf + 1, 1)]
        for i, (planes, down) in enumerate(specs):
            x = ResidualBlock(out_planes=planes, downsample_factor=down,
                              train=train, dtype=self.dtype, name=f"res{i}")(x)

        state = x[..., :-1]
        attention = nn.sigmoid(x[..., -1:])
        return state, attention
