"""Rendering network D: hidden state -> multi-resolution frames.

Reference: model/main_model/rendering_network.py:14-71 (main, widths
128/128->64->32) and model/reduced_model/rendering_network.py:14-71
(reduced, widths 64/64->32->16).  Both follow widths
(hidden, hidden/2, hidden/4), so a single parameterized module covers both
variants.  Three bilinear x2 upsampling stages (x8 total, back to input
resolution); after each stage a conv+tanh FinalBlock emits an RGB frame,
returned high-resolution-first.
"""
from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from playablevideogeneration_tpu.models.layers import FinalBlock, ResidualBlock, UpBlock


class RenderingNetwork(nn.Module):
    widths: Tuple[int, int, int]  # output channels of the three upsample stages
    dtype: Any = jnp.float32
    # Space-to-depth factor per FinalBlock (0 = direct conv). The RGB heads
    # have 3 output channels — 3/128 MXU lanes — so the top-resolution 7x7
    # head dominated the profiled train step at 1.1 TF/s until reformulated
    # on the block grid (docs/PROFILE_r4.md, ops/subpixel_conv.py).
    final_subpixel: Tuple[int, int, int] = (0, 0, 4)
    # "strided" computes the reformulated head as one stride-f conv on the
    # fine grid (no space-to-depth layout passes, lower MAC inflation);
    # "block" uses the explicit space-to-depth grid. Tap-exact either way.
    final_subpixel_mode: str = "strided"
    # Compute each UpBlock's bilinear-x2 + 3x3 conv as one coarse-grid conv
    # (exact; ops/fused_upsample_conv.py). Off by default — measured slower
    # on the BAIR-class workload (docs/PROFILE_r4.md "Ablations").
    fuse_upsample: bool = False
    # x2 bilinear implementation for the upsample stages: "phases"
    # (elementwise blends + reshape interleaves, ops/resize.py) or "xla"
    # (jax.image.resize dot_generals). Identical interpolation weights.
    bilinear_impl: str = "deconv"

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        """
        :param hidden_states: (N, h, w, hidden_state_size)
        :return: (N, 8h, 8w, 3) full-res frame, and the list
                 [(N, 8h/2^i, 8w/2^i, 3) for i in range(3)] high-res first,
                 all in [-1, 1]
        """
        x = hidden_states
        outputs = []
        final_kernels = (3, 3, 7)
        for i, width in enumerate(self.widths):
            x = UpBlock(out_planes=width, scale_factor=2, upscaling_mode="bilinear",
                        fuse_upsample=self.fuse_upsample,
                        bilinear_impl=self.bilinear_impl,
                        train=train, dtype=self.dtype, name=f"up{i}")(x)
            if i < len(self.widths) - 1:
                x = ResidualBlock(out_planes=width, downsample_factor=1, train=train,
                                  dtype=self.dtype, name=f"res{i}")(x)
            frame = FinalBlock(out_planes=3, kernel_size=final_kernels[i],
                               subpixel_factor=self.final_subpixel[i],
                               subpixel_mode=self.final_subpixel_mode,
                               dtype=self.dtype, name=f"final{i}")(x)
            outputs.append(frame)
        outputs = list(reversed(outputs))  # high-res first (reference rend.py:70)
        return outputs[0], outputs
