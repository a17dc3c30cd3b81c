"""Fused bilinear x2 upsample + 3x3 SAME conv on the coarse grid.

The rendering network's UpBlocks (reference up_block.py:30-46, used by
model/rendering_network.py with early upscaling) compute

    y = conv3x3_SAME(bilinear_x2(x), W)            # at 2H x 2W

On TPU this materializes the upsampled tensor (4x the HBM traffic of x),
recomputes it under remat, and runs the conv at the fine resolution; the
round-4 profile (docs/PROFILE_r4.md) attributes ~40 ms/step to the up2
family alone. Because bilinear interpolation is a *linear* map, the
composite is itself a convolution over the coarse grid:

    fine[2m+oi] = A-combination of xe[m], xe[m+1], xe[m+2]   (per parity oi)

with xe = edge-padded x (edge padding == torch's coordinate clamp), so

    y[2I+oi, 2J+oj] = sum_{u,v} W[u,v] . fine[2I+oi-1+u, 2J+oj-1+v]
                    = sum_{a,b}  EK[a,b,:, (oi,oj,:)] . xe[I+a, J+b]

one 3x3 VALID conv with the parity-expanded kernel

    EK[a,b,c,(oi*2+oj)*D+d] = sum_{u,v} W[u,v,c,d] A[a,u,oi] A[b,v,oj].

This has IDENTICAL FLOPs to the fine-grid conv (both sum 9 taps per
output element), never materializes the upsampled tensor, and gives the
MXU a 4.D-lane output. Exactness: the same tap values are combined with
the same weights; only association order differs (f32 accumulation).

Border: the fine-grid conv zero-pads at fine rows -1 and 2H (and cols),
but the coarse-grid conv instead reads "phantom" values extrapolated from
the edge-padded xe. Only the outermost fine-pixel ring is affected; the
phantom row -1 equals the W-upsample of x's first row (edge-padded), so
the error is removed exactly by four 1-D strip convs plus a 4-corner
inclusion-exclusion term (see ``_border_corrections``).

Everything is built from differentiable primitives, so JAX autodiff
yields the exact gradient — the backward convs inherit the same
MXU-friendly coarse-grid shapes.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from playablevideogeneration_tpu.ops.subpixel_conv import depth_to_space

# A[a, u, oi]: weight of xe[I+a] in fine[2I+oi-1+u]  (u = conv tap index).
# Derived from fine[2m] = 0.25 xe[m] + 0.75 xe[m+1],
#              fine[2m+1] = 0.75 xe[m+1] + 0.25 xe[m+2].
_A = np.zeros((3, 3, 2), np.float32)
_A[0, 0, 0], _A[1, 0, 0] = 0.75, 0.25          # oi=0, u=0 -> fine[2I-1]
_A[0, 1, 0], _A[1, 1, 0] = 0.25, 0.75          # oi=0, u=1 -> fine[2I]
_A[1, 2, 0], _A[2, 2, 0] = 0.75, 0.25          # oi=0, u=2 -> fine[2I+1]
_A[0, 0, 1], _A[1, 0, 1] = 0.25, 0.75          # oi=1, u=0 -> fine[2I]
_A[1, 1, 1], _A[2, 1, 1] = 0.75, 0.25          # oi=1, u=1 -> fine[2I+1]
_A[1, 2, 1], _A[2, 2, 1] = 0.25, 0.75          # oi=1, u=2 -> fine[2I+2]

# 1-D x2 bilinear upsample as two strided tap pairs (used for the border
# phantom strips; equals jax.image.resize(..., 'linear') for scale 2).
def _upsample1d(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    xe = _edge_pad(x, axis, 1)
    lo = lax.slice_in_dim(xe, 0, xe.shape[axis] - 1, axis=axis)
    hi = lax.slice_in_dim(xe, 1, xe.shape[axis], axis=axis)
    even = 0.25 * lo + 0.75 * hi          # fine[2m]
    odd_lo = lax.slice_in_dim(xe, 1, xe.shape[axis] - 1, axis=axis)
    odd_hi = lax.slice_in_dim(xe, 2, xe.shape[axis], axis=axis)
    odd = 0.75 * odd_lo + 0.25 * odd_hi   # fine[2m+1]
    even = even[tuple(slice(None) if i != axis else slice(0, x.shape[axis])
                      for i in range(x.ndim))]
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _edge_pad(x: jnp.ndarray, axis: int, amount: int) -> jnp.ndarray:
    pads = [(0, 0)] * x.ndim
    pads[axis] = (amount, amount)
    return jnp.pad(x, pads, mode="edge")


def expand_upsample_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,D] fine-grid kernel -> [3,3,C,4D] coarse-grid kernel with
    output channel order (oi, oj, d) (depth_to_space's convention)."""
    a = jnp.asarray(_A, kernel.dtype)
    ek = jnp.einsum("uvcd,auo,bvp->abcopd", kernel, a, a)
    k3, _, c, _, _, d = ek.shape
    return ek.reshape(k3, k3, c, 4 * d)


def _border_corrections(y: jnp.ndarray, x: jnp.ndarray,
                        kernel: jnp.ndarray) -> jnp.ndarray:
    """Subtracts the phantom-tap contributions at the 1-pixel fine ring.

    The coarse-grid conv read phantom fine rows -1 / 2H (value: the
    W-upsample of x's edge row, itself edge-padded — exactly what the
    expanded kernel combines at the border) where the fine-grid conv has
    zero padding. err(t=0, s) = sum_v W[0,v] . phantom[s-1+v]; corners
    subtract twice via the row and column strips, so the doubly-counted
    (u,v) corner tap is added back once.
    """
    b, h, w, _ = x.shape
    dn = ("NHWC", "HWIO", "NHWC")

    def strip_conv_w(row, ktap):  # row [B,1,2W,C], ktap [3,C,D]
        padded = _edge_pad(row, 2, 1)
        return lax.conv_general_dilated(
            padded, ktap[None], (1, 1), "VALID", dimension_numbers=dn)

    def strip_conv_h(col, ktap):  # col [B,2H,1,C], ktap [3,C,D]
        padded = _edge_pad(col, 1, 1)
        return lax.conv_general_dilated(
            padded, ktap[:, None], (1, 1), "VALID", dimension_numbers=dn)

    top = strip_conv_w(_upsample1d(x[:, :1], 2), kernel[0])
    bot = strip_conv_w(_upsample1d(x[:, h - 1:], 2), kernel[2])
    left = strip_conv_h(_upsample1d(x[:, :, :1], 1), kernel[:, 0])
    right = strip_conv_h(_upsample1d(x[:, :, w - 1:], 1), kernel[:, 2])

    y = y.at[:, 0].add(-top[:, 0])
    y = y.at[:, -1].add(-bot[:, 0])
    y = y.at[:, :, 0].add(-left[:, :, 0])
    y = y.at[:, :, -1].add(-right[:, :, 0])

    corner = lambda kuv, px: jnp.einsum("cd,bc->bd", kuv, px)
    y = y.at[:, 0, 0].add(corner(kernel[0, 0], x[:, 0, 0]))
    y = y.at[:, 0, -1].add(corner(kernel[0, 2], x[:, 0, w - 1]))
    y = y.at[:, -1, 0].add(corner(kernel[2, 0], x[:, h - 1, 0]))
    y = y.at[:, -1, -1].add(corner(kernel[2, 2], x[:, h - 1, w - 1]))
    return y


def fused_upsample2_conv3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Equals ``conv3x3_SAME(bilinear_x2(x), kernel)`` (NHWC / HWIO),
    computed entirely on the coarse grid. x: [B,H,W,C] -> [B,2H,2W,D]."""
    xe = _edge_pad(_edge_pad(x, 1, 1), 2, 1)
    ek = expand_upsample_kernel(kernel)
    y4 = lax.conv_general_dilated(
        xe, ek, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = depth_to_space(y4, 2)
    return _border_corrections(y, x, kernel)
