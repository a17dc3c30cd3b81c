"""Subpixel (space-to-depth) reformulation of few-output-channel convs.

The rendering network ends in a k x k conv producing a 3-channel RGB
image (reference model/layers/final_block.py:24-29, applied per rendering
resolution by model/rendering_network.py). On the MXU a conv with 3
output channels occupies 3 of the systolic array's 128 lanes: the
round-4 on-chip profile (docs/PROFILE_r4.md) measured the 7x7 32->3 conv
at 256px running at 1.1 TF/s and 8 GiB/s — neither compute- nor
HBM-bound — costing 27% of the whole training step across
forward + remat recompute + backward.

This module computes the *same* convolution as an MXU-friendly one:

    space_to_depth(x, f)                    # (B,H/f,W/f, f²·Cin)
      -> conv KxK with an expanded kernel   # (B,H/f,W/f, f²·Cout)
      -> depth_to_space(y, f)               # (B,H,W,Cout)

where the expanded kernel E[K,K, f²·Cin, f²·Cout] scatters each original
tap W[u,v,c,co] to the block-grid position it lands on. Every output
element is the exact same dot product as the direct conv (identical taps,
f32 accumulation on TPU) — only the loop order changes. The expansion is
sparse (density k²/(K²f²)), so the reformulation performs K²f²/k² times
the MACs of the direct conv (2.94x for k=7, f=4), but the output now
fills f²·Cout MXU lanes instead of Cout, a >30x rate improvement that
dwarfs the FLOP waste.

Derivation: with p=(k-1)//2 (SAME padding) and block factor f, output
pixel (I·f+oi, J·f+oj) reads input rows I·f+oi+u-p for u in [0,k), which
fall in block rows I-lo .. I+hi with lo=ceil(p/f), hi=(f-1+p)//f. So a
K=lo+hi+1 tap block conv covers every original tap:

    E[ki,kj,(di·f+dj)·Cin+c,(oi·f+oj)·Cout+co] = W[u,v,c,co]
      with u=(ki-lo)·f+di-oi+p  (zero where u outside [0,k)), v likewise.

The (ki,di) <-> u map is a bijection for fixed oi, so each tap appears
exactly once. Block zero-padding of the s2d conv reproduces the direct
conv's SAME zero-padding (nonzero E entries only reach p pixels past the
image edge).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _tap_indices(k: int, f: int):
    """Static gather map from the direct kernel to the expanded kernel.

    Returns (u_idx[K, f, f], lo, hi) where u_idx[ki, d, o] is the direct
    kernel row for block-tap ki, input subpixel d, output subpixel o —
    or the sentinel ``k`` (a zero-padded row) where no tap lands.
    """
    p = (k - 1) // 2
    lo = -(-p // f)
    hi = (f - 1 + p) // f
    ki = np.arange(lo + hi + 1)[:, None, None]
    d = np.arange(f)[None, :, None]
    o = np.arange(f)[None, None, :]
    u = (ki - lo) * f + d - o + p
    return np.where((u >= 0) & (u < k), u, k), lo, hi


def expand_kernel(kernel: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Expands an HWIO kernel [k,k,Cin,Cout] to the block-grid kernel
    [K,K, f²·Cin, f²·Cout] described in the module docstring."""
    k, k2, cin, cout = kernel.shape
    if k != k2 or k % 2 != 1:
        raise ValueError(f"square odd kernel required, got {kernel.shape}")
    u_idx, _, _ = _tap_indices(k, factor)
    num_taps = len(u_idx)
    # Sentinel row/col k indexes the zero padding.
    padded = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    rows = u_idx[:, None, :, None, :, None]   # ki, kj, di, dj, oi, oj
    cols = u_idx[None, :, None, :, None, :]
    e = padded[rows, cols]                    # [K,K,f,f,f,f,Cin,Cout]
    e = e.transpose(0, 1, 2, 3, 6, 4, 5, 7)   # ki,kj,di,dj,Cin,oi,oj,Cout
    f = factor
    return e.reshape(num_taps, num_taps, f * f * cin, f * f * cout)


def space_to_depth(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/f,W/f,f²·C), channel order (di, dj, c)."""
    b, h, w, c = x.shape
    f = factor
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def depth_to_space(y: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B,H,W,f²·C) -> (B,H·f,W·f,C), inverse channel order (oi, oj, c)."""
    b, h, w, fc = y.shape
    f = factor
    c = fc // (f * f)
    y = y.reshape(b, h, w, f, f, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, c)


def subpixel_conv(x: jnp.ndarray, kernel: jnp.ndarray, factor: int) -> jnp.ndarray:
    """SAME-padded stride-1 conv of NHWC ``x`` with HWIO ``kernel``,
    computed on the f-block grid. Exactly equal (same taps, same f32
    accumulation) to ``lax.conv_general_dilated(x, kernel, (1,1), 'SAME')``.

    Requires H % factor == W % factor == 0; the caller gates on that.
    """
    _, lo, hi = _tap_indices(kernel.shape[0], factor)
    xs = space_to_depth(x, factor)
    e = expand_kernel(kernel, factor)
    ys = lax.conv_general_dilated(
        xs, e, window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(ys, factor)


# --------------------------------------------------------------------- #
# Strided formulation: same math, no input space-to-depth               #
# --------------------------------------------------------------------- #
#
# The block-grid form above still pays explicit space_to_depth /
# depth_to_space layout passes: the round-4 post-subpixel profile
# (docs/profile_r4_b16_subpixel.json) attributes ~30 ms/step of pure
# `data formatting` copies to the final2 reshape/transpose pair across
# forward + remat + backward. A stride-f conv with an enlarged kernel
# computes the identical result while reading the fine-grid input
# directly (strides are native to the conv op — no layout pass):
#
#   out[I·f+oi, J·f+oj, co] = Σ_{u,v,c} W[u,v,c,co]·x[I·f+oi+u-p, ...]
#
# matches a stride-f conv with padding p and kernel K = k+f-1 whose
# output channel (oi·f+oj)·Cout+co holds tap E[a,b,c,·] = W[a-oi, b-dx]
# (zero where a-oi is outside [0,k)): substituting a = oi+u gives every
# original tap exactly once per phase. Output phases land in the same
# (oi, oj, c) channel order as ``depth_to_space`` expects. MAC count is
# (K/k)² = 2.04x the direct conv for k=7,f=4 (vs 2.94x for the block
# grid), with the same f²·Cout MXU output lanes.


@functools.lru_cache(maxsize=None)
def _strided_tap_indices(k: int, f: int):
    """u_idx[K, f] with u_idx[a, o] = direct-kernel row for enlarged-kernel
    row a and output subpixel o, or the zero-pad sentinel ``k``."""
    a = np.arange(k + f - 1)[:, None]
    o = np.arange(f)[None, :]
    u = a - o
    return np.where((u >= 0) & (u < k), u, k)


def expand_kernel_strided(kernel: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Expands an HWIO kernel [k,k,Cin,Cout] to the stride-``factor`` kernel
    [k+f-1, k+f-1, Cin, f²·Cout] described above."""
    k, k2, cin, cout = kernel.shape
    if k != k2 or k % 2 != 1:
        raise ValueError(f"square odd kernel required, got {kernel.shape}")
    u_idx = _strided_tap_indices(k, factor)
    padded = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    rows = u_idx[:, None, :, None]            # a, b, oi, oj
    cols = u_idx[None, :, None, :]
    e = padded[rows, cols]                    # [K,K,oi,oj,Cin,Cout]
    e = e.transpose(0, 1, 4, 2, 3, 5)         # K,K,Cin,oi,oj,Cout
    f = factor
    big = k + f - 1
    return e.reshape(big, big, cin, f * f * cout)


def strided_subpixel_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                          factor: int) -> jnp.ndarray:
    """SAME-padded stride-1 conv of NHWC ``x`` with HWIO ``kernel``,
    computed as one stride-``factor`` conv on the fine grid. Exactly equal
    (same taps, f32 accumulation) to
    ``lax.conv_general_dilated(x, kernel, (1,1), 'SAME')``.

    Requires H % factor == W % factor == 0; the caller gates on that.
    """
    p = (kernel.shape[0] - 1) // 2
    e = expand_kernel_strided(kernel, factor)
    ys = lax.conv_general_dilated(
        x, e, window_strides=(factor, factor), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return depth_to_space(ys, factor)


# --------------------------------------------------------------------- #
# Few-INPUT-channel convs: subpixel-formulated input gradient           #
# --------------------------------------------------------------------- #
#
# The transposed problem of the RGB heads: a conv whose INPUT has few
# channels (VGG19's first 3->64 conv over decoder outputs) has a cheap
# forward, but its backward-input conv produces a [*,*,*,3] cotangent —
# the round-4 profile measured that fusion at 185 GB/s / 15 ms per step
# (3/128 lanes in the output tile). dL/dx of a stride-1 SAME odd-kernel
# conv is itself a SAME conv of the cotangent with the spatially-flipped,
# in/out-transposed kernel, so the subpixel reformulation above applies
# verbatim to the backward pass while the forward stays the plain conv.


def _plain_conv_same(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_same_mxu_grad(x: jnp.ndarray, kernel: jnp.ndarray,
                       grad_factor: int) -> jnp.ndarray:
    """Stride-1 SAME NHWC/HWIO conv; forward identical to
    ``lax.conv_general_dilated``, backward-input computed on the
    ``grad_factor`` block grid (exact — same taps, f32 accumulation).
    Falls back to the plain transposed conv when the spatial dims do not
    divide ``grad_factor``."""
    return _plain_conv_same(x, kernel)


def _conv_same_mxu_grad_fwd(x, kernel, grad_factor):
    return _plain_conv_same(x, kernel), (x, kernel)


def _conv_same_mxu_grad_bwd(grad_factor, residuals, g):
    x, kernel = residuals
    # dL/dkernel: trace the vjp w.r.t. the kernel only, so the plain
    # backward-input conv is never emitted. (Unused when the caller holds
    # the kernel frozen — XLA removes it.)
    _, vjp_k = jax.vjp(lambda k: _plain_conv_same(x, k), kernel)
    (dk,) = vjp_k(g)
    # dL/dx = SAME conv of g with the flipped, in/out-transposed kernel.
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    _, h, w, _ = g.shape
    if grad_factor > 1 and h % grad_factor == 0 and w % grad_factor == 0:
        dx = subpixel_conv(g, kt, grad_factor)
    else:
        dx = _plain_conv_same(g, kt)
    return dx.astype(x.dtype), dk


conv_same_mxu_grad.defvjp(_conv_same_mxu_grad_fwd, _conv_same_mxu_grad_bwd)


# --------------------------------------------------------------------- #
# 2x2 max pool with an O(n) elementwise backward                        #
# --------------------------------------------------------------------- #
#
# XLA lowers max-pool gradients to ``select_and_scatter``, which the
# round-4 profile measured at ~6.4 ms/step across the VGG19 levels
# (operational intensity 0.22, far off the HBM roofline). For the frozen
# perceptual net the gradient only carries training signal, so the
# backward can route the cotangent by VALUE EQUALITY — every input equal
# to its window's max receives g/(#ties) — instead of replaying the
# pooling selection order. This is an exact subgradient of max-pooling;
# it differs from torch/XLA only on exact ties (which split the mass
# rather than following first-element order) and is implemented entirely
# with reshapes and elementwise ops that fuse to one HBM pass.


@jax.custom_vjp
def max_pool_2x2_fast_grad(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 VALID max pool over NHWC, torch-equal forward."""
    return nn_max_pool_2x2(x)


def nn_max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min,
        lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _pool_fwd(x):
    y = nn_max_pool_2x2(x)
    return y, (x, y)


def _pool_bwd(residuals, g):
    x, y = residuals
    b, h, w, c = x.shape
    hh, ww = y.shape[1], y.shape[2]
    # Trailing odd row/col never enters a VALID window: zero gradient.
    xe = x[:, : hh * 2, : ww * 2, :]
    blocks = xe.reshape(b, hh, 2, ww, 2, c)
    is_max = (blocks == y[:, :, None, :, None, :]).astype(g.dtype)
    ties = is_max.sum(axis=(2, 4))
    scaled = (g / ties)[:, :, None, :, None, :]
    dxe = (is_max * scaled).reshape(b, hh * 2, ww * 2, c)
    dx = jnp.zeros_like(x).at[:, : hh * 2, : ww * 2, :].set(dxe) \
        if (h != hh * 2 or w != ww * 2) else dxe
    return (dx,)


max_pool_2x2_fast_grad.defvjp(_pool_fwd, _pool_bwd)
