"""Phase-decomposed 2x bilinear upsampling (exact, no dot_general).

``jax.image.resize(method='linear')`` lowers integer upscaling to a pair
of dot_generals with interpolation-weight matrices; on TPU the surrounding
layout demands cost more than the math — the round-4 post-subpixel
profile (docs/profile_r4_b16_subpixel.json) attributes ~58 ms/step of the
BAIR-class train step to the rendering UpBlocks' resize dot_generals plus
their `data formatting` copies (reference counterpart: the bilinear
``F.interpolate`` in model/layers/up_block.py:30-46).

For the x2 half-pixel (align_corners=False) case the interpolation
weights are the constants (0.75, 0.25): output row 2i sits a quarter
pixel above input row i, row 2i+1 a quarter pixel below —

    out[2i]   = 0.25*x[i-1] + 0.75*x[i]      (i-1 edge-clamped)
    out[2i+1] = 0.75*x[i]   + 0.25*x[i+1]    (i+1 edge-clamped)

At the edges the out-of-range tap has exactly one valid neighbour, so
edge-clamping and jax.image.resize's weight renormalization agree (both
yield x[0] / x[H-1]).  The whole resize is therefore two shifted
elementwise blends per axis plus an interleave:

- rows interleave as ``stack(axis=2) -> reshape`` ([B,H,2,W,C] is
  row-major contiguous with [B,2H,W,C]);
- columns interleave as a CHANNEL concat + reshape: in row-major order
  index (w, p*C+c) of [B,2H,W,2C] equals index (2w+p, c) of
  [B,2H,2W,C], so ``concat([even, odd], axis=-1).reshape(...)`` IS the
  column interleave — no gather, no dot, no transpose.

Equality with jax.image.resize is pinned by tests/test_resize.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _edge_shifted(x: jnp.ndarray, axis: int):
    """(x shifted +1 with edge clamp, x shifted -1 with edge clamp)."""
    n = x.shape[axis]
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    prev = jnp.concatenate([first, lax.slice_in_dim(x, 0, n - 1, axis=axis)],
                           axis=axis)
    nxt = jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis), last],
                          axis=axis)
    return prev, nxt


def _blend2(x: jnp.ndarray, axis: int):
    """Even/odd output phases of the x2 bilinear along ``axis``."""
    prev, nxt = _edge_shifted(x, axis)
    c25 = jnp.asarray(0.25, x.dtype)
    c75 = jnp.asarray(0.75, x.dtype)
    return c25 * prev + c75 * x, c75 * x + c25 * nxt


def upsample_bilinear2_phases(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), equal to
    ``jax.image.resize(x, (B, 2H, 2W, C), method='linear')``.

    Sub-f32 inputs blend internally in float32 with ONE downcast at the
    end: per-phase bf16 rounding after each axis diverged from
    jax.image.resize's f32 dot_general accumulation by up to ~0.016 on
    ~40% of elements (round-4 advisor finding).  The f32 intermediate
    matches resize-in-f32-then-cast bit-exactly; the op stays
    bandwidth-bound on the interleave copies either way (the round-5
    A/B table in docs/PROFILE_r5.md times this exact configuration).
    """
    dtype = x.dtype
    if jnp.finfo(dtype).bits < 32:
        x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    # Rows: stack the two phases next to H, then merge (layout-compatible).
    ev, od = _blend2(x, axis=1)
    y = jnp.stack([ev, od], axis=2).reshape(b, 2 * h, w, c)
    # Columns: phase-major channel concat + reshape is the interleave.
    ev, od = _blend2(y, axis=2)
    return jnp.concatenate([ev, od], axis=-1).reshape(b, 2 * h, 2 * w, c).astype(dtype)


def upsample_bilinear2_deconv(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C) x2 bilinear as ONE depthwise
    input-dilated convolution (the transposed-conv formulation).

    Same taps as :func:`upsample_bilinear2_phases` (0.75/0.25 separable,
    edge-clamped via a 1-px replicate pre-pad), but the interleave happens
    INSIDE the conv op instead of as stack/concat+reshape — the round-5
    profile (docs/profile_r5_b16.json) attributes ~60 ms/step of
    `data formatting` copies to the phase path's interleaves at 256²,
    which XLA must materialize as physical tile-layout copies.

    Derivation: with the input edge-padded by 1 and lhs_dilation=2, the
    correlation with the separable kernel [0.25, 0.75, 0.75, 0.25] under
    padding (1, 1) yields out[2i+1] = 0.25 x[i-1] + 0.75 x[i] and
    out[2i+2] = 0.75 x[i] + 0.25 x[i+1]; cropping [1 : 2H+1] aligns this
    exactly with jax.image.resize's half-pixel grid (tests/test_resize.py
    pins both impls).

    Numerics: inputs stay in their own dtype (bf16 moves HALF the HBM
    bytes of an f32 upcast — the phases impl's f32-blend correctness fix
    cost a measured 772→989 ms/step at the BAIR batch-16 workload,
    docs/PROFILE_r5.md); every 2D tap product (0.5625/0.1875/0.0625) is
    EXACT in bf16, and accumulation runs in f32 via
    ``preferred_element_type`` with one final downcast — i.e. exactly the
    resize-in-f32-then-cast semantics, in one pass instead of two.
    """
    return _deconv2(x)


def _bilinear_kernel(c, dtype):
    """Separable 4x4 depthwise kernel; every tap (0.5625/0.1875/0.0625)
    is exactly representable in bf16, so casting is lossless."""
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], jnp.float32)
    k = (k1[:, None] * k1[None, :])[:, :, None, None]
    return (jnp.broadcast_to(k, (4, 4, 1, 1))
            * jnp.ones((1, 1, 1, c), jnp.float32)).astype(dtype)


@jax.custom_vjp
def _deconv2(x):
    dtype = x.dtype
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        xp, _bilinear_kernel(c, dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)], lhs_dilation=(2, 2),
        feature_group_count=c, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y[:, 1:2 * h + 1, 1:2 * w + 1, :].astype(dtype)


def _deconv2_fwd(x):
    return _deconv2(x), None


def _deconv2_bwd(_res, ct):
    """Adjoint of crop∘conv_dilated∘edge_pad, term by term:

    - cropᵀ: zero-pad the cotangent back to the conv's output extent
      ([1 : 2H+1] came from length 2H+2);
    - conv_dilatedᵀ: a stride-2 correlation with the SAME (symmetric)
      kernel under padding (k-1-p) = (2, 2);
    - edge_padᵀ: fold the two border rows/cols back into their clamped
      sources (x[0] / x[H-1]).

    The custom rule exists because lax's mechanical transpose would feed
    the f32 accumulator cotangent into a conv against the input-dtype
    kernel (a dtype-mismatch error), and a hand adjoint keeps the
    backward in input dtype — the same HBM-bandwidth win as the forward.
    tests/test_resize.py checks it against the jax.image.resize VJP.
    """
    dtype = ct.dtype  # the output dtype IS the input dtype
    h, w, c = ct.shape[1] // 2, ct.shape[2] // 2, ct.shape[3]
    ct = jnp.pad(ct, ((0, 0), (1, 1), (1, 1), (0, 0)))
    g = lax.conv_general_dilated(
        ct, _bilinear_kernel(c, dtype), window_strides=(2, 2),
        padding=[(2, 2), (2, 2)], feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    # g has extent (H+2, W+2): the padded input's grid. Fold borders.
    def fold(t, n, axis):
        if n == 1:  # every padded row folds into the single source row
            return jnp.sum(t, axis=axis, keepdims=True)
        first = lax.slice_in_dim(t, 0, 1, axis=axis) \
            + lax.slice_in_dim(t, 1, 2, axis=axis)
        last = lax.slice_in_dim(t, n, n + 1, axis=axis) \
            + lax.slice_in_dim(t, n + 1, n + 2, axis=axis)
        return jnp.concatenate(
            [first, lax.slice_in_dim(t, 2, n, axis=axis), last], axis=axis)

    g = fold(fold(g, h, axis=1), w, axis=2)
    return (g.astype(dtype),)


_deconv2.defvjp(_deconv2_fwd, _deconv2_bwd)
