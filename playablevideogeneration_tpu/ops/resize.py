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
    ``jax.image.resize(x, (B, 2H, 2W, C), method='linear')``."""
    b, h, w, c = x.shape
    # Rows: stack the two phases next to H, then merge (layout-compatible).
    ev, od = _blend2(x, axis=1)
    y = jnp.stack([ev, od], axis=2).reshape(b, 2 * h, w, c)
    # Columns: phase-major channel concat + reshape is the interleave.
    ev, od = _blend2(y, axis=2)
    return jnp.concatenate([ev, od], axis=-1).reshape(b, 2 * h, 2 * w, c)
