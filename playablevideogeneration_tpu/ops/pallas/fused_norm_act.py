"""Fused inference-BatchNorm + LeakyReLU as a Pallas TPU kernel.

Every conv block in the model family ends in BatchNorm + LeakyReLU(0.2)
(reference residual_block.py:49-67, same_block.py:36-47, up_block.py:30-46).
At inference the BN is an affine transform with frozen statistics; this
kernel applies the folded per-channel scale/shift and the LeakyReLU in one
VPU pass: y = leaky_relu(x * a + b) with
    a = scale / sqrt(var + eps),  b = bias - mean * a
(`fold_batch_norm` computes a, b from a flax BatchNorm variable group).

Inference-only by design: the play path is the consumer; training keeps
XLA's own conv-epilogue fusion and batch-statistics path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from playablevideogeneration_tpu.ops.pallas.convlstm_gates import pallas_enabled

ROW_TILE = 512


def fold_batch_norm(scale, bias, mean, var, eps: float = 1e-5):
    """BN(frozen stats) == x * a + b."""
    a = scale / jnp.sqrt(var + eps)
    return a, bias - mean * a


def _kernel(x_ref, a_ref, b_ref, out_ref, *, negative_slope: float):
    # f32 math with casts at the refs: uniform element types keep Mosaic's
    # verifier happy on bf16 storage (see convlstm_gates._fwd_kernel).
    y = (x_ref[:].astype(jnp.float32) * a_ref[:].astype(jnp.float32)
         + b_ref[:].astype(jnp.float32))
    y = jnp.where(y >= 0.0, y, y * negative_slope)
    out_ref[:] = y.astype(out_ref.dtype)


def fused_scale_shift_leaky_relu(x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                                 negative_slope: float = 0.2,
                                 use_pallas: bool = None,
                                 interpret: bool = False) -> jnp.ndarray:
    """y = leaky_relu(x * a + b); a, b are per-channel (C,) vectors and
    x is (..., C)."""
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if not (use_pallas or interpret):
        y = x * a + b
        return jnp.where(y >= 0, y, y * negative_slope)

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shape = x.shape
    channels = shape[-1]
    x2d = x.reshape(-1, channels)
    n_rows = x2d.shape[0]
    tile = min(ROW_TILE, n_rows)
    a2d = jnp.broadcast_to(a.astype(x.dtype)[None], (tile, channels))
    b2d = jnp.broadcast_to(b.astype(x.dtype)[None], (tile, channels))

    row_spec = pl.BlockSpec((tile, channels), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    # a/b are one broadcast tile reused by every grid step.
    const_spec = pl.BlockSpec((tile, channels), lambda r: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, negative_slope=negative_slope),
        grid=(pl.cdiv(n_rows, tile),),
        in_specs=[row_spec, const_spec, const_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x.dtype),
        interpret=interpret,
    )(x2d, a2d, b2d)
    return out.reshape(shape)
