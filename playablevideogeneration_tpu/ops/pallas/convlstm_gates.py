"""Fused ConvLSTM gate update as a Pallas TPU kernel.

The ConvLSTM cell computes one 4C-channel gate convolution (MXU) followed
by a chain of elementwise ops: two sigmoids, two tanhs, three multiplies
and an add across six intermediate tensors (reference
convolutional_lstm_cell.py:96-105).  This kernel fuses the entire
post-conv gate update into ONE VPU pass over VMEM — the gate tensor is
read once and only (h', c') are written back, instead of materializing
i/f/o/g and tanh(c') between HLO ops.

A custom VJP ships a matching fused backward kernel (activations are
recomputed from the saved inputs — cheap VPU math — rather than stored),
so the kernel is usable in both the training scan and the play path.

The pure-jnp reference implementation is used on non-TPU backends and as
the golden value in tests (tests/test_pallas.py runs the kernel in
interpreter mode on CPU).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

ROW_TILE = 512  # rows per grid step; lanes = channel dim


def pallas_enabled() -> bool:
    """Pallas kernels run on real TPUs; set PVG_PALLAS=0 to force XLA."""
    if os.environ.get("PVG_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# --------------------------------------------------------------------- #
# Reference (XLA) implementation                                        #
# --------------------------------------------------------------------- #


def _gate_math(gates: jnp.ndarray, c: jnp.ndarray):
    i, f, o, g = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    new_c = f * c + i * g
    new_h = o * jnp.tanh(new_c)
    return new_h, new_c


# --------------------------------------------------------------------- #
# Pallas kernels                                                        #
# --------------------------------------------------------------------- #


def _fwd_kernel(gates_ref, c_ref, h_out_ref, c_out_ref):
    # Gate math runs in f32 regardless of storage dtype: transcendentals
    # want the precision, and uniform element types keep Mosaic's
    # vector-broadcast verifier happy on bf16 inputs.
    channels = c_ref.shape[-1]
    gates = gates_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, 0:channels])
    f = jax.nn.sigmoid(gates[:, channels : 2 * channels])
    o = jax.nn.sigmoid(gates[:, 2 * channels : 3 * channels])
    g = jnp.tanh(gates[:, 3 * channels : 4 * channels])
    new_c = f * c + i * g
    c_out_ref[:] = new_c.astype(c_out_ref.dtype)
    h_out_ref[:] = (o * jnp.tanh(new_c)).astype(h_out_ref.dtype)


def _bwd_kernel(gates_ref, c_ref, dh_ref, dc_ref, dgates_ref, dc_in_ref):
    channels = c_ref.shape[-1]
    gates = gates_ref[:].astype(jnp.float32)
    c = c_ref[:].astype(jnp.float32)
    i = jax.nn.sigmoid(gates[:, 0:channels])
    f = jax.nn.sigmoid(gates[:, channels : 2 * channels])
    o = jax.nn.sigmoid(gates[:, 2 * channels : 3 * channels])
    g = jnp.tanh(gates[:, 3 * channels : 4 * channels])
    new_c = f * c + i * g
    tanh_c = jnp.tanh(new_c)

    dh = dh_ref[:].astype(jnp.float32)
    # d(new_c) accumulates the direct cotangent and the h' = o*tanh(c') path.
    d_new_c = dc_ref[:].astype(jnp.float32) + dh * o * (1.0 - tanh_c * tanh_c)
    d_i = d_new_c * g * i * (1.0 - i)
    d_f = d_new_c * c * f * (1.0 - f)
    d_o = dh * tanh_c * o * (1.0 - o)
    d_g = d_new_c * i * (1.0 - g * g)
    dgates_ref[:] = jnp.concatenate(
        [d_i, d_f, d_o, d_g], axis=-1).astype(dgates_ref.dtype)
    dc_in_ref[:] = (d_new_c * f).astype(dc_in_ref.dtype)


def _row_specs(channels: int, dtype, n_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(ROW_TILE, n_rows)
    grid = (pl.cdiv(n_rows, tile),)
    gates_spec = pl.BlockSpec((tile, 4 * channels), lambda r: (r, 0),
                              memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((tile, channels), lambda r: (r, 0),
                              memory_space=pltpu.VMEM)
    return grid, gates_spec, state_spec, tile


def _fwd_2d(gates2d: jnp.ndarray, c2d: jnp.ndarray, interpret: bool):
    from jax.experimental import pallas as pl

    n_rows, channels = c2d.shape
    grid, gates_spec, state_spec, _ = _row_specs(channels, c2d.dtype, n_rows)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[gates_spec, state_spec],
        out_specs=[state_spec, state_spec],
        out_shape=[jax.ShapeDtypeStruct(c2d.shape, c2d.dtype)] * 2,
        interpret=interpret,
    )(gates2d, c2d)


def _bwd_2d(gates2d, c2d, dh2d, dc2d, interpret: bool):
    from jax.experimental import pallas as pl

    n_rows, channels = c2d.shape
    grid, gates_spec, state_spec, _ = _row_specs(channels, c2d.dtype, n_rows)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[gates_spec, state_spec, state_spec, state_spec],
        out_specs=[gates_spec, state_spec],
        out_shape=[jax.ShapeDtypeStruct(gates2d.shape, gates2d.dtype),
                   jax.ShapeDtypeStruct(c2d.shape, c2d.dtype)],
        interpret=interpret,
    )(gates2d, c2d, dh2d, dc2d)


# --------------------------------------------------------------------- #
# Public entry with custom VJP                                          #
# --------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_gates_pallas(gates: jnp.ndarray, c: jnp.ndarray, interpret: bool):
    shape = c.shape
    gates2d = gates.reshape(-1, gates.shape[-1])
    c2d = c.reshape(-1, shape[-1])
    h2d, new_c2d = _fwd_2d(gates2d, c2d, interpret)
    return h2d.reshape(shape), new_c2d.reshape(shape)


def _fused_gates_fwd(gates, c, interpret):
    out = _fused_gates_pallas(gates, c, interpret)
    return out, (gates, c)


def _fused_gates_bwd(interpret, residuals, cotangents):
    gates, c = residuals
    dh, dc = cotangents
    shape = c.shape
    dgates2d, dc2d = _bwd_2d(
        gates.reshape(-1, gates.shape[-1]), c.reshape(-1, shape[-1]),
        dh.reshape(-1, shape[-1]), dc.reshape(-1, shape[-1]), interpret)
    return dgates2d.reshape(gates.shape), dc2d.reshape(shape)


_fused_gates_pallas.defvjp(_fused_gates_fwd, _fused_gates_bwd)


def fused_lstm_gates(gates: jnp.ndarray, c: jnp.ndarray,
                     use_pallas: bool = None,
                     interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(gates (..., 4C), c (..., C)) -> (h' (..., C), c' (..., C)).

    Dispatches to the fused Pallas kernel on TPU (or in interpreter mode
    when `interpret=True`), else to the jnp reference implementation.
    """
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if use_pallas or interpret:
        return _fused_gates_pallas(gates, c, interpret)
    return _gate_math(gates, c)
