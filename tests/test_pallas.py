"""Pallas kernel parity tests.

Kernels run in interpreter mode on CPU (the standard way to test Pallas
without a TPU); golden values come from the pure-jnp reference
implementations that the non-TPU dispatch path uses in production.
"""
import jax
import jax.numpy as jnp
import numpy as np

from playablevideogeneration_tpu.ops.pallas import convlstm_gates
from playablevideogeneration_tpu.ops.pallas.fused_norm_act import (
    fold_batch_norm,
    fused_scale_shift_leaky_relu,
)


def _random_gate_inputs(seed=0, shape=(2, 4, 4), channels=8, dtype=np.float32):
    rng = np.random.default_rng(seed)
    gates = rng.normal(size=shape + (4 * channels,)).astype(dtype)
    c = rng.normal(size=shape + (channels,)).astype(dtype)
    return jnp.asarray(gates), jnp.asarray(c)


def test_fused_lstm_gates_forward_matches_reference():
    gates, c = _random_gate_inputs()
    want_h, want_c = convlstm_gates._gate_math(gates, c)
    got_h, got_c = convlstm_gates.fused_lstm_gates(gates, c, use_pallas=False,
                                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-6, atol=1e-6)


def test_fused_lstm_gates_gradients_match_reference():
    gates, c = _random_gate_inputs(seed=1)

    def loss_ref(gates, c):
        h, new_c = convlstm_gates._gate_math(gates, c)
        return jnp.sum(h * 1.3 + new_c * 0.7)

    def loss_pallas(gates, c):
        h, new_c = convlstm_gates.fused_lstm_gates(gates, c, use_pallas=False,
                                                   interpret=True)
        return jnp.sum(h * 1.3 + new_c * 0.7)

    want = jax.grad(loss_ref, argnums=(0, 1))(gates, c)
    got = jax.grad(loss_pallas, argnums=(0, 1))(gates, c)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)


def test_fused_lstm_gates_under_scan_and_jit():
    """The production shape: the kernel inside a jitted lax.scan over time."""
    gates_seq = jnp.asarray(
        np.random.default_rng(2).normal(size=(5, 2, 4, 4, 32)).astype(np.float32))
    c0 = jnp.zeros((2, 4, 4, 8))

    def run(fused):
        def body(c, gates):
            h, c = convlstm_gates.fused_lstm_gates(
                gates, c, use_pallas=False, interpret=fused)
            return c, h

        c, hs = jax.lax.scan(body, c0, gates_seq)
        return c, hs

    c_ref, hs_ref = jax.jit(lambda: run(False))()
    c_pal, hs_pal = jax.jit(lambda: run(True))()
    np.testing.assert_allclose(np.asarray(hs_pal), np.asarray(hs_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-6)


def test_fused_lstm_gates_ragged_rows():
    """Row count not a multiple of the tile: the last partial block must be
    masked correctly."""
    gates, c = _random_gate_inputs(seed=3, shape=(3, 7, 5), channels=8)
    want_h, want_c = convlstm_gates._gate_math(gates, c)
    got_h, got_c = convlstm_gates.fused_lstm_gates(gates, c, use_pallas=False,
                                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(want_h),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                               rtol=1e-6, atol=1e-6)


def test_fused_norm_act_matches_batchnorm_leaky_relu():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 16)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=16).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=16).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))

    eps = 1e-5
    want = (x - mean) / jnp.sqrt(var + eps) * scale + bias
    want = jnp.where(want >= 0, want, want * 0.2)

    a, b = fold_batch_norm(scale, bias, mean, var, eps)
    got = fused_scale_shift_leaky_relu(x, a, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_dispatch_off_tpu_uses_reference(monkeypatch):
    gates, c = _random_gate_inputs(seed=5)
    # Spy: the TPU kernel path must NOT be taken on the CPU backend
    # (comparing outputs alone is vacuous — the reference path IS
    # _gate_math, so the numbers always agree).
    def boom(*a, **k):
        raise AssertionError("pallas kernel path taken on CPU backend")

    monkeypatch.setattr(convlstm_gates, "_fused_gates_pallas", boom)
    got = convlstm_gates.fused_lstm_gates(gates, c)  # CPU backend here
    want = convlstm_gates._gate_math(gates, c)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]), rtol=1e-6)
    # And interpret=True must route through the kernel path (now the spy).
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="pallas kernel path"):
        convlstm_gates.fused_lstm_gates(gates, c, interpret=True)
