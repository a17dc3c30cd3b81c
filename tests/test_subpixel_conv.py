"""Subpixel (space-to-depth) final-conv reformulation tests.

The rendering RGB heads compute a k x k SAME conv to 3 channels; on TPU
this is reformulated on the f-block grid for MXU lane occupancy
(ops/subpixel_conv.py, docs/PROFILE_r4.md). These tests pin exact
equivalence to the direct convolution — forward and both gradients — and
that FinalBlock's parameter tree is unchanged by the switch (checkpoints
remain interchangeable between the two paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from playablevideogeneration_tpu.models.layers import FinalBlock
from playablevideogeneration_tpu.ops.subpixel_conv import (
    depth_to_space,
    space_to_depth,
    subpixel_conv,
)


def _direct(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k,f,h,w,cin,cout", [
    (7, 4, 32, 32, 32, 3),    # the final2 shape class
    (7, 8, 64, 64, 16, 3),
    (7, 2, 32, 32, 8, 3),     # p > f: needs the wider 5-tap block kernel
    (3, 4, 64, 64, 32, 3),
    (3, 2, 16, 16, 5, 4),
    (5, 4, 32, 48, 7, 3),     # non-square image
    (1, 4, 16, 16, 4, 3),
])
def test_matches_direct_conv(k, f, h, w, cin, cout):
    rng = np.random.RandomState(k * 100 + f)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    ref = _direct(x, kern)
    got = subpixel_conv(x, kern, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_direct_conv():
    k, f, h, w, cin, cout = 7, 4, 32, 32, 16, 3
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(2, h, w, cout), jnp.float32)

    g_ref = jax.grad(lambda kk, xx: jnp.sum(_direct(xx, kk) * ct),
                     argnums=(0, 1))(kern, x)
    g_sub = jax.grad(lambda kk, xx: jnp.sum(subpixel_conv(xx, kk, f) * ct),
                     argnums=(0, 1))(kern, x)
    for a, b in zip(g_ref, g_sub):
        # f32 accumulation-order noise: the block-grid conv sums the same
        # taps in a different order.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_space_to_depth_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 16, 24, 5), jnp.float32)
    y = depth_to_space(space_to_depth(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_final_block_param_tree_and_output_match():
    """Subpixel on/off: identical param tree, equal outputs (f32)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 32, 16), jnp.float32)
    direct = FinalBlock(out_planes=3, kernel_size=7, subpixel_factor=0)
    sub = FinalBlock(out_planes=3, kernel_size=7, subpixel_factor=4)
    v = direct.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(sub.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(np.asarray(sub.apply(v, x)),
                               np.asarray(direct.apply(v, x)),
                               rtol=1e-4, atol=1e-5)


def test_final_block_indivisible_resolution_falls_back():
    """Resolutions the factor doesn't divide use the direct conv (same
    params, so the choice is invisible to callers and checkpoints)."""
    x = jnp.zeros((1, 30, 30, 8), jnp.float32)
    blk = FinalBlock(out_planes=3, kernel_size=7, subpixel_factor=4)
    v = blk.init(jax.random.PRNGKey(0), x)
    assert blk.apply(v, x).shape == (1, 30, 30, 3)
