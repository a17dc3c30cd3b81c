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


@pytest.mark.parametrize("k,f,h,w,cin,cout", [
    (7, 4, 32, 32, 32, 3),    # the final2 shape class
    (7, 8, 64, 64, 16, 3),
    (7, 2, 32, 32, 8, 3),
    (3, 4, 64, 64, 32, 3),
    (3, 2, 16, 16, 5, 4),
    (5, 4, 32, 48, 7, 3),     # non-square image
    (1, 4, 16, 16, 4, 3),
])
def test_strided_matches_direct_conv(k, f, h, w, cin, cout):
    from playablevideogeneration_tpu.ops.subpixel_conv import (
        strided_subpixel_conv,
    )

    rng = np.random.RandomState(k * 100 + f + 7)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    ref = _direct(x, kern)
    got = strided_subpixel_conv(x, kern, f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_strided_gradients_match_direct_conv():
    from playablevideogeneration_tpu.ops.subpixel_conv import (
        strided_subpixel_conv,
    )

    k, f, h, w, cin, cout = 7, 4, 32, 32, 16, 3
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(2, h, w, cout), jnp.float32)

    g_ref = jax.grad(lambda kk, xx: jnp.sum(_direct(xx, kk) * ct),
                     argnums=(0, 1))(kern, x)
    g_new = jax.grad(
        lambda kk, xx: jnp.sum(strided_subpixel_conv(xx, kk, f) * ct),
        argnums=(0, 1))(kern, x)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_final_block_strided_mode_matches_block_mode():
    """Both reformulations load the same param tree and emit the direct
    conv's output — checkpoints are interchangeable across all three."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 32, 32, 16), jnp.float32)
    direct = FinalBlock(out_planes=3, kernel_size=7, subpixel_factor=0)
    strided = FinalBlock(out_planes=3, kernel_size=7, subpixel_factor=4,
                         subpixel_mode="strided")
    v = direct.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                strided.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(np.asarray(strided.apply(v, x)),
                               np.asarray(direct.apply(v, x)),
                               rtol=1e-4, atol=1e-5)


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


# --------------------------------------------------------------------- #
# Backward-pass variants used by the frozen VGG19 (models/vgg.py)        #
# --------------------------------------------------------------------- #

from playablevideogeneration_tpu.ops.subpixel_conv import (  # noqa: E402
    conv_same_mxu_grad,
    max_pool_2x2_fast_grad,
)


@pytest.mark.parametrize("h,w,cin,cout,f", [
    (32, 32, 3, 8, 4),     # the VGG conv0 shape class
    (16, 24, 3, 8, 4),
    (30, 30, 3, 8, 4),     # indivisible -> plain transposed-conv fallback
    (16, 16, 5, 7, 2),
])
@pytest.mark.slow  # off-by-default variant (docs/PROFILE_r4.md ablations)
def test_conv_same_mxu_grad_matches_plain(h, w, cin, cout, f):
    """Forward equal bit-for-bit; input/kernel grads equal to the plain
    conv's up to f32 accumulation order."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    ct = jnp.asarray(rng.randn(2, h, w, cout), jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(conv_same_mxu_grad(x, kern, f)),
        np.asarray(_direct(x, kern)))

    g_ref = jax.grad(lambda xx, kk: jnp.sum(_direct(xx, kk) * ct),
                     argnums=(0, 1))(x, kern)
    g_new = jax.grad(lambda xx, kk: jnp.sum(conv_same_mxu_grad(xx, kk, f) * ct),
                     argnums=(0, 1))(x, kern)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("h,w", [(8, 8), (9, 7)])
@pytest.mark.slow  # off-by-default variant (docs/PROFILE_r4.md ablations)
def test_max_pool_fast_grad_forward_and_untied_grad(h, w):
    """Forward equals nn.max_pool; with all-distinct inputs the gradient
    equals XLA's select_and_scatter gradient exactly (no ties)."""
    import flax.linen as nn

    rng = np.random.RandomState(1)
    # Distinct values guarantee a unique max per window.
    x = jnp.asarray(rng.permutation(h * w * 6).reshape(2, h, w, 3),
                    jnp.float32)
    ref_pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))

    np.testing.assert_array_equal(
        np.asarray(max_pool_2x2_fast_grad(x)), np.asarray(ref_pool(x)))

    ct = jnp.asarray(rng.randn(*ref_pool(x).shape), jnp.float32)
    g_ref = jax.grad(lambda t: jnp.sum(ref_pool(t) * ct))(x)
    g_new = jax.grad(lambda t: jnp.sum(max_pool_2x2_fast_grad(t) * ct))(x)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_ref))


@pytest.mark.slow  # off-by-default variant (docs/PROFILE_r4.md ablations)
def test_max_pool_fast_grad_ties_split_mass():
    """Exact ties split the cotangent; total mass per window is conserved
    (a valid subgradient of max)."""
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    ct = jnp.asarray(np.arange(1, 5, dtype=np.float32).reshape(1, 2, 2, 1))
    g = jax.grad(lambda t: jnp.sum(max_pool_2x2_fast_grad(t) * ct))(x)
    g = np.asarray(g)[0, :, :, 0]
    # Every window is a 4-way tie: each input gets ct/4.
    expect = np.repeat(np.repeat(np.asarray(ct)[0, :, :, 0], 2, 0), 2, 1) / 4.0
    np.testing.assert_allclose(g, expect)
    assert abs(g.sum() - float(np.asarray(ct).sum())) < 1e-6


@pytest.mark.slow  # off-by-default variant (docs/PROFILE_r4.md ablations)
def test_vgg_flags_forward_identical_and_tree_stable():
    """Vgg19 with the backward optimizations on emits bit-identical
    features and the identical parameter tree (converted weights load
    into either)."""
    from playablevideogeneration_tpu.models import vgg as vgg_lib

    base = vgg_lib.Vgg19()
    fast = vgg_lib.Vgg19(grad_subpixel=4, fast_pool_grad=True)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 64, 64, 3), jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fast.init(jax.random.PRNGKey(0), x)))
    for a, b in zip(base.apply(v, x), fast.apply(v, x)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # off-by-default variant (docs/PROFILE_r4.md ablations)
def test_representation_stem_subpixel_matches_direct():
    """Encoder stem on the block grid: identical param tree and outputs
    (same conv, different loop order — f32 tolerance only)."""
    from playablevideogeneration_tpu.models.representation import (
        RepresentationNetwork,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 32, 6), jnp.float32)
    direct = RepresentationNetwork(state_features=8, stem_subpixel=0)
    sub = RepresentationNetwork(state_features=8, stem_subpixel=4)
    v = direct.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                sub.init(jax.random.PRNGKey(0), x, train=False)))
    s_d, a_d = direct.apply(v, x, train=False)
    s_s, a_s = sub.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(s_s), np.asarray(s_d),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_d),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # off-by-default variant (docs/PROFILE_r4.md ablations)
def test_representation_stem_indivisible_falls_back():
    from playablevideogeneration_tpu.models.representation import (
        RepresentationNetwork,
    )

    x = jnp.zeros((1, 24, 24, 6), jnp.float32)  # 24 % 4 == 0 -> subpixel
    y = jnp.zeros((1, 30, 30, 6), jnp.float32)  # 30 % 4 != 0 -> direct
    net = RepresentationNetwork(state_features=8, stem_subpixel=4)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    state, att = net.apply(v, y, train=False)
    assert state.shape[1:3] == (3, 3) and att.shape[-1] == 1
