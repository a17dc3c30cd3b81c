"""Fused bilinear-x2-upsample + 3x3-conv tests (ops/fused_upsample_conv.py).

The rendering UpBlocks (reference up_block.py:30-46, early upscaling as
used by model/rendering_network.py) compute conv3x3(bilinear_x2(x)); the
fused op computes the identical map as one coarse-grid conv plus exact
border corrections. These tests pin equality — forward and both
gradients, including the 1-pixel border ring and degenerate shapes — and
that UpBlock's parameter tree is unchanged by the fusion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

# The fused-upsample conv ships OFF by default (docs/PROFILE_r4.md:
# on-chip A/B measured it slower); its parity suite runs in the slow tier.
pytestmark = pytest.mark.slow

from playablevideogeneration_tpu.models.layers import UpBlock, upsample_bilinear
from playablevideogeneration_tpu.ops.fused_upsample_conv import (
    fused_upsample2_conv3,
)


def _plain(x, kernel):
    up = upsample_bilinear(x, 2)
    return lax.conv_general_dilated(
        up, kernel, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,cin,cout", [
    (8, 8, 16, 8),     # the up-block shape class
    (5, 7, 3, 4),      # odd sizes
    (2, 2, 3, 3),      # border-dominated
    (1, 4, 2, 2),      # degenerate H
    (3, 1, 2, 2),      # degenerate W
])
def test_fused_matches_plain_forward(h, w, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    a = np.asarray(_plain(x, k))
    b = np.asarray(fused_upsample2_conv3(x, k))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_fused_matches_plain_gradients():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 6, 5), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 5, 4), jnp.float32)
    ct = jnp.asarray(rng.randn(2, 12, 12, 4), jnp.float32)
    g_ref = jax.grad(lambda xx, kk: jnp.sum(_plain(xx, kk) * ct),
                     argnums=(0, 1))(x, k)
    g_new = jax.grad(lambda xx, kk: jnp.sum(fused_upsample2_conv3(xx, kk) * ct),
                     argnums=(0, 1))(x, k)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_upblock_fusion_param_tree_and_output_match():
    """UpBlock fused on/off: identical param tree (checkpoints
    interchangeable), equal outputs."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
    plain = UpBlock(out_planes=4, upscaling_mode="bilinear",
                    fuse_upsample=False, train=False)
    fused = UpBlock(out_planes=4, upscaling_mode="bilinear",
                    fuse_upsample=True, train=False)
    v = plain.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(fused.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(
        np.asarray(fused.apply(v, x)), np.asarray(plain.apply(v, x)),
        rtol=1e-4, atol=1e-5)


def test_upblock_fusion_gates_on_configuration():
    """Late-upscaling / nearest / non-3x3 blocks keep the plain path (the
    fused op only models the bilinear x2 early-upscale composite)."""
    x = jnp.zeros((1, 4, 4, 3), jnp.float32)
    for kwargs in ({"late_upscaling": True, "upscaling_mode": "bilinear"},
                   {"upscaling_mode": "nearest"},
                   {"upscaling_mode": "bilinear", "kernel_size": 5}):
        blk = UpBlock(out_planes=4, fuse_upsample=True, train=False, **kwargs)
        v = blk.init(jax.random.PRNGKey(0), x)
        assert blk.apply(v, x).shape[:3] == (1, 8, 8)
