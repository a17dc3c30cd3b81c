"""Phase-decomposed x2 bilinear upsampling (ops/resize.py) parity tests.

The rendering UpBlocks' `jax.image.resize` lowering dominated the layout
costs of the round-4 train-step profile; the phase implementation must be
weight-for-weight equal (same 0.75/0.25 taps, same edge handling) to both
jax.image.resize('linear') and the torch F.interpolate semantics the
reference uses (model/layers/up_block.py:30-46).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playablevideogeneration_tpu.models.layers import UpBlock, upsample_bilinear
from playablevideogeneration_tpu.ops.resize import upsample_bilinear2_phases


@pytest.mark.parametrize("b,h,w,c", [
    (2, 16, 16, 8),
    (1, 32, 24, 3),   # non-square
    (3, 2, 2, 5),     # tiny: every pixel is an edge case
    (1, 1, 7, 2),     # single row: H edge-clamp everywhere
])
def test_matches_jax_image_resize(b, h, w, c):
    rng = np.random.RandomState(b * 100 + h + w + c)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    ref = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")
    got = upsample_bilinear2_phases(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 10, 4).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample_bilinear2_phases(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_gradient_matches_xla_path():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
    ct = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    g_ref = jax.grad(lambda t: jnp.sum(
        upsample_bilinear(t, 2, impl="xla") * ct))(x)
    g_new = jax.grad(lambda t: jnp.sum(
        upsample_bilinear2_phases(t) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_upblock_impl_switch_is_invisible():
    """Same param tree and (f32) outputs for either implementation."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
    a = UpBlock(out_planes=4, upscaling_mode="bilinear", bilinear_impl="xla",
                train=False)
    b = UpBlock(out_planes=4, upscaling_mode="bilinear", bilinear_impl="phases",
                train=False)
    v = a.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(b.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(np.asarray(b.apply(v, x)),
                               np.asarray(a.apply(v, x)),
                               rtol=1e-5, atol=1e-6)


def test_non_factor2_scales_use_xla_path():
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    assert upsample_bilinear(x, 4).shape == (1, 32, 32, 3)
