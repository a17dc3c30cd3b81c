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
from playablevideogeneration_tpu.ops.resize import (
    upsample_bilinear2_deconv,
    upsample_bilinear2_phases,
)


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


@pytest.mark.parametrize("b,h,w,c", [
    (2, 16, 16, 8),
    (1, 32, 24, 3),   # non-square
    (3, 2, 2, 5),     # tiny: every pixel is an edge case
    (1, 1, 7, 2),     # single row: H edge-clamp everywhere
])
def test_deconv_matches_jax_image_resize(b, h, w, c):
    rng = np.random.RandomState(b * 100 + h + w + c)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    ref = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")
    got = upsample_bilinear2_deconv(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,h,w,c", [
    (2, 8, 8, 4),
    (3, 2, 2, 5),   # n=2: the border folds meet
    (1, 1, 7, 2),   # n=1: every padded row folds into one source row
])
def test_deconv_gradient_matches_xla_path(b, h, w, c):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    ct = jnp.asarray(rng.randn(b, 2 * h, 2 * w, c), jnp.float32)
    g_ref = jax.grad(lambda t: jnp.sum(
        upsample_bilinear(t, 2, impl="xla") * ct))(x)
    g_new = jax.grad(lambda t: jnp.sum(
        upsample_bilinear2_deconv(t) * ct))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_deconv_bf16_close_to_f32_resize_then_cast():
    rng = np.random.RandomState(6)
    x32 = jnp.asarray(rng.randn(2, 16, 12, 4), jnp.float32)
    got = upsample_bilinear2_deconv(x32.astype(jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    ref = jax.image.resize(x32, (2, 32, 24, 4), method="linear")
    # Inputs are bf16-quantized and the result is downcast once, so the
    # comparison against the f32 reference is bounded by ~2 bf16 ulps
    # (2^-8 relative) plus the input quantization error.
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


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


@pytest.mark.parametrize("impl", ["phases", "deconv"])
def test_upblock_impl_switch_is_invisible(impl):
    """Same param tree and (f32) outputs for every implementation."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 6), jnp.float32)
    a = UpBlock(out_planes=4, upscaling_mode="bilinear", bilinear_impl="xla",
                train=False)
    b = UpBlock(out_planes=4, upscaling_mode="bilinear", bilinear_impl=impl,
                train=False)
    v = a.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(b.init(jax.random.PRNGKey(0), x)))
    np.testing.assert_allclose(np.asarray(b.apply(v, x)),
                               np.asarray(a.apply(v, x)),
                               rtol=1e-5, atol=1e-6)


def test_non_factor2_scales_use_xla_path():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    got = upsample_bilinear(x, 4)
    ref = jax.image.resize(x, (1, 32, 32, 3), method="linear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_bf16_matches_f32_resize_then_cast():
    """In bf16 the phase op blends internally in f32 with one final
    downcast, so it must be BIT-EXACT to resize-in-f32-then-cast — the
    round-4 advisor measured up to ~0.016 divergence on ~40% of elements
    when the blends themselves rounded per-phase in bf16."""
    rng = np.random.RandomState(5)
    x32 = jnp.asarray(rng.randn(2, 16, 12, 4), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    got = upsample_bilinear2_phases(x16)
    assert got.dtype == jnp.bfloat16
    ref = jax.image.resize(x16.astype(jnp.float32), (2, 32, 24, 4),
                           method="linear").astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_invalid_mode_strings_raise():
    """Typos in impl/mode knobs must fail loudly, not silently pick a
    different implementation (round-4 advisor finding)."""
    from playablevideogeneration_tpu.models.layers import _SubpixelConv

    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="resize_impl"):
        upsample_bilinear(x, 2, impl="phase")
    bad = _SubpixelConv(features=3, kernel_size=3, factor=2, mode="stride")
    with pytest.raises(ValueError, match="subpixel mode"):
        bad.init(jax.random.PRNGKey(0), x)
