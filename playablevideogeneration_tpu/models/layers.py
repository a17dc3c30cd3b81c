"""Basic convolutional building blocks, NHWC / TPU-native.

Functional re-designs of the reference blocks:
- ResidualBlock  (reference: model/layers/residual_block.py:14-67)
- SameBlock      (reference: model/layers/same_block.py:10-47)
- UpBlock        (reference: model/layers/up_block.py:5-46)
- FinalBlock     (reference: model/layers/final_block.py:9-29)
- ConvLSTMCell   (reference: model/layers/convolutional_lstm_cell.py:6-102)

Differences from the reference by design (TPU-first):
- NHWC layout; convolutions map onto the MXU via XLA.
- The four ConvLSTM gate convolutions are fused into a single convolution
  producing 4*C channels (mathematically identical to four separate
  convolutions over the same input; one big MXU matmul instead of four).
- Downsampling uses average pooling exactly like the reference (not strided
  conv) to preserve the architecture.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from playablevideogeneration_tpu.ops.fused_upsample_conv import fused_upsample2_conv3
from playablevideogeneration_tpu.ops.subpixel_conv import (
    strided_subpixel_conv,
    subpixel_conv,
)

Dtype = Any


def tag_activation(y: jnp.ndarray, kind: str = "convout") -> jnp.ndarray:
    """Resolution-bucketed `checkpoint_name` tag on an activation.

    Every conv/upsample output in the blocks below is tagged
    `convout<bucket>` where bucket is the spatial size rounded up to a
    power of two (>= 32).  The tags are inert identities unless
    `tpu.remat_policy` selects them, e.g. `names:convout32+convout64`
    saves exactly the conv outputs at or below 64px inside the remat'd
    scan step — a resolution-bounded `dots_saveable` that buys back the
    backward-pass recompute of the cheap-in-bytes low-resolution layers
    without the full-resolution HBM cost that made plain `dots` lose the
    round-4 A/B (docs/PROFILE_r4.md).  Reference cost center: the hot
    loop at model/main_model/model.py:215-260 under full BPTT."""
    if y.ndim < 3:
        return y
    size = max(int(y.shape[-3]), int(y.shape[-2]))
    bucket = 32
    while bucket < size:
        bucket *= 2
    return checkpoint_name(y, f"{kind}{bucket}")


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    """LeakyReLU with the reference's fixed negative slope 0.2."""
    return nn.leaky_relu(x, negative_slope=0.2)


def avg_pool(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average pool with window == stride == factor (identity for factor 1)."""
    if factor == 1:
        return x
    return nn.avg_pool(x, (factor, factor), strides=(factor, factor))


def upsample_bilinear(x: jnp.ndarray, scale: int,
                      impl: str = "deconv") -> jnp.ndarray:
    """Bilinear x`scale` upsampling of NHWC tensors.

    Matches torch ``F.interpolate(scale_factor=s, mode='bilinear')``
    (align_corners=False) which jax.image.resize('linear') implements.
    ``impl="phases"`` computes the x2 case as elementwise phase blends +
    reshape interleaves; ``impl="deconv"`` as one depthwise input-dilated
    conv (both in ops/resize.py — same weights, no dot_general); any
    other scale, or ``impl="xla"``, goes through jax.image.resize.
    """
    if impl not in ("phases", "deconv", "xla"):
        raise ValueError(
            f"resize_impl must be 'phases', 'deconv' or 'xla', got {impl!r}")
    if scale == 2 and impl in ("phases", "deconv"):
        from playablevideogeneration_tpu.ops.resize import (
            upsample_bilinear2_deconv,
            upsample_bilinear2_phases,
        )
        return (upsample_bilinear2_phases(x) if impl == "phases"
                else upsample_bilinear2_deconv(x))
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method="linear")


def upsample_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method="nearest")


class _FrozenBNLeakyRelu(nn.Module):
    """Inference-path BatchNorm + LeakyReLU as one fused Pallas VPU pass.

    Declares the exact parameter/statistic structure of nn.BatchNorm
    (params scale/bias, batch_stats mean/var) so it is checkpoint- and
    init-interchangeable with the standard path; the frozen statistics
    fold into a per-channel scale/shift (ops/pallas/fused_norm_act.py).
    Forward-only: training and autodiff use the standard path.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from playablevideogeneration_tpu.ops.pallas.fused_norm_act import (
            fold_batch_norm,
            fused_scale_shift_leaky_relu,
        )

        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((features,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((features,), jnp.float32)).value
        a, b = fold_batch_norm(scale, bias, mean, var, eps=1e-5)
        return fused_scale_shift_leaky_relu(x.astype(self.dtype),
                                            a.astype(self.dtype),
                                            b.astype(self.dtype))


class BatchNorm(nn.Module):
    """BatchNorm with torch-compatible hyperparameters.

    torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9);
    epsilon 1e-5 in both.  Statistics are kept in the 'batch_stats'
    collection and computed in float32 regardless of compute dtype.

    ``activation='leaky_relu'`` appends the model's LeakyReLU(0.2); on the
    inference path (frozen statistics) on TPU, the normalization and
    activation run as ONE fused Pallas kernel over folded scale/shift
    parameters (SURVEY.md §7 step 8 'fused conv+BN+LeakyReLU' epilogue).
    """

    use_running_average: bool = False
    affine: bool = True
    dtype: Dtype = jnp.float32
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        from playablevideogeneration_tpu.ops.pallas.convlstm_gates import (
            pallas_enabled,
        )

        if (self.activation == "leaky_relu" and self.use_running_average
                and self.affine and pallas_enabled()
                and not self.is_initializing()):
            return _FrozenBNLeakyRelu(dtype=self.dtype, name="BatchNorm_0")(x)

        y = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.activation == "leaky_relu":
            y = leaky_relu(y)
        return y


class ResidualBlock(nn.Module):
    """conv3x3 -> avgpool(d) -> BN -> lrelu -> conv3x3 -> BN (+ shortcut) -> add -> lrelu.

    Shortcut = conv1x1 -> avgpool(d) -> BN when the shape changes.
    Reference: model/layers/residual_block.py:49-67.
    """

    out_planes: int
    downsample_factor: int = 1
    last_affine: bool = True
    drop_final_activation: bool = False
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_planes = x.shape[-1]
        out = tag_activation(nn.Conv(self.out_planes, (3, 3), use_bias=False,
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name="conv1")(x))
        out = avg_pool(out, self.downsample_factor)
        out = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                        activation="leaky_relu", name="bn1")(out)
        out = tag_activation(nn.Conv(self.out_planes, (3, 3), use_bias=False,
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name="conv2")(out))
        out = BatchNorm(use_running_average=not self.train, affine=self.last_affine,
                        dtype=self.dtype, name="bn2")(out)

        identity = x
        if self.downsample_factor != 1 or in_planes != self.out_planes:
            identity = tag_activation(
                nn.Conv(self.out_planes, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="shortcut_conv")(x))
            identity = avg_pool(identity, self.downsample_factor)
            identity = BatchNorm(use_running_average=not self.train, affine=self.last_affine,
                                 dtype=self.dtype, name="shortcut_bn")(identity)

        out = out + identity
        if not self.drop_final_activation:
            out = leaky_relu(out)
        return out


class SameBlock(nn.Module):
    """conv3x3 -> optional avgpool -> BN -> lrelu (reference same_block.py:36-47)."""

    out_planes: int
    downsample_factor: int = 1
    drop_final_activation: bool = False
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = tag_activation(nn.Conv(self.out_planes, (3, 3), use_bias=False,
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     name="conv1")(x))
        out = avg_pool(out, self.downsample_factor)
        activation = None if self.drop_final_activation else "leaky_relu"
        out = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                        activation=activation, name="bn1")(out)
        return out


class UpBlock(nn.Module):
    """interp x`scale` -> conv -> BN -> lrelu; `late_upscaling` moves the
    interpolation after the activation (reference up_block.py:30-46).

    When the block is a bilinear x2 early-upscale with a 3x3 kernel (the
    rendering network's hot configuration) and ``fuse_upsample`` is set,
    the interp+conv pair is computed as one conv on the coarse grid
    (ops/fused_upsample_conv.py — exact same math, identical FLOPs, no
    materialized upsampled tensor). The parameter tree is unchanged, so
    checkpoints are interchangeable between the two paths."""

    out_planes: int
    kernel_size: int = 3
    scale_factor: int = 2
    upscaling_mode: str = "nearest"
    late_upscaling: bool = False
    fuse_upsample: bool = False
    # x2 bilinear implementation: "phases" (ops/resize.py, no dot_general)
    # or "xla" (jax.image.resize). Exact same interpolation either way.
    bilinear_impl: str = "deconv"
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.upscaling_mode == "bilinear":
            up = functools.partial(upsample_bilinear, impl=self.bilinear_impl)
        else:
            up = upsample_nearest
        fused = (self.fuse_upsample and not self.late_upscaling
                 and self.upscaling_mode == "bilinear"
                 and self.scale_factor == 2 and self.kernel_size == 3)
        out = x
        if fused:
            out = _FusedUpConv(features=self.out_planes, dtype=self.dtype,
                               name="conv")(out)
        else:
            if not self.late_upscaling:
                out = tag_activation(up(out, self.scale_factor), kind="upout")
            out = nn.Conv(self.out_planes, (self.kernel_size, self.kernel_size),
                          use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                          name="conv")(out)
        out = tag_activation(out)
        out = BatchNorm(use_running_average=not self.train, dtype=self.dtype,
                        activation="leaky_relu", name="norm")(out)
        if self.late_upscaling:
            out = tag_activation(up(out, self.scale_factor), kind="upout")
        return out


class _FusedUpConv(nn.Module):
    """bilinear x2 upsample + 3x3 SAME conv as one coarse-grid conv, with
    the identical ``kernel`` parameter as ``nn.Conv(features, (3, 3),
    use_bias=False)`` (see ops/fused_upsample_conv.py for the exactness
    argument)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        return fused_upsample2_conv3(x, kernel)


class _SubpixelConv(nn.Module):
    """SAME conv computed on the space-to-depth block grid.

    Drop-in replacement for ``nn.Conv(features, (k, k), use_bias=True)``:
    identical parameter tree (kernel [k,k,Cin,Cout] + bias, same
    initializers), identical math (ops/subpixel_conv.py proves tap-for-tap
    equality) — but the MXU sees f²·Cout output lanes instead of Cout,
    which is what makes the few-channel RGB head fast (docs/PROFILE_r4.md:
    the direct 7x7 32->3 conv ran at 1.1 TF/s, 27% of the train step).
    """

    features: int
    kernel_size: int
    factor: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    # "block": space-to-depth grid conv; "strided": one stride-f conv on
    # the fine grid (no layout passes, (K/k)² vs K²f²/k² MAC inflation —
    # see ops/subpixel_conv.py). Both are tap-exact vs the direct conv.
    mode: str = "block"

    @nn.compact
    def __call__(self, x):
        if self.mode not in ("strided", "block"):
            raise ValueError(
                f"subpixel mode must be 'strided' or 'block', got {self.mode!r}")
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features), jnp.float32)
        conv = (strided_subpixel_conv if self.mode == "strided"
                else subpixel_conv)
        if not self.use_bias:
            x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            return conv(x, kernel, self.factor)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        return conv(x, kernel, self.factor) + bias


class FinalBlock(nn.Module):
    """conv -> tanh, producing an image in [-1, 1] (reference final_block.py:24-29).

    ``subpixel_factor`` > 0 computes the same conv via the space-to-depth
    reformulation when the resolution divides by the factor; 0 keeps the
    direct conv."""

    out_planes: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32
    subpixel_factor: int = 0
    subpixel_mode: str = "block"

    @nn.compact
    def __call__(self, x):
        f = self.subpixel_factor
        if f and x.shape[1] % f == 0 and x.shape[2] % f == 0:
            x = _SubpixelConv(features=self.out_planes, kernel_size=self.kernel_size,
                              factor=f, mode=self.subpixel_mode,
                              dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.out_planes, (self.kernel_size, self.kernel_size), use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        return jnp.tanh(tag_activation(x))


def broadcast_to_spatial(vec: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, F) -> (B, height, width, F): spatial broadcast of a feature vector.

    TPU-native equivalent of the reference's make_2d_tensor
    (conv_dynamics_network.py:64-76); the broadcast is free under XLA fusion.
    """
    return jnp.broadcast_to(vec[:, None, None, :], (vec.shape[0], height, width, vec.shape[-1]))


def channelwise_concat(tensors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concatenates NHWC tensors and (B, F) vectors channelwise, broadcasting
    vectors over the spatial dims (reference conv_dynamics_network.py:78-109)."""
    height = width = None
    for t in tensors:
        if t.ndim == 4:
            height, width = t.shape[1], t.shape[2]
            break
    if height is None:
        raise ValueError("At least one input must have spatial dimensions")
    expanded = [
        t if t.ndim == 4 else broadcast_to_spatial(t, height, width) for t in tensors
    ]
    return jnp.concatenate(expanded, axis=-1)


class ConvLSTMCell(nn.Module):
    """Convolutional LSTM cell as a pure (carry, x) -> (carry, y) function.

    The reference keeps recurrent state in module attributes mutated across
    forward calls (convolutional_lstm.py:43-73); here the (h, c) carry is
    explicit so the time loop becomes a `lax.scan`.

    The four 3x3 gate convolutions of the reference
    (convolutional_lstm_cell.py:22-25) are fused into one convolution with
    4*out_planes output channels; splitting its output reproduces the exact
    same math with a single MXU pass.
    """

    out_planes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray):
        from playablevideogeneration_tpu.ops.pallas.convlstm_gates import (
            fused_lstm_gates,
        )

        h, c = carry
        z = jnp.concatenate([x, h], axis=-1)
        gates = tag_activation(
            nn.Conv(4 * self.out_planes, (3, 3), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="gates")(z))
        # Post-conv gate update: one fused Pallas VPU pass on TPU, the
        # equivalent jnp chain elsewhere (ops/pallas/convlstm_gates.py).
        new_h, new_c = fused_lstm_gates(gates, c)
        return (new_h, new_c), new_h


class ConvLSTM(nn.Module):
    """ConvLSTM with learnable initial (h, c) states.

    Reference: model/layers/convolutional_lstm.py:33-34 keeps the learnable
    initial states as (C, H, W) parameters expanded per batch; we do the same
    in HWC layout, but state is threaded explicitly via `init_carry`.
    """

    out_planes: int
    height: int
    width: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.cell = ConvLSTMCell(out_planes=self.out_planes, dtype=self.dtype)
        self.initial_hidden_state = self.param(
            "initial_hidden_state", nn.initializers.zeros,
            (self.height, self.width, self.out_planes), jnp.float32)
        self.initial_cell_state = self.param(
            "initial_cell_state", nn.initializers.zeros,
            (self.height, self.width, self.out_planes), jnp.float32)

    def init_carry(self, batch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = jnp.broadcast_to(self.initial_hidden_state[None],
                             (batch_size,) + self.initial_hidden_state.shape)
        c = jnp.broadcast_to(self.initial_cell_state[None],
                             (batch_size,) + self.initial_cell_state.shape)
        return h.astype(self.dtype), c.astype(self.dtype)

    def __call__(self, carry, x):
        return self.cell(carry, x)
