"""VGG19 feature extractor for the perceptual loss and VGG-cosine metric.

Reference: model/layers/vgg.py:8-55 splits a torchvision-pretrained VGG19
into 5 slices ending after relu1_1, relu2_1, relu3_1, relu4_1, relu5_1 and
returns the 5 feature maps, frozen.

This environment has no torchvision and no network egress, so pretrained
weights cannot be downloaded at build time.  The module therefore supports:
  1. loading converted weights from an .npz file (``load_vgg_params``), the
     production path — `convert_torch_vgg19` maps a torchvision state_dict;
  2. deterministic random initialization as a fallback.  Random VGG
     features still provide a meaningful multi-scale perceptual training
     signal; metric parity requires real weights.

Inputs are NHWC in [-1, 1] (the model's frame range).  The torchvision VGG
expects ImageNet-normalized RGB in [0, 1]; the conversion is applied
internally so callers can pass frames directly, matching how the reference
feeds its [-1, 1] frames straight into VGG (training/losses.py:452-455 —
the reference does NOT re-normalize either, so we replicate feeding the
[-1, 1] range unchanged for parity).
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from playablevideogeneration_tpu.ops import subpixel_conv as subpixel

# Convolution channel plan of VGG19 features, with slice boundaries after
# relu1_1 (layer 0), relu2_1 (2), relu3_1 (4), relu4_1 (8), relu5_1 (12).
_VGG19_PLAN = [
    # (out_channels, maxpool_before)
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False), (256, False),
    (512, True), (512, False), (512, False), (512, False),
    (512, True), (512, False), (512, False), (512, False),
]
# Indices (into the conv list) after whose ReLU a slice output is taken:
# relu1_1 -> conv0, relu2_1 -> conv2, relu3_1 -> conv4, relu4_1 -> conv8,
# relu5_1 -> conv12  (reference vgg.py:25-35).
_SLICE_AFTER = (0, 2, 4, 8, 12)


class Vgg19(nn.Module):
    """VGG19 up to relu5_1, emitting the reference's 5 feature slices.

    Two training-path MXU optimizations, both forward-identical (default
    off; the trainer enables them — see ``make_vgg_apply``):

    - ``grad_subpixel``: the first conv's 3-channel input cotangent is the
      profiled worst VGG op (a [*,*,*,3] backward conv at 185 GB/s,
      docs/PROFILE_r4.md); ``conv_same_mxu_grad`` computes the identical
      gradient on the space-to-depth block grid.
    - ``fast_pool_grad``: replaces XLA's ``select_and_scatter`` max-pool
      backward with an elementwise tie-splitting subgradient (exact except
      that exact ties share the mass instead of following selection order;
      the net is frozen, so this only perturbs the training signal's
      distribution across tied pixels).
    """

    dtype: Any = jnp.float32
    grad_subpixel: int = 0
    fast_pool_grad: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outputs = []
        for i, (channels, pool_before) in enumerate(_VGG19_PLAN):
            if pool_before:
                if self.fast_pool_grad:
                    x = subpixel.max_pool_2x2_fast_grad(x)
                else:
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if i == 0 and self.grad_subpixel > 1:
                x = _MxuGradConv(channels, self.grad_subpixel, self.dtype,
                                 name=f"conv{i}")(x)
            else:
                x = nn.Conv(channels, (3, 3), use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i}")(x)
            x = nn.relu(x)
            if i in _SLICE_AFTER:
                outputs.append(x)
            if i == _SLICE_AFTER[-1]:
                break
        return outputs


class _MxuGradConv(nn.Module):
    """3x3 SAME conv with the same param tree as ``nn.Conv`` (kernel,
    bias) whose backward-input runs on the subpixel block grid."""

    features: int
    grad_factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = subpixel.conv_same_mxu_grad(
            x.astype(self.dtype), kernel.astype(self.dtype),
            self.grad_factor)
        return y + bias.astype(self.dtype)


def convert_torch_vgg19(state_dict) -> dict:
    """Converts a torchvision vgg19().features state_dict to this module's
    params.  Torch conv weights are OIHW; flax expects HWIO."""
    torch_layers = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
    params = {}
    for i, tl in enumerate(torch_layers[: _SLICE_AFTER[-1] + 1]):
        w = np.asarray(state_dict[f"{tl}.weight"])
        b = np.asarray(state_dict[f"{tl}.bias"])
        params[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),
            "bias": b,
        }
    return {"params": params}


def save_vgg_params(variables: dict, path: str):
    flat = {}

    def _walk(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                _walk(key, v)
            else:
                flat[key] = np.asarray(v)

    _walk("", variables["params"])
    np.savez(path, **flat)


def load_vgg_params(path: str) -> dict:
    data = np.load(path)
    params: dict = {}
    for key, value in data.items():
        parts = key.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)
    return {"params": params}


def make_vgg_apply(variables: dict, dtype=jnp.float32,
                   grad_subpixel: int = 0, fast_pool_grad: bool = False):
    """Returns a closure (N, H, W, 3) -> [5 feature maps] over fixed params.

    ``grad_subpixel``/``fast_pool_grad`` select the forward-identical
    backward-pass optimizations (see ``Vgg19``); the trainer turns them on,
    inference/metric paths keep the defaults."""
    model = Vgg19(dtype=dtype, grad_subpixel=grad_subpixel,
                  fast_pool_grad=fast_pool_grad)

    def apply(x):
        return model.apply(variables, x)

    return apply


def random_vgg_variables(key) -> dict:
    """Deterministic random initialization fallback (no pretrained weights
    available in this environment)."""
    model = Vgg19()
    dummy = jnp.zeros((1, 64, 64, 3))
    return model.init({"params": key}, dummy)
