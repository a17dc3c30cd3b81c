"""InceptionV3 (FID variant) feature extractor in JAX, NHWC.

Reference: pytorch_fid/inception.py:16-300 — torchvision InceptionV3 with
the FID-specific pooling tweaks (count_include_pad=False average pools in
the A/C/E mixed blocks) and TF-ported weights, producing 2048-dim pool3
activations.

This module implements the architecture; weights load from an .npz
converted from the pytorch_fid checkpoint (`convert_torch_inception`).
Inputs are (N, H, W, 3) in [0, 1]; they are bilinearly resized to 299x299
and scaled to [-1, 1] exactly as pytorch_fid does (inception.py:
resize_input/normalize_input paths).
"""
from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class BasicConv(nn.Module):
    """conv(no bias) + BN(eps=1e-3, affine) + relu."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = "VALID"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _avg_pool_3x3_no_pad_count(x):
    """3x3 stride-1 average pool with count_include_pad=False (the FID
    tweak, pytorch_fid/inception.py FIDInception blocks)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones_like(x[..., :1])
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x, window, stride):
    return nn.max_pool(x, (window, window), strides=(stride, stride))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                       name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv(self.pool_features, (1, 1), dtype=self.dtype,
                       name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # E_2 (last block) uses max pool in FID net
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.use_max_pool:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = _avg_pool_3x3_no_pad_count(x)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Produces the 2048-dim pool3 activations used for FID.

    `input_size` must stay 299 for FID parity (pytorch_fid resize_input);
    smaller values exist for cheap shape/smoke tests only.
    """

    dtype: Dtype = jnp.float32
    input_size: int = 299

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, 3) in [0, 1]."""
        n, s = x.shape[0], self.input_size
        x = jax.image.resize(x, (n, s, s, 3), method="linear")
        x = 2.0 * x - 1.0  # pytorch_fid normalize_input

        x = BasicConv(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                      name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(use_max_pool=False, dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, dtype=self.dtype, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)


def convert_torch_inception(state_dict) -> dict:
    """Converts a pytorch_fid InceptionV3 state_dict into this module's
    params (OIHW -> HWIO conv kernels; BN running stats -> batch_stats).
    The classifier head (`fc.*`, 1008-way in the TF-ported checkpoint) is
    kept under params['fc'] for the Inception Score; FID ignores it."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in state_dict.items():
        value = np.asarray(value)
        parts = key.split(".")
        # torch names: Mixed_5b.branch1x1.conv.weight etc.
        if parts[0] == "fc":
            # torch Linear stores (out, in); flax Dense wants (in, out).
            leaf = value.T if parts[-1] == "weight" else value
            put(params, ["fc", "kernel" if parts[-1] == "weight" else "bias"],
                leaf)
        elif parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], np.transpose(value, (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                put(params, parts[:-1] + ["scale"], value)
            elif parts[-1] == "bias":
                put(params, parts[:-1] + ["bias"], value)
            elif parts[-1] == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], value)
            elif parts[-1] == "running_var":
                put(batch_stats, parts[:-1] + ["var"], value)
    return {"params": params, "batch_stats": batch_stats}


def make_fid_extractor(variables: dict, dtype=jnp.float32):
    """Returns a jitted (N, H, W, 3)->[0,1] -> (N, 2048) extractor."""
    model = InceptionV3FID(dtype=dtype)

    @jax.jit
    def extract(variables, x):
        return model.apply(variables, jnp.asarray(x, jnp.float32))

    return lambda x: extract(variables, x)


def random_inception_variables(key) -> dict:
    model = InceptionV3FID()
    dummy = jnp.zeros((1, 299, 299, 3))
    return model.init({"params": key}, dummy)


# --------------------------------------------------------------------- #
# Inception Score                                                       #
# --------------------------------------------------------------------- #


def make_class_probability_fn(variables: dict, dtype=jnp.float32):
    """(N, H, W, 3) in [0,1] -> (N, classes) softmax class probabilities:
    the FID pool3 features followed by the checkpoint's classifier head
    (reference evaluation/metrics/inception_score.py:17-65)."""
    if "fc" not in variables["params"]:
        raise ValueError("Checkpoint has no classifier head ('fc') — "
                         "convert with tools/convert_weights.py fid-inception")
    model = InceptionV3FID(dtype=dtype)
    backbone = {"params": {k: v for k, v in variables["params"].items()
                           if k != "fc"},
                "batch_stats": variables["batch_stats"]}
    kernel = jnp.asarray(variables["params"]["fc"]["kernel"])
    bias = jnp.asarray(variables["params"]["fc"]["bias"])

    @jax.jit
    def probs(backbone, kernel, bias, x):
        features = model.apply(backbone, jnp.asarray(x, jnp.float32))
        return jax.nn.softmax(features @ kernel + bias, axis=-1)

    return lambda x: probs(backbone, kernel, bias, x)


def inception_score(class_probabilities: np.ndarray,
                    splits: int = 10) -> tuple:
    """Standard IS: exp(E_x KL(p(y|x) || p(y))), averaged over splits
    (reference inception_score.py:36-60).  Returns (mean, std)."""
    probs = np.asarray(class_probabilities, np.float64)
    n = probs.shape[0]
    scores = []
    for part in np.array_split(probs, min(splits, n)):
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))
