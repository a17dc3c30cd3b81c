"""I3D (Inflated Inception-V1, kinetics-400) video embedder for FVD, NDHWC.

Reference: evaluation/metrics/fvd.py:67-126 loads the TF-Hub I3D graph and
takes its logits-layer embeddings over 224x224 videos in [-1, 1].

This is the architecture in JAX; weights load from an .npz converted from
the TF-Hub checkpoint (`convert_tf_i3d` maps variable names).  Inputs are
(N, T, H, W, 3) in [0, 1]; resizing to 224x224 and scaling to [-1, 1]
happens inside, matching the reference preprocessing (fvd.py:39-56).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class Unit3D(nn.Module):
    """conv3d + BN + relu (I3D basic unit; BN eps 1e-3)."""

    features: int
    kernel: tuple = (1, 1, 1)
    strides: tuple = (1, 1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3d")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.9,
                         use_scale=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


def _max_pool_3d(x, window, strides):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


class InceptionModule(nn.Module):
    """I3D inception block: 1x1, 1x1->3x3, 1x1->3x3, pool->1x1 branches."""

    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3b: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        br0 = Unit3D(self.b0, (1, 1, 1), dtype=self.dtype, name="Branch_0")(x)
        br1 = Unit3D(self.b1a, (1, 1, 1), dtype=self.dtype, name="Branch_1a")(x)
        br1 = Unit3D(self.b1b, (3, 3, 3), dtype=self.dtype, name="Branch_1b")(br1)
        br2 = Unit3D(self.b2a, (1, 1, 1), dtype=self.dtype, name="Branch_2a")(x)
        br2 = Unit3D(self.b2b, (3, 3, 3), dtype=self.dtype, name="Branch_2b")(br2)
        br3 = _max_pool_3d(x, (3, 3, 3), (1, 1, 1))
        br3 = Unit3D(self.b3b, (1, 1, 1), dtype=self.dtype, name="Branch_3b")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class I3D(nn.Module):
    """I3D backbone producing the 400-dim averaged kinetics logits used by
    FVD (the reference embeds 'RGB/inception_i3d/Mean:0', fvd.py:118-126)."""

    dtype: Dtype = jnp.float32
    # 224 for FVD parity (reference fvd.py:39-56); smaller only for tests.
    input_size: int = 224

    @nn.compact
    def __call__(self, videos):
        """videos: (N, T, H, W, 3) in [0, 1]."""
        n, t = videos.shape[:2]
        s = self.input_size
        x = jax.image.resize(videos, (n, t, s, s, 3), method="linear")
        x = 2.0 * x - 1.0  # reference fvd.py:39-56 preprocessing

        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = _max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, (1, 1, 1), dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = _max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(64, 96, 128, 16, 32, 32, dtype=self.dtype,
                            name="Mixed_3b")(x)
        x = InceptionModule(128, 128, 192, 32, 96, 64, dtype=self.dtype,
                            name="Mixed_3c")(x)
        x = _max_pool_3d(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule(192, 96, 208, 16, 48, 64, dtype=self.dtype,
                            name="Mixed_4b")(x)
        x = InceptionModule(160, 112, 224, 24, 64, 64, dtype=self.dtype,
                            name="Mixed_4c")(x)
        x = InceptionModule(128, 128, 256, 24, 64, 64, dtype=self.dtype,
                            name="Mixed_4d")(x)
        x = InceptionModule(112, 144, 288, 32, 64, 64, dtype=self.dtype,
                            name="Mixed_4e")(x)
        x = InceptionModule(256, 160, 320, 32, 128, 128, dtype=self.dtype,
                            name="Mixed_4f")(x)
        x = _max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(256, 160, 320, 32, 128, 128, dtype=self.dtype,
                            name="Mixed_5b")(x)
        x = InceptionModule(384, 192, 384, 48, 128, 128, dtype=self.dtype,
                            name="Mixed_5c")(x)
        # Logits head (kinetics-i3d): avg_pool3d window (2, 7, 7) stride 1
        # VALID, then a 1x1x1 logits conv and a temporal mean — this is the
        # 'RGB/inception_i3d/Mean:0' tensor the reference FVD embeds
        # (fvd.py:118-126).  The spatial window adapts for test-size inputs
        # (it equals the full 7x7 map at the parity input size 224).
        tw = min(2, x.shape[1])
        x = nn.avg_pool(x, (tw, x.shape[2], x.shape[3]),
                        strides=(1, 1, 1), padding="VALID")
        x = nn.Conv(400, (1, 1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="Logits_Conv3d_0c_1x1")(x)
        return jnp.mean(x, axis=(1, 2, 3))  # (N, 400) averaged logits


# TF branch-unit name -> this module's Unit3D name inside InceptionModule.
_BRANCH_UNIT_MAP = {
    ("Branch_0", "Conv3d_0a_1x1"): "Branch_0",
    ("Branch_1", "Conv3d_0a_1x1"): "Branch_1a",
    ("Branch_1", "Conv3d_0b_3x3"): "Branch_1b",
    ("Branch_2", "Conv3d_0a_1x1"): "Branch_2a",
    ("Branch_2", "Conv3d_0b_3x3"): "Branch_2b",
    ("Branch_3", "Conv3d_0b_1x1"): "Branch_3b",
}
# TF leaf name -> (collection, module sublayer, leaf).
_LEAF_MAP = {
    ("conv_3d", "w"): ("params", "conv3d", "kernel"),
    ("conv_3d", "b"): ("params", "conv3d", "bias"),
    ("batch_norm", "beta"): ("params", "bn", "bias"),
    ("batch_norm", "moving_mean"): ("batch_stats", "bn", "mean"),
    ("batch_norm", "moving_variance"): ("batch_stats", "bn", "var"),
}


def convert_tf_i3d(variables_dict) -> dict:
    """Converts TF-Hub i3d-kinetics-400 variables ({name: array}, names like
    'RGB/inception_i3d/Mixed_3b/Branch_1/Conv3d_0a_1x1/conv_3d/w') into this
    module's params/batch_stats.  TF conv kernels are already DHWIO; sonnet
    BatchNorm stats come shaped (1, 1, 1, 1, C) and are flattened."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in variables_dict.items():
        parts = [p for p in key.split("/") if p not in ("RGB", "inception_i3d")]
        if len(parts) < 3 or (parts[-2], parts[-1]) not in _LEAF_MAP:
            continue
        collection, sublayer, leaf = _LEAF_MAP[(parts[-2], parts[-1])]
        value = np.asarray(value)
        if parts[-1] != "w":  # bias / BN stats -> (C,)
            value = value.reshape(-1)
        scope = parts[:-2]
        if scope[0] == "Logits":
            # 'Logits/Conv3d_0c_1x1/conv_3d/{w,b}' -> the flat logits conv.
            path = ["Logits_Conv3d_0c_1x1", leaf]
        elif len(scope) == 3:  # Mixed_Xx / Branch_i / Conv3d_0?_...
            unit = _BRANCH_UNIT_MAP[(scope[1], scope[2])]
            path = [scope[0], unit, sublayer, leaf]
        else:  # stem: Conv3d_1a_7x7 etc.
            path = [scope[0], sublayer, leaf]
        put(params if collection == "params" else batch_stats, path, value)
    return {"params": params, "batch_stats": batch_stats}


def make_fvd_embedder(variables: dict, dtype=jnp.float32):
    """Returns a jitted (N, T, H, W, 3) in [0,1] -> (N, 400) embedder."""
    model = I3D(dtype=dtype)

    @jax.jit
    def embed(variables, videos):
        return model.apply(variables, jnp.asarray(videos, jnp.float32))

    return lambda videos: embed(variables, videos)


def random_i3d_variables(key, frames: int = 9, input_size: int = 64) -> dict:
    """Random-init variables (tree shape is independent of input_size)."""
    model = I3D(input_size=input_size)
    dummy = jnp.zeros((1, frames, 64, 64, 3))
    return model.init({"params": key}, dummy)
