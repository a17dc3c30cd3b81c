"""Pretrained-backbone pipeline tests.

Covers the weight converters (torch/TF naming -> flax trees), numerical
parity of the JAX backbones against torch-built clones with random weights
(the strongest check possible in this egress-free environment: it validates
architecture + converter end-to-end; with real checkpoints the same code
path yields reference-parity features), and the config-driven wiring.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Backbone-clone parity: minutes of torch+XLA compile on this host.
pytestmark = pytest.mark.slow

from playablevideogeneration_tpu.utils import pretrained

# Conv numerics differ across backends; parity checks use highest precision.
ATOL = 1e-4 if jax.default_backend() == "cpu" else 5e-3


# --------------------------------------------------------------------- #
# npz round trip                                                        #
# --------------------------------------------------------------------- #


def test_save_load_npz_roundtrip(tmp_path):
    variables = {
        "params": {"block": {"conv": {"kernel": np.ones((3, 3, 2, 4), np.float32)},
                             "bn": {"bias": np.zeros((4,), np.float32)}}},
        "batch_stats": {"block": {"bn": {"mean": np.full((4,), 2.0, np.float32),
                                         "var": np.full((4,), 3.0, np.float32)}}},
    }
    path = str(tmp_path / "w.npz")
    pretrained.save_variables_npz(variables, path)
    loaded = pretrained.load_variables_npz(path)
    np.testing.assert_array_equal(
        loaded["params"]["block"]["conv"]["kernel"],
        variables["params"]["block"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        loaded["batch_stats"]["block"]["bn"]["var"],
        variables["batch_stats"]["block"]["bn"]["var"])


# --------------------------------------------------------------------- #
# VGG19: full numerical parity against a torch clone                    #
# --------------------------------------------------------------------- #


def _torch_vgg19_features():
    """VGG19 `features` clone built from torch primitives with torchvision's
    exact Sequential indices/key names (reference model/layers/vgg.py:15)."""
    import torch.nn as tnn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=False))
            in_ch = v
    return tnn.Sequential(*layers)


def test_vgg19_converter_numerical_parity():
    import torch

    torch.manual_seed(0)
    net = _torch_vgg19_features().eval()
    state = {k: v for k, v in net.state_dict().items()}

    from playablevideogeneration_tpu.models import vgg as vgg_lib

    variables = vgg_lib.convert_torch_vgg19(
        {k: v.numpy() for k, v in state.items()})
    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)

    with jax.default_matmul_precision("highest"):
        jax_feats = vgg_lib.Vgg19().apply(variables, jnp.asarray(x))

    # torch side: capture after relu1_1 (idx 1), relu2_1 (6), relu3_1 (11),
    # relu4_1 (20), relu5_1 (29) — the reference slice boundaries.
    t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    torch_feats = []
    with torch.no_grad():
        for i, layer in enumerate(net):
            t = layer(t)
            if i in (1, 6, 11, 20, 29):
                torch_feats.append(t.numpy())
            if i == 29:
                break

    assert len(jax_feats) == 5
    for jf, tf_ in zip(jax_feats, torch_feats):
        np.testing.assert_allclose(
            np.asarray(jf), np.transpose(tf_, (0, 2, 3, 1)), atol=ATOL, rtol=1e-3)


# --------------------------------------------------------------------- #
# FID Inception: block-level parity + converter round trip              #
# --------------------------------------------------------------------- #


def test_fid_avg_pool_matches_torch_count_include_pad_false():
    import torch

    from playablevideogeneration_tpu.evaluation.metrics.inception import (
        _avg_pool_3x3_no_pad_count,
    )

    x = np.random.default_rng(1).normal(size=(2, 9, 9, 5)).astype(np.float32)
    got = np.asarray(_avg_pool_3x3_no_pad_count(jnp.asarray(x)))
    pool = torch.nn.AvgPool2d(3, stride=1, padding=1, count_include_pad=False)
    want = pool(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=1e-5, rtol=1e-5)


def test_basic_conv_matches_torch_conv_bn_relu():
    import torch

    from playablevideogeneration_tpu.evaluation.metrics.inception import BasicConv

    torch.manual_seed(3)
    conv = torch.nn.Conv2d(3, 8, 3, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3)
    bn.running_mean.normal_(); bn.running_var.uniform_(0.5, 2.0)
    bn.weight.data.uniform_(0.5, 1.5); bn.bias.data.normal_()
    bn.eval()

    variables = {
        "params": {"conv": {"kernel": np.transpose(conv.weight.detach().numpy(),
                                                   (2, 3, 1, 0))},
                   "bn": {"scale": bn.weight.detach().numpy(),
                          "bias": bn.bias.detach().numpy()}},
        "batch_stats": {"bn": {"mean": bn.running_mean.numpy(),
                               "var": bn.running_var.numpy()}},
    }
    x = np.random.default_rng(4).normal(size=(2, 12, 12, 3)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(BasicConv(8, (3, 3)).apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = torch.relu(bn(conv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))))).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=ATOL, rtol=1e-3)


def _invert_inception_tree(variables):
    """Builds a pytorch_fid-style state_dict from this module's variables —
    the exact inverse naming of convert_torch_inception."""
    state = {}

    def walk(prefix, tree, collection):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(name, v, collection)
                continue
            v = np.asarray(v)
            if collection == "params" and k == "kernel":
                state[name.replace(".kernel", ".weight")] = np.transpose(
                    v, (3, 2, 0, 1))
            elif collection == "params" and k == "scale":
                state[name.replace(".scale", ".weight")] = v
            elif collection == "params" and k == "bias":
                state[name] = v
            elif collection == "batch_stats" and k == "mean":
                state[name.replace(".mean", ".running_mean")] = v
            elif collection == "batch_stats" and k == "var":
                state[name.replace(".var", ".running_var")] = v

    walk("", variables["params"], "params")
    walk("", variables["batch_stats"], "batch_stats")
    return state


def test_inception_converter_roundtrip_and_shape():
    from playablevideogeneration_tpu.evaluation.metrics.inception import (
        InceptionV3FID,
        convert_torch_inception,
    )

    model = InceptionV3FID(input_size=75)  # small for test speed
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    state = _invert_inception_tree(jax.tree.map(np.asarray, dict(variables)))
    # The classifier head real checkpoints carry: kept for the Inception
    # Score (transposed to flax Dense layout), not part of the FID net.
    state["fc.weight"] = np.arange(2048 * 4, dtype=np.float32).reshape(4, 2048)
    state["fc.bias"] = np.zeros((4,), np.float32)
    converted = convert_torch_inception(state)
    fc = converted["params"].pop("fc")
    assert fc["kernel"].shape == (2048, 4)
    np.testing.assert_array_equal(fc["kernel"], state["fc.weight"].T)

    flat_a = jax.tree_util.tree_leaves_with_path(dict(variables))
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    assert len(flat_a) == len(flat_b) > 180  # ~94 convs: kernel+scale+bias+stats
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                  sorted(flat_b, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    out = model.apply(variables, jnp.ones((2, 16, 16, 3)) * 0.5)
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out)))


# --------------------------------------------------------------------- #
# I3D: converter naming round trip + shape                              #
# --------------------------------------------------------------------- #


def _invert_i3d_tree(variables):
    """Builds TF-Hub-style variable names (the inverse of convert_tf_i3d)."""
    from playablevideogeneration_tpu.evaluation.metrics.i3d import _BRANCH_UNIT_MAP

    unit_to_tf = {v: k for k, v in _BRANCH_UNIT_MAP.items()}
    out = {}

    def leaf_name(collection, sub, leaf):
        if sub == "conv3d":
            return "conv_3d/" + ("w" if leaf == "kernel" else "b")
        names = {("params", "bias"): "beta", ("batch_stats", "mean"): "moving_mean",
                 ("batch_stats", "var"): "moving_variance"}
        return "batch_norm/" + names[(collection, leaf)]

    for collection in ("params", "batch_stats"):
        for scope, tree in variables.get(collection, {}).items():
            if scope == "Logits_Conv3d_0c_1x1":
                for leaf, v in tree.items():
                    tf_leaf = "w" if leaf == "kernel" else "b"
                    out[f"RGB/inception_i3d/Logits/Conv3d_0c_1x1/conv_3d/{tf_leaf}"] = v
            elif scope.startswith("Mixed"):
                for unit, sublayers in tree.items():
                    branch, conv_name = unit_to_tf[unit]
                    for sub, leaves in sublayers.items():
                        for leaf, v in leaves.items():
                            out[f"RGB/inception_i3d/{scope}/{branch}/{conv_name}/"
                                f"{leaf_name(collection, sub, leaf)}"] = v
            else:  # stem units
                for sub, leaves in tree.items():
                    for leaf, v in leaves.items():
                        out[f"RGB/inception_i3d/{scope}/"
                            f"{leaf_name(collection, sub, leaf)}"] = v
    return out


def test_i3d_converter_roundtrip_and_shape():
    from playablevideogeneration_tpu.evaluation.metrics.i3d import (
        I3D,
        convert_tf_i3d,
        random_i3d_variables,
    )

    variables = jax.tree.map(np.asarray,
                             dict(random_i3d_variables(jax.random.PRNGKey(1))))
    tf_vars = _invert_i3d_tree(variables)
    assert any("Branch_1/Conv3d_0a_1x1" in k for k in tf_vars)  # TF naming
    converted = convert_tf_i3d(tf_vars)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    assert len(flat_a) == len(flat_b) > 100
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda kv: str(kv[0])),
                                  sorted(flat_b, key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    out = I3D(input_size=64).apply(variables, jnp.ones((1, 9, 32, 32, 3)) * 0.5)
    assert out.shape == (1, 400)  # kinetics-400 averaged logits (fvd.py:118-126)
    assert np.all(np.isfinite(np.asarray(out)))


# --------------------------------------------------------------------- #
# LPIPS heads + converter CLI                                           #
# --------------------------------------------------------------------- #


def test_lpips_converter_and_metric(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_weights",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "convert_weights.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    # Official lpips-vgg checkpoint layout: lin<i>.model.1.weight (1,C,1,1).
    channels = [64, 128, 256, 512, 512]
    rng = np.random.default_rng(7)
    state = {f"lin{i}.model.1.weight": rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
             for i, c in enumerate(channels)}
    in_path, out_path = str(tmp_path / "lpips.npz"), str(tmp_path / "lpips_lin.npz")
    np.savez(in_path, **state)
    tool.convert_lpips(in_path, out_path)

    from playablevideogeneration_tpu.evaluation.metrics import lpips as lpips_lib
    from playablevideogeneration_tpu.models import vgg as vgg_lib

    heads = lpips_lib.load_lpips_linear_weights(out_path)
    assert [h.shape[0] for h in heads] == channels

    vgg_variables = vgg_lib.random_vgg_variables(jax.random.PRNGKey(5))
    fn = lpips_lib.make_lpips_fn(vgg_lib.make_vgg_apply(vgg_variables), heads)
    a = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (1, 2, 32, 32, 3))
                    .astype(np.float32))
    b = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (1, 2, 32, 32, 3))
                    .astype(np.float32))
    d_same = np.asarray(fn(a, a))
    d_diff = np.asarray(fn(a, b))
    assert d_same.shape == (1, 2)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    assert (d_diff > 1e-4).all()


# --------------------------------------------------------------------- #
# Config wiring                                                         #
# --------------------------------------------------------------------- #


def test_weights_resolution_order(tmp_path, monkeypatch):
    from playablevideogeneration_tpu.models import vgg as vgg_lib

    monkeypatch.delenv("PVG_PRETRAINED_WEIGHTS", raising=False)
    assert pretrained.find_weights({"tpu": {}}, "vgg19") is None

    # Directory resolution via env var.
    variables = vgg_lib.random_vgg_variables(jax.random.PRNGKey(2))
    path = str(tmp_path / pretrained.WEIGHT_FILES["vgg19"])
    pretrained.save_variables_npz(jax.tree.map(np.asarray, dict(variables)), path)
    monkeypatch.setenv("PVG_PRETRAINED_WEIGHTS", str(tmp_path))
    assert pretrained.find_weights({"tpu": {}}, "vgg19") == path

    loaded, is_pretrained = pretrained.get_vgg_variables({"tpu": {}})
    assert is_pretrained
    got = loaded["params"]["conv0"]["kernel"]
    want = np.asarray(variables["params"]["conv0"]["kernel"])
    np.testing.assert_array_equal(np.asarray(got), want)

    # Explicit per-backbone override wins over the directory.
    other = str(tmp_path / "other.npz")
    pretrained.save_variables_npz(jax.tree.map(np.asarray, dict(variables)), other)
    cfg = {"tpu": {"pretrained_weights": {"vgg19": other}}}
    assert pretrained.find_weights(cfg, "vgg19") == other

    # Missing explicit path is an error, not a silent fallback.
    with pytest.raises(FileNotFoundError):
        pretrained.find_weights(
            {"tpu": {"pretrained_weights": {"vgg19": "/nope.npz"}}}, "vgg19")

    # Backbone bundle: only VGG present -> others None, lpips None.
    bundle = pretrained.evaluation_backbones({"tpu": {}})
    assert bundle["vgg_variables"] is not None
    assert bundle["lpips_fn"] is None
    assert bundle["fid_extractor"] is None
    assert bundle["fvd_embedder"] is None


# --------------------------------------------------------------------- #
# The documented converter CLI, end to end for every backbone           #
# --------------------------------------------------------------------- #


def _run_converter_cli(backbone, in_path, out_path):
    """Invokes tools/convert_weights.py main() exactly as the runbook
    documents (docs/PRETRAINED_WEIGHTS.md step 2), argparse included."""
    import importlib.util
    import sys
    from unittest import mock

    spec = importlib.util.spec_from_file_location(
        "convert_weights",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "tools", "convert_weights.py"))
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)
    argv = ["convert_weights.py", backbone,
            "--input", in_path, "--output", out_path]
    with mock.patch.object(sys, "argv", argv):
        tool.main()


def test_converter_cli_smokes_every_documented_backbone(tmp_path):
    """One smoke per runbook command: random reference-layout inputs ->
    CLI -> output .npz loads through utils.pretrained.  Guards the
    offline operator's one-command-per-net path (VGG19 reference
    model/layers/vgg.py:15, FID pytorch_fid/inception.py:13, I3D
    fvd.py:88, LPIPS lpips.py:14, FRCNN tennis_player_detector.py:14)."""
    rng = np.random.default_rng(0)

    def save_in(name, state):
        path = str(tmp_path / f"{name}_in.npz")
        np.savez(path, **{k: np.asarray(v) for k, v in state.items()})
        return path

    # VGG19: torchvision features state_dict (cfg E conv indices).
    vgg_convs = [(0, 3, 64), (2, 64, 64), (5, 64, 128), (7, 128, 128),
                 (10, 128, 256), (12, 256, 256), (14, 256, 256),
                 (16, 256, 256), (19, 256, 512), (21, 512, 512),
                 (23, 512, 512), (25, 512, 512), (28, 512, 512),
                 (30, 512, 512), (32, 512, 512), (34, 512, 512)]
    vgg_state = {}
    for idx, cin, cout in vgg_convs:
        vgg_state[f"features.{idx}.weight"] = rng.normal(
            size=(cout, cin, 3, 3)).astype(np.float32) * 0.05
        vgg_state[f"features.{idx}.bias"] = np.zeros((cout,), np.float32)

    # FID-Inception / I3D: reference-named state dicts via the tested
    # inverse mappings over randomly-initialized JAX variables.
    from playablevideogeneration_tpu.evaluation.metrics.i3d import (
        random_i3d_variables,
    )
    from playablevideogeneration_tpu.evaluation.metrics.inception import (
        InceptionV3FID,
    )

    inception_vars = InceptionV3FID(input_size=75).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)))
    inception_state = _invert_inception_tree(
        jax.tree.map(np.asarray, dict(inception_vars)))
    i3d_state = _invert_i3d_tree(jax.tree.map(
        np.asarray, dict(random_i3d_variables(jax.random.PRNGKey(4)))))

    # LPIPS: official lin<i>.model.1.weight layout.
    lpips_state = {f"lin{i}.model.1.weight":
                   rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
                   for i, c in enumerate([64, 128, 256, 512, 512])}

    # FRCNN: rpn + box heads subset (the converter maps whatever
    # torchvision keys are present; the full-net mapping has its own
    # oracle suite in test_frcnn.py).
    frcnn_state = {
        "rpn.head.conv.weight": rng.normal(size=(16, 16, 3, 3)).astype(np.float32),
        "rpn.head.conv.bias": np.zeros((16,), np.float32),
        "rpn.head.cls_logits.weight": rng.normal(size=(3, 16, 1, 1)).astype(np.float32),
        "rpn.head.cls_logits.bias": np.zeros((3,), np.float32),
        "rpn.head.bbox_pred.weight": rng.normal(size=(12, 16, 1, 1)).astype(np.float32),
        "rpn.head.bbox_pred.bias": np.zeros((12,), np.float32),
        "roi_heads.box_head.fc6.weight": rng.normal(size=(32, 16 * 49)).astype(np.float32),
        "roi_heads.box_head.fc6.bias": np.zeros((32,), np.float32),
        "roi_heads.box_head.fc7.weight": rng.normal(size=(32, 32)).astype(np.float32),
        "roi_heads.box_head.fc7.bias": np.zeros((32,), np.float32),
        "roi_heads.box_predictor.cls_score.weight": rng.normal(size=(91, 32)).astype(np.float32),
        "roi_heads.box_predictor.cls_score.bias": np.zeros((91,), np.float32),
        "roi_heads.box_predictor.bbox_pred.weight": rng.normal(size=(91 * 4, 32)).astype(np.float32),
        "roi_heads.box_predictor.bbox_pred.bias": np.zeros((91 * 4,), np.float32),
    }

    inputs = {"vgg19": vgg_state, "fid-inception": inception_state,
              "i3d": i3d_state, "lpips": lpips_state, "frcnn": frcnn_state}
    out_names = {"vgg19": "vgg19", "fid-inception": "fid_inception",
                 "i3d": "i3d", "lpips": "lpips_lin", "frcnn": "frcnn"}

    for backbone, state in inputs.items():
        out_path = str(tmp_path / f"{out_names[backbone]}.npz")
        _run_converter_cli(backbone, save_in(backbone, state), out_path)
        assert os.path.isfile(out_path), backbone
        if backbone == "lpips":
            loaded = dict(np.load(out_path))
            assert sorted(loaded) == [f"lin{i}" for i in range(5)]
            assert [v.shape[0] for _, v in sorted(loaded.items())] == \
                [64, 128, 256, 512, 512]
        else:
            loaded = pretrained.load_variables_npz(out_path)
            assert "params" in loaded and loaded["params"], backbone

    # The converted VGG19 actually drives the perceptual backbone.
    from playablevideogeneration_tpu.models import vgg as vgg_lib

    vgg_variables = pretrained.load_variables_npz(str(tmp_path / "vgg19.npz"))
    feats = vgg_lib.make_vgg_apply(vgg_variables)(
        jnp.ones((1, 32, 32, 3)) * 0.5)
    assert len(feats) == 5 and all(np.isfinite(np.asarray(f)).all()
                                   for f in feats)
