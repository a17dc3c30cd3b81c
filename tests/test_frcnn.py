"""Faster R-CNN detector: block-level parity vs torch-primitive clones +
reference-math golden tests for the box pipeline.

Same discipline as the VGG/Inception/I3D backbones (test_pretrained.py,
test_backbone_parity.py): torch clones follow torchvision's
fasterrcnn_resnet50_fpn computation (the network the reference downloads,
reference evaluation/metrics/tennis_player_detector.py:14-16), random
weights flow through the real converter, activations must match.
RoIAlign and NMS are verified against independent numpy references.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from playablevideogeneration_tpu.evaluation.metrics import frcnn

# Torch-clone parity suite: minutes of compile time on this host.
pytestmark = pytest.mark.slow

ATOL, RTOL = 1e-4, 1e-3


def _seed(n):
    torch.manual_seed(n)
    return np.random.default_rng(n)


# --------------------------------------------------------------------- #
# Torch clones (no torchvision in this env)                             #
# --------------------------------------------------------------------- #


class TFrozenBN(tnn.Module):
    """torchvision FrozenBatchNorm2d: affine with buffered stats."""

    def __init__(self, n, eps=1e-5):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))
        self.eps = eps

    def randomize(self):
        self.weight.uniform_(0.5, 1.5)
        self.bias.normal_(0, 0.5)
        self.running_mean.normal_(0, 0.5)
        self.running_var.uniform_(0.5, 2.0)

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        return x * scale[None, :, None, None] + (
            self.bias - self.running_mean * scale)[None, :, None, None]


class TBottleneck(tnn.Module):
    def __init__(self, in_ch, width, stride=1, project=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = TFrozenBN(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = TFrozenBN(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = TFrozenBN(width * 4)
        self.downsample = None
        if project:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, width * 4, 1, stride, bias=False),
                TFrozenBN(width * 4))

    def randomize(self):
        for m in self.modules():
            if isinstance(m, TFrozenBN):
                m.randomize()

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        sc = self.downsample(x) if self.downsample is not None else x
        return F.relu(out + sc)


def _bottleneck_state(block: TBottleneck, prefix: str) -> dict:
    """torchvision-style state_dict keys for one bottleneck block."""
    state = {}
    for i in (1, 2, 3):
        state[f"{prefix}.conv{i}.weight"] = \
            getattr(block, f"conv{i}").weight.detach().numpy()
        bn = getattr(block, f"bn{i}")
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            state[f"{prefix}.bn{i}.{leaf}"] = getattr(bn, leaf).numpy()
    if block.downsample is not None:
        state[f"{prefix}.downsample.0.weight"] = \
            block.downsample[0].weight.detach().numpy()
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            state[f"{prefix}.downsample.1.{leaf}"] = \
                getattr(block.downsample[1], leaf).numpy()
    return state


# --------------------------------------------------------------------- #
# Block parity                                                          #
# --------------------------------------------------------------------- #


def test_frozen_bn_matches_torch():
    rng = _seed(31)
    t = TFrozenBN(6)
    t.randomize()
    variables = {"params": {"scale": t.weight.numpy(), "bias": t.bias.numpy(),
                            "mean": t.running_mean.numpy(),
                            "var": t.running_var.numpy()}}
    x = rng.normal(size=(2, 5, 5, 6)).astype(np.float32)
    got = np.asarray(frcnn.FrozenBN(6).apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = t(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("stride,project", [(1, False), (2, True)])
def test_bottleneck_matches_torch(stride, project):
    rng = _seed(32)
    # project=True exercises a CHANNEL-CHANGING 1x1 downsample (32 -> 64),
    # not just a stride change; non-project needs in == width*4 for the add.
    in_ch = 64 if not project else 32
    t = TBottleneck(in_ch, 16, stride=stride, project=project).eval()
    t.randomize()
    state = {f"backbone.body.layer1.0.{k.split('.', 1)[1]}": v
             for k, v in _bottleneck_state(t, "x").items()}
    converted = frcnn.convert_torch_frcnn(state)
    variables = {"params": converted["params"]["body"]["layer1_0"]}

    x = rng.normal(size=(1, 10, 10, in_ch)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = t(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
    with jax.default_matmul_precision("highest"):
        got = np.asarray(frcnn.Bottleneck(
            16, stride=stride, project=project).apply(
            variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)),
                               atol=ATOL, rtol=RTOL)


def test_fpn_merge_matches_torch():
    """Lateral 1x1 + nearest-upsample top-down + 3x3 output convs + P6
    (stride-2 max pool) against a torch-primitive clone."""
    rng = _seed(33)
    chans = [32, 64, 128, 256]
    inners = [tnn.Conv2d(c, 16, 1) for c in chans]
    layers = [tnn.Conv2d(16, 16, 3, padding=1) for _ in chans]

    state = {}
    for i, (inner, layer) in enumerate(zip(inners, layers)):
        state[f"backbone.fpn.inner_blocks.{i}.0.weight"] = \
            inner.weight.detach().numpy()
        state[f"backbone.fpn.inner_blocks.{i}.0.bias"] = \
            inner.bias.detach().numpy()
        state[f"backbone.fpn.layer_blocks.{i}.0.weight"] = \
            layer.weight.detach().numpy()
        state[f"backbone.fpn.layer_blocks.{i}.0.bias"] = \
            layer.bias.detach().numpy()
    converted = frcnn.convert_torch_frcnn(state)
    variables = {"params": converted["params"]["fpn"]}

    feats_np = [rng.normal(size=(1, 16 // (2 ** i), 16 // (2 ** i), c))
                .astype(np.float32) for i, c in enumerate(chans)]

    with torch.no_grad():
        t_feats = [torch.tensor(np.transpose(f, (0, 3, 1, 2)))
                   for f in feats_np]
        lat = [inner(f) for inner, f in zip(inners, t_feats)]
        merged = [lat[-1]]
        for l in lat[-2::-1]:
            merged.insert(0, l + F.interpolate(merged[0], size=l.shape[-2:],
                                               mode="nearest"))
        outs = [layer(m) for layer, m in zip(layers, merged)]
        outs.append(F.max_pool2d(outs[-1], 1, 2))
        want = [o.numpy() for o in outs]

    with jax.default_matmul_precision("highest"):
        got = frcnn.FPN(channels=16).apply(
            variables, [jnp.asarray(f) for f in feats_np])
    assert len(got) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g),
                                   np.transpose(w, (0, 2, 3, 1)),
                                   atol=ATOL, rtol=RTOL)


def test_rpn_and_box_heads_match_torch():
    rng = _seed(34)
    conv = tnn.Conv2d(16, 16, 3, padding=1)
    cls_logits = tnn.Conv2d(16, 3, 1)
    bbox_pred = tnn.Conv2d(16, 12, 1)
    state = {}
    for name, mod in (("conv", conv), ("cls_logits", cls_logits),
                      ("bbox_pred", bbox_pred)):
        state[f"rpn.head.{name}.weight"] = mod.weight.detach().numpy()
        state[f"rpn.head.{name}.bias"] = mod.bias.detach().numpy()

    fc6 = tnn.Linear(16 * 7 * 7, 32)
    fc7 = tnn.Linear(32, 32)
    cls_score = tnn.Linear(32, 91)
    box_delta = tnn.Linear(32, 91 * 4)
    state["roi_heads.box_head.fc6.weight"] = fc6.weight.detach().numpy()
    state["roi_heads.box_head.fc6.bias"] = fc6.bias.detach().numpy()
    state["roi_heads.box_head.fc7.weight"] = fc7.weight.detach().numpy()
    state["roi_heads.box_head.fc7.bias"] = fc7.bias.detach().numpy()
    state["roi_heads.box_predictor.cls_score.weight"] = \
        cls_score.weight.detach().numpy()
    state["roi_heads.box_predictor.cls_score.bias"] = \
        cls_score.bias.detach().numpy()
    state["roi_heads.box_predictor.bbox_pred.weight"] = \
        box_delta.weight.detach().numpy()
    state["roi_heads.box_predictor.bbox_pred.bias"] = \
        box_delta.bias.detach().numpy()
    converted = frcnn.convert_torch_frcnn_full(state)

    x = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    with torch.no_grad():
        t = F.relu(conv(torch.tensor(np.transpose(x, (0, 3, 1, 2)))))
        want_logits = cls_logits(t).numpy()
        want_deltas = bbox_pred(t).numpy()
    with jax.default_matmul_precision("highest"):
        got_logits, got_deltas = frcnn.RPNHead().apply(
            {"params": converted["params"]["rpn_head"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.transpose(want_logits, (0, 2, 3, 1)),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(got_deltas),
                               np.transpose(want_deltas, (0, 2, 3, 1)),
                               atol=ATOL, rtol=RTOL)

    # Box head: torch flattens (C, 7, 7); NHWC flattens (7, 7, C).  The
    # converter's fc6 row reorder must reconcile the two.
    roi = rng.normal(size=(5, 7, 7, 16)).astype(np.float32)
    with torch.no_grad():
        flat = torch.tensor(np.transpose(roi, (0, 3, 1, 2))).flatten(1)
        h = F.relu(fc7(F.relu(fc6(flat))))
        want_scores = cls_score(h).numpy()
        want_boxes = box_delta(h).numpy()
    with jax.default_matmul_precision("highest"):
        got_scores, got_boxes = frcnn.BoxHead(representation_size=32).apply(
            {"params": converted["params"]["box_head"]}, jnp.asarray(roi))
    np.testing.assert_allclose(np.asarray(got_scores), want_scores,
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(got_boxes), want_boxes,
                               atol=ATOL, rtol=RTOL)


# --------------------------------------------------------------------- #
# Box math golden tests                                                 #
# --------------------------------------------------------------------- #


def test_anchor_generation_matches_torchvision_formula():
    anchors = frcnn.make_anchors([(2, 3)], [4])
    assert anchors[0].shape == (2 * 3 * 3, 4)
    # First cell (shift 0): base anchors for size 32, ratios 0.5/1/2 —
    # torchvision rounds the halved coordinates (generate_anchors:
    # stack/2 then round), so size 32 ratio 0.5 gives +/-23, not +/-22.5.
    ws = 1.0 / np.sqrt([0.5, 1.0, 2.0]) * 32
    hs = np.sqrt([0.5, 1.0, 2.0]) * 32
    want = np.round(np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1))
    assert want[0, 2] == 23.0  # the case the old full-extent rounding missed
    np.testing.assert_allclose(anchors[0][:3], want)
    # Second cell shifts x by the stride.
    np.testing.assert_allclose(anchors[0][3:6, 0] - anchors[0][:3, 0], 4.0)


def test_decode_boxes_matches_manual():
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 20.0]])
    deltas = jnp.asarray([[0.1, -0.2, np.log(2.0), np.log(0.5)]])
    out = np.asarray(frcnn.decode_boxes(deltas, anchors))
    # center (5, 10), size (10, 20) -> center (6, 6), size (20, 10)
    np.testing.assert_allclose(out, [[-4.0, 1.0, 16.0, 11.0]], atol=1e-5)


def test_nms_mask_matches_numpy_greedy():
    rng = _seed(35)
    n = 60
    centers = rng.uniform(10, 90, (n, 2))
    sizes = rng.uniform(5, 30, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)

    def numpy_nms(boxes, scores, thresh):
        order = np.argsort(-scores)
        keep = []
        suppressed = np.zeros(len(boxes), bool)
        for i in order:
            if suppressed[i]:
                continue
            keep.append(i)
            for j in order:
                if suppressed[j] or j == i or scores[j] > scores[i]:
                    continue
                xx1 = max(boxes[i, 0], boxes[j, 0])
                yy1 = max(boxes[i, 1], boxes[j, 1])
                xx2 = min(boxes[i, 2], boxes[j, 2])
                yy2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
                a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / (a + b - inter) > thresh:
                    suppressed[j] = True
        return sorted(keep)

    want = numpy_nms(boxes, scores, 0.5)
    got = np.flatnonzero(np.asarray(frcnn.nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5))).tolist()
    assert got == want


def test_roi_align_matches_numpy_reference():
    rng = _seed(36)
    h, w, c = 12, 14, 3
    feature = rng.normal(size=(h, w, c)).astype(np.float32)
    boxes = np.asarray([[2.0, 3.0, 11.0, 9.0], [0.0, 0.0, 14.0, 12.0]],
                       np.float32)

    def numpy_roi_align(feat, box, scale, out, s):
        x1, y1, x2, y2 = box * scale
        roi_w, roi_h = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
        bin_w, bin_h = roi_w / out, roi_h / out
        res = np.zeros((out, out, feat.shape[-1]), np.float32)
        for i in range(out):
            for j in range(out):
                acc = 0.0
                for ky in range(s):
                    for kx in range(s):
                        y = y1 + (i + (ky + 0.5) / s) * bin_h
                        x = x1 + (j + (kx + 0.5) / s) * bin_w
                        y = min(max(y, 0.0), feat.shape[0] - 1.0)
                        x = min(max(x, 0.0), feat.shape[1] - 1.0)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1_, x1_ = min(y0 + 1, feat.shape[0] - 1), \
                            min(x0 + 1, feat.shape[1] - 1)
                        wy, wx = y - y0, x - x0
                        acc = acc + (feat[y0, x0] * (1 - wy) * (1 - wx)
                                     + feat[y0, x1_] * (1 - wy) * wx
                                     + feat[y1_, x0] * wy * (1 - wx)
                                     + feat[y1_, x1_] * wy * wx)
                res[i, j] = acc / (s * s)
        return res

    got = np.asarray(frcnn.roi_align(jnp.asarray(feature),
                                     jnp.asarray(boxes), 0.5,
                                     output_size=7, sampling_ratio=2))
    for b in range(2):
        want = numpy_roi_align(feature, boxes[b], 0.5, 7, 2)
        np.testing.assert_allclose(got[b], want, atol=1e-5, rtol=1e-5)


def test_fpn_level_assignment_formula():
    # Canonical 224^2 box -> level 4 -> index 2 (P4); tiny boxes -> P2;
    # huge -> P5.
    boxes = jnp.asarray([
        [0, 0, 224, 224],
        [0, 0, 16, 16],
        [0, 0, 1000, 1000],
    ], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(frcnn.fpn_level_assignment(boxes)), [2, 0, 3])


# --------------------------------------------------------------------- #
# End-to-end wiring                                                     #
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny_frcnn_variables():
    return frcnn.random_frcnn_variables(jax.random.PRNGKey(0),
                                        height=64, width=96)


@pytest.mark.slow
def test_frcnn_end_to_end_and_detector_plug(tmp_path, tiny_frcnn_variables):
    """Full pipeline on random converted-format weights: static output
    shapes, finite values, and the TennisPlayerDetector 'frcnn' config
    path (detection.py make_detector)."""
    import os

    from playablevideogeneration_tpu.evaluation.metrics.detection import (
        make_detector,
    )
    from playablevideogeneration_tpu.utils import pretrained

    variables = jax.tree.map(np.asarray, dict(tiny_frcnn_variables))
    path = os.path.join(str(tmp_path), pretrained.WEIGHT_FILES["frcnn"])
    pretrained.save_variables_npz(variables, path)

    config = {"evaluation": {"detector": "frcnn",
                             "detector_resize": [64, 128]},
              "tpu": {"pretrained_weights": {"frcnn": path}}}
    detector = make_detector(config)
    assert detector.available

    rng = np.random.default_rng(1)
    obs = rng.uniform(0, 1, (1, 2, 64, 96, 3)).astype(np.float32)
    centers = detector(obs)
    assert centers.shape == (1, 2, 2)
    assert np.all(np.isfinite(centers))


def test_frcnn_detect_shapes(tiny_frcnn_variables):
    """Static (D, 4)/(D,)/(D,) outputs with -1 padding."""
    img = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (64, 96, 3)).astype(np.float32))
    boxes, scores, labels = frcnn.FasterRCNN(min_size=64, max_size=128).apply(
        tiny_frcnn_variables, img)
    assert boxes.shape == (frcnn.DETECTIONS_PER_IMG, 4)
    assert scores.shape == (frcnn.DETECTIONS_PER_IMG,)
    assert labels.shape == (frcnn.DETECTIONS_PER_IMG,)
    empty = np.asarray(scores) <= 0
    assert np.all(np.asarray(labels)[empty] == -1)


def test_invalid_rois_cannot_emit_detections(tiny_frcnn_variables):
    """Static-shape padding regression: NMS-suppressed proposals pad the
    post-NMS top-k with zero-score rois of NORMAL size; torchvision's
    RoIHeads never sees them, so their class scores must be masked to
    zero no matter what the box head thinks.  Rig: zeroed RPN weights
    (proposals = the anchor grid, constant score, dense overlaps ->
    guaranteed suppressions) and a box head biased to score 'person'
    ~1.0 for every roi."""
    variables = jax.tree.map(np.array, dict(tiny_frcnn_variables))
    p = variables["params"]
    rpn = p["rpn_head"]
    rpn["cls_logits"]["kernel"][:] = 0.0
    rpn["cls_logits"]["bias"][:] = 2.0   # every anchor scores sigmoid(2)
    rpn["bbox_pred"]["kernel"][:] = 0.0
    rpn["bbox_pred"]["bias"][:] = 0.0    # proposals = anchors exactly
    bias = p["box_head"]["cls_score"]["bias"]
    bias[:] = -10.0
    bias[frcnn.PERSON_LABEL] = 10.0      # softmax(person) ~ 1.0 everywhere

    img = jnp.asarray(np.random.default_rng(3).uniform(
        0, 1, (64, 96, 3)).astype(np.float32))
    _, state = frcnn.FasterRCNN(min_size=64, max_size=128).apply(
        variables, img, mutable=["intermediates"])
    taps = state["intermediates"]
    roi_valid = np.asarray(taps["roi_valid"][0])
    person = np.asarray(taps["masked_class_scores"][0])
    assert (~roi_valid).sum() > 0            # the rig produced padding rois
    assert roi_valid.sum() > 0               # ... and real survivors
    assert (person[roi_valid] > 0.9).all()   # the box-head rig worked
    # The actual invariant: padding rois are silenced before NMS/top-k.
    assert np.all(person[~roi_valid] == 0.0)
