"""Faster R-CNN ResNet50-FPN person detector in JAX/Flax, NHWC.

Reference: evaluation/metrics/tennis_player_detector.py:14-16 loads
torchvision's ``fasterrcnn_resnet50_fpn(pretrained=True)`` and keeps
'person' boxes above score 0.8.  This module is that detector rebuilt
TPU-first: the whole pipeline — ResNet50 backbone with frozen BN, FPN,
RPN with per-level proposal selection, RoIAlign, two-MLP box head and
class-wise NMS — runs as ONE jitted program with static shapes
(fixed-size top-k + masked greedy NMS instead of dynamic-shape filtering,
so XLA can tile everything onto the MXU).

Weights load from an .npz converted from the torchvision checkpoint
(``convert_torch_frcnn`` maps the state_dict); random weights exercise
the identical code path for tests.

Inference protocol (matches torchvision's GeneralizedRCNNTransform and
RoIHeads eval defaults):
- normalize with ImageNet mean/std, bilinear-resize so min side -> 800
  capped at max side 1333
- RPN: 1000 pre-NMS top-k per level, NMS iou 0.7 per level, 1000 total
- heads: score_thresh 0.05, class-wise NMS iou 0.5, 100 detections
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
MIN_SIZE, MAX_SIZE = 800, 1333
ANCHOR_SIZES = (32, 64, 128, 256, 512)        # one per level P2..P6
ASPECT_RATIOS = (0.5, 1.0, 2.0)
RPN_PRE_NMS_TOPK = 1000
RPN_POST_NMS_TOPK = 1000
RPN_NMS_THRESH = 0.7
BOX_SCORE_THRESH = 0.05
BOX_NMS_THRESH = 0.5
DETECTIONS_PER_IMG = 100
NUM_CLASSES = 91                               # COCO incl. background
PERSON_LABEL = 1
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


# --------------------------------------------------------------------- #
# Backbone: ResNet50 with frozen BatchNorm                              #
# --------------------------------------------------------------------- #


class FrozenBN(nn.Module):
    """Inference-only affine BN: y = (x - mean) * scale/sqrt(var+eps) + bias.
    torchvision detection backbones freeze BN into this exact form
    (FrozenBatchNorm2d, eps 1e-5 in the fasterrcnn checkpoint)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    """torchvision ResNet Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) with
    projection shortcut on the first block of a stage."""

    width: int
    stride: int = 1
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv1")(x)
        out = FrozenBN(self.width, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.width, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv2")(out)
        out = FrozenBN(self.width, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.width * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv3")(out)
        out = FrozenBN(self.width * 4, name="bn3")(out)
        if self.project:
            sc = nn.Conv(self.width * 4, (1, 1),
                         strides=(self.stride, self.stride), use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="downsample_conv")(x)
            sc = FrozenBN(self.width * 4, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class ResNet50(nn.Module):
    """Returns the C2..C5 feature maps (strides 4, 8, 16, 32)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = FrozenBN(64, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feats = []
        for stage, (width, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))):
            for b in range(blocks):
                x = Bottleneck(width, stride=stride if b == 0 else 1,
                               project=(b == 0), dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x)
            feats.append(x)
        return feats  # [C2, C3, C4, C5]


class FPN(nn.Module):
    """1x1 lateral convs + nearest-neighbor top-down merge + 3x3 output
    convs; P6 via stride-2 max pool of P5 (torchvision LastLevelMaxPool)."""

    channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        laterals = [
            nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"inner_{i}")(c)
            for i, c in enumerate(feats)]
        merged = [laterals[-1]]
        for lateral in laterals[-2::-1]:
            top = merged[0]
            n, h, w, c = lateral.shape
            up = jax.image.resize(top, (n, h, w, c), method="nearest")
            merged.insert(0, lateral + up)
        outs = [
            nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"layer_{i}")(m)
            for i, m in enumerate(merged)]
        p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
        return outs + [p6]  # [P2, P3, P4, P5, P6]


class RPNHead(nn.Module):
    """Shared 3x3 conv + objectness/box-delta 1x1 heads (A anchors)."""

    anchors: int = len(ASPECT_RATIOS)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feature):
        t = nn.relu(nn.Conv(feature.shape[-1], (3, 3),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            param_dtype=jnp.float32, name="conv")(feature))
        logits = nn.Conv(self.anchors, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="cls_logits")(t)
        deltas = nn.Conv(self.anchors * 4, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="bbox_pred")(t)
        return logits, deltas


class BoxHead(nn.Module):
    """TwoMLPHead (1024-1024) + FastRCNNPredictor (cls + per-class boxes)."""

    num_classes: int = NUM_CLASSES
    representation_size: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_features):
        x = roi_features.reshape((roi_features.shape[0], -1))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc7")(x))
        scores = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype,
                          param_dtype=jnp.float32, name="bbox_pred")(x)
        return scores, deltas


# --------------------------------------------------------------------- #
# Box math (static shapes throughout)                                   #
# --------------------------------------------------------------------- #


def make_anchors(level_shapes: Sequence[Tuple[int, int]],
                 strides: Sequence[int]) -> List[np.ndarray]:
    """Per-level (H*W*A, 4) anchor grids in (x1, y1, x2, y2), replicating
    torchvision's AnchorGenerator (sqrt-ratio base anchors, rounded,
    shifted by the feature stride)."""
    all_anchors = []
    for (h, w), stride, size in zip(level_shapes, strides, ANCHOR_SIZES):
        ratios = np.asarray(ASPECT_RATIOS, np.float32)
        h_ratios = np.sqrt(ratios)
        w_ratios = 1.0 / h_ratios
        ws = w_ratios * size
        hs = h_ratios * size
        # torchvision rounds the HALF-extent coordinates
        # (AnchorGenerator.generate_anchors: stack(...)/2 then .round()),
        # not the full extents — rounding before halving shifts anchors
        # by up to 0.5px from what the checkpoint was trained against.
        base = np.stack([-ws / 2, -hs / 2, ws / 2, hs / 2], axis=1).round()
        shifts_x = np.arange(w, dtype=np.float32) * stride
        shifts_y = np.arange(h, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shifts_x, shifts_y)
        shifts = np.stack([sx.ravel(), sy.ravel(),
                           sx.ravel(), sy.ravel()], axis=1)  # (H*W, 4)
        anchors = (shifts[:, None, :] + base[None, :, :]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
    return all_anchors


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """(dx, dy, dw, dh) deltas -> (x1, y1, x2, y2) boxes (torchvision
    BoxCoder.decode_single semantics, incl. the dw/dh clamp)."""
    wx, wy, ww, wh = weights
    widths = anchors[:, 2] - anchors[:, 0]
    heights = anchors[:, 3] - anchors[:, 1]
    ctr_x = anchors[:, 0] + 0.5 * widths
    ctr_y = anchors[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = jnp.clip(deltas[:, 2] / ww, max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[:, 3] / wh, max=BBOX_XFORM_CLIP)
    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights
    return jnp.stack([pred_ctr_x - 0.5 * pred_w, pred_ctr_y - 0.5 * pred_h,
                      pred_ctr_x + 0.5 * pred_w, pred_ctr_y + 0.5 * pred_h],
                     axis=1)


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    x1 = jnp.clip(boxes[:, 0], 0, width)
    y1 = jnp.clip(boxes[:, 1], 0, height)
    x2 = jnp.clip(boxes[:, 2], 0, width)
    y2 = jnp.clip(boxes[:, 3], 0, height)
    return jnp.stack([x1, y1, x2, y2], axis=1)


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS with STATIC shapes: returns a keep-mask over the input.

    Candidates are visited in score order; a fixed-length scan suppresses
    lower-scored boxes overlapping a kept box — semantically identical to
    torchvision.ops.nms but compiled as one dense program (no dynamic
    shapes, XLA/TPU-friendly)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_sorted = boxes[order]
    iou = box_iou(boxes_sorted, boxes_sorted)

    def body(keep, i):
        # Suppressed if any higher-ranked KEPT box overlaps above the
        # threshold.  keep[j] for j < i is final when we reach i.
        overlap = (iou[i] > iou_threshold) & keep
        suppressed = jnp.any(overlap & (jnp.arange(n) < i))
        keep = keep.at[i].set(~suppressed)
        return keep, ()

    keep_sorted, _ = jax.lax.scan(body, jnp.ones((n,), bool), jnp.arange(n))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


# --------------------------------------------------------------------- #
# RoIAlign                                                              #
# --------------------------------------------------------------------- #


def roi_align(feature: jnp.ndarray, boxes: jnp.ndarray, spatial_scale: float,
              output_size: int = 7, sampling_ratio: int = 2) -> jnp.ndarray:
    """RoIAlign (aligned=False, torchvision detection default): for each
    box, output_size^2 bins x sampling_ratio^2 bilinear samples averaged.

    :param feature: (H, W, C)
    :param boxes: (N, 4) in image coordinates
    :return: (N, output_size, output_size, C)
    """
    h, w, c = feature.shape
    boxes = boxes * spatial_scale
    x1, y1 = boxes[:, 0], boxes[:, 1]
    roi_w = jnp.maximum(boxes[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(boxes[:, 3] - y1, 1.0)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size

    s = sampling_ratio
    # Sample grid: for bin (i, j), samples at offsets (k + 0.5)/s, k<s.
    grid = (jnp.arange(output_size)[:, None]
            + (jnp.arange(s)[None, :] + 0.5) / s).reshape(-1)  # (out*s,)
    ys = y1[:, None] + bin_h[:, None] * grid[None, :]  # (N, out*s)
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]

    def bilinear(img, yy, xx):
        # torchvision clamps sample coords into the map; samples fully
        # outside (y < -1 or y > H) contribute 0 — boxes are pre-clipped
        # to the image here, so the clamp path suffices.
        yy = jnp.clip(yy, 0.0, h - 1.0)
        xx = jnp.clip(xx, 0.0, w - 1.0)
        y0 = jnp.floor(yy).astype(jnp.int32)
        x0 = jnp.floor(xx).astype(jnp.int32)
        y1_ = jnp.minimum(y0 + 1, h - 1)
        x1_ = jnp.minimum(x0 + 1, w - 1)
        wy = (yy - y0)[..., None]
        wx = (xx - x0)[..., None]
        v00 = img[y0[:, :, None], x0[:, None, :]]
        v01 = img[y0[:, :, None], x1_[:, None, :]]
        v10 = img[y1_[:, :, None], x0[:, None, :]]
        v11 = img[y1_[:, :, None], x1_[:, None, :]]
        wy = wy[:, :, None, :]
        wx = wx[:, None, :, :]
        return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx
                + v10 * wy * (1 - wx) + v11 * wy * wx)

    samples = bilinear(feature, ys, xs)  # (N, out*s, out*s, C)
    n = boxes.shape[0]
    samples = samples.reshape(n, output_size, s, output_size, s, c)
    return samples.mean(axis=(2, 4))


def fpn_level_assignment(boxes: jnp.ndarray, num_levels: int = 4,
                         canonical_scale: float = 224.0,
                         canonical_level: int = 4) -> jnp.ndarray:
    """FPN paper eq. 1 as used by torchvision MultiScaleRoIAlign: level
    k = floor(k0 + log2(sqrt(area)/224)), clamped to [2, 5], returned as
    a 0-based index into [P2..P5]."""
    area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    k = jnp.floor(canonical_level
                  + jnp.log2(jnp.sqrt(jnp.maximum(area, 1e-6))
                             / canonical_scale + 1e-6))
    return jnp.clip(k, 2, 2 + num_levels - 1).astype(jnp.int32) - 2


# --------------------------------------------------------------------- #
# Full detector                                                         #
# --------------------------------------------------------------------- #


class FasterRCNN(nn.Module):
    """End-to-end eval-mode Faster R-CNN; one jitted program per input
    shape.  __call__ maps a [0, 1] RGB image (H, W, 3) to fixed-size
    (boxes (D, 4), scores (D,), labels (D,)) padded with -1 rows.

    min_size/max_size are the torchvision transform's resize bounds
    (800/1333 for the COCO checkpoint); tests shrink them so the whole
    graph runs on CPU in seconds — the parameter tree is size-invariant.
    """

    dtype: Dtype = jnp.float32
    min_size: int = MIN_SIZE
    max_size: int = MAX_SIZE

    @nn.compact
    def __call__(self, image):
        orig_h, orig_w = image.shape[0], image.shape[1]
        scale = min(self.min_size / min(orig_h, orig_w),
                    self.max_size / max(orig_h, orig_w))
        new_h, new_w = int(round(orig_h * scale)), int(round(orig_w * scale))
        x = (image - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        x = jax.image.resize(x, (new_h, new_w, 3), method="linear")
        # torchvision pads the resized image up to a multiple of 32.
        pad_h, pad_w = -(-new_h // 32) * 32, -(-new_w // 32) * 32
        x = jnp.pad(x, ((0, pad_h - new_h), (0, pad_w - new_w), (0, 0)))

        feats = ResNet50(dtype=self.dtype, name="body")(x[None])
        levels = FPN(dtype=self.dtype, name="fpn")(feats)  # P2..P6

        rpn = RPNHead(dtype=self.dtype, name="rpn_head")
        strides = [4, 8, 16, 32, 64]
        level_shapes = [(l.shape[1], l.shape[2]) for l in levels]
        anchors = [jnp.asarray(a) for a in
                   make_anchors(level_shapes, strides)]

        proposals, proposal_scores = [], []
        for level, anchor in zip(levels, anchors):
            logits, deltas = rpn(level)
            scores = jax.nn.sigmoid(logits.reshape(-1))
            deltas = deltas.reshape(-1, 4)
            k = min(RPN_PRE_NMS_TOPK, scores.shape[0])
            top_scores, top_idx = jax.lax.top_k(scores, k)
            boxes = decode_boxes(deltas[top_idx], anchor[top_idx])
            boxes = clip_boxes(boxes, new_h, new_w)
            # Degenerate (tiny) boxes score 0 instead of being removed —
            # static-shape equivalent of torchvision's remove_small_boxes.
            valid = ((boxes[:, 2] - boxes[:, 0] > 1e-2)
                     & (boxes[:, 3] - boxes[:, 1] > 1e-2))
            top_scores = jnp.where(valid, top_scores, 0.0)
            keep = nms_mask(boxes, top_scores, RPN_NMS_THRESH)
            proposals.append(boxes)
            proposal_scores.append(jnp.where(keep & valid, top_scores, 0.0))

        all_boxes = jnp.concatenate(proposals, axis=0)
        all_scores = jnp.concatenate(proposal_scores, axis=0)
        k = min(RPN_POST_NMS_TOPK, all_scores.shape[0])
        top_scores, top_idx = jax.lax.top_k(all_scores, k)
        rois = all_boxes[top_idx]  # (K, 4)
        # Static-shape padding: when fewer than K proposals survive NMS /
        # the size filter, the top-k tail holds zero-score boxes that
        # torchvision's RoIHeads would never see.  They still ride through
        # RoIAlign + box head (dense program), but the mask zeroes their
        # detection scores so they cannot emit spurious detections no
        # matter what the box head thinks of them.
        roi_valid = top_scores > 0.0

        self.sow("intermediates", "roi_valid", roi_valid)
        # RoIAlign over P2..P5 with per-box level assignment: compute the
        # pooled features at EVERY level and select — static shapes, no
        # gather-by-level (the 4x redundancy is trivial next to the
        # backbone and keeps the program dense for the TPU).
        levels_idx = fpn_level_assignment(rois)
        pooled_all = jnp.stack([
            roi_align(levels[i][0], rois, 1.0 / strides[i])
            for i in range(4)], axis=0)  # (4, K, 7, 7, C)
        onehot = jax.nn.one_hot(levels_idx, 4, axis=0,
                                dtype=pooled_all.dtype)  # (4, K)
        pooled = jnp.einsum("lkhwc,lk->khwc", pooled_all, onehot)

        scores, deltas = BoxHead(dtype=self.dtype, name="box_head")(pooled)
        probs = jax.nn.softmax(scores, axis=-1)  # (K, NUM_CLASSES)

        # Per-class decode (background class 0 dropped).
        deltas = deltas.reshape(-1, NUM_CLASSES, 4)
        out_boxes, out_scores, out_labels = [], [], []
        for cls in (PERSON_LABEL,):  # person-only: the tennis use case
            cls_boxes = decode_boxes(deltas[:, cls, :], rois,
                                     weights=(10.0, 10.0, 5.0, 5.0))
            cls_boxes = clip_boxes(cls_boxes, new_h, new_w)
            cls_scores = jnp.where(roi_valid, probs[:, cls], 0.0)
            self.sow("intermediates", "masked_class_scores", cls_scores)
            cls_scores = jnp.where(cls_scores > BOX_SCORE_THRESH,
                                   cls_scores, 0.0)
            valid = ((cls_boxes[:, 2] - cls_boxes[:, 0] > 1e-2)
                     & (cls_boxes[:, 3] - cls_boxes[:, 1] > 1e-2))
            cls_scores = jnp.where(valid, cls_scores, 0.0)
            keep = nms_mask(cls_boxes, cls_scores, BOX_NMS_THRESH)
            cls_scores = jnp.where(keep, cls_scores, 0.0)
            out_boxes.append(cls_boxes)
            out_scores.append(cls_scores)
            out_labels.append(jnp.full((cls_boxes.shape[0],), cls, jnp.int32))

        boxes = jnp.concatenate(out_boxes, axis=0)
        scores = jnp.concatenate(out_scores, axis=0)
        labels = jnp.concatenate(out_labels, axis=0)
        d = min(DETECTIONS_PER_IMG, scores.shape[0])
        final_scores, idx = jax.lax.top_k(scores, d)
        final_boxes = boxes[idx] / scale  # back to input coordinates
        final_labels = labels[idx]
        empty = final_scores <= 0.0
        final_boxes = jnp.where(empty[:, None], -1.0, final_boxes)
        final_labels = jnp.where(empty, -1, final_labels)
        return final_boxes, final_scores, final_labels


# --------------------------------------------------------------------- #
# Weight conversion (torchvision fasterrcnn_resnet50_fpn state_dict)    #
# --------------------------------------------------------------------- #


def convert_torch_frcnn(state_dict) -> dict:
    """torchvision ``fasterrcnn_resnet50_fpn`` state_dict -> this module's
    variables.  Conv kernels OIHW -> HWIO; Linear (out, in) -> (in, out);
    FrozenBatchNorm2d {weight, bias, running_mean, running_var} ->
    FrozenBN {scale, bias, mean, var}."""
    params: dict = {}

    def put(path, leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(leaf)

    def conv(v):
        return np.transpose(np.asarray(v), (2, 3, 1, 0))

    bn_leaf = {"weight": "scale", "bias": "bias",
               "running_mean": "mean", "running_var": "var"}

    for key, value in state_dict.items():
        parts = key.split(".")
        if parts[0] == "backbone" and parts[1] == "body":
            # backbone.body.conv1.weight / bn1.* / layerX.B.convY.weight /
            # layerX.B.bn Y.* / layerX.B.downsample.{0,1}.*
            rest = parts[2:]
            if rest[0] == "conv1":
                put(["body", "conv1", "kernel"], conv(value))
            elif rest[0] == "bn1":
                put(["body", "bn1", bn_leaf[rest[1]]], value)
            else:  # layerX.B...
                block = f"{rest[0]}_{rest[1]}"
                if rest[2] == "downsample":
                    if rest[3] == "0":
                        put(["body", block, "downsample_conv", "kernel"],
                            conv(value))
                    else:
                        put(["body", block, "downsample_bn",
                             bn_leaf[rest[4]]], value)
                elif rest[2].startswith("conv"):
                    put(["body", block, rest[2], "kernel"], conv(value))
                else:  # bn1/bn2/bn3
                    put(["body", block, rest[2], bn_leaf[rest[3]]], value)
        elif parts[0] == "backbone" and parts[1] == "fpn":
            # backbone.fpn.inner_blocks.i.0.{weight,bias} (older: no .0)
            idx = parts[3]
            kind = "inner" if parts[2] == "inner_blocks" else "layer"
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            val = conv(value) if leaf == "kernel" else value
            put(["fpn", f"{kind}_{idx}", leaf], val)
        elif parts[0] == "rpn":
            # rpn.head.conv.{weight,bias} (newer: rpn.head.conv.0.0.*),
            # rpn.head.cls_logits.*, rpn.head.bbox_pred.*
            name = parts[2]
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            val = conv(value) if leaf == "kernel" else value
            put(["rpn_head", name, leaf], val)
        elif parts[0] == "roi_heads":
            # roi_heads.box_head.fc6/fc7.*, box_predictor.cls_score/
            # bbox_pred.*
            name = parts[2]
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            val = np.asarray(value).T if leaf == "kernel" else value
            put(["box_head", name, leaf], val)
    return {"params": params}


def _torch_fc6_kernel_reorder(kernel_chw: np.ndarray) -> np.ndarray:
    """torch flattens RoI features as (C, 7, 7); this module flattens NHWC
    as (7, 7, C).  Reorder fc6's input rows accordingly.
    kernel_chw: (C*7*7, 1024) with torch's (C, H, W) row order."""
    c = kernel_chw.shape[0] // 49
    k = kernel_chw.reshape(c, 7, 7, -1)
    return np.transpose(k, (1, 2, 0, 3)).reshape(c * 49, -1)


def convert_torch_frcnn_full(state_dict) -> dict:
    """convert_torch_frcnn + the fc6 row reorder for the NHWC RoI layout."""
    variables = convert_torch_frcnn(state_dict)
    fc6 = variables["params"]["box_head"]["fc6"]
    fc6["kernel"] = _torch_fc6_kernel_reorder(fc6["kernel"])
    return variables


# --------------------------------------------------------------------- #
# Detector backend for TennisPlayerDetector                             #
# --------------------------------------------------------------------- #


def random_frcnn_variables(key, height: int = 96, width: int = 256,
                           min_size: int = 64, max_size: int = 128) -> dict:
    """Random-init variables (the tree is input-size-invariant, so tiny
    init sizes keep tests fast)."""
    model = FasterRCNN(min_size=min_size, max_size=max_size)
    return model.init({"params": key},
                      jnp.zeros((height, width, 3), jnp.float32))


def make_person_box_backend(variables: dict, score_threshold: float = 0.8,
                            min_size: int = MIN_SIZE,
                            max_size: int = MAX_SIZE, dtype=jnp.float32):
    """Returns a (T, H, W, C) [0,1] -> [[(x1,y1,x2,y2), ...] per frame]
    box proposer pluggable into TennisPlayerDetector (detection.py).  The
    0.8 person-score threshold matches the reference
    (tennis_player_detector.py:17)."""
    model = FasterRCNN(dtype=dtype, min_size=min_size, max_size=max_size)

    @jax.jit
    def detect(variables, frames):
        return jax.vmap(
            lambda img: model.apply(variables, img))(frames)

    def backend(frames: np.ndarray):
        frames = np.asarray(frames, np.float32)[..., :3]
        boxes, scores, labels = jax.device_get(detect(variables, frames))
        out = []
        for t in range(frames.shape[0]):
            frame_boxes = [
                tuple(float(v) for v in boxes[t, i])
                for i in range(boxes.shape[1])
                if scores[t, i] > score_threshold
                and labels[t, i] == PERSON_LABEL]
            out.append(frame_boxes)
        return out

    return backend


def frcnn_backend_from_config(config):
    """Resolves `evaluation.detector: frcnn` — loads converted torchvision
    weights from the pretrained-weights directory (WEIGHT_FILES['frcnn']).
    Optional `evaluation.detector_resize: [min, max]` overrides the
    torchvision 800/1333 transform bounds (e.g. for low-res footage or
    CPU smoke runs)."""
    from playablevideogeneration_tpu.utils import pretrained

    path = pretrained.find_weights(config, "frcnn")
    if path is None:
        raise FileNotFoundError(
            "evaluation.detector: frcnn needs converted detector weights "
            "(tools/convert_weights.py frcnn) in PVG_PRETRAINED_WEIGHTS or "
            "tpu.pretrained_weights_dir")
    variables = pretrained.load_variables_npz(path)
    resize = (config.get("evaluation", {}) or {}).get(
        "detector_resize", (MIN_SIZE, MAX_SIZE))
    return make_person_box_backend(variables, min_size=int(resize[0]),
                                   max_size=int(resize[1]))
