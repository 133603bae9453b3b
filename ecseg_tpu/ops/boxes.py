"""Anchor generation, bbox decode/clip, and NMS.

Numerics mirror the reference's luminoth-derived TF ops so imported NuSeT
checkpoints produce identical proposals:

- anchors: reference src/nuset_utils/anchors.py:6-55,
  src/nuset_utils/generate_anchors.py:5-48 (ratio-major reference anchors,
  row-major stride-16 grid);
- decode / clip / change_order: reference src/nuset_utils/
  bbox_transform_tf.py:41-126 (+1 width convention, the "-1 extra" on x2/y2);
- NMS: tf.image.non_max_suppression semantics (greedy by descending score,
  IoU strictly greater than threshold suppresses) as called at
  reference src/model_layers/rpn_proposal.py:142-147.

Everything is pure jnp and jit-safe with static proposal budgets; numpy
callers can pass numpy arrays (results are identical on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PRE_NMS_TOP_N = 6000  # reference src/model_layers/rpn_proposal.py:19
POST_NMS_TOP_N = 800  # reference src/model_layers/rpn_proposal.py:25


def generate_anchors_reference(base_size, aspect_ratios, scales) -> np.ndarray:
    """(num_ratios * num_scales, 4) reference anchors, (x1, y1, x2, y2)."""
    scales = np.asarray(scales, np.float64)
    ratios = np.asarray(aspect_ratios, np.float64)
    scales_grid, ratios_grid = np.meshgrid(scales, ratios)
    base_scales = scales_grid.reshape(-1)
    base_ratios = ratios_grid.reshape(-1)
    sqrt_r = np.sqrt(base_ratios)
    heights = base_scales * sqrt_r * base_size
    widths = base_scales / sqrt_r * base_size
    return np.stack(
        [
            -(widths - 1) / 2,
            -(heights - 1) / 2,
            (widths - 1) / 2,
            (heights - 1) / 2,
        ],
        axis=-1,
    )


def generate_anchors(
    anchors_reference: np.ndarray, stride: int, feat_shape: Tuple[int, int]
) -> np.ndarray:
    """All anchors over the stride grid: (feat_h * feat_w * A, 4), y-outer
    x-inner row-major, matching reference generate_anchors.py:5-48."""
    feat_h, feat_w = int(feat_shape[0]), int(feat_shape[1])
    shift_x = np.arange(feat_w) * stride
    shift_y = np.arange(feat_h) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel()] * 2, axis=1).astype(np.float64)
    all_anchors = anchors_reference[None, :, :] + shifts[:, None, :]
    return all_anchors.reshape(-1, 4).astype(np.float32)


def _width_upright(b):
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    urx = x1 + 0.5 * w
    ury = y1 + 0.5 * h
    return w, h, urx, ury


def encode(bboxes, gt_boxes, variances=None):
    """Anchor-relative box encoding (reference bbox_transform_tf.py:18-38);
    the inverse of :func:`decode` (up to its -1 quirk), used for training and
    kept for API completeness."""
    bboxes = jnp.asarray(bboxes, jnp.float32)
    gt_boxes = jnp.asarray(gt_boxes, jnp.float32)
    if variances is None:
        variances = [1.0, 1.0]
    bw, bh, bx, by = _width_upright(bboxes)
    gw, gh, gx, gy = _width_upright(gt_boxes)
    dx = (gx - bx) / (bw * variances[0])
    dy = (gy - by) / (bh * variances[0])
    dw = jnp.log(gw / bw) / variances[1]
    dh = jnp.log(gh / bh) / variances[1]
    return jnp.stack([dx, dy, dw, dh], axis=1)


def decode(roi, deltas, variances=None):
    """reference bbox_transform_tf.py:41-66 (incl. the -1 on x2/y2).
    ``variances`` mirror :func:`encode`'s so the pair stays a round-trip
    inverse for non-default values (the inference path uses [1, 1])."""
    roi = jnp.asarray(roi, jnp.float32)
    deltas = jnp.asarray(deltas, jnp.float32)
    if variances is None:
        variances = [1.0, 1.0]
    w, h, urx, ury = _width_upright(roi)
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    pur_x = dx * variances[0] * w + urx
    pur_y = dy * variances[0] * h + ury
    pw = jnp.exp(dw * variances[1]) * w
    ph = jnp.exp(dh * variances[1]) * h
    x1 = pur_x - 0.5 * pw
    y1 = pur_y - 0.5 * ph
    x2 = pur_x + 0.5 * pw - 1.0
    y2 = pur_y + 0.5 * ph - 1.0
    return jnp.stack([x1, y1, x2, y2], axis=1)


def clip_boxes(boxes, im_shape):
    """Clamp to [0, dim-1] (reference bbox_transform_tf.py:69-99);
    ``im_shape`` = (height, width)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    h = jnp.float32(im_shape[0])
    w = jnp.float32(im_shape[1])
    x1 = jnp.clip(boxes[:, 0], 0.0, w - 1.0)
    y1 = jnp.clip(boxes[:, 1], 0.0, h - 1.0)
    x2 = jnp.clip(boxes[:, 2], 0.0, w - 1.0)
    y2 = jnp.clip(boxes[:, 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=1)


def change_order(boxes):
    """(x1,y1,x2,y2) <-> (y1,x1,y2,x2) (reference bbox_transform_tf.py:102-126)."""
    return jnp.stack([boxes[:, 1], boxes[:, 0], boxes[:, 3], boxes[:, 2]], axis=1)


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, max_output: int, iou_threshold: float):
    """tf.image.non_max_suppression on host; boxes (y1,x1,y2,x2).  Returns
    selected indices (into the input order)."""
    boxes = np.asarray(boxes, np.float32)
    scores = np.asarray(scores, np.float32)
    order = np.argsort(-scores, kind="stable")
    areas = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    selected = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        selected.append(i)
        if len(selected) >= max_output:
            break
        yy1 = np.maximum(boxes[i, 0], boxes[:, 0])
        xx1 = np.maximum(boxes[i, 1], boxes[:, 1])
        yy2 = np.minimum(boxes[i, 2], boxes[:, 2])
        xx2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.maximum(yy2 - yy1, 0) * np.maximum(xx2 - xx1, 0)
        union = areas[i] + areas - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
        suppressed |= iou > iou_threshold
    return np.asarray(selected, np.int64)


@functools.partial(jax.jit, static_argnames=("max_output",))
def nms_jax(boxes, scores, max_output: int, iou_threshold):
    """Greedy NMS on device with a static output budget.

    Returns (indices (max_output,), valid mask (max_output,)).  Matches
    :func:`nms_numpy` selection order; unused slots have valid=False.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    n = boxes.shape[0]
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )

    def body(state, _):
        live_scores, = state
        i = jnp.argmax(live_scores)
        valid = live_scores[i] > -jnp.inf
        yy1 = jnp.maximum(boxes[i, 0], boxes[:, 0])
        xx1 = jnp.maximum(boxes[i, 1], boxes[:, 1])
        yy2 = jnp.minimum(boxes[i, 2], boxes[:, 2])
        xx2 = jnp.minimum(boxes[i, 3], boxes[:, 3])
        inter = jnp.maximum(yy2 - yy1, 0) * jnp.maximum(xx2 - xx1, 0)
        union = areas[i] + areas - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        kill = jnp.logical_or(iou > iou_threshold, jnp.arange(n) == i)
        live_scores = jnp.where(kill, -jnp.inf, live_scores)
        return (live_scores,), (jnp.where(valid, i, -1), valid)

    # argmax ties: jnp.argmax picks the first max, same as the stable
    # descending sort in nms_numpy.
    (_,), (idx, valid) = jax.lax.scan(
        body, (jnp.where(scores > -jnp.inf, scores, -jnp.inf),), None, length=max_output
    )
    return idx, valid
