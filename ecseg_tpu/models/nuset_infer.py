"""NuSeT end-to-end inference: the TPU-native equivalent of the reference's
``load_nuset`` TF1 graph + two-session protocol (reference src/utils.py:35-103)
and ``nuclei_segment`` (src/utils.py:134-163).

Graph structure (per reference):

  image -> U-Net -> per-pixel fg/bg argmax mask
        -> dynamic anchor base size from the predicted mask  [host]
        -> reference anchors (scales [.5,1,2] x ratios [.125..8], stride 16)
        -> RPN head on the pooled feature map
        -> proposal decode + zero-area filter + top-6000 + NMS(iou, top-800)
           + clip                                             [device]
        -> marker watershed                                   [host]

Two weight sets run over the same graph: ``whole_norm`` (pass 1, whole-image
normalization -> binary mask) and ``foreground`` (pass 2, foreground
normalization -> watershed-split mask).

Device/host split: the U-Net + RPN + proposal filtering are one jitted JAX
function per input geometry; the anchor base size (median region extent of
the pass-specific mask) and the marker watershed are host steps, exactly the
two tf.py_func boundaries of the reference graph.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import boxes as box_ops
from ..ops.normalization import clean_image, foreground_norm, whole_image_norm
from ..ops.resize import rescale
from ..ops.morphology import remove_small_objects
from ..ops.watershed import anchor_size_from_mask, nuset_marker_watershed
from . import nuset

SCALES = np.array([0.5, 1, 2])
RATIOS = np.array([0.125, 0.25, 0.5, 1, 2, 4, 8])
NUM_REF_ANCHORS = SCALES.shape[0] * RATIOS.shape[0]  # 21
STRIDE = 16


@dataclasses.dataclass
class NuSeTModel:
    """Weights for both passes + the NMS config."""

    unet_whole: Dict
    unet_fg: Dict
    rpn_fg: Dict
    nms_threshold: float
    bbox_min_score: float
    resize_scale: float


def init_nuset_model(
    key,
    bbox_min_score: float = 0.95,
    nms_threshold: float = 0.01,
    resize_scale: float = 0.3,
) -> NuSeTModel:
    k1, k2, k3 = jax.random.split(key, 3)
    return NuSeTModel(
        unet_whole=nuset.init_unet_params(k1),
        unet_fg=nuset.init_unet_params(k2),
        rpn_fg=nuset.init_rpn_params(k3, NUM_REF_ANCHORS),
        nms_threshold=nms_threshold,
        bbox_min_score=bbox_min_score,
        resize_scale=resize_scale,
    )


@jax.jit
def _mask_pass(unet_params: Dict, image: jnp.ndarray):
    """Pass 1: normalized image (1, H, W, 1) -> fg mask (H, W) float32."""
    logits, _ = nuset.unet_forward(unet_params, image)
    return nuset.pred_mask(logits)


@jax.jit
def _mask_and_feat_pass(unet_params: Dict, image: jnp.ndarray):
    logits, feat = nuset.unet_forward(unet_params, image)
    return nuset.pred_mask(logits), feat


@functools.partial(jax.jit, static_argnames=("pre_nms_top_n", "post_nms_top_n"))
def _proposal_pass(
    rpn_params: Dict,
    feat: jnp.ndarray,
    all_anchors: jnp.ndarray,
    im_shape: Tuple[int, int],
    nms_threshold: float,
    pre_nms_top_n: int = box_ops.PRE_NMS_TOP_N,
    post_nms_top_n: int = box_ops.POST_NMS_TOP_N,
):
    """RPN head + proposal filtering (reference rpn_proposal.py:4-187) with
    static budgets.  Returns (proposals (P,4), scores (P,), valid (P,))."""
    pred = nuset.rpn_forward(rpn_params, feat)
    all_scores = pred["rpn_cls_prob"][:, 1]
    all_proposals = box_ops.decode(all_anchors, pred["rpn_bbox_pred"])

    x1, y1, x2, y2 = (all_proposals[:, i] for i in range(4))
    zero_area = (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )
    scores = jnp.where(zero_area, all_scores, -jnp.inf)

    k = min(pre_nms_top_n, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_proposals = all_proposals[top_idx]

    tf_order = box_ops.change_order(top_proposals)
    sel, valid = box_ops.nms_jax(
        jnp.where(top_scores[:, None] > -jnp.inf, tf_order, 0.0),
        top_scores,
        post_nms_top_n,
        nms_threshold,
    )
    sel_safe = jnp.maximum(sel, 0)
    proposals = box_ops.change_order(tf_order[sel_safe])
    proposals = box_ops.clip_boxes(proposals, im_shape)
    scores_out = top_scores[sel_safe]
    return proposals, scores_out, valid


def nuset_forward(
    model: NuSeTModel, image_norm: np.ndarray, pass_two: bool
) -> np.ndarray:
    """One full graph evaluation on a normalized (H, W) float image.

    pass_two=False: binary mask only (sess1 protocol).
    pass_two=True: mask + RPN proposals + marker watershed (sess2 protocol).
    """
    H, W = image_norm.shape
    x = jnp.asarray(image_norm, jnp.float32).reshape(1, H, W, 1)
    if not pass_two:
        return np.asarray(_mask_pass(model.unet_whole, x))

    mask_dev, feat = _mask_and_feat_pass(model.unet_fg, x)
    mask = np.asarray(mask_dev)

    # host boundary #1: dynamic anchor base size (reference anchor_size.py)
    base_size = anchor_size_from_mask(mask)
    ref_anchors = box_ops.generate_anchors_reference(base_size, RATIOS, SCALES)
    all_anchors = box_ops.generate_anchors(
        ref_anchors, STRIDE, (H // STRIDE, W // STRIDE)
    )

    proposals, scores, valid = _proposal_pass(
        model.rpn_fg,
        feat,
        jnp.asarray(all_anchors),
        (H, W),
        model.nms_threshold,
    )
    valid = np.asarray(valid)
    proposals = np.asarray(proposals)[valid]
    scores = np.asarray(scores)[valid]

    # host boundary #2: marker watershed (reference marker_watershed.py)
    return nuset_marker_watershed(
        scores, proposals, mask, min_score=model.bbox_min_score
    ).astype(np.float32)


def nuclei_segment(
    image: np.ndarray, model: NuSeTModel, nuclei_size_t: int
) -> np.ndarray:
    """reference src/utils.py:134-163: rescale 0.3 -> crop /16 -> pass 1
    (whole-image norm) -> pass 2 (foreground norm + watershed) -> clean ->
    rescale back -> binarize -> remove_small_objects -> uint8 {0, 255}."""
    resize_scale = model.resize_scale
    if resize_scale != 1:
        image = rescale(image, resize_scale, anti_aliasing=True)

    imheight, imwidth = image.shape
    imheight = imheight // 16 * 16
    imwidth = imwidth // 16 * 16
    image = image[:imheight, :imwidth]

    image_wn = whole_image_norm(image)
    masks1 = nuset_forward(model, image_wn, pass_two=False)

    image_fg = foreground_norm(image, masks1)
    masks_watershed = nuset_forward(model, image_fg, pass_two=True)
    masks_watershed = clean_image(masks_watershed)

    if resize_scale != 1:
        masks_watershed = rescale(masks_watershed, 1 / resize_scale)

    lo, hi = masks_watershed.min(), masks_watershed.max()
    I8 = (((masks_watershed - lo) / (hi - lo)) * 255).astype(np.uint8)
    I8[I8 > 0] = 255
    I8 = remove_small_objects(I8.astype(bool), nuclei_size_t).astype(int) * 255
    return I8.astype(np.uint8)
