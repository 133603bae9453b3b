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
from ..runtime.progcache import cached_jit

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


@cached_jit
def _mask_pass(unet_params: Dict, image: jnp.ndarray, valid_hw=None):
    """Pass 1: normalized image (1, H, W, 1) -> fg mask, 1-BIT PACKED
    (Hb, ceil(Wb/8)) uint8.  ``valid_hw`` is a pair of TRACED scalars (not a
    static cache key), so every true geometry within one bucket shares one
    compiled program; the padded mask is cropped back to (H, W) on the host
    (a device crop would need a shape-dependent -- hence
    geometry-specialized -- program).

    The mask is exactly {0, 1} (per-pixel argmax), so the bitmap fetch is
    lossless and 8x smaller -- this attachment moves device->host bytes at
    ~27 MB/s, so the raw 615^2 f32 mask fetch alone cost ~55 ms/pass."""
    from ..ops.packing import pack_mask_1bit_jax

    logits, _ = nuset.unet_forward(unet_params, image, valid_hw)
    return pack_mask_1bit_jax(nuset.pred_mask(logits))


@cached_jit
def _mask_and_feat_pass(unet_params: Dict, image: jnp.ndarray, valid_hw=None):
    """Pass 2 front half: (packed mask bitmap, device-resident RPN feat)."""
    from ..ops.packing import pack_mask_1bit_jax

    logits, feat = nuset.unet_forward(unet_params, image, valid_hw)
    return pack_mask_1bit_jax(nuset.pred_mask(logits)), feat


def _fetch_mask(packed_dev, Hb: int, Wb: int) -> np.ndarray:
    """One small fetch + host LUT unpack -> (Hb, Wb) float32 {0., 1.}."""
    from ..ops.packing import unpack_mask_1bit

    return unpack_mask_1bit(np.asarray(packed_dev), Wb).astype(np.float32)


@cached_jit(static_argnames=("pre_nms_top_n", "post_nms_top_n"))
def _proposal_pass(
    rpn_params: Dict,
    feat: jnp.ndarray,
    all_anchors: jnp.ndarray,
    im_shape: Tuple[int, int],
    nms_threshold: float,
    pre_nms_top_n: int = box_ops.PRE_NMS_TOP_N,
    post_nms_top_n: int = box_ops.POST_NMS_TOP_N,
    valid_grid: Tuple[int, int] = None,
):
    """RPN head + proposal filtering (reference rpn_proposal.py:4-187) with
    static budgets.  Returns (proposals (P,4), scores (P,), valid (P,)).

    ``valid_grid``: when ``feat`` comes from a bucket-padded image, the true
    (H/16, W/16) anchor-grid extent; anchors at padded positions are masked
    to -inf score, which reproduces the unpadded selection exactly (valid
    anchors keep identical scores and relative raster order, so top-k and
    NMS tie-breaking are unchanged; -inf fillers never become valid
    proposals).  Traced scalars, like ``valid_hw`` above -- one program per
    bucket, not per geometry."""
    pred = nuset.rpn_forward(rpn_params, feat)
    all_scores = pred["rpn_cls_prob"][:, 1]
    all_proposals = box_ops.decode(all_anchors, pred["rpn_bbox_pred"])

    x1, y1, x2, y2 = (all_proposals[:, i] for i in range(4))
    zero_area = (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )
    keep = zero_area
    if valid_grid is not None:
        gh, gw = feat.shape[1], feat.shape[2]
        a = all_scores.shape[0] // (gh * gw)
        rows = jnp.arange(gh * gw * a, dtype=jnp.int32) // (gw * a)
        cols = (jnp.arange(gh * gw * a, dtype=jnp.int32) // a) % gw
        in_grid = jnp.logical_and(rows < valid_grid[0], cols < valid_grid[1])
        keep = jnp.logical_and(keep, in_grid)
    scores = jnp.where(keep, all_scores, -jnp.inf)

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


@cached_jit(static_argnames=("pre_nms_top_n", "post_nms_top_n"))
def _proposal_pass_packed(
    rpn_params: Dict,
    feat: jnp.ndarray,
    all_anchors: jnp.ndarray,
    im_shape: Tuple[int, int],
    nms_threshold: float,
    pre_nms_top_n: int = box_ops.PRE_NMS_TOP_N,
    post_nms_top_n: int = box_ops.POST_NMS_TOP_N,
    valid_grid: Tuple[int, int] = None,
):
    """:func:`_proposal_pass` with its three outputs concatenated into ONE
    (P, 6) f32 array [x1, y1, x2, y2, score, valid] so the host pays a
    single dispatch round trip (~35-45 ms each on this attachment) instead
    of three.  Values are bit-identical to the separate outputs."""
    proposals, scores, valid = _proposal_pass(
        rpn_params,
        feat,
        all_anchors,
        im_shape,
        nms_threshold,
        pre_nms_top_n=pre_nms_top_n,
        post_nms_top_n=post_nms_top_n,
        valid_grid=valid_grid,
    )
    return jnp.concatenate(
        [proposals, scores[:, None], valid.astype(jnp.float32)[:, None]],
        axis=1,
    )


BUCKET = 128  # compile-geometry bucket granularity (/16-aligned)


def _bucket_dim(d: int) -> int:
    return max(BUCKET, -(-d // BUCKET) * BUCKET)


def _bucket_enabled() -> bool:
    import os

    return os.environ.get("ECSEG_NUSET_BUCKET", "1") not in ("0", "false")


def nuset_forward(
    model: NuSeTModel, image_norm: np.ndarray, pass_two: bool,
    bucket: bool = None,
) -> np.ndarray:
    """One full graph evaluation on a normalized (H, W) float image.

    pass_two=False: binary mask only (sess1 protocol).
    pass_two=True: mask + RPN proposals + marker watershed (sess2 protocol).

    Geometry bucketing (on by default; ECSEG_NUSET_BUCKET=0 disables): the
    input is zero-padded up to BUCKET-multiples so a mixed-size folder
    compiles only a handful of U-Net programs instead of one per distinct
    geometry (the reference crops to /16, src/utils.py:138-141, which still
    leaves arbitrarily many shapes; first compiles cost minutes on this
    attachment).  The masked forward (models/nuset.unet_forward valid_hw)
    and -inf anchor masking make the padded outputs bit-identical to the
    unpadded program's.
    """
    if bucket is None:
        bucket = _bucket_enabled()
    H, W = image_norm.shape
    Hb = _bucket_dim(H) if bucket else H
    Wb = _bucket_dim(W) if bucket else W
    valid_hw = (H, W) if (Hb, Wb) != (H, W) else None
    if valid_hw is not None:
        padded = np.zeros((Hb, Wb), np.float32)
        padded[:H, :W] = image_norm
        image_norm = padded
    x = jnp.asarray(image_norm, jnp.float32).reshape(1, Hb, Wb, 1)
    if not pass_two:
        mask = _fetch_mask(_mask_pass(model.unet_whole, x, valid_hw), Hb, Wb)
        return mask[:H, :W] if valid_hw is not None else mask

    mask_dev, feat = _mask_and_feat_pass(model.unet_fg, x, valid_hw)
    mask = _fetch_mask(mask_dev, Hb, Wb)
    if valid_hw is not None:
        mask = mask[:H, :W]  # host-side crop keeps the device program
        # geometry-independent within the bucket

    # host boundary #1: dynamic anchor base size (reference anchor_size.py)
    base_size = anchor_size_from_mask(mask)
    ref_anchors = box_ops.generate_anchors_reference(base_size, RATIOS, SCALES)
    all_anchors = box_ops.generate_anchors(
        ref_anchors, STRIDE, (Hb // STRIDE, Wb // STRIDE)
    )

    packed = np.asarray(
        _proposal_pass_packed(
            model.rpn_fg,
            feat,
            jnp.asarray(all_anchors),
            (H, W),
            model.nms_threshold,
            valid_grid=(H // STRIDE, W // STRIDE)
            if valid_hw is not None
            else None,
        )
    )  # (P, 6): one fetch instead of three
    valid = packed[:, 5] > 0.5
    proposals = packed[valid, :4]
    scores = packed[valid, 4]

    # host boundary #2: marker watershed (reference marker_watershed.py).
    # Default on the device pipeline is the parity-GATED device flood
    # ('auto': keep the device result only when its per-image certificate
    # proves order-independence, i.e. bit-equality with the host
    # priority flood); ECSEG_FAST_WATERSHED picks host/on/check/auto
    # explicitly (runtime/devicepath.fast_watershed_mode).
    from ..runtime.devicepath import fast_watershed_check, fast_watershed_mode

    mode = fast_watershed_mode()
    if mode == "auto":
        from ..ops.watershed_tpu import nuset_marker_watershed_auto

        out, n_unc = nuset_marker_watershed_auto(
            scores, proposals, mask, min_score=model.bbox_min_score
        )
        if out is not None:
            return out.astype(np.float32)
        from ..runtime import fallbacks

        fallbacks.record("fast_watershed_uncertain_px", n_unc)
        fallbacks.record("fast_watershed_host_recompute")
    elif mode in ("on", "check"):
        from ..ops.watershed_tpu import nuset_marker_watershed_fast

        if fast_watershed_check():
            out, tie_px = nuset_marker_watershed_fast(
                scores,
                proposals,
                mask,
                min_score=model.bbox_min_score,
                count_ties=True,
            )
            if tie_px:
                from ..runtime import fallbacks

                fallbacks.record("fast_watershed_tie_px", tie_px)
                fallbacks.record("fast_watershed_tie_images")
            return out.astype(np.float32)
        return nuset_marker_watershed_fast(
            scores, proposals, mask, min_score=model.bbox_min_score
        ).astype(np.float32)
    return nuset_marker_watershed(
        scores, proposals, mask, min_score=model.bbox_min_score
    ).astype(np.float32)


@cached_jit(static_argnames=("out_hw",))
def _cleanup_pass(mask_f32, out_hw, nuclei_size_t):
    """Device twin of the post-watershed cleanup chain (reference
    src/utils.py:153-163): clean_image -> rescale back -> min-max binarize
    (incl. the uint8-truncation threshold and the all-equal -> empty NaN
    quirk) -> remove_small_objects.  Returns uint8 {0, 255}."""
    from ..ops.morphology_tpu import clean_image_tpu, remove_small_objects_tpu
    from ..ops.resize import resize_linear_matmul

    m = clean_image_tpu(mask_f32).astype(jnp.float32)  # {0, 1}
    if tuple(out_hw) != tuple(mask_f32.shape):
        m = resize_linear_matmul(m, out_hw)
    lo, hi = m.min(), m.max()
    # host: I8 = ((m-lo)/(hi-lo)*255).astype(uint8); I8 > 0  -- truncation
    # makes the support threshold (m-lo) >= (hi-lo)/255; hi == lo divides
    # 0/0 -> NaN -> uint8 0 on host, i.e. empty
    supp = jnp.logical_and(
        (m - lo) / (hi - lo) * 255.0 >= 1.0, hi > lo
    )
    keep = remove_small_objects_tpu(supp, nuclei_size_t, connectivity=1)
    from ..ops.packing import pack_mask_1bit_jax

    # 1-bit packed fetch: this attachment's device->host path runs at
    # ~27 MB/s, so the full-res binary mask ships as a bitmap (8x smaller)
    return pack_mask_1bit_jax(keep)


def nuclei_segment_prepare(image: np.ndarray, resize_scale: float):
    """Host prep stage of :func:`nuclei_segment` (rescale -> /16 crop ->
    whole-image norm), split out so pipeline reader threads can overlap it
    with the PREVIOUS image's device passes: the skimage-parity 0.3x
    rescale of a 2048^2 image costs ~125 ms of f64 gaussian+zoom on this
    host (scripts/profile_nuclei_segment.py), pure dead time on the device
    critical path when run inline.  Bit-identical to the inline steps it
    replaces -- same functions, same order."""
    if resize_scale != 1:
        image = rescale(image, resize_scale, anti_aliasing=True)
    imheight, imwidth = image.shape
    image = image[: imheight // 16 * 16, : imwidth // 16 * 16]
    return image, whole_image_norm(image)


def nuclei_segment(
    image: np.ndarray, model: NuSeTModel, nuclei_size_t: int,
    device_cleanup: bool = None, pre=None,
) -> np.ndarray:
    """reference src/utils.py:134-163: rescale 0.3 -> crop /16 -> pass 1
    (whole-image norm) -> pass 2 (foreground norm + watershed) -> clean ->
    rescale back -> binarize -> remove_small_objects -> uint8 {0, 255}.

    The cleanup tail runs on device when ``device_cleanup`` (default: the
    pipeline device-path switch, runtime/devicepath) -- the host chain below
    stays as the parity oracle (tests/test_device_pipeline_e2e.py asserts
    byte equality through stat_fish's main).  ``pre`` optionally supplies a
    precomputed :func:`nuclei_segment_prepare` result (reader-thread
    overlap; must have been built with this model's ``resize_scale``)."""
    if device_cleanup is None:
        from ..runtime.devicepath import use_device_path

        device_cleanup = use_device_path()
    resize_scale = model.resize_scale
    if resize_scale > 1:
        # the host oracle's rescale(masks, 1/resize_scale) is then a
        # DOWNscale, for which skimage auto-enables a gaussian anti-aliasing
        # prefilter that the device twin (plain bilinear matmul resize) does
        # not replicate -- keep such configs on the host chain
        device_cleanup = False
    if pre is None:
        pre = nuclei_segment_prepare(image, resize_scale)
    image, image_wn = pre

    masks1 = nuset_forward(model, image_wn, pass_two=False)

    image_fg = foreground_norm(image, masks1)
    masks_watershed = nuset_forward(model, image_fg, pass_two=True)

    if device_cleanup:
        if resize_scale != 1:
            out_hw = tuple(
                int(d)
                for d in np.maximum(
                    np.round(
                        np.multiply(
                            masks_watershed.shape, 1 / resize_scale
                        )
                    ),
                    1,
                )
            )
        else:
            out_hw = masks_watershed.shape
        from ..ops.packing import unpack_mask_1bit

        packed = np.asarray(
            _cleanup_pass(
                jnp.asarray(masks_watershed, jnp.float32),
                out_hw,
                nuclei_size_t,
            )
        )
        return unpack_mask_1bit(packed, out_hw[1]) * np.uint8(255)

    masks_watershed = clean_image(masks_watershed)

    if resize_scale != 1:
        masks_watershed = rescale(masks_watershed, 1 / resize_scale)

    lo, hi = masks_watershed.min(), masks_watershed.max()
    I8 = (((masks_watershed - lo) / (hi - lo)) * 255).astype(np.uint8)
    I8[I8 > 0] = 255
    I8 = remove_small_objects(I8.astype(bool), nuclei_size_t).astype(int) * 255
    return I8.astype(np.uint8)
