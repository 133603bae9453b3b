"""Marker-controlled watershed (host side).

Implements the Vincent–Soille priority-flood algorithm with the same
ordering semantics as skimage.segmentation.watershed (which the reference
calls at src/model_layers/marker_watershed.py:84): a min-heap keyed by
(image value, insertion age); 4-connected by default; with
``watershed_line=True`` pixels adjacent to a different label are recorded as
line pixels and zeroed in the output.

Also hosts the NuSeT-specific marker placement + watershed post-pass
(``nuset_marker_watershed``), the numpy py_func body of reference
marker_watershed.py:9-96, reproduced quirk-for-quirk (the no-op
``markers[...] == 0`` statement, edge suppression band, fallback region
markers, score-ascending marker overwrite order).
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
from scipy import ndimage as ndi

from . import morphology as morph
from .cc import label as cc_label, regionprops


def watershed(
    image: np.ndarray,
    markers: np.ndarray,
    mask: Optional[np.ndarray] = None,
    connectivity: int = 1,
    watershed_line: bool = False,
) -> np.ndarray:
    """Flood ``markers`` over ``image`` (ascending values) within ``mask``.

    Dispatches to the C++ priority-flood kernel (ecseg_tpu.native) when
    built; the Python implementation below is the behavioral reference and
    the fallback."""
    image = np.asarray(image, np.float64)
    H, W = image.shape
    if mask is None:
        mask = np.ones((H, W), bool)
    else:
        mask = np.asarray(mask).astype(bool)
    markers = np.asarray(markers).astype(np.int64)
    markers = np.where(mask, markers, 0)

    from .. import native

    native_out = native.watershed(
        image, markers, mask, connectivity=connectivity,
        watershed_line=watershed_line,
    )
    if native_out is not None:
        return native_out

    output = markers.copy()
    lines = np.zeros((H, W), bool)

    if connectivity == 1:
        offsets = [(-1, 0), (0, -1), (0, 1), (1, 0)]
    else:
        offsets = [
            (-1, -1), (-1, 0), (-1, 1),
            (0, -1), (0, 1),
            (1, -1), (1, 0), (1, 1),
        ]

    heap = []
    age = 0
    ys, xs = np.nonzero(markers)
    for y, x in zip(ys.tolist(), xs.tolist()):
        heapq.heappush(heap, (image[y, x], age, y, x, y, x))
        age += 1

    while heap:
        _, _, y, x, sy, sx = heapq.heappop(heap)
        if watershed_line:
            # a pixel may be queued several times; first pop wins
            if output[y, x] != 0 and (y, x) != (sy, sx):
                continue
            output[y, x] = output[sy, sx]
        for dy, dx in offsets:
            ny, nx = y + dy, x + dx
            if not (0 <= ny < H and 0 <= nx < W) or not mask[ny, nx]:
                continue
            if watershed_line:
                if output[ny, nx] != 0 and output[ny, nx] != output[y, x]:
                    lines[y, x] = True
            if output[ny, nx] != 0:
                continue
            age += 1
            if not watershed_line:
                output[ny, nx] = output[y, x]
            heapq.heappush(heap, (image[ny, nx], age, ny, nx, y, x))

    if watershed_line:
        output[lines] = 0
    return output


def nuset_place_markers(
    scores: np.ndarray,
    proposals: np.ndarray,
    pred_mask: np.ndarray,
    min_score: float = 0.99,
):
    """Marker placement of reference marker_watershed.py:9-80: one point
    marker per confident proposal (interior-only, score-ascending overwrite
    order), plus fallback region-center markers for mask regions >= 10 px
    lacking any marker.  Returns the (H, W) float32 point-marker map, or
    ``None`` when no proposal clears ``min_score`` (the reference's
    all-ones-contour branch, marker_watershed.py:86-89).

    Shared by the parity path (:func:`nuset_marker_watershed`) and the
    device fast path (ops/watershed_tpu.nuset_marker_watershed_fast) so the
    placement quirks cannot diverge between them."""
    pred_mask = np.asarray(pred_mask)
    im_height, im_width = pred_mask.shape
    mask = pred_mask.reshape(im_height, im_width)

    scores = np.asarray(scores)
    proposals = np.asarray(proposals)
    if not (scores.size > 0 and np.max(scores) > min_score):
        return None

    markers = np.zeros((im_height, im_width), np.float32)
    edge_len = 20
    edge_mask = np.zeros((im_height, im_width))
    edge_mask[edge_len : im_height - edge_len, edge_len : im_width - edge_len] = 1
    edge_mask = 1 - edge_mask

    top_idx = scores > min_score
    scores_f = scores[top_idx]
    proposals_f = proposals[top_idx]
    sorted_idx = scores_f.argsort()
    proposals_f = proposals_f[sorted_idx]

    p = 1
    for proposal in proposals_f:
        bbox = list(proposal)
        # proposals are (x1, y1, x2, y2); the reference's x_pos is the
        # row (y-center) and y_pos the column (x-center)
        x_pos = int(round((bbox[3] + bbox[1]) / 2))
        y_pos = int(round((bbox[2] + bbox[0]) / 2))
        if edge_mask[x_pos, y_pos] < 1:
            # (the reference's `markers[...] == 0` here is a no-op)
            markers[x_pos, y_pos] = p
            p += 1

    label_mask = cc_label(mask != 0)
    for region in regionprops(label_mask):
        if region["Area"] < 10:
            continue
        minx, miny, maxx, maxy = region["BoundingBox"]
        minx = int(np.clip(minx, 0, im_height - 1))
        miny = int(np.clip(miny, 0, im_width - 1))
        maxx = int(np.clip(maxx, 0, im_height - 1))
        maxy = int(np.clip(maxy, 0, im_width - 1))
        if np.sum(markers[minx:maxx, miny:maxy]) == 0:
            x_pos = int(round((minx + maxx) / 2))
            y_pos = int(round((miny + maxy) / 2))
            markers[x_pos, y_pos] = p
            p += 1
    return markers


def nuset_marker_watershed(
    scores: np.ndarray,
    proposals: np.ndarray,
    pred_mask: np.ndarray,
    min_score: float = 0.99,
) -> np.ndarray:
    """Reference marker_watershed.py:9-96: place one marker per confident
    proposal (interior only), fall back to region-center markers, dilate,
    watershed on -EDT, multiply the line-split contour with the mask."""
    pred_mask = np.asarray(pred_mask)
    im_height, im_width = pred_mask.shape
    mask = pred_mask.reshape(im_height, im_width)

    markers = nuset_place_markers(scores, proposals, pred_mask, min_score)
    if markers is not None:
        markers_rw = morph.dilation(markers, morph.disk(3))
        distance = ndi.distance_transform_edt(ndi.binary_fill_holes(mask))
        contour = watershed(
            -distance, markers_rw, mask=mask != 0, watershed_line=True
        )
        contour[contour != 0] = 1
    else:
        contour = np.ones((im_height, im_width), np.int64)

    return (pred_mask * contour).astype(np.int32)


def anchor_size_from_mask(mask: np.ndarray) -> float:
    """Median of per-region max bbox dimension of the labeled mask -- the
    dynamic RPN anchor base size (reference src/model_layers/
    anchor_size.py:10-38)."""
    label_mask = cc_label(np.asarray(mask) != 0)
    blob_scales = []
    for region in regionprops(label_mask):
        minx, miny, maxx, maxy = region["BoundingBox"]
        blob_scales.append(np.maximum(maxy - miny, maxx - minx))
    return float(np.median(np.asarray(blob_scales))) if blob_scales else float("nan")
