"""Marker-controlled watershed ON DEVICE (fast path).

The parity-exact watershed stays on the host (Python + C++ twins,
ops/watershed.py): skimage's flood ordering is a global priority queue with
insertion-age tie-breaking, which is inherently sequential, and the
reference itself runs it host-side inside a tf.py_func
(reference src/model_layers/marker_watershed.py:84).

This module provides the TPU-native FAST PATH for throughput-oriented
callers: watershed by topographic (minimax-path) flooding, the classical
parallel formulation.  Each pixel takes the label of the marker reachable
with the smallest bottleneck:  cost(p) = min over paths from a marker of
max(image along path);  computed by iterated neighbor relaxation of a
(cost, label) pair entirely in registers/VMEM-friendly shift ops under one
jit (lax.while_loop to the fixpoint).

Relation to the host result: identical wherever the minimax assignment is
unique (markers in distinct basins separated by strict ridges -- the
touching-nuclei EDT regime); on exact ties (equidistant ridge pixels) the
two implementations may assign either side, which is why this is a fast
path and not the parity path.  Tests pin the analytic two-basin case
exactly and near-total agreement on the EDT regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# kept as a python float so importing this module never initializes a jax
# backend (device constants at module scope force platform init on import)
_BIG = 3.4e38


# single edge-fill shift implementation shared with the morphology kernels
from .morphology_tpu import _shift2d as _shift


def _minimax_flood(image, markers, mask, connectivity: int, max_iters: int):
    """Shared flood core: returns the fixpoint ``(cost, labels)`` pair.
    ``cost`` is the minimax path cost from the owning marker (``_BIG`` where
    unreached), ``labels`` the int32 owner map (0 = unreached)."""
    offs4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    offs8 = offs4 + [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    offs = offs8 if connectivity == 2 else offs4

    cost0 = jnp.where(markers > 0, image, _BIG)
    lab0 = markers

    def body(state):
        cost, lab, _, it = state
        new_cost, new_lab = cost, lab
        for dy, dx in offs:
            ncost = _shift(cost, dy, dx, _BIG)
            nlab = _shift(lab, dy, dx, 0)
            cand = jnp.maximum(ncost, image)
            take = jnp.logical_and(cand < new_cost, nlab > 0)
            new_cost = jnp.where(take, cand, new_cost)
            new_lab = jnp.where(take, nlab, new_lab)
        new_cost = jnp.where(mask, new_cost, _BIG)
        new_lab = jnp.where(mask, new_lab, 0)
        # markers never change hands
        new_lab = jnp.where(markers > 0, markers, new_lab)
        new_cost = jnp.where(markers > 0, cost0, new_cost)
        changed = jnp.max(jnp.where(new_lab != lab, 1, 0)) > 0
        changed = jnp.logical_or(
            changed, jnp.max(jnp.where(new_cost != cost, 1, 0)) > 0
        )
        return new_cost, new_lab, changed, it + 1

    def cond(state):
        _, _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    cost, lab, _, _ = lax.while_loop(
        cond, body, (cost0, lab0, jnp.bool_(True), jnp.int32(0))
    )
    return cost, lab


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters"))
def watershed_tpu(
    image: jnp.ndarray,
    markers: jnp.ndarray,
    mask: jnp.ndarray = None,
    connectivity: int = 1,
    max_iters: int = 4096,
) -> jnp.ndarray:
    """Flood ``markers`` over ``image`` (ascending values) within ``mask``
    by minimax-path relaxation.  Returns int32 labels (0 = unreached)."""
    image = jnp.asarray(image, jnp.float32)
    markers = jnp.asarray(markers, jnp.int32)
    if mask is None:
        mask = jnp.ones(image.shape, bool)
    else:
        mask = jnp.asarray(mask).astype(bool)
    markers = jnp.where(mask, markers, 0)
    _, lab = _minimax_flood(image, markers, mask, connectivity, max_iters)
    return lab


@jax.jit
def _nuset_fast_pass(pred_mask: jnp.ndarray, markers: jnp.ndarray):
    """Device body of the NuSeT watershed post-pass (the numpy chain of
    reference src/model_layers/marker_watershed.py:82-91): grayscale-dilate
    the point markers by disk(3), EDT of the hole-filled mask, minimax-flood
    ``-EDT`` within the mask, zero basin-boundary ("watershed line") pixels,
    AND with the mask.  Returns the surviving-foreground bitmap 1-bit packed
    (this attachment fetches device->host at ~27 MB/s; see ops/packing).

    Line rule: a pixel is a line pixel when a 4-neighbor holds a different
    nonzero label and reached its pixel no later (strictly smaller minimax
    cost, or equal cost with a smaller label as the deterministic
    tie-break) -- the parallel analog of skimage's "later-popped pixel
    becomes the line" semantics.  Exact ties may resolve to the other side
    of the ridge than the host's insertion-age order; that is the documented
    fast-path deviation (module docstring)."""
    from .edt_tpu import edt_tpu
    from .morphology_tpu import _se_offsets, binary_fill_holes_tpu
    from .packing import pack_mask_1bit_jax

    mask = pred_mask != 0
    markers = markers.astype(jnp.int32)

    # grayscale dilation by disk(3) of the RAW markers (matches
    # morph.dilation: an off-mask marker still seeds where its dilated disk
    # overlaps the mask); the flood itself then zeroes off-mask markers,
    # like the host watershed's np.where(mask, markers, 0)
    disk3 = _disk3_footprint()
    m = markers
    for dy, dx in _se_offsets(disk3):
        m = jnp.maximum(m, _shift(markers, dy, dx, 0))
    m = jnp.where(mask, m, 0)

    dist = edt_tpu(binary_fill_holes_tpu(mask))
    cost, lab = _minimax_flood(
        -dist.astype(jnp.float32), m, mask, connectivity=1, max_iters=4096
    )

    line = jnp.zeros(lab.shape, bool)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nlab = _shift(lab, dy, dx, 0)
        ncost = _shift(cost, dy, dx, _BIG)
        differs = jnp.logical_and(nlab > 0, jnp.logical_and(lab > 0, nlab != lab))
        earlier = jnp.logical_or(
            ncost < cost, jnp.logical_and(ncost == cost, nlab < lab)
        )
        line = jnp.logical_or(line, jnp.logical_and(differs, earlier))

    contour = jnp.logical_and(lab > 0, jnp.logical_not(line))
    return pack_mask_1bit_jax(jnp.logical_and(contour, mask))


def _disk3_footprint():
    """skimage.morphology.disk(3) (the reference's marker dilation
    footprint, marker_watershed.py:82) -- ops/morphology.disk(3)."""
    from .morphology import disk

    return disk(3).astype(bool)


_FAST_PAD = 128  # pad fast-pass geometries up to /128 so a mixed-size
# folder compiles a handful of flood programs, not one per distinct shape


def nuset_marker_watershed_fast(
    scores,
    proposals,
    pred_mask,
    min_score: float = 0.99,
    count_ties: bool = False,
):
    """Device FAST PATH twin of ops/watershed.nuset_marker_watershed
    (reference src/model_layers/marker_watershed.py:9-96).  Marker placement
    (quirk-exact, host) is shared with the parity path via
    ops/watershed.nuset_place_markers; the EDT + flood + line-split runs as
    one jitted device program.  Opt-in via ECSEG_FAST_WATERSHED=1 (see
    models/nuset_infer.nuset_forward): identical to the host result wherever
    the minimax assignment is unique, may differ on exact ridge ties, so it
    is NOT the parity default.

    ``count_ties=True`` additionally measures the fast path's own
    order-dependence: rerunning with the marker ids PERMUTED
    (id -> max+1-id) flips the pixels whose decision rests on the id-based
    tie rule.  Returns ``(result, tie_px)`` with ``tie_px`` the count of
    flipped contour pixels.  This is a LOWER BOUND on host divergence, not
    a certificate: minimax ties the flood breaks by propagation geometry
    (stable under id permutation) can still differ from skimage's
    insertion-age order -- measured on realistic touching-nuclei fields,
    host-divergent pixels run ~1.6% of foreground while the permutation
    proxy flags ~0.1% (scripts/quantify_watershed_divergence.py; numbers
    in README)."""
    import numpy as np

    from .packing import unpack_mask_1bit
    from .watershed import nuset_place_markers

    pred_mask = np.asarray(pred_mask)
    H, W = pred_mask.shape
    markers = nuset_place_markers(scores, proposals, pred_mask, min_score)
    if markers is None:
        # reference marker_watershed.py:86-89: all-ones contour
        out = pred_mask.astype(np.int32)
        return (out, 0) if count_ties else out

    Hp = max(_FAST_PAD, -(-H // _FAST_PAD) * _FAST_PAD)
    Wp = max(_FAST_PAD, -(-W // _FAST_PAD) * _FAST_PAD)
    mask_p = np.zeros((Hp, Wp), pred_mask.dtype)
    mask_p[:H, :W] = pred_mask
    mark_p = np.zeros((Hp, Wp), np.int32)
    mark_p[:H, :W] = markers.astype(np.int32)

    packed = np.asarray(_nuset_fast_pass(jnp.asarray(mask_p), jnp.asarray(mark_p)))
    contour = unpack_mask_1bit(packed, Wp)[:H, :W]
    result = (pred_mask * contour).astype(np.int32)
    if not count_ties:
        return result
    perm = np.where(mark_p > 0, int(mark_p.max()) + 1 - mark_p, 0).astype(
        np.int32
    )
    packed2 = np.asarray(
        _nuset_fast_pass(jnp.asarray(mask_p), jnp.asarray(perm))
    )
    contour2 = unpack_mask_1bit(packed2, Wp)[:H, :W]
    tie_px = int(np.count_nonzero(contour != contour2))
    return result, tie_px
