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


def _sentinel(dtype):
    """Unreached-cost sentinel for the flood: +inf-like for the dtype."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.asarray(jnp.iinfo(dtype).max, dtype)
    return jnp.asarray(_BIG, dtype)


def _minimax_flood(image, markers, mask, connectivity: int, max_iters: int):
    """Shared flood core: returns the fixpoint ``(cost, labels, converged)``
    triple.  ``cost`` is the minimax path cost from the owning marker
    (sentinel where unreached), ``labels`` the int32 owner map (0 =
    unreached), ``converged`` False iff the iteration cap cut the flood
    short (callers treating the result as authoritative must check it).
    ``image`` may be float32 or int32 -- the flood only compares values, so
    any order-isomorphic cost domain gives identical labels (the certified
    NuSeT pass floods exact ``-EDT^2`` int32 to make tie detection exact)."""
    offs4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    offs8 = offs4 + [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    offs = offs8 if connectivity == 2 else offs4
    big = _sentinel(image.dtype)

    cost0 = jnp.where(markers > 0, image, big)
    lab0 = markers

    def body(state):
        cost, lab, _, it = state
        new_cost, new_lab = cost, lab
        for dy, dx in offs:
            ncost = _shift(cost, dy, dx, big)
            nlab = _shift(lab, dy, dx, 0)
            cand = jnp.maximum(ncost, image)
            take = jnp.logical_and(cand < new_cost, nlab > 0)
            new_cost = jnp.where(take, cand, new_cost)
            new_lab = jnp.where(take, nlab, new_lab)
        new_cost = jnp.where(mask, new_cost, big)
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

    cost, lab, changed, _ = lax.while_loop(
        cond, body, (cost0, lab0, jnp.bool_(True), jnp.int32(0))
    )
    return cost, lab, jnp.logical_not(changed)


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
    _, lab, _ = _minimax_flood(image, markers, mask, connectivity, max_iters)
    return lab


def _lex_flood(image, markers, mask, max_iters: int):
    """Priority-flood-faithful parallel flood (4-connected): each pixel
    carries ``(cost, pcost, lab)`` where ``cost`` is the minimax path cost
    (the flood level at which the host priority queue pops the pixel),
    ``pcost`` the OWN cost of the cheapest neighbor achieving it, and
    ``lab`` that neighbor's label.

    Host-ownership correspondence (ops/watershed.watershed semantics): the
    host assigns a pixel the label of its first-popping neighbor; pops are
    ordered by (cost, insertion age), so among a pixel's neighbors the one
    with the strictly smallest OWN cost pops first and owns it.  The
    lexicographic relaxation converges to exactly that owner whenever it is
    unique; when two argmin-cost neighbors carry different labels the
    choice rests on the host's insertion ages, which is what the
    certificate in :func:`_nuset_fast_pass` flags."""
    offs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    big = _sentinel(image.dtype)

    cost0 = jnp.where(markers > 0, image, big)
    pcost0 = cost0
    lab0 = markers

    def body(state):
        cost, pcost, lab, _, it = state
        nc, npc, nl = cost, pcost, lab
        for dy, dx in offs:
            qcost = _shift(cost, dy, dx, big)
            qlab = _shift(lab, dy, dx, 0)
            cand = jnp.maximum(qcost, image)
            better = jnp.logical_or(
                cand < nc, jnp.logical_and(cand == nc, qcost < npc)
            )
            take = jnp.logical_and(better, qlab > 0)
            nc = jnp.where(take, cand, nc)
            npc = jnp.where(take, qcost, npc)
            nl = jnp.where(take, qlab, nl)
        nc = jnp.where(mask, nc, big)
        npc = jnp.where(mask, npc, big)
        nl = jnp.where(mask, nl, 0)
        # markers never change hands
        nc = jnp.where(markers > 0, cost0, nc)
        npc = jnp.where(markers > 0, pcost0, npc)
        nl = jnp.where(markers > 0, markers, nl)
        changed = jnp.max(jnp.where(nl != lab, 1, 0)) > 0
        changed |= jnp.max(jnp.where(nc != cost, 1, 0)) > 0
        changed |= jnp.max(jnp.where(npc != pcost, 1, 0)) > 0
        return nc, npc, nl, changed, it + 1

    cost, pcost, lab, changed, _ = lax.while_loop(
        lambda s: jnp.logical_and(s[3], s[4] < max_iters),
        body,
        (cost0, pcost0, lab0, jnp.bool_(True), jnp.int32(0)),
    )
    return cost, pcost, lab, jnp.logical_not(changed)


@jax.jit
def _nuset_fast_pass(pred_mask: jnp.ndarray, markers: jnp.ndarray):
    """Device body of the NuSeT watershed post-pass (the numpy chain of
    reference src/model_layers/marker_watershed.py:82-91): grayscale-dilate
    the point markers by disk(3), EDT of the hole-filled mask, flood
    ``-EDT^2`` (exact int32 -- order-isomorphic to -EDT, so the flood is
    identical and tie tests are exact integer comparisons instead of f32
    sqrt round-offs) within the mask via :func:`_lex_flood`, zero
    basin-boundary ("watershed line") pixels, AND with the mask.  Returns
    the surviving-foreground bitmap 1-bit packed (this attachment fetches
    device->host at ~27 MB/s; see ops/packing) plus an int32 UNCERTAINTY
    count (the parity certificate).

    Line rule, matched to the host priority flood's deterministic cases
    (ops/watershed.watershed with watershed_line=True):

      - dilated-marker pixels are pre-assigned in the host's output map
        (``output = markers.copy()``), so ANY pixel 4-adjacent to a
        different-label MARKER pixel is a line pixel regardless of flood
        order (both sides, when both are markers);
      - otherwise the later-popped side of a boundary is the line:
        strictly smaller cost pops first; at equal cost a marker pops
        before a non-marker (markers carry the smallest insertion ages);
      - equal cost between two NON-marker pixels is decided by the host's
        insertion age -- not reconstructible in parallel; the device
        tie-breaks by smaller label and the certificate flags the image.

    Certificate: counts the pixels where the host outcome rests on
    insertion age rather than on the (cost, pcost) order --

      * ownership tie: a non-marker pixel with a second argmin-cost
        predecessor (cost(q) == pcost(p)) of a different label;
      * line tie: two adjacent equal-cost different-label non-markers;

    plus a whole-image penalty if the flood hit its iteration cap.  Any
    host-vs-device divergence ORIGINATES at such a tie (downstream label
    inheritance, moved plateau fronts and flipped lines are all fed by one),
    so for the per-image gate ``count == 0`` certifies the packed contour
    equals the host priority-flood result bit-for-bit (validated over
    randomized and adversarial fields in tests/test_watershed_auto.py)."""
    from .edt_tpu import edt_sq_tpu
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

    img = -edt_sq_tpu(binary_fill_holes_tpu(mask))  # int32, exact
    cost, pcost, lab, converged = _lex_flood(img, m, mask, max_iters=4096)
    big = _sentinel(img.dtype)
    ismark = m > 0

    line = jnp.zeros(lab.shape, bool)
    unc = jnp.zeros(lab.shape, bool)
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        nlab = _shift(lab, dy, dx, 0)
        ncost = _shift(cost, dy, dx, big)
        nmark = _shift(ismark, dy, dx, False)
        both = jnp.logical_and(nlab > 0, lab > 0)
        differs = jnp.logical_and(both, nlab != lab)
        nonmark_pair = jnp.logical_and(
            jnp.logical_not(nmark), jnp.logical_not(ismark)
        )
        earlier = nmark | (ncost < cost) | (
            (ncost == cost) & nonmark_pair & (nlab < lab)
        )
        line = line | (differs & earlier)
        own_tie = (ncost == pcost) & (nlab != lab)
        line_tie = (ncost == cost) & (nlab != lab) & nonmark_pair
        unc = unc | (
            both & jnp.logical_not(ismark) & (own_tie | line_tie)
        )

    n_unc = jnp.sum(unc.astype(jnp.int32))
    n_unc = n_unc + jnp.where(converged, 0, jnp.int32(1 << 20))

    contour = jnp.logical_and(lab > 0, jnp.logical_not(line))
    return pack_mask_1bit_jax(jnp.logical_and(contour, mask)), n_unc


def _disk3_footprint():
    """skimage.morphology.disk(3) (the reference's marker dilation
    footprint, marker_watershed.py:82) -- ops/morphology.disk(3)."""
    from .morphology import disk

    return disk(3).astype(bool)


_FAST_PAD = 128  # pad fast-pass geometries up to /128 so a mixed-size
# folder compiles a handful of flood programs, not one per distinct shape


def _run_fast_pass(pred_mask, markers):
    """Pad to /128, run the device pass, fetch (contour, uncertainty) in
    one transfer.  Returns (bool contour (H, W), int uncertainty)."""
    import numpy as np

    from .packing import unpack_mask_1bit

    H, W = pred_mask.shape
    Hp = max(_FAST_PAD, -(-H // _FAST_PAD) * _FAST_PAD)
    Wp = max(_FAST_PAD, -(-W // _FAST_PAD) * _FAST_PAD)
    mask_p = np.zeros((Hp, Wp), pred_mask.dtype)
    mask_p[:H, :W] = pred_mask
    mark_p = np.zeros((Hp, Wp), np.int32)
    mark_p[:H, :W] = markers.astype(np.int32)
    packed, n_unc = jax.device_get(
        _nuset_fast_pass(jnp.asarray(mask_p), jnp.asarray(mark_p))
    )
    return unpack_mask_1bit(packed, Wp)[:H, :W], int(n_unc)


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
    the priority-flood outcome is order-independent (the certified common
    case -- see :func:`nuset_marker_watershed_auto` for the gated mode);
    may differ on exact ridge ties, so bare ``=1`` is NOT the parity
    default.

    ``count_ties=True`` additionally measures the fast path's own
    order-dependence: rerunning with the marker ids PERMUTED
    (id -> max+1-id) flips the pixels whose decision rests on the id-based
    tie rule.  Returns ``(result, tie_px)`` with ``tie_px`` the count of
    flipped contour pixels.  This is a LOWER BOUND on host divergence
    (geometry-broken ties are permutation-stable); the SOUND per-image
    certificate is the uncertainty count used by ``=auto``."""
    import numpy as np

    from .packing import unpack_mask_1bit
    from .watershed import nuset_place_markers

    pred_mask = np.asarray(pred_mask)
    markers = nuset_place_markers(scores, proposals, pred_mask, min_score)
    if markers is None:
        # reference marker_watershed.py:86-89: all-ones contour
        out = pred_mask.astype(np.int32)
        return (out, 0) if count_ties else out

    contour, _ = _run_fast_pass(pred_mask, markers)
    result = (pred_mask * contour).astype(np.int32)
    if not count_ties:
        return result
    perm = np.where(markers > 0, int(markers.max()) + 1 - markers, 0)
    contour2, _ = _run_fast_pass(pred_mask, perm)
    tie_px = int(np.count_nonzero(contour != contour2))
    return result, tie_px


def nuset_marker_watershed_auto(
    scores, proposals, pred_mask, min_score: float = 0.99
):
    """Parity-gated device watershed (``ECSEG_FAST_WATERSHED=auto``): run
    the device fast pass WITH its uncertainty certificate; when the image
    is certificate-clean (no order-dependent ownership/line decision) the
    device contour IS the host priority-flood result, so return it --
    otherwise return ``(None, n_uncertain)`` and let the caller recompute
    on the host parity path (models/nuset_infer records the fallback).

    Returns ``(result_or_None, n_uncertain)``.  The no-marker branch
    (reference marker_watershed.py:86-89) is deterministic on both paths.
    Certificate soundness is pinned by tests/test_watershed_auto.py: on
    randomized touching-nuclei fields, every certificate-clean image must
    match ops/watershed.nuset_marker_watershed bit-for-bit."""
    import numpy as np

    from .watershed import nuset_place_markers

    pred_mask = np.asarray(pred_mask)
    markers = nuset_place_markers(scores, proposals, pred_mask, min_score)
    if markers is None:
        return pred_mask.astype(np.int32), 0
    contour, n_unc = _run_fast_pass(pred_mask, markers)
    if n_unc:
        return None, n_unc
    return (pred_mask * contour).astype(np.int32), 0
