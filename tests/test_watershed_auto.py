"""Soundness of the parity-gated device watershed (ECSEG_FAST_WATERSHED=auto).

The device fast pass (ops/watershed_tpu._nuset_fast_pass) returns a
per-image UNCERTAINTY count: the number of pixels whose host priority-flood
outcome (ops/watershed.watershed, the skimage-ordering parity twin of
reference src/model_layers/marker_watershed.py:84) is not forced by the
minimax fixpoint.  The ``auto`` contract is: uncertainty == 0  ==>  the
device contour equals the host result BIT-FOR-BIT.  These tests pin that
implication on randomized touching-nuclei fields (the stat_fish pass-2
regime), on adversarial plateau fields (maximally tie-prone), and on
analytic cases where the certificate must be clean.
"""

import numpy as np
import pytest

from ecseg_tpu.ops.watershed import nuset_marker_watershed
from ecseg_tpu.ops.watershed_tpu import (
    _run_fast_pass,
    nuset_marker_watershed_auto,
    nuset_marker_watershed_fast,
)
from ecseg_tpu.ops.watershed import nuset_place_markers


def _blob_case(rng, H=160, W=160, n=10, rmin=8, rmax=18):
    """Touching-nuclei blob field (scripts/quantify_watershed_divergence)."""
    mask = np.zeros((H, W), bool)
    centers = []
    while len(centers) < n:
        cy, cx = int(rng.integers(20, H - 20)), int(rng.integers(20, W - 20))
        r = int(rng.integers(rmin, rmax))
        yy, xx = np.ogrid[:H, :W]
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        centers.append((cy, cx, r))
    pred = mask.astype(np.float32)
    props = np.array(
        [[cx - r, cy - r, cx + r, cy + r] for cy, cx, r in centers], np.float32
    )
    scores = np.full(len(centers), 0.97, np.float32)
    return pred, scores, props


def _rect_case(rng, H=128, W=128):
    """Axis-aligned rectangles: large EDT plateaus and straight equidistant
    ridges -- the maximally tie-prone regime for a priority flood."""
    mask = np.zeros((H, W), bool)
    centers = []
    for _ in range(int(rng.integers(3, 7))):
        cy, cx = int(rng.integers(24, H - 24)), int(rng.integers(24, W - 24))
        hh, ww = int(rng.integers(10, 22)), int(rng.integers(10, 22))
        mask[max(0, cy - hh) : cy + hh, max(0, cx - ww) : cx + ww] = True
        centers.append((cy, cx, max(hh, ww)))
    pred = mask.astype(np.float32)
    props = np.array(
        [[cx - r, cy - r, cx + r, cy + r] for cy, cx, r in centers], np.float32
    )
    scores = np.full(len(centers), 0.97, np.float32)
    return pred, scores, props


def _sparse_case(rng, H=192, W=192, n=5):
    """Sparse blob field: mostly-isolated nuclei, the regime where the
    certificate should certify a real share of images."""
    return _blob_case(rng, H=H, W=W, n=n, rmin=9, rmax=14)


@pytest.mark.parametrize(
    "maker,cases,require_clean",
    [
        (_blob_case, 25, False),  # dense touching field: soundness stress
        (_rect_case, 25, False),  # plateau-heavy: maximally tie-prone
        (_sparse_case, 25, True),  # sparse: the gate must engage sometimes
    ],
)
def test_certificate_clean_implies_host_equality(maker, cases, require_clean):
    """THE soundness property: whenever auto certifies an image, its result
    must equal the host parity path exactly.  Dirty images must fall back
    (auto returns None) -- their divergence is irrelevant here."""
    rng = np.random.default_rng(0)
    n_clean = 0
    for _ in range(cases):
        pred, scores, props = maker(rng)
        out, n_unc = nuset_marker_watershed_auto(
            scores, props, pred, min_score=0.95
        )
        if out is None:
            assert n_unc > 0
            continue
        n_clean += 1
        host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
        assert np.array_equal(out, host), (
            f"certificate-clean image diverged from host "
            f"({np.count_nonzero(out != host)} px)"
        )
    if require_clean:
        assert n_clean > 0, "certificate never clean -- gate has no fast path"


def test_certificate_flags_plateau_tie():
    """Two markers exactly equidistant across a flat rectangle: every pixel
    on the midline is an order-dependent tie -- the certificate must flag
    the image (uncertainty > 0)."""
    H, W = 64, 96
    pred = np.zeros((H, W), np.float32)
    pred[16:48, 8:88] = 1.0
    # two proposals mirror-symmetric about the vertical midline
    props = np.array(
        [[20, 24, 36, 40], [60, 24, 76, 40]], np.float32
    )  # (x1,y1,x2,y2)
    scores = np.array([0.97, 0.97], np.float32)
    out, n_unc = nuset_marker_watershed_auto(scores, props, pred, min_score=0.95)
    assert out is None and n_unc > 0


def test_certificate_clean_on_separate_blobs():
    """Well-separated disks: no shared ridge, certificate must be clean and
    the result must equal host."""
    H, W = 128, 128
    yy, xx = np.ogrid[:H, :W]
    mask = ((yy - 40) ** 2 + (xx - 40) ** 2 <= 14 * 14) | (
        (yy - 90) ** 2 + (xx - 90) ** 2 <= 12 * 12
    )
    pred = mask.astype(np.float32)
    props = np.array([[26, 26, 54, 54], [78, 78, 102, 102]], np.float32)
    scores = np.array([0.97, 0.97], np.float32)
    out, n_unc = nuset_marker_watershed_auto(scores, props, pred, min_score=0.95)
    assert n_unc == 0 and out is not None
    host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
    assert np.array_equal(out, host)


def test_no_marker_branch_matches_host():
    """No proposal clears min_score: both paths take the reference's
    all-ones-contour branch (marker_watershed.py:86-89) identically."""
    pred = (np.random.default_rng(3).random((64, 64)) > 0.6).astype(np.float32)
    props = np.array([[10, 10, 20, 20]], np.float32)
    scores = np.array([0.5], np.float32)
    out, n_unc = nuset_marker_watershed_auto(scores, props, pred, min_score=0.95)
    host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
    assert n_unc == 0 and np.array_equal(out, host)


def test_fast_path_agreement_improved():
    """The host-exact deterministic line rules (marker adjacency, marker-
    beats-non-marker tie) leave divergence ONLY on certificate-flagged
    images: across the randomized corpus, every divergent image must be
    flagged (the contrapositive of the soundness property, aggregated)."""
    rng = np.random.default_rng(7)
    flagged_div = free_div = 0
    for _ in range(20):
        pred, scores, props = _blob_case(rng, n=14)
        host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
        fast = nuset_marker_watershed_fast(scores, props, pred, min_score=0.95)
        markers = nuset_place_markers(scores, props, pred, 0.95)
        assert markers is not None
        _, n_unc = _run_fast_pass(pred, markers)
        div = int(np.count_nonzero(host != fast))
        if div and n_unc == 0:
            free_div += 1
        elif div:
            flagged_div += 1
    assert free_div == 0, (
        f"{free_div} divergent images escaped the certificate"
    )
