"""Device minimax-flooding watershed (fast path) vs the host parity twin."""

import numpy as np
from scipy import ndimage as ndi

import jax.numpy as jnp

from ecseg_tpu.ops.watershed import watershed as watershed_host
from ecseg_tpu.ops.watershed_tpu import watershed_tpu


def test_two_basin_analytic_exact():
    H, W = 21, 41
    xx = np.arange(W, dtype=float)
    row = np.minimum(np.abs(xx - 10), np.abs(xx - 30))
    image = np.tile(row, (H, 1))
    markers = np.zeros((H, W), np.int64)
    markers[10, 10] = 1
    markers[10, 30] = 2
    got = np.asarray(watershed_tpu(jnp.asarray(image), jnp.asarray(markers)))
    assert (got[:, :20] == 1).all()
    assert (got[:, 21:] == 2).all()


def test_edt_blobs_near_total_agreement(rng):
    """Touching-nuclei EDT regime: the fast path matches the host watershed
    everywhere except exact-tie ridge pixels."""
    for _ in range(3):
        mask = np.zeros((96, 110), bool)
        centers = []
        while len(centers) < 5:
            cy, cx = rng.integers(15, 81), rng.integers(15, 95)
            if any(abs(cy - y) + abs(cx - x) < 14 for y, x in centers):
                continue
            r = int(rng.integers(9, 14))
            yy, xx = np.ogrid[:96, :110]
            mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            centers.append((int(cy), int(cx)))
        dist = ndi.distance_transform_edt(mask)
        markers = np.zeros(mask.shape, np.int64)
        for k, (cy, cx) in enumerate(centers, 1):
            if mask[cy, cx]:
                markers[cy, cx] = k

        host = watershed_host(-dist, markers, mask, watershed_line=False)
        dev = np.asarray(
            watershed_tpu(jnp.asarray(-dist), jnp.asarray(markers), jnp.asarray(mask))
        )
        # full coverage of the mask, nothing outside it
        assert (dev[~mask] == 0).all()
        assert (dev[mask] > 0).all()
        # markers keep labels
        for k, (cy, cx) in enumerate(centers, 1):
            if markers[cy, cx]:
                assert dev[cy, cx] == k
        agreement = (dev[mask] == host[mask]).mean()
        assert agreement >= 0.97, agreement


def _circle(shape, cy, cx, r):
    yy, xx = np.ogrid[: shape[0], : shape[1]]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def _proposals_for(centers_r):
    """(x1, y1, x2, y2) boxes centered on (cy, cx) with confident scores."""
    props = np.array(
        [[cx - r, cy - r, cx + r, cy + r] for cy, cx, r in centers_r],
        np.float32,
    )
    scores = np.linspace(0.97, 0.99, len(centers_r)).astype(np.float32)
    return scores, props


def test_nuset_fast_exact_on_separated_nuclei():
    """Well-separated basins have a unique minimax assignment -> the device
    fast path equals the host parity path bit-for-bit."""
    from ecseg_tpu.ops.watershed import nuset_marker_watershed
    from ecseg_tpu.ops.watershed_tpu import nuset_marker_watershed_fast

    shape = (120, 140)
    pred = (_circle(shape, 45, 42, 17) | _circle(shape, 82, 100, 15)).astype(
        np.float32
    )
    scores, props = _proposals_for([(45, 42, 17), (82, 100, 15)])
    host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
    fast = nuset_marker_watershed_fast(scores, props, pred, min_score=0.95)
    assert fast.dtype == host.dtype
    assert np.array_equal(fast, host)


def test_nuset_fast_splits_touching_nuclei():
    """Touching nuclei: the fast path separates them with a zeroed line and
    agrees with the host parity path away from exact ridge ties."""
    from ecseg_tpu.ops.cc import label as cc_label
    from ecseg_tpu.ops.watershed import nuset_marker_watershed
    from ecseg_tpu.ops.watershed_tpu import nuset_marker_watershed_fast

    shape = (120, 140)
    pred = (_circle(shape, 60, 50, 21) | _circle(shape, 60, 84, 19)).astype(
        np.float32
    )
    scores, props = _proposals_for([(60, 50, 21), (60, 84, 19)])
    host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
    fast = nuset_marker_watershed_fast(scores, props, pred, min_score=0.95)

    # both split the fused blob into two 4-connected components
    assert cc_label(fast != 0).max() == 2
    assert cc_label(host != 0).max() == 2
    agreement = (fast == host).mean()
    assert agreement >= 0.995, agreement


def test_nuset_fast_no_confident_proposal_is_identity():
    """reference marker_watershed.py:86-89: no score above min_score ->
    all-ones contour -> the mask passes through unchanged (both paths)."""
    from ecseg_tpu.ops.watershed import nuset_marker_watershed
    from ecseg_tpu.ops.watershed_tpu import nuset_marker_watershed_fast

    pred = _circle((64, 64), 30, 30, 12).astype(np.float32)
    scores = np.array([0.5, 0.8], np.float32)
    props = np.array([[10, 10, 40, 40], [20, 20, 50, 50]], np.float32)
    host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
    fast = nuset_marker_watershed_fast(scores, props, pred, min_score=0.95)
    assert np.array_equal(fast, pred.astype(np.int32))
    assert np.array_equal(fast, host)


def test_fast_watershed_toggle_routing(monkeypatch):
    """ECSEG_FAST_WATERSHED=1 routes nuset_forward's pass-2 tail through the
    device fast path; default stays on the host parity path."""
    from ecseg_tpu.runtime.devicepath import fast_watershed

    monkeypatch.delenv("ECSEG_FAST_WATERSHED", raising=False)
    assert not fast_watershed()
    monkeypatch.setenv("ECSEG_FAST_WATERSHED", "1")
    assert fast_watershed()

    import ecseg_tpu.models.nuset_infer as nuset_infer
    import ecseg_tpu.ops.watershed_tpu as wtpu
    from tests._nusetutil import crafted_nuset_model

    calls = []
    real = wtpu.nuset_marker_watershed_fast

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(wtpu, "nuset_marker_watershed_fast", spy)

    rng = np.random.default_rng(0)
    img = (rng.random((96, 96)) * 0.2).astype(np.float32)
    img[20:50, 20:50] = 1.0
    model = crafted_nuset_model(resize_scale=1.0)
    nuset_infer.nuset_forward(model, img, pass_two=True)
    assert calls, "fast path was not routed"


def test_mask_and_unreachable_regions(rng):
    image = rng.random((40, 60))
    mask = np.zeros((40, 60), bool)
    mask[5:20, 5:25] = True
    mask[25:35, 35:55] = True  # disconnected region with NO marker
    markers = np.zeros((40, 60), np.int64)
    markers[10, 10] = 3
    out = np.asarray(
        watershed_tpu(jnp.asarray(image), jnp.asarray(markers), jnp.asarray(mask))
    )
    assert (out[5:20, 5:25] == 3).all()
    assert (out[25:35, 35:55] == 0).all()  # unreachable stays unlabeled
    assert (out[~mask] == 0).all()


def test_count_ties_symmetric_vs_asymmetric():
    """count_ties measures order-dependence: a mirror-symmetric two-nucleus
    field has equidistant ridge pixels (ties > 0); the returned result must
    equal the count_ties=False result bit-for-bit either way."""
    from ecseg_tpu.ops.watershed_tpu import nuset_marker_watershed_fast

    H = W = 160
    yy, xx = np.ogrid[:H, :W]
    # two identical circles with an even-width bridge: exact mirror symmetry
    # mirror symmetry about x = 80.5: the ridge is an equal-cost PAIR of
    # columns, so the line side is decided purely by marker id
    m1 = (yy - 80) ** 2 + (xx - 50) ** 2 <= 30**2
    m2 = (yy - 80) ** 2 + (xx - 111) ** 2 <= 30**2
    bridge = (np.abs(yy - 80) <= 6) & (xx >= 50) & (xx <= 111)
    pred = (m1 | m2 | bridge).astype(np.float32)
    props = np.array(
        [[20, 50, 80, 110], [81, 50, 141, 110]], np.float32
    )
    scores = np.full(2, 0.97, np.float32)

    plain = nuset_marker_watershed_fast(scores, props, pred, min_score=0.95)
    out, ties = nuset_marker_watershed_fast(
        scores, props, pred, min_score=0.95, count_ties=True
    )
    assert np.array_equal(out, plain)
    assert ties > 0  # the symmetric ridge is order-decided

    # no-marker fallback keeps the (result, 0) contract
    out2, ties2 = nuset_marker_watershed_fast(
        np.full(2, 0.5, np.float32), props, pred, min_score=0.95,
        count_ties=True,
    )
    assert ties2 == 0
    assert np.array_equal(out2, pred.astype(np.int32))


def test_fast_watershed_check_mode_records(monkeypatch):
    """ECSEG_FAST_WATERSHED=check engages the fast path AND counts
    tie-decided pixels via runtime/fallbacks."""
    from ecseg_tpu.runtime import devicepath, fallbacks

    monkeypatch.setenv("ECSEG_FAST_WATERSHED", "check")
    assert devicepath.fast_watershed()
    assert devicepath.fast_watershed_check()
    monkeypatch.setenv("ECSEG_FAST_WATERSHED", "1")
    assert devicepath.fast_watershed()
    assert not devicepath.fast_watershed_check()
