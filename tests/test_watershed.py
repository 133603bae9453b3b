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
