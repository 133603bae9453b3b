import numpy as np

from ecseg_tpu.ops import boxes


def test_reference_anchors_order():
    ref = boxes.generate_anchors_reference(16.0, [0.5, 1, 2], [1.0])
    assert ref.shape == (3, 4)
    # ratio = h/w: first row (ratio .5) is wider than tall
    w0 = ref[0, 2] - ref[0, 0]
    h0 = ref[0, 3] - ref[0, 1]
    assert w0 > h0
    # square anchor for ratio 1
    assert np.isclose(ref[1, 2] - ref[1, 0], ref[1, 3] - ref[1, 1])


def test_generate_anchors_grid():
    ref = np.zeros((2, 4))
    anchors = boxes.generate_anchors(ref, stride=16, feat_shape=(2, 3))
    assert anchors.shape == (2 * 3 * 2, 4)
    # row-major: second anchor point is x-shifted
    np.testing.assert_allclose(anchors[2], [16, 0, 16, 0])
    np.testing.assert_allclose(anchors[2 * 3], [0, 16, 0, 16])


def test_encode_decode_roundtrip():
    """Port of the reference's own self-test
    (src/nuset_utils/bbox_transform_tf.py:129-153)."""
    bboxes = np.array([[10, 10, 20, 22]], np.float32)
    gt = np.array([[11, 13, 34, 31]], np.float32)

    # encode (reference bbox_transform_tf.py:18-38)
    def wur(b):
        w = b[:, 2] - b[:, 0] + 1
        h = b[:, 3] - b[:, 1] + 1
        return w, h, b[:, 0] + 0.5 * w, b[:, 1] + 0.5 * h

    bw, bh, bx, by = wur(bboxes)
    gw, gh, gx, gy = wur(gt)
    deltas = np.stack(
        [(gx - bx) / bw, (gy - by) / bh, np.log(gw / bw), np.log(gh / bh)], axis=1
    )
    dec = np.asarray(boxes.decode(bboxes, deltas))
    clipped = np.asarray(boxes.clip_boxes(dec, (100, 100)))
    np.testing.assert_allclose(clipped, gt, atol=1e-4)


def test_change_order_involution(rng):
    b = rng.random((5, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(boxes.change_order(boxes.change_order(b))), b
    )


def test_nms_numpy_basic():
    b = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    s = np.array([0.9, 0.8, 0.7], np.float32)
    sel = boxes.nms_numpy(b, s, 10, 0.3)
    np.testing.assert_array_equal(sel, [0, 2])


def test_nms_jax_matches_numpy(rng):
    n = 200
    centers = rng.random((n, 2)) * 100
    wh = rng.random((n, 2)) * 20 + 2
    b = np.concatenate([centers, centers + wh], axis=1).astype(np.float32)
    s = rng.random(n).astype(np.float32)
    ref = boxes.nms_numpy(b, s, 50, 0.01)
    idx, valid = boxes.nms_jax(b, s, 50, 0.01)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, ref)
