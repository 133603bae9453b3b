import numpy as np
import pytest

from ecseg_tpu.ops import matched_filter as mf
from ecseg_tpu.ops import maxflow
from ecseg_tpu.ops.conv_host import conv2d_same_tf, conv2d_valid_tf


def test_conv2d_same_tf_odd_kernel():
    x = np.arange(25, dtype=float).reshape(5, 5)
    k = np.zeros((3, 3))
    k[1, 1] = 1.0
    np.testing.assert_array_equal(conv2d_same_tf(x, k), x)


def test_conv2d_same_tf_even_kernel_alignment():
    # TF 'SAME' for k=2: pad_lo=0, pad_hi=1 -> out[i] = x[i]*w0 + x[i+1]*w1
    x = np.array([[1.0, 2.0, 4.0, 8.0]])
    k = np.array([[1.0, -1.0]])
    out = conv2d_same_tf(x, k)
    np.testing.assert_array_equal(out, [[-1.0, -2.0, -4.0, 8.0]])


def test_conv2d_valid():
    x = np.arange(12, dtype=float).reshape(3, 4)
    k = np.array([[1.0], [-1.0]])
    out = conv2d_valid_tf(x, k)
    np.testing.assert_array_equal(out, np.full((2, 4), -4.0))


def test_gaussian_proj_kernel_properties():
    k = mf.get_gaussian_proj_kernel([7, 7], sigma=3)
    assert k.shape == (7, 7)
    # zero-DC: orthogonal to the constant kernel
    assert abs(k.sum()) < 1e-10
    assert abs(np.linalg.norm(k) - 1.0) < 1e-10
    # center-peaked
    assert k[3, 3] == k.max()


def test_get_thresholded_detects_focus():
    H = W = 40
    I = np.zeros((H, W, 3), np.uint8)  # BGR
    I[:, :, 0] = 100  # blue/DAPI irrelevant here
    I[20, 20, 1] = 200  # bright green focus
    seg = np.full((H, W), 255, np.uint8)
    th = mf.get_thresholded(I, seg, 3.0, 15, [70, 70], [7, 7])
    assert th.shape == (H, W, 2)
    assert th[20, 20, 0] > 0  # green channel focus found
    assert th[..., 1].sum() == 0  # red channel empty


def test_count_blobs_removes_small():
    fish = np.zeros((20, 20), int)
    fish[2:6, 2:6] = 255  # 16 px
    fish[10, 10] = 255  # 1 px
    seg = np.ones((20, 20), int)
    n = mf.count_blobs(fish, seg, min_cc_size=7)
    assert n == 1
    assert fish[10, 10] == 0  # small blob removed in place
    assert fish[2, 2] == 255


def test_get_boundaries_marks_label_changes():
    s = np.zeros((10, 10), int)
    s[:, 5:] = 2
    b = mf.get_boundaries(s, line_thickness=1)
    assert b.shape == (10, 10, 3)
    assert (b[:, 4:6, 0] == 255).any()  # boundary near the label change
    np.testing.assert_array_equal(b[..., 1], -b[..., 0])


def test_merge_channels():
    img3 = np.zeros((4, 4, 3), np.uint8)
    assert mf.merge_channels(img3, [233, 137, 54]) is img3
    img4 = np.zeros((4, 4, 4), np.uint8)
    img4[..., 3] = 255
    out = mf.merge_channels(img4, [233, 137, 54])
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out[0, 0], [54, 137, 233])  # BGR of aqua


def _dumbbell_mask(H=60, W=110):
    """Two circular lobes (radius 20) joined by a thin bridge, like touching
    nuclei; circular so distance-transform maxima sit in the interior."""
    m = np.zeros((H, W), np.uint8)
    yy, xx = np.mgrid[:H, :W]
    m[(yy - 30) ** 2 + (xx - 25) ** 2 <= 400] = 1
    m[(yy - 30) ** 2 + (xx - 85) ** 2 <= 400] = 1
    m[27:33, 40:70] = 1  # bridge
    return m


def test_get_centers_dumbbell():
    centers = maxflow.get_centers(_dumbbell_mask())
    assert len(centers) >= 2
    cols = sorted(c[1] for c in centers)
    assert cols[0] < 45 and cols[-1] >= 60  # one per lobe


def test_min_cut_splits_dumbbell():
    seg = _dumbbell_mask()
    # add a small second component so the dumbbell exceeds 1.25 x median
    seg2 = np.zeros((80, 120), np.uint8)
    seg2[:60, :110] = seg
    seg2[70:78, 5:13] = 1
    labels, vis = maxflow.binary_seg_to_instance_min_cut(
        seg2, flow_limit=60, cell_size_threshold_coeff=1.25
    )
    n = labels.max()
    assert n >= 3  # dumbbell split into >= 2 + the small blob
    assert vis.shape == (80, 120, 3) and vis.dtype == np.uint8
    # partition is exact: instance pixels == original foreground
    np.testing.assert_array_equal(labels > 0, seg2 > 0)
    # left and right lobe centers carry different labels
    assert labels[30, 20] != labels[30, 90]


def test_min_cut_leaves_small_regions_alone():
    seg = np.zeros((40, 40), np.uint8)
    seg[5:15, 5:15] = 1
    seg[25:35, 25:35] = 1
    labels, _ = maxflow.binary_seg_to_instance_min_cut(seg, 60, 1.25)
    assert labels.max() == 2


def test_get_scale():
    labels = np.zeros((50, 50), int)
    labels[0:10, 0:10] = 1  # area 100
    sf = mf.get_scale(labels, target_median_nuclei_size=2500)
    assert sf == pytest.approx(5.0)


def test_get_thresholded_jax_matches_host(rng):
    """Device matched-filter path vs the host TF-'SAME' parity twin."""
    from ecseg_tpu.ops.matched_filter import (
        conv2d_same_tf_jax,
        get_thresholded,
        get_thresholded_jax,
    )
    from ecseg_tpu.ops.conv_host import conv2d_same_tf

    # conv twin parity, odd and even kernels
    for kh, kw in [(7, 7), (5, 3), (4, 4), (2, 6)]:
        x = rng.standard_normal((33, 47)).astype(np.float32)
        k = rng.standard_normal((kh, kw)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(conv2d_same_tf_jax(x, k)),
            conv2d_same_tf(x, k),
            rtol=2e-4,
            atol=2e-4,
        )

    # full thresholding parity on a synthetic BGR image
    I = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
    cells = ((rng.random((64, 80)) < 0.4) * 255).astype(np.uint8)
    host = get_thresholded(I, cells, 1.5, 15.0, [70, 70], [7, 7])
    dev = np.asarray(
        get_thresholded_jax(I, cells, 1.5, 15.0, (70.0, 70.0), (7, 7))
    )
    np.testing.assert_array_equal(dev, host)

def test_get_thresholded_device_packed_matches_host(rng):
    """The transfer-packed device variant (FISH channels + 1-bit mask up,
    1-bit center bitmaps down) must be value-identical to the host twin,
    including mutability (count_blobs mutates the result in place)."""
    from ecseg_tpu.ops.matched_filter import (
        get_thresholded,
        get_thresholded_device_packed,
    )

    for h, w in [(64, 80), (33, 47)]:  # w % 8 == 0 and ragged
        I = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cells = ((rng.random((h, w)) < 0.4) * 255).astype(np.uint8)
        host = get_thresholded(I, cells, 1.5, 15.0, [70, 70], [7, 7])
        dev = get_thresholded_device_packed(I, cells, 1.5, 15.0, [70, 70], [7, 7])
        np.testing.assert_array_equal(dev, host)
        dev[0, 0, 0] = 7  # writable (np.asarray of a device buffer is not)

    # empty mask: {0} everywhere on both paths
    empty = np.zeros((16, 24), np.uint8)
    I = (rng.random((16, 24, 3)) * 255).astype(np.uint8)
    np.testing.assert_array_equal(
        get_thresholded_device_packed(I, empty, 1.5, 15.0, [70, 70], [7, 7]),
        get_thresholded(I, empty, 1.5, 15.0, [70, 70], [7, 7]),
    )


def test_pack_mask_1bit_host_roundtrip(rng):
    from ecseg_tpu.ops.packing import (
        pack_mask_1bit_host,
        pack_mask_1bit_jax,
        unpack_mask_1bit,
        unpack_mask_1bit_jax,
    )

    m = rng.random((37, 53)) < 0.5
    ph = pack_mask_1bit_host(m)
    pj = np.asarray(pack_mask_1bit_jax(m))
    np.testing.assert_array_equal(ph, pj)  # identical bit layout
    np.testing.assert_array_equal(unpack_mask_1bit(ph, 53), m.astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(unpack_mask_1bit_jax(ph, 53)), m.astype(np.uint8)
    )
