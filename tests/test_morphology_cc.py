import numpy as np
import pytest
from scipy import ndimage as ndi

from ecseg_tpu.ops import morphology as morph
from ecseg_tpu.ops import cc


def test_diamond_disk():
    np.testing.assert_array_equal(
        morph.diamond(1), [[0, 1, 0], [1, 1, 1], [0, 1, 0]]
    )
    d2 = morph.disk(2)
    assert d2.shape == (5, 5)
    assert d2[2, 2] == 1 and d2[0, 0] == 0 and d2[0, 2] == 1


def test_remove_small_objects():
    mask = np.zeros((10, 10), bool)
    mask[0:2, 0:2] = True  # size 4
    mask[5:8, 5:8] = True  # size 9
    out = morph.remove_small_objects(mask, 5)
    assert out[6, 6] and not out[0, 0]
    # strictly-smaller semantics: min_size == 4 keeps the size-4 object
    out = morph.remove_small_objects(mask, 4)
    assert out[0, 0]


def test_remove_small_objects_connectivity():
    mask = np.zeros((6, 6), bool)
    mask[0, 0] = mask[1, 1] = mask[2, 2] = True  # diagonal chain
    # 4-connected: three size-1 objects -> all removed at min_size=2
    assert not morph.remove_small_objects(mask, 2, connectivity=1).any()
    # 8-connected: one size-3 object -> kept
    assert morph.remove_small_objects(mask, 2, connectivity=2).sum() == 3


def test_remove_small_holes():
    mask = np.ones((8, 8), bool)
    mask[3, 3] = False  # 1-px hole
    mask[6, 1] = mask[6, 2] = False  # 2-px hole
    out = morph.remove_small_holes(mask, 1)
    assert out[3, 3] and not out[6, 1]  # fills holes of area <= threshold
    out = morph.remove_small_holes(mask, 2)
    assert out.all()


def test_binary_erosion_border():
    # skimage semantics: out-of-image treated as foreground, so a full-width
    # stripe at the border does not erode from the image edge.
    mask = np.zeros((5, 7), bool)
    mask[0:2, :] = True
    out = morph.binary_erosion(mask, morph.diamond(1))
    assert out[0, 3]  # top edge survives
    assert not out[1, 3]  # interior boundary erodes


def test_label_default_8conn():
    img = np.zeros((5, 5), np.uint8)
    img[0, 0] = 1
    img[1, 1] = 1  # touches diagonally
    labels, num = cc.label(img > 0, return_num=True)
    assert num == 1
    labels, num = cc.label(img > 0, connectivity=1, return_num=True)
    assert num == 2


def test_label_multivalue():
    img = np.zeros((4, 4), np.uint8)
    img[0, 0:2] = 1
    img[0, 2:4] = 2  # adjacent but different values: separate components
    labels, num = cc.label(img, return_num=True)
    assert num == 2
    assert labels[0, 0] != labels[0, 2]


def test_count_cc():
    mask = np.zeros((10, 10), bool)
    mask[0:2, 0:2] = True
    mask[5, 5] = True
    num, px = cc.count_cc(mask)
    assert (num, px) == (2, 5)


def test_regionprops_fields():
    img = np.zeros((6, 8), np.uint8)
    img[1:3, 2:5] = 1
    labels = cc.label(img > 0)
    regs = cc.regionprops(labels)
    assert len(regs) == 1
    r = regs[0]
    assert r.area == 6
    assert r.bbox == (1, 2, 3, 5)
    assert r.centroid == (1.5, 3.0)
    assert r["BoundingBox"] == r.bbox and r["Area"] == r.area
    assert r.coords.shape == (6, 2)
    sl_y, sl_x = r.slice
    assert (sl_y.start, sl_y.stop, sl_x.start, sl_x.stop) == (1, 3, 2, 5)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_cc_tpu_matches_host(rng, connectivity):
    from ecseg_tpu.ops.cc_tpu import count_cc_tpu

    mask = rng.random((64, 96)) > 0.6
    structure = ndi.generate_binary_structure(2, connectivity)
    _, expected = ndi.label(mask, structure=structure)
    num, px = count_cc_tpu(mask, connectivity=connectivity)
    assert int(num) == expected
    assert int(px) == int(mask.sum())


def test_cc_tpu_snake(rng):
    """Pointer jumping must converge on long thin components too."""
    from ecseg_tpu.ops.cc_tpu import count_cc_tpu

    mask = np.zeros((48, 48), bool)
    for r in range(0, 48, 2):  # serpentine path: one long component
        mask[r, :] = True
        if r + 1 < 48:
            mask[r + 1, -1 if (r // 2) % 2 == 0 else 0] = True
    num, _ = count_cc_tpu(mask, connectivity=1)
    assert int(num) == 1


def test_component_sizes_tpu(rng):
    from ecseg_tpu.ops.cc_tpu import component_sizes_tpu

    mask = np.zeros((16, 16), bool)
    mask[0:2, 0:3] = True
    mask[10:12, 10:12] = True
    sizes = np.asarray(component_sizes_tpu(mask, connectivity=2))
    assert sizes[0, 0] == 6 and sizes[10, 10] == 4 and sizes[5, 5] == 0


def test_centroid_single_rounding_matches_global_mean():
    """Region.centroid must round ONCE over global coordinates like skimage
    (fl((ysum + n*start)/n)), not fl(ysum/n) + start -- the double-rounded
    form is 1 ulp off for e.g. n=2519, ysum=4584346, start=3976 (r2 review
    counterexample), which can flip maxflow center snapping and the
    metaphase-window comparisons."""
    from ecseg_tpu.ops.cc import label, regionprops

    # build a mask whose region reproduces the counterexample numbers:
    # n pixels with local ysum = 4584346 within a slice starting at 3976 is
    # impractical to place in a test image; instead verify the formula on a
    # synthetic Region via the public API with offsets where the two forms
    # differ for SOME (n, ysum, start).  Search a small space for one.
    found = None
    rng = np.random.default_rng(0)
    for _ in range(200000):
        n = int(rng.integers(3, 4000))
        ysum = int(rng.integers(0, n * 1000))
        start = int(rng.integers(1, 4096))
        if ysum / n + start != (ysum + n * start) / n:
            found = (n, ysum, start)
            break
    assert found is not None, "no divergent (n, ysum, start) found"

    # end-to-end check: a real region away from the origin gives the
    # global-coordinate mean bit-for-bit
    img = np.zeros((64, 80), bool)
    img[17:23, 31:44] = True
    img[19, 35] = False
    reg = regionprops(label(img))[0]
    ys, xs = np.nonzero(img)
    assert reg.centroid[0] == np.float64(ys.mean())
    assert reg.centroid[1] == np.float64(xs.mean())
