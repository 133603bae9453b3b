"""fish_distance: KD-tree implementation vs a brute-force oracle.

The oracle recomputes the reference semantics
(src/fish_distance_calculation.py:15-45) directly from the spec: per cell,
min over fish pixels of the min Euclidean distance to any centromere pixel,
over sqrt(area); skip cells with > max_spots fish blobs (8-connected); gate
on channels 0 AND 1 having in-cell signal.
"""

import numpy as np
from scipy import ndimage

from ecseg_tpu.pipelines.fish_distance import image_distances, min_set_distance


def _oracle(lsq, segmentation, cent_idx, fish_idx, max_spots):
    out = []
    for lab in np.unique(segmentation):
        if lab == 0:
            continue
        cell = segmentation == lab
        if not (lsq[..., 0][cell] != 0).any() or not (lsq[..., 1][cell] != 0).any():
            continue
        fish = (lsq[..., fish_idx] != 0) & cell
        s8 = ndimage.generate_binary_structure(2, 2)
        if ndimage.label(fish, structure=s8)[1] > max_spots:
            continue
        cent = (lsq[..., cent_idx] != 0) & cell
        fy, fx = np.nonzero(fish)
        cy, cx = np.nonzero(cent)
        if len(fy) == 0:
            out.append(float("inf"))
            continue
        best = min(
            np.sqrt((fy[i] - cy) ** 2 + (fx[i] - cx) ** 2).min()
            for i in range(len(fy))
        )
        out.append(best / np.sqrt(cell.sum()))
    return out


def _synthetic(rng, n_cells=6, shape=(160, 160)):
    seg = np.zeros(shape, np.int64)
    lsq = np.zeros(shape + (3,), np.uint8)
    for lab in range(1, n_cells + 1):
        cy, cx = rng.integers(20, shape[0] - 20, 2)
        r = int(rng.integers(10, 18))
        yy, xx = np.ogrid[: shape[0], : shape[1]]
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        disk &= seg == 0
        seg[disk] = lab
        # sprinkle probe pixels inside the cell
        ys, xs = np.nonzero(disk)
        if len(ys) == 0:
            continue
        for ch, k in [(0, 4), (1, 3), (2, 5)]:
            take = rng.choice(len(ys), size=min(k, len(ys)), replace=False)
            lsq[ys[take], xs[take], ch] = 200
    return lsq, seg


def test_matches_oracle_random_cells(rng):
    for trial in range(5):
        lsq, seg = _synthetic(rng)
        for cent_idx, fish_idx in [(0, 1), (1, 0), (0, 2)]:
            got = image_distances(lsq, seg, cent_idx, fish_idx, max_spots=10)
            want = _oracle(lsq, seg, cent_idx, fish_idx, max_spots=10)
            np.testing.assert_allclose(got, want, rtol=1e-12)


def test_spot_count_gate(rng):
    lsq, seg = _synthetic(rng, n_cells=4)
    # max_spots=0 rejects every cell with any fish blob
    got = image_distances(lsq, seg, 0, 1, max_spots=0)
    want = _oracle(lsq, seg, 0, 1, max_spots=0)
    np.testing.assert_allclose(got, want)


def test_empty_fish_channel_is_inf():
    seg = np.zeros((40, 40), np.int64)
    seg[5:25, 5:25] = 1
    lsq = np.zeros((40, 40, 3), np.uint8)
    lsq[10, 10, 0] = 1  # gate channel 0
    lsq[12, 12, 1] = 1  # gate channel 1
    # fish on channel 2 (empty), centromere on channel 0
    got = image_distances(lsq, seg, 0, 2, max_spots=10)
    assert got == [float("inf")]


def test_min_set_distance_basics():
    f = np.array([[0, 0], [10, 10]])
    c = np.array([[0, 3], [20, 20]])
    assert min_set_distance(f, c) == 3.0
    assert min_set_distance(np.empty((0, 2)), c) == float("inf")
