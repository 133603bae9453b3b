"""Vectorized per-nucleus stats vs the reference's per-region loop.

The oracle below replicates the reference loop structure
(src/stat_fish.py:249-275) using the framework's own count_blobs /
intensity_metrics / regionprops primitives, including count_blobs' in-place
small-blob deletion; the vectorized pass must reproduce every number AND
the mutated thresholded map.
"""

import numpy as np

from ecseg_tpu.ops import matched_filter as mf
from ecseg_tpu.ops import region_stats
from ecseg_tpu.ops.cc import label as cc_label, regionprops
from ecseg_tpu.ops.meta_post import intensity_metrics


def _oracle(I, thresholded, cells, min_cc_size):
    """Reference-shaped per-region loop (on its own copy of thresholded)."""
    thresholded = thresholded.copy()
    n_fish = thresholded.shape[-1]
    out = {
        "areas": [], "cents": [],
        "blobs": [[] for _ in range(n_fish)],
        "px": [[] for _ in range(n_fish)],
        "avg": [[] for _ in range(n_fish)],
        "mx": [[] for _ in range(n_fish)],
        "gr_blobs": [], "gr_px": [],
    }
    for region in regionprops(cells):
        raw_cell, thresh_cell, cell_seg, _ = mf.cell_splice_segmentation(
            I, thresholded, cells, region
        )
        fish = [thresh_cell[..., c] for c in range(n_fish)]
        for c in range(n_fish):
            blob_count = mf.count_blobs(fish[c], cell_seg, min_cc_size)
            out["blobs"][c].append(blob_count)
            out["px"][c].append(int((fish[c] * cell_seg).sum() / 255))
            raw = raw_cell[..., c + 1].astype(np.int64) * cell_seg
            avg_i, max_i = intensity_metrics(raw)
            out["avg"][c].append(avg_i if not np.isnan(avg_i) else 0)
            out["mx"][c].append(max_i)
        out["areas"].append(region.area)
        cy, cx = region.centroid
        out["cents"].append(f"{int(cy)}_{int(cx)}")
        gr = (fish[0]) * (fish[1] / 255)
        out["gr_blobs"].append(mf.count_blobs(gr, cell_seg, min_cc_size))
        out["gr_px"].append(int((gr * cell_seg).sum() / 255))
    return out, thresholded


def _vectorized(I, thresholded, cells, min_cc_size):
    thresholded = thresholded.copy()
    n_fish = thresholded.shape[-1]
    labels, areas, cents = region_stats.cell_geometry(cells)
    out = {
        "areas": list(areas), "cents": cents,
        "blobs": [], "px": [], "avg": [], "mx": [],
    }
    for c in range(n_fish):
        counts, px, removed = region_stats.per_cell_blob_stats(
            thresholded[..., c] != 0, cells, min_cc_size
        )
        thresholded[..., c][removed] = 0
        out["blobs"].append(list(counts[labels]))
        out["px"].append(list(px[labels]))
        avg, mx = region_stats.per_cell_intensity(
            I[..., c + 1].astype(np.int64), cells
        )
        out["avg"].append(list(avg[labels]))
        out["mx"].append(list(mx[labels].astype(np.int64)))
    gr = (thresholded[..., 0] != 0) & (thresholded[..., 1] != 0)
    gc, gp, _ = region_stats.per_cell_blob_stats(gr, cells, min_cc_size)
    out["gr_blobs"] = list(gc[labels])
    out["gr_px"] = list(gp[labels])
    return out, thresholded


def _synthetic(rng, shape=(120, 150), n_cells=8, touching=False):
    cells = np.zeros(shape, np.int64)
    lab = 0
    for _ in range(n_cells):
        lab += 1
        cy, cx = rng.integers(15, shape[0] - 15), rng.integers(15, shape[1] - 15)
        r = int(rng.integers(8, 16))
        yy, xx = np.ogrid[: shape[0], : shape[1]]
        disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        if touching:
            cells[disk] = lab  # later cells overwrite -> touching boundaries
        else:
            cells[disk & (cells == 0)] = lab
    I = (rng.random(shape + (3,)) * 255).astype(np.uint8)
    th = ((rng.random(shape + (2,)) < 0.25) * 255).astype(np.int64)
    return I, th, cells


def test_matches_loop_oracle(rng):
    for touching in (False, True):
        for min_cc in (1, 3, 7):
            I, th, cells = _synthetic(rng, touching=touching)
            want, th_want = _oracle(I, th, cells, min_cc)
            got, th_got = _vectorized(I, th, cells, min_cc)
            for key in want:
                np.testing.assert_allclose(
                    np.asarray(got[key], dtype=object).astype(float),
                    np.asarray(want[key], dtype=object).astype(float),
                    err_msg=f"{key} touching={touching} min_cc={min_cc}",
                )
            np.testing.assert_array_equal(th_got, th_want)


def test_nonconsecutive_labels(rng):
    I, th, cells = _synthetic(rng)
    cells[cells == 2] = 17  # gap in label space (min-cut splitter can do this)
    want, _ = _oracle(I, th, cells, 3)
    got, _ = _vectorized(I, th, cells, 3)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key], dtype=object).astype(float),
            np.asarray(want[key], dtype=object).astype(float),
            err_msg=key,
        )


def test_cross_cell_component_split(rng):
    """A fish blob spanning two touching nuclei must be split per nucleus."""
    cells = np.zeros((40, 40), np.int64)
    cells[10:30, 5:20] = 1
    cells[10:30, 20:35] = 2  # touching at column 20
    th = np.zeros((40, 40, 2), np.int64)
    th[18:22, 15:25, 0] = 255  # one 4x10 blob crossing the boundary
    I = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    want, thw = _oracle(I, th, cells, 3)
    got, thg = _vectorized(I, th, cells, 3)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key], dtype=object).astype(float),
            np.asarray(want[key], dtype=object).astype(float),
            err_msg=key,
        )
    np.testing.assert_array_equal(thg, thw)
    assert want["blobs"][0] == [1, 1]  # split into one blob per nucleus
