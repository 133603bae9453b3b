"""Pallas connected-component kernel vs scipy and vs the XLA labeler.

Runs in Pallas interpret mode on the CPU test platform; the identical kernel
code path compiles with Mosaic on TPU.
"""

import numpy as np
import pytest
from scipy import ndimage

import jax.numpy as jnp

from ecseg_tpu.ops.cc_pallas import count_cc_pallas, label_pallas
from ecseg_tpu.ops.cc_tpu import label_tpu


def _ref_count(m, conn):
    s = ndimage.generate_binary_structure(2, conn)
    return ndimage.label(m, structure=s)[1]


@pytest.mark.parametrize("conn", [1, 2])
@pytest.mark.parametrize("density", [0.15, 0.5, 0.85])
def test_count_matches_scipy_random(rng, conn, density):
    m = rng.random((96, 160)) < density
    n, px = count_cc_pallas(jnp.asarray(m), connectivity=conn)
    assert int(n) == _ref_count(m, conn)
    assert int(px) == int(m.sum())


@pytest.mark.parametrize("conn", [1, 2])
def test_count_blobs_and_edges(rng, conn):
    m = np.zeros((128, 200), bool)
    for _ in range(30):
        y, x = rng.integers(0, 120), rng.integers(0, 192)
        r = int(rng.integers(2, 7))
        m[y : y + r, x : x + r] = True
    # components touching every border
    m[0, :10] = True
    m[-1, -10:] = True
    m[:10, 0] = True
    m[-10:, -1] = True
    n, px = count_cc_pallas(jnp.asarray(m), connectivity=conn)
    assert int(n) == _ref_count(m, conn)
    assert int(px) == int(m.sum())


def test_count_degenerate():
    empty = jnp.zeros((64, 128), bool)
    n, px = count_cc_pallas(empty)
    assert (int(n), int(px)) == (0, 0)
    full = jnp.ones((64, 128), bool)
    n, px = count_cc_pallas(full)
    assert (int(n), int(px)) == (1, 64 * 128)


@pytest.mark.parametrize("conn", [1, 2])
def test_labels_match_xla_labeler(rng, conn):
    m = rng.random((72, 136)) < 0.4
    lp = np.asarray(label_pallas(jnp.asarray(m), connectivity=conn))
    lx = np.asarray(label_tpu(jnp.asarray(m), connectivity=conn))
    np.testing.assert_array_equal(lp, lx)


def test_snake_mask_exercises_scan_phase():
    # a serpentine one-pixel path: geodesic diameter >> phase-A sweep budget
    m = np.zeros((64, 64), bool)
    for r in range(0, 64, 4):
        m[r, :] = True
        if (r // 4) % 2 == 0 and r + 4 < 64:
            m[r : r + 5, -1] = True
        elif r + 4 < 64:
            m[r : r + 5, 0] = True
    n, px = count_cc_pallas(jnp.asarray(m), connectivity=1)
    assert int(n) == _ref_count(m, 1) == 1
    assert int(px) == int(m.sum())


def test_fused_stitch_count_matches_stitch_then_count(rng):
    """count_cc_from_patches == count over the XLA-stitched canvas, for a
    full 1024^2 overlap-tiled geometry with blob-like and noisy labels."""
    from ecseg_tpu.ops import tiling
    from ecseg_tpu.ops.cc_pallas import count_cc_from_patches

    h = w = 1024
    positions = tuple(map(tuple, tiling.patch_positions(h, w)))
    img = np.zeros((h, w), np.int32)
    for _ in range(150):
        y, x = rng.integers(0, h - 10, 2)
        r = int(rng.integers(2, 8))
        img[y : y + r, x : x + r] = 3
    img[rng.random((h, w)) < 0.002] = 3  # single-pixel specks
    img[rng.random((h, w)) < 0.01] = 1  # other-class clutter

    patches = np.stack([img[y : y + 256, x : x + 256] for (y, x) in positions])
    n, px = count_cc_from_patches(jnp.asarray(patches), positions, class_id=3)

    stitched = tiling.stitch_labels_host(patches, positions)
    ref_n, ref_px = count_cc_pallas(jnp.asarray(stitched == 3), connectivity=2)
    assert int(n) == int(ref_n)
    assert int(px) == int(ref_px)
    # and against scipy on the same canvas
    assert int(n) == _ref_count(stitched == 3, 2)


@pytest.mark.parametrize("shape", [(700, 900), (256, 256), (512, 310)])
def test_fused_stitch_count_irregular_geometries(rng, shape):
    from ecseg_tpu.ops import tiling
    from ecseg_tpu.ops.cc_pallas import count_cc_from_patches

    h, w = shape
    positions = tuple(map(tuple, tiling.patch_positions(h, w)))
    img = np.zeros((h, w), np.int32)
    for _ in range(40):
        y, x = rng.integers(0, h - 8), rng.integers(0, w - 8)
        img[y : y + int(rng.integers(2, 7)), x : x + int(rng.integers(2, 7))] = 3
    patches = np.stack([img[y : y + 256, x : x + 256] for (y, x) in positions])

    n, px = count_cc_from_patches(jnp.asarray(patches), positions, class_id=3)
    stitched = tiling.stitch_labels_host(patches, positions)
    ref_n, ref_px = count_cc_pallas(jnp.asarray(stitched == 3), connectivity=2)
    assert (int(n), int(px)) == (int(ref_n), int(ref_px))


def test_stitch_labels_pallas_matches_host(rng):
    """The one-kernel Pallas stitch must equal the host stitcher on
    regular and irregular geometries (incl. the reference's rim rules)."""
    import jax.numpy as jnp

    from ecseg_tpu.ops import tiling
    from ecseg_tpu.ops.cc_pallas import stitch_labels_pallas

    for h, w in [(512, 512), (462, 874), (306, 306)]:
        img = rng.integers(0, 4, size=(h, w)).astype(np.float32)
        _, patches, pos = tiling.im2patches_overlap(img[..., None])
        label_patches = patches[..., 0].astype(np.int32)
        want = tiling.stitch_labels_host(label_patches, pos)
        got = np.asarray(
            stitch_labels_pallas(
                jnp.asarray(label_patches), tuple(map(tuple, pos))
            )
        )
        np.testing.assert_array_equal(got, want)


def test_vmem_gate_fallbacks_match_pallas(rng, monkeypatch):
    """Beyond the Pallas VMEM envelope the entry points fall back to the
    XLA formulations; force the gate shut and assert identical results."""
    import jax.numpy as jnp

    from ecseg_tpu.ops import cc_pallas

    m = rng.random((96, 128)) < 0.3
    seeds = rng.random((96, 128)) < 0.02
    want_lab = np.asarray(cc_pallas.label_pallas(jnp.asarray(m)))
    want_cnt = tuple(
        int(v) for v in cc_pallas.count_cc_pallas(jnp.asarray(m))
    )
    want_fb = np.asarray(cc_pallas.flood_from_border_pallas(jnp.asarray(m)))
    want_fs = np.asarray(
        cc_pallas.flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(seeds))
    )

    monkeypatch.setattr(cc_pallas, "_fits_vmem", lambda h, w, op="": False)
    jax_clear = __import__("jax").clear_caches
    jax_clear()
    got_lab = np.asarray(cc_pallas.label_pallas(jnp.asarray(m)))
    got_cnt = tuple(int(v) for v in cc_pallas.count_cc_pallas(jnp.asarray(m)))
    got_fb = np.asarray(cc_pallas.flood_from_border_pallas(jnp.asarray(m)))
    got_fs = np.asarray(
        cc_pallas.flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(seeds))
    )
    jax_clear()

    np.testing.assert_array_equal(got_lab, want_lab)
    assert got_cnt == want_cnt
    np.testing.assert_array_equal(got_fb, want_fb)
    np.testing.assert_array_equal(got_fs, want_fs)


def test_strip_blocked_scans_match_unblocked(rng, monkeypatch):
    """2048^2-class maps run the B-phase scans strip-blocked to bound live
    VMEM (cc_pallas._strip_slices).  Forcing multi-strip scans on a small
    map must be bit-identical to the unblocked path -- including snake
    masks whose long runs the scans (not the plain sweeps) resolve."""
    import jax
    import jax.numpy as jnp

    from ecseg_tpu.ops import cc_pallas

    # snake: one serpentine component + blobs + noise
    m = np.zeros((160, 256), bool)
    for i, r in enumerate(range(2, 150, 8)):
        m[r, 4:-4] = True
        if i % 2 == 0:
            m[r : r + 8, -5] = True
        else:
            m[r : r + 8, 4] = True
    m |= rng.random((160, 256)) < 0.15
    seeds = rng.random((160, 256)) < 0.02

    args = [(m,), (m,)]
    want = {
        "lab": np.asarray(cc_pallas.label_pallas(jnp.asarray(m))),
        "cnt": tuple(int(v) for v in cc_pallas.count_cc_pallas(jnp.asarray(m))),
        "fb": np.asarray(cc_pallas.flood_from_border_pallas(jnp.asarray(m))),
        "fs": np.asarray(
            cc_pallas.flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(seeds))
        ),
    }

    # force the strip path: per-strip envelope smaller than the map
    monkeypatch.setattr(cc_pallas, "_PALLAS_MAX_MAP_BYTES", 32 * 1024)
    jax.clear_caches()
    assert cc_pallas._n_strips(*cc_pallas._padded_dims(160, 256)) > 1
    got = {
        "lab": np.asarray(cc_pallas.label_pallas(jnp.asarray(m))),
        "cnt": tuple(int(v) for v in cc_pallas.count_cc_pallas(jnp.asarray(m))),
        "fb": np.asarray(cc_pallas.flood_from_border_pallas(jnp.asarray(m))),
        "fs": np.asarray(
            cc_pallas.flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(seeds))
        ),
    }
    jax.clear_caches()

    np.testing.assert_array_equal(got["lab"], want["lab"])
    assert got["cnt"] == want["cnt"]
    np.testing.assert_array_equal(got["fb"], want["fb"])
    np.testing.assert_array_equal(got["fs"], want["fs"])
