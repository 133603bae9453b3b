"""Device meta_inference twin vs the host oracle (ops/meta_post)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ecseg_tpu.ops.meta_post import meta_inference
from ecseg_tpu.ops.meta_post_tpu import count_roots_tpu, meta_inference_tpu
from ecseg_tpu.ops.cc import count_cc


def _random_label_map(rng, shape=(180, 220)):
    img = np.zeros(shape, np.int64)
    for lab, n, rmax in [(1, 4, 28), (2, 14, 9), (3, 25, 4)]:
        for _ in range(n):
            y, x = rng.integers(0, shape[0] - 4), rng.integers(0, shape[1] - 4)
            r = int(rng.integers(2, rmax))
            img[y : y + r, x : x + r] = lab
    return img


def _check(img):
    want = meta_inference(img.copy())
    out, ok = meta_inference_tpu(jnp.asarray(img))
    assert bool(ok), "device twin unexpectedly flagged fallback"
    np.testing.assert_array_equal(np.asarray(out).astype(np.int64), want)


def test_matches_host_on_random_maps(rng):
    for _ in range(4):
        _check(_random_label_map(rng))


def test_matches_host_with_multiclass_fixpoints_off(rng, monkeypatch):
    """ECSEG_MC_LABEL=0 reverts to the per-class fixpoint formulation; the
    device twin must stay bit-equal to the host oracle either way.  The
    toggle is read at TRACE time and meta_inference_tpu is module-jitted,
    so the jit cache is cleared on both sides (the earlier tests traced the
    default multiclass form at the same call signature)."""
    monkeypatch.setenv("ECSEG_MC_LABEL", "0")
    meta_inference_tpu.clear_cache()
    try:
        for _ in range(2):
            _check(_random_label_map(rng))
    finally:
        # do not leave the MC-off trace behind for later default-env tests
        meta_inference_tpu.clear_cache()


def test_matches_host_degenerate_maps(rng):
    h, w = 96, 128
    _check(np.zeros((h, w), np.int64))  # empty
    _check(np.full((h, w), 1, np.int64))  # all nuclei
    _check(np.full((h, w), 3, np.int64))  # all ec
    img = np.zeros((h, w), np.int64)  # nuclei but no chrom (NaN mean)
    img[10:40, 10:40] = 1
    img[50:54, 50:54] = 3
    _check(img)
    img = np.zeros((h, w), np.int64)  # chrom but no ec (NaN mean)
    img[10:30, 10:30] = 2
    img[40:80, 60:100] = 1
    _check(img)


def test_matches_host_on_metaphase_spread(rng):
    """Chromosome centroids in all four bands around a 'nucleus' centroid
    exercise the removal branch (reference src/image_tools.py:71-81)."""
    img = np.zeros((256, 256), np.int64)
    cy, cx = 128, 128
    img[cy - 10 : cy + 10, cx - 10 : cx + 10] = 1  # the fake nucleus
    rng_local = np.random.default_rng(3)
    for _ in range(40):  # chrom blobs scattered within the +-70 bands
        dy = int(rng_local.integers(-60, 60))
        dx = int(rng_local.integers(-60, 60))
        y, x = cy + dy, cx + dx
        img[y : y + 4, x : x + 4] = 2
    _check(img)
    # sanity: the host oracle must actually have removed the nucleus
    want = meta_inference(img.copy())
    assert not (want == 1).sum() or (want == 1).sum() < (img == 1).sum()


def test_touching_classes_and_merges(rng):
    """ec adjacent to chromosome/nuclei exercises merge_comp incl. the
    skipped-last-label quirk."""
    for _ in range(3):
        img = _random_label_map(rng, shape=(150, 170))
        # force adjacency: an ec blob glued to a chrom blob
        img[20:26, 20:30] = 2
        img[26:30, 24:28] = 3
        _check(img)


def test_budget_overflow_lowers_ok():
    img = np.zeros((120, 120), np.int64)
    img[::2, ::2] = 2  # 3600 single-pixel chromosomes > MAX_CHROM
    out, ok = meta_inference_tpu(jnp.asarray(img))
    assert not bool(ok)


def test_centroid_near_tie_flags_fallback():
    """A chromosome whose NON-dyadic centroid sits exactly BAND_V from a
    nucleus centroid can round differently through the host oracle's
    float64 chain, so the device must clear ``ok`` (host recomputes).
    L-shaped 3-px components give centroids with denominator 3."""
    img = np.zeros((96, 128), np.int64)
    img[10, 10] = img[11, 10] = img[10, 11] = 1  # nucleus, x mean 31/3
    img[40, 80] = img[41, 80] = img[40, 81] = 2  # chrom, x mean 241/3
    # exact gap: (241 - 31) / 3 == 70 == BAND_V, non-dyadic on both sides
    out, ok = meta_inference_tpu(jnp.asarray(img))
    assert not bool(ok)


def test_dyadic_exact_band_edge_keeps_ok():
    """The same exact-gap construction with INTEGER centroids is float64-
    exact on the host, so it must NOT flag (the dyadic-safety test)."""
    img = np.zeros((96, 128), np.int64)
    img[10:13, 10:13] = 1  # nucleus, centroid (11, 11)
    img[40:43, 80:83] = 2  # chrom, centroid (41, 81): x gap exactly 70
    _check(img)


def test_count_roots_matches_count_cc(rng):
    for density in (0.05, 0.2, 0.5):
        m = rng.random((90, 130)) < density
        assert int(count_roots_tpu(jnp.asarray(m))) == count_cc(m)[0]
    assert int(count_roots_tpu(jnp.zeros((40, 40), bool))) == 0
    assert int(count_roots_tpu(jnp.ones((40, 40), bool))) == 1


def test_hilo_split_branch_matches_direct_sums(rng, monkeypatch):
    """_component_sums carries raw coordinates through the sort on small
    maps and the overflow-free hi/lo split on large ones
    (_needs_hilo_split).  Forcing the split branch on a small map must
    produce identical limbs, hi/lo pairs, and downstream meta_inference
    output."""
    import jax.numpy as jnp

    from ecseg_tpu.ops import meta_post_tpu as mp

    m = rng.random((96, 128)) < 0.25
    hw = m.size
    direct = mp._component_sums(jnp.asarray(m), hw, 64)

    monkeypatch.setattr(mp, "_needs_hilo_split", lambda hw, h, w: True)
    split = mp._component_sums(jnp.asarray(m), hw, 64)

    for k in ("nraw", "num", "valid", "flat", "roots"):
        np.testing.assert_array_equal(np.asarray(direct[k]), np.asarray(split[k]))
    for k in ("sy", "sx", "n"):
        for a, b in zip(direct[k], split[k]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # hi/lo pairs may split differently but must agree as 64*hi + lo
    for k in ("sy_hilo", "sx_hilo"):
        da = 64 * np.asarray(direct[k][0]) + np.asarray(direct[k][1])
        db = 64 * np.asarray(split[k][0]) + np.asarray(split[k][1])
        np.testing.assert_array_equal(da, db)
