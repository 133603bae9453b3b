"""Banded HBM-resident fixpoint kernels (ops/cc_pallas_banded) must be
bit-identical to the in-VMEM labeler / floods -- including snake masks
whose resolution crosses many band boundaries, which exercises the
Gauss-Seidel down/up passes and the outer convergence loop."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.fixture
def small_bands(monkeypatch):
    """Shrink the band geometry so small CPU test maps exercise multiple
    bands per pass."""
    from ecseg_tpu.ops import cc_pallas_banded as b

    monkeypatch.setattr(b, "_BAND", 32)
    monkeypatch.setattr(b, "_HALO", 8)
    return b


def _cases(rng):
    # blobs + noise
    m1 = rng.random((200, 260)) < 0.22
    for _ in range(8):
        y, x = rng.integers(0, 160), rng.integers(0, 200)
        m1[y : y + 40, x : x + 40] = True
    # serpentine snake spanning every band + noise
    m2 = np.zeros((200, 260), bool)
    for i, r in enumerate(range(2, 190, 10)):
        m2[r, 4:-4] = True
        if i % 2 == 0:
            m2[r : r + 10, -5] = True
        else:
            m2[r : r + 10, 4] = True
    m2 |= rng.random((200, 260)) < 0.1
    # degenerate: empty / full
    m3 = np.zeros((96, 130), bool)
    m4 = np.ones((96, 130), bool)
    return [m1, m2, m3, m4]


def test_label_banded_matches_label_pallas(rng, small_bands):
    from ecseg_tpu.ops.cc_pallas import label_pallas

    for conn in (1, 2):
        for m in _cases(rng):
            want = np.asarray(label_pallas(jnp.asarray(m), connectivity=conn))
            got = np.asarray(
                small_bands.label_banded(jnp.asarray(m), connectivity=conn)
            )
            np.testing.assert_array_equal(got, want)


def test_flood_banded_matches_flood_pallas(rng, small_bands):
    from ecseg_tpu.ops.cc_pallas import flood_from_seeds_pallas

    for conn in (1, 2):
        for m in _cases(rng):
            seeds = rng.random(m.shape) < 0.01
            want = np.asarray(
                flood_from_seeds_pallas(
                    jnp.asarray(m), jnp.asarray(seeds), connectivity=conn
                )
            )
            got = np.asarray(
                small_bands.flood_banded(
                    jnp.asarray(m), jnp.asarray(seeds), connectivity=conn
                )
            )
            np.testing.assert_array_equal(got, want)


def test_fits_banded_geometry_gates():
    from ecseg_tpu.ops import cc_pallas_banded as b

    assert b.fits_banded(2048, 2048)
    assert b.fits_banded(4096, 4096)
    assert not b.fits_banded(9000, 9000)  # beyond the HBM-side bound
    assert not b.fits_banded(64, 64)  # smaller than one band: in-VMEM path


def test_entry_points_route_through_banded(rng, small_bands, monkeypatch):
    """With the in-VMEM gate closed and the banded geometry admitted, the
    cc_pallas entry points must return banded results identical to the
    unrestricted path."""
    import jax

    from ecseg_tpu.ops import cc_pallas

    m = _cases(rng)[0]
    seeds = rng.random(m.shape) < 0.01
    want_lab = np.asarray(cc_pallas.label_pallas(jnp.asarray(m)))
    want_cnt = tuple(int(v) for v in cc_pallas.count_cc_pallas(jnp.asarray(m)))
    want_fb = np.asarray(cc_pallas.flood_from_border_pallas(jnp.asarray(m)))
    want_fs = np.asarray(
        cc_pallas.flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(seeds))
    )

    monkeypatch.setattr(cc_pallas, "_fits_vmem", lambda h, w, op="": False)
    jax.clear_caches()
    got_lab = np.asarray(cc_pallas.label_pallas(jnp.asarray(m)))
    got_cnt = tuple(int(v) for v in cc_pallas.count_cc_pallas(jnp.asarray(m)))
    got_fb = np.asarray(cc_pallas.flood_from_border_pallas(jnp.asarray(m)))
    got_fs = np.asarray(
        cc_pallas.flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(seeds))
    )
    jax.clear_caches()

    np.testing.assert_array_equal(got_lab, want_lab)
    assert got_cnt == want_cnt
    np.testing.assert_array_equal(got_fb, want_fb)
    np.testing.assert_array_equal(got_fs, want_fs)
