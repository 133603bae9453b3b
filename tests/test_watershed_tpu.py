"""Device minimax-flooding watershed (fast path) vs the host parity twin."""

import numpy as np
from scipy import ndimage as ndi

import jax.numpy as jnp

from ecseg_tpu.ops.watershed import watershed as watershed_host
from ecseg_tpu.ops.watershed_tpu import watershed_tpu


def test_two_basin_analytic_exact():
    H, W = 21, 41
    xx = np.arange(W, dtype=float)
    row = np.minimum(np.abs(xx - 10), np.abs(xx - 30))
    image = np.tile(row, (H, 1))
    markers = np.zeros((H, W), np.int64)
    markers[10, 10] = 1
    markers[10, 30] = 2
    got = np.asarray(watershed_tpu(jnp.asarray(image), jnp.asarray(markers)))
    assert (got[:, :20] == 1).all()
    assert (got[:, 21:] == 2).all()


def test_edt_blobs_near_total_agreement(rng):
    """Touching-nuclei EDT regime: the fast path matches the host watershed
    everywhere except exact-tie ridge pixels."""
    for _ in range(3):
        mask = np.zeros((96, 110), bool)
        centers = []
        while len(centers) < 5:
            cy, cx = rng.integers(15, 81), rng.integers(15, 95)
            if any(abs(cy - y) + abs(cx - x) < 14 for y, x in centers):
                continue
            r = int(rng.integers(9, 14))
            yy, xx = np.ogrid[:96, :110]
            mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            centers.append((int(cy), int(cx)))
        dist = ndi.distance_transform_edt(mask)
        markers = np.zeros(mask.shape, np.int64)
        for k, (cy, cx) in enumerate(centers, 1):
            if mask[cy, cx]:
                markers[cy, cx] = k

        host = watershed_host(-dist, markers, mask, watershed_line=False)
        dev = np.asarray(
            watershed_tpu(jnp.asarray(-dist), jnp.asarray(markers), jnp.asarray(mask))
        )
        # full coverage of the mask, nothing outside it
        assert (dev[~mask] == 0).all()
        assert (dev[mask] > 0).all()
        # markers keep labels
        for k, (cy, cx) in enumerate(centers, 1):
            if markers[cy, cx]:
                assert dev[cy, cx] == k
        agreement = (dev[mask] == host[mask]).mean()
        assert agreement >= 0.97, agreement


def test_mask_and_unreachable_regions(rng):
    image = rng.random((40, 60))
    mask = np.zeros((40, 60), bool)
    mask[5:20, 5:25] = True
    mask[25:35, 35:55] = True  # disconnected region with NO marker
    markers = np.zeros((40, 60), np.int64)
    markers[10, 10] = 3
    out = np.asarray(
        watershed_tpu(jnp.asarray(image), jnp.asarray(markers), jnp.asarray(mask))
    )
    assert (out[5:20, 5:25] == 3).all()
    assert (out[25:35, 35:55] == 0).all()  # unreachable stays unlabeled
    assert (out[~mask] == 0).all()
