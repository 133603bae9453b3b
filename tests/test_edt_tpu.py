"""Device EDT vs scipy (exact squared match) and cv2 L1."""

import cv2
import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp

from ecseg_tpu.ops.edt_tpu import edt_sq_tpu, edt_tpu, l1_distance_tpu


def _cases(rng):
    yield ndi.binary_closing(rng.random((60, 90)) < 0.55)
    yield rng.random((48, 48)) < 0.8
    m = np.zeros((40, 70), bool)
    m[5:35, 10:60] = True
    m[18:22, 30:40] = False  # internal hole
    yield m
    yield np.zeros((16, 16), bool)


def test_edt_squared_bit_matches_scipy(rng):
    for m in _cases(rng):
        ref = ndi.distance_transform_edt(m)
        got2 = np.asarray(edt_sq_tpu(jnp.asarray(m)))
        np.testing.assert_array_equal(got2, np.round(ref**2).astype(np.int64))
        got = np.asarray(edt_tpu(jnp.asarray(m)))
        np.testing.assert_allclose(got, ref, atol=1e-4)


def test_edt_all_foreground_saturates():
    got = np.asarray(edt_sq_tpu(jnp.ones((12, 12), bool)))
    assert (got == 1 << 30).all()


def test_l1_bit_matches_cv2(rng):
    for m in _cases(rng):
        ref = cv2.distanceTransform(
            np.asarray(m, np.uint8), cv2.DIST_L1, 3
        ).astype(np.int64)
        got = np.asarray(l1_distance_tpu(jnp.asarray(m)))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape", [(1, 7), (7, 1), (3, 3)])
def test_edt_tiny_shapes(rng, shape):
    m = rng.random(shape) < 0.5
    if m.all():
        m.flat[0] = False
    ref = ndi.distance_transform_edt(m)
    got = np.asarray(edt_tpu(jnp.asarray(m)))
    np.testing.assert_allclose(got, ref, atol=1e-4)
