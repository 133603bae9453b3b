"""Device morphology twins vs the host scipy/skimage-semantics versions."""

import numpy as np
import pytest
from scipy import ndimage as ndi

import jax.numpy as jnp

from ecseg_tpu.ops import morphology as host
from ecseg_tpu.ops.morphology_tpu import (
    binary_dilation_tpu,
    binary_erosion_tpu,
    binary_fill_holes_tpu,
    clean_image_tpu,
    remove_small_holes_tpu,
    remove_small_objects_tpu,
)
from ecseg_tpu.ops.normalization import clean_image as clean_image_host


def _blobby(rng, shape=(72, 104), density=0.5):
    m = rng.random(shape) < density
    return ndi.binary_closing(m)  # gives structures with holes


@pytest.mark.parametrize("fp", [host.diamond(1), host.disk(2), host.disk(3)])
def test_dilate_erode_match_host(rng, fp):
    m = _blobby(rng)
    np.testing.assert_array_equal(
        np.asarray(binary_dilation_tpu(jnp.asarray(m), fp)),
        host.binary_dilation(m, fp),
    )
    np.testing.assert_array_equal(
        np.asarray(binary_erosion_tpu(jnp.asarray(m), fp)),
        host.binary_erosion(m, fp),
    )


@pytest.mark.parametrize("fp", [host.diamond(1), host.disk(2)])
def test_erosion_border_value_matches_skimage(fp):
    """skimage erosion pads with True: a solid border stripe must survive
    erosion (regression: the device twin used to pad with False)."""
    m = np.zeros((24, 40), bool)
    m[:3, :] = True
    m[:, -4:] = True
    np.testing.assert_array_equal(
        np.asarray(binary_erosion_tpu(jnp.asarray(m), fp)),
        host.binary_erosion(m, fp),
    )
    assert np.asarray(binary_erosion_tpu(jnp.asarray(m), fp))[0, 10]


@pytest.mark.parametrize("conn", [1, 2])
@pytest.mark.parametrize("min_size", [1, 5, 20])
def test_remove_small_objects_matches_host(rng, conn, min_size):
    m = rng.random((64, 96)) < 0.3
    np.testing.assert_array_equal(
        np.asarray(remove_small_objects_tpu(jnp.asarray(m), min_size, conn)),
        host.remove_small_objects(m, min_size, conn),
    )


@pytest.mark.parametrize("conn", [1, 2])
@pytest.mark.parametrize("thresh", [0, 4, 15])
def test_remove_small_holes_matches_host(rng, conn, thresh):
    m = _blobby(rng)
    np.testing.assert_array_equal(
        np.asarray(remove_small_holes_tpu(jnp.asarray(m), thresh, conn)),
        host.remove_small_holes(m, thresh, conn),
    )


def test_fill_holes_matches_scipy(rng):
    for _ in range(3):
        m = _blobby(rng)
        np.testing.assert_array_equal(
            np.asarray(binary_fill_holes_tpu(jnp.asarray(m))),
            ndi.binary_fill_holes(m),
        )


def test_clean_image_matches_host(rng):
    for density in (0.35, 0.55):
        m = _blobby(rng, density=density).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(clean_image_tpu(jnp.asarray(m))), clean_image_host(m)
        )


def test_clean_image_empty():
    z = jnp.zeros((32, 64), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(clean_image_tpu(z)), clean_image_host(np.zeros((32, 64)))
    )
