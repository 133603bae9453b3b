"""Otsu: device twin vs cv2 (the host/product parity path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ecseg_tpu.ops.threshold import otsu_binarize, otsu_threshold_tpu


def test_otsu_tpu_matches_cv2(rng):
    for shape, kind in [
        ((120, 160), "bimodal"),
        ((64, 64), "uniform"),
        ((200, 300), "bimodal"),
        ((50, 50), "constant"),
    ]:
        if kind == "bimodal":
            img = np.where(
                rng.random(shape) < 0.4,
                rng.normal(60, 10, shape),
                rng.normal(190, 15, shape),
            )
            img = np.clip(img, 0, 255).astype(np.uint8)
        elif kind == "uniform":
            img = (rng.random(shape) * 255).astype(np.uint8)
        else:
            img = np.full(shape, 37, np.uint8)
        t_cv, binary_cv = otsu_binarize(img)
        t_dev = int(otsu_threshold_tpu(jnp.asarray(img)))
        assert t_dev == int(t_cv), (kind, t_dev, t_cv)
        np.testing.assert_array_equal((img > t_dev).astype(np.uint8), binary_cv)


def test_otsu_tpu_envelope_guard():
    with pytest.raises(ValueError):
        otsu_threshold_tpu(jnp.zeros((4096, 4096), jnp.uint8))
