"""Otsu thresholding.

Host path matches ``cv2.threshold(..., THRESH_BINARY+THRESH_OTSU)``
(reference src/image_tools.py:91); a device (JAX) variant computes the same
threshold from a 256-bin histogram so background-polarity detection can run
on TPU.
"""

from __future__ import annotations

import cv2
import jax.numpy as jnp
import numpy as np


def otsu_binarize(img_u8: np.ndarray):
    """(threshold, binary {0,1} image), exactly cv2's Otsu."""
    t, th = cv2.threshold(
        np.asarray(img_u8, dtype=np.uint8), 0, 1, cv2.THRESH_BINARY + cv2.THRESH_OTSU
    )
    return t, th


def otsu_threshold_tpu(img_u8: jnp.ndarray) -> jnp.ndarray:
    """Otsu threshold of a uint8 image on device.

    Returns the threshold t such that the binary image is ``img > t``
    (matching cv2's THRESH_BINARY semantics where pixels strictly greater
    than the returned threshold become 1).
    """
    hist = jnp.zeros(256, dtype=jnp.float32).at[img_u8.reshape(-1).astype(jnp.int32)].add(1.0)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)  # background weight for threshold t (inclusive)
    w1 = total - w0
    sum0 = jnp.cumsum(hist * bins)
    sum_all = sum0[-1]
    mu0 = jnp.where(w0 > 0, sum0 / jnp.maximum(w0, 1), 0.0)
    mu1 = jnp.where(w1 > 0, (sum_all - sum0) / jnp.maximum(w1, 1), 0.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return jnp.argmax(between).astype(jnp.int32)
