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

    Numerics: histogram and moment cumsums are EXACT int32 (f32 partial
    sums go inexact past 2^24 and can flip near-tied variances); the
    envelope guard keeps ``hist * bins`` cumsums < 2^31.  The final
    between-class variances are compared in f32 where cv2 uses double, so
    an exactly-tied pair of thresholds may resolve differently -- the host
    :func:`otsu_binarize` (cv2) is the product parity path; this twin
    exists so a future device-resident preprocess can avoid the host trip.
    cv2's FLT_EPSILON class-weight skip is replicated via the w0/w1 > 0
    masking (integer weights: the smallest nonzero weight is 1 pixel,
    far above FLT_EPSILON * total for any supported image).
    """
    if img_u8.size >= 1 << 23:  # 255 * px must stay < 2^31 for exact int32
        raise ValueError(
            f"otsu_threshold_tpu supports < 2^23 px; got {img_u8.shape}"
        )
    hist = (
        jnp.zeros(256, dtype=jnp.int32)
        .at[img_u8.reshape(-1).astype(jnp.int32)]
        .add(1)
    )
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.int32)
    w0 = jnp.cumsum(hist)  # background weight for threshold t (inclusive)
    w1 = total - w0
    sum0 = jnp.cumsum(hist * bins)
    sum_all = sum0[-1]
    w0f = w0.astype(jnp.float32)
    w1f = w1.astype(jnp.float32)
    mu0 = jnp.where(w0 > 0, sum0.astype(jnp.float32) / jnp.maximum(w0f, 1), 0.0)
    mu1 = jnp.where(
        w1 > 0, (sum_all - sum0).astype(jnp.float32) / jnp.maximum(w1f, 1), 0.0
    )
    between = jnp.where(
        jnp.logical_and(w0 > 0, w1 > 0), w0f * w1f * (mu0 - mu1) ** 2, 0.0
    )
    return jnp.argmax(between).astype(jnp.int32)
