"""Device->host transfer packing.

This TPU attachment moves device->host bytes at ~25-30 MB/s through the
relay, so fetching a 2048^2 int32 label canvas costs ~0.6 s -- more than
the whole device compute.  The pipelines' final artifacts are tiny-alphabet
images (4-class labels, binary masks), so the device packs them before the
fetch and the host unpacks with a LUT:

- 4-class label maps: 2 bits/px, 16x smaller than int32;
- binary masks: 1 bit/px, 8x smaller than uint8.

Packing is exact and cheap on device (a few VPU passes); unpacking is a
single table gather on host.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_LUT2 = np.stack(
    [np.arange(256) >> (2 * k) & 3 for k in range(4)], axis=1
).astype(np.uint8)  # (256, 4)
_LUT1 = np.stack(
    [np.arange(256) >> k & 1 for k in range(8)], axis=1
).astype(np.uint8)  # (256, 8)


def pack_labels_2bit_jax(labels: jnp.ndarray) -> jnp.ndarray:
    """(H, W) integer label map with values in {0..3} -> (H, ceil(W/4))
    uint8, 4 pixels per byte (little-endian within the byte)."""
    h, w = labels.shape
    w4 = -(-w // 4) * 4
    x = labels.astype(jnp.uint8)
    if w4 != w:
        x = jnp.pad(x, ((0, 0), (0, w4 - w)))
    x = x.reshape(h, w4 // 4, 4).astype(jnp.uint32)
    packed = x[..., 0] | (x[..., 1] << 2) | (x[..., 2] << 4) | (x[..., 3] << 6)
    return packed.astype(jnp.uint8)


def unpack_labels_2bit(packed: np.ndarray, w: int) -> np.ndarray:
    """Inverse of :func:`pack_labels_2bit_jax`; returns (H, w) uint8."""
    h = packed.shape[0]
    out = _LUT2[np.asarray(packed)].reshape(h, -1)
    return out[:, :w]


def pack_mask_1bit_jax(mask: jnp.ndarray) -> jnp.ndarray:
    """(H, W) boolean/nonzero mask -> (H, ceil(W/8)) uint8 bitmap."""
    h, w = mask.shape
    w8 = -(-w // 8) * 8
    x = (mask != 0).astype(jnp.uint8)
    if w8 != w:
        x = jnp.pad(x, ((0, 0), (0, w8 - w)))
    x = x.reshape(h, w8 // 8, 8).astype(jnp.uint32)
    packed = x[..., 0]
    for k in range(1, 8):
        packed = packed | (x[..., k] << k)
    return packed.astype(jnp.uint8)


def unpack_mask_1bit(packed: np.ndarray, w: int) -> np.ndarray:
    """Inverse of :func:`pack_mask_1bit_jax`; returns (H, w) uint8 {0, 1}."""
    h = packed.shape[0]
    out = _LUT1[np.asarray(packed)].reshape(h, -1)
    return out[:, :w]


def pack_mask_1bit_host(mask: np.ndarray) -> np.ndarray:
    """Host twin of :func:`pack_mask_1bit_jax` (same little-endian bit
    layout), for shrinking host->device uploads of binary masks."""
    return np.packbits(
        np.ascontiguousarray(mask != 0), axis=1, bitorder="little"
    )


def unpack_mask_1bit_jax(packed: jnp.ndarray, w: int) -> jnp.ndarray:
    """Device twin of :func:`unpack_mask_1bit`: (H, ceil(w/8)) uint8 ->
    (H, w) uint8 {0, 1}."""
    h = packed.shape[0]
    bits = (
        packed[:, :, None].astype(jnp.uint32)
        >> jnp.arange(8, dtype=jnp.uint32)[None, None, :]
    ) & 1
    return bits.reshape(h, -1)[:, :w].astype(jnp.uint8)
