"""Transfer packing round trips (ops/packing)."""

import numpy as np

import jax.numpy as jnp

from ecseg_tpu.ops.packing import (
    pack_labels_2bit_jax,
    pack_mask_1bit_jax,
    unpack_labels_2bit,
    unpack_mask_1bit,
)


def test_labels_2bit_roundtrip(rng):
    for h, w in [(64, 64), (33, 37), (10, 1), (5, 4)]:
        lab = rng.integers(0, 4, size=(h, w))
        packed = np.asarray(pack_labels_2bit_jax(jnp.asarray(lab)))
        assert packed.shape == (h, -(-w // 4))
        assert packed.dtype == np.uint8
        out = unpack_labels_2bit(packed, w)
        np.testing.assert_array_equal(out, lab)


def test_mask_1bit_roundtrip(rng):
    for h, w in [(64, 64), (33, 41), (7, 3)]:
        m = rng.random((h, w)) < 0.4
        packed = np.asarray(pack_mask_1bit_jax(jnp.asarray(m)))
        assert packed.shape == (h, -(-w // 8))
        out = unpack_mask_1bit(packed, w)
        np.testing.assert_array_equal(out.astype(bool), m)
