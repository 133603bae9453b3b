"""Multiclass CC kernels (cc_pallas.label_multiclass_pallas /
flood_multiclass_pallas / label_and_flood_pallas): one fixpoint covering
every class must be bit-identical to the per-class binary kernels merged.
Runs in Pallas interpret mode on the CPU mesh (same code path as TPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecseg_tpu.ops.cc_pallas import (
    flood_from_seeds_pallas,
    flood_multiclass_pallas,
    label_and_flood_pallas,
    label_multiclass_pallas,
    label_pallas,
)

GEOMETRIES = [(64, 96), (120, 130), (33, 257), (200, 64)]


def _random_cls(rng, h, w, stripes=False):
    cls = (rng.random((h, w)) * 4).astype(np.int32)
    cls[5:20, 5:40] = 1
    cls[10:15, 30:60] = 2  # touching different-class runs
    if stripes:
        cls[:, ::2] = 3  # maximal same-class run fragmentation
    return cls


@pytest.mark.parametrize("hw", GEOMETRIES)
def test_label_multiclass_matches_per_class(hw, rng):
    h, w = hw
    cls = _random_cls(rng, h, w, stripes=(hw == (33, 257)))
    clsj = jnp.asarray(cls)
    mc = np.asarray(label_multiclass_pallas(clsj))
    ref = np.full((h, w), -1, np.int32)
    for c in (1, 2, 3):
        lab_c = np.asarray(label_pallas(clsj == c, connectivity=2))
        ref[cls == c] = lab_c[cls == c]
    np.testing.assert_array_equal(mc, ref)


@pytest.mark.parametrize("hw", GEOMETRIES[:2])
def test_flood_multiclass_matches_per_class(hw, rng):
    h, w = hw
    cls = _random_cls(rng, h, w)
    seeds = rng.random((h, w)) < 0.01
    clsj = jnp.asarray(cls)
    fm = np.asarray(flood_multiclass_pallas(clsj, jnp.asarray(seeds)))
    fr = np.zeros((h, w), bool)
    for c in (1, 2, 3):
        m = cls == c
        fr |= np.asarray(
            flood_from_seeds_pallas(
                jnp.asarray(m), jnp.asarray(seeds & m), connectivity=2
            )
        )
    np.testing.assert_array_equal(fm, fr)


@pytest.mark.parametrize("hw", GEOMETRIES[:2])
def test_label_and_flood_fused(hw, rng):
    h, w = hw
    m = rng.random(hw) < 0.45
    s = (rng.random(hw) < 0.02) & m
    lab, fl = label_and_flood_pallas(jnp.asarray(m), jnp.asarray(s))
    np.testing.assert_array_equal(
        np.asarray(lab), np.asarray(label_pallas(jnp.asarray(m), connectivity=2))
    )
    np.testing.assert_array_equal(
        np.asarray(fl),
        np.asarray(
            flood_from_seeds_pallas(jnp.asarray(m), jnp.asarray(s), connectivity=2)
        ),
    )


def test_label_multiclass_empty_and_single_class(rng):
    cls = np.zeros((48, 64), np.int32)
    out = np.asarray(label_multiclass_pallas(jnp.asarray(cls)))
    assert (out == -1).all()
    cls[10:20, 10:20] = 2
    out = np.asarray(label_multiclass_pallas(jnp.asarray(cls)))
    assert (out[10:20, 10:20] == 10 * 64 + 10).all()
    assert (out[cls == 0] == -1).all()
