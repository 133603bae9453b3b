"""Packed transpose-conv Pallas kernel (ops/convt_pallas) vs the lhs-dilated
lowering (models/layers.conv2d_transpose), which is itself TF-golden-pinned.

The kernel is a kept negative result (no model uses it -- see its module
docstring); these tests pin the fused-pixel-shuffle layout technique it
documents.  Runs in Pallas interpret mode on the CPU test platform.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ecseg_tpu.models.layers import conv2d_transpose
from ecseg_tpu.ops.convt_pallas import conv2d_transpose_packed

SHAPES = [
    # flagship decoder levels (spatially scaled down where large)
    (3, 16, 16, 512, 256),
    (2, 32, 32, 256, 128),
    (2, 64, 64, 128, 64),
    # non-square, tiny channels, batch not a multiple of the group size
    (5, 8, 24, 8, 128),
    (1, 16, 40, 16, 64),
]


def _ref(x, k, b):
    return np.asarray(jnp.maximum(conv2d_transpose(x, k, b), 0))


@pytest.mark.parametrize("n,h,w,cin,cout", SHAPES)
def test_exact_on_integer_inputs(n, h, w, cin, cout):
    """Integer-valued f32 inputs: every partial product is exact, so any
    accumulation order gives the identical result -- the kernel must match
    the lhs-dilated lowering bit-for-bit."""
    rng = np.random.default_rng(hash((n, h, w, cin, cout)) % 2**31)
    x = jnp.asarray(rng.integers(-4, 5, (n, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.integers(-4, 5, (3, 3, cin, cout)).astype(np.float32))
    b = jnp.asarray(rng.integers(-4, 5, (cout,)).astype(np.float32))
    got = np.asarray(conv2d_transpose_packed(x, k, b))
    assert got.shape == (n, 2 * h, 2 * w, cout)
    assert np.array_equal(_ref(x, k, b), got)


def test_bf16_close_to_f32_reference():
    """bf16 inputs differ from the XLA lowering only by f32 accumulation
    order; both must sit within bf16-grade distance of the f32 answer."""
    rng = np.random.default_rng(0)
    n, h, w, cin, cout = 2, 16, 16, 64, 64
    x32 = jnp.asarray(rng.standard_normal((n, h, w, cin), np.float32))
    k32 = jnp.asarray(rng.standard_normal((3, 3, cin, cout), np.float32))
    b32 = jnp.asarray(rng.standard_normal((cout,), np.float32))
    want = _ref(x32, k32, b32)
    got = np.asarray(
        conv2d_transpose_packed(
            x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16), b32
        )
    ).astype(np.float32)
    scale = np.abs(want).max()
    assert np.abs(want - got).max() <= 0.05 * scale


def test_no_bias():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-3, 4, (2, 16, 16, 32)).astype(np.float32))
    k = jnp.asarray(rng.integers(-3, 4, (3, 3, 32, 64)).astype(np.float32))
    want = np.asarray(jnp.maximum(conv2d_transpose(x, k), 0))
    got = np.asarray(conv2d_transpose_packed(x, k, None))
    assert np.array_equal(want, got)
