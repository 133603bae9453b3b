"""Fused decoder-tail kernel (ops/fused_tail) vs the XLA chain.

With integer-valued weights and activations the f32 accumulations are
exact in BOTH formulations, so labels must match bit-for-bit regardless of
summation order; with random bf16 weights the two chains may disagree only
on quantize-level ties, so agreement must be near-total."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecseg_tpu.models.layers import conv2d, relu
from ecseg_tpu.ops import tiling
from ecseg_tpu.ops.fused_tail import fused_dec1_head


def xla_chain(x, w1, b1, w2, b2, wh, bh):
    y = relu(conv2d(x, w1, b1))
    y = relu(conv2d(y, w2, b2))
    logits = conv2d(y, wh, bh)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(tiling.quantize_u8_jax(probs), -1).astype(jnp.int32)


def _weights(rng, c1, c2, ncls, integer):
    if integer:
        mk = lambda *s: jnp.asarray(
            rng.integers(-2, 3, s).astype(np.float32)
        )
    else:
        mk = lambda *s: jnp.asarray(
            (rng.standard_normal(s) * 0.2).astype(np.float32)
        )
    return (
        mk(3, 3, c1, c2), mk(c2), mk(3, 3, c2, c2), mk(c2),
        mk(1, 1, c2, ncls), mk(ncls),
    )


@pytest.mark.parametrize("integer", [True, False])
def test_fused_tail_matches_xla(integer):
    rng = np.random.default_rng(3 if integer else 4)
    c1, c2, ncls = 64, 32, 4
    n = 2
    if integer:
        x = jnp.asarray(rng.integers(0, 3, (n, 256, 256, c1)).astype(np.float32))
    else:
        x = jnp.asarray(
            (rng.random((n, 256, 256, c1)) * 0.5).astype(np.float32)
        ).astype(jnp.bfloat16)
    w1, b1, w2, b2, wh, bh = _weights(rng, c1, c2, ncls, integer)
    if not integer:
        x = x.astype(jnp.bfloat16)

    want = np.asarray(xla_chain(x, w1, b1, w2, b2, wh, bh))
    got = np.asarray(fused_dec1_head(x, w1, b1, w2, b2, wh, bh))
    if integer:
        np.testing.assert_array_equal(got, want)
    else:
        # random weights are the worst case: near-uniform logits put many
        # pixels within an accumulation-order ulp of a quantize tie
        # (measured ~0.5% flips); trained weights produce confident logits
        # where flips are far rarer.  The integer case above proves the
        # MAC set is identical.
        agree = (got == want).mean()
        assert agree > 0.99, f"agreement {agree}"
