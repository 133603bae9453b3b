"""Functional conv-net building blocks (NHWC, HWIO) for all model families.

Models are pure functions over parameter pytrees (nested dicts of jnp
arrays); there is no layer-object framework.  This keeps weight import from
foreign checkpoints trivial (a converter just produces the same dict) and the
forward passes transparently jit/shard_map-able.

Conventions match the TF graphs being replaced so imported weights drop in
unchanged:

- conv kernels are HWIO (TF layout);
- 'SAME' padding semantics;
- ``conv2d_transpose`` reproduces tf.layers.conv2d_transpose(kernel 3x3,
  stride 2, 'SAME'): TF stores its kernel as (H, W, out_ch, in_ch), importers
  must transpose to HWIO = (H, W, in_ch, out_ch) (see keras_import).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _precision_for(x):
    # fp32 inputs are the parity path: force full-precision accumulation
    # (the platform default silently computes convs at bf16-grade precision).
    # bf16 inputs are the throughput path and keep the default MXU mode.
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def conv2d(x, kernel, bias=None, stride: int = 1, padding: str = "SAME"):
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DN,
        precision=_precision_for(x),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d_transpose(x, kernel, bias=None, stride: int = 2, padding: str = "SAME"):
    """TF-compatible transpose conv: output spatial size = input * stride for
    'SAME'.  ``kernel`` is HWIO where I = input channels of *this* op.

    Implemented as a fractionally-strided conv (lhs_dilation) with the
    spatially-flipped kernel, which is exactly TF's gradient-of-conv
    definition and lowers to a single XLA convolution on the MXU.
    """
    kh, kw, _, _ = kernel.shape
    # TF 'SAME' transpose conv: out = in * stride.
    # grad-of-conv padding: lo = k - 1 - pad_lo, hi = k - 1 - pad_hi + extra
    # For stride 2, k 3, TF forward-conv pad would be lo=0? Derive generally:
    # forward conv 'SAME' with stride s on output size o=in*s back to in:
    # pad_total = k - s if k >= s else 0   (when o % s == 0)
    pad_total = max(kh - stride, 0)
    pad_lo = pad_total // 2
    pad_hi = pad_total - pad_lo
    flipped = jnp.flip(kernel, axis=(0, 1))
    y = lax.conv_general_dilated(
        x,
        flipped.astype(x.dtype),
        window_strides=(1, 1),
        padding=[(kh - 1 - pad_lo, kh - 1 - pad_hi), (kw - 1 - pad_lo, kw - 1 - pad_hi)],
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN,
        precision=_precision_for(x),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def max_pool(x, window: int = 2, stride: int = 2, padding: str = "SAME"):
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def relu(x):
    return jnp.maximum(x, 0)


# ---------------------------------------------------------------------------
# Initializers (TF-compatible)
# ---------------------------------------------------------------------------


def glorot_uniform(key, shape: Tuple[int, ...], dtype=jnp.float32):
    """VarianceScaling(scale=1.0, fan_avg, uniform) -- the initializer every
    NuSeT conv uses (reference src/model_layers/models.py:19 etc.)."""
    kh, kw, cin, cout = shape
    fan_in = kh * kw * cin
    fan_out = kh * kw * cout
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def normal_init(key, shape, stddev: float, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * stddev


def conv_params(key, kh, kw, cin, cout, use_bias=True, init=glorot_uniform, **kw_init):
    kkey, _ = jax.random.split(key)
    p = {"kernel": init(kkey, (kh, kw, cin, cout), **kw_init)}
    if use_bias:
        p["bias"] = jnp.zeros((cout,), jnp.float32)
    return p


def param_count(params: Dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
