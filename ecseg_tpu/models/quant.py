"""Post-training int8 quantization for the segmentation U-Nets.

Quantized inference for the metaseg hot path (the ``model.predict_on_batch``
call at reference src/utils.py:115), for memory-constrained deployments
(int8 weights are 4x smaller than fp32, activations move half the bytes of
bf16).  The scheme:

- **Weights**: per-output-channel symmetric int8 (scale = max|W|/127 per
  channel), quantized once at load time.
- **Activations**: dynamic per-tensor symmetric int8 (scale = max|x|/127,
  computed on device per conv input).  No calibration data needed, and the
  scale adapts to each batch, so there is no train/serve distribution gap.
- **Accumulation**: int32 (``preferred_element_type``), then a single fused
  rescale (``sx * sw[c]``) back to bf16, plus bias and ReLU.

**Throughput note (measured, v5e single chip, 2026-08)**: although v5e
hardware rates int8 at 2x bf16 peak, the current XLA/libtpu lowering of
int8 ``conv_general_dilated`` runs the metaseg U-Net *slower* than bf16
(103.6 vs 161.9 tiles/s with static activation scales; 77.4 with dynamic
scales, whose per-layer max-reductions serialize the pipeline).  bf16
therefore remains the serving default and the benched configuration;
revisit if a later toolchain lowers int8 convs natively.

This is NOT the parity path: the fp32 forward remains the bit-parity
reference and the bf16 forward the rank-stable throughput default.  Label
agreement with the float forward is pinned in tests/test_quant.py (~0.98 on
worst-case random-init nets; trained nets with confident logit gaps sit far
higher -- the benched realistic-weight workload agrees exactly).

The first encoder conv (1 input channel, ~0.04 GFLOP of a ~33 GFLOP
forward) stays in bf16 by default: it contributes nothing to throughput and
its input distribution (raw normalized pixels) benefits most from keeping
full precision.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from . import metaseg_unet
from .layers import conv2d, conv2d_transpose, max_pool, relu

_DN = ("NHWC", "HWIO", "NHWC")
DEFAULT_SKIP = ("enc1_1",)


def quantize_kernel(kernel: jnp.ndarray):
    """Per-output-channel symmetric int8: returns (kernel_q int8, scale
    fp32[cout]) with kernel ~= kernel_q * scale."""
    k = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return kq, scale


def quantize_unet(params: Dict, skip: Sequence[str] = DEFAULT_SKIP) -> Dict:
    """Quantize a metaseg-U-Net parameter pytree (the dict produced by
    :func:`ecseg_tpu.models.metaseg_unet.init_params` or the npz loader).

    Layers named in ``skip`` keep their float kernels and run in bf16.
    """
    qp: Dict = {}
    for name, p in params.items():
        if name in skip:
            qp[name] = dict(p)
            continue
        kq, scale = quantize_kernel(p["kernel"])
        qp[name] = {"kernel_q": kq, "scale": scale}
        if "bias" in p:
            qp[name]["bias"] = p["bias"]
    return qp


def _quantize_activation(x: jnp.ndarray):
    """Dynamic per-tensor symmetric int8: (x_q int8, scale fp32 scalar)."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf)) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def qconv2d(x, p: Dict, *, transpose: bool = False, stride: int = 2):
    """int8 conv (or stride-2 transpose conv) with int32 accumulation and a
    fused bf16 rescale.  Falls back to the float op for un-quantized layers
    (``skip`` entries)."""
    if "kernel_q" not in p:
        f = (
            functools.partial(conv2d_transpose, stride=stride)
            if transpose
            else conv2d
        )
        return f(x, p["kernel"], p.get("bias"))

    xq, sx = _quantize_activation(x)
    kq = p["kernel_q"]
    if transpose:
        # mirror layers.conv2d_transpose: grad-of-conv with flipped kernel,
        # with per-axis padding so non-square kernels stay correct
        def _pad(k):
            pad_total = max(k - stride, 0)
            pad_lo = pad_total // 2
            pad_hi = pad_total - pad_lo
            return (k - 1 - pad_lo, k - 1 - pad_hi)

        kh, kw = kq.shape[0], kq.shape[1]
        y = lax.conv_general_dilated(
            xq,
            jnp.flip(kq, axis=(0, 1)),
            (1, 1),
            [_pad(kh), _pad(kw)],
            lhs_dilation=(stride, stride),
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    else:
        y = lax.conv_general_dilated(
            xq,
            kq,
            (1, 1),
            "SAME",
            dimension_numbers=_DN,
            preferred_element_type=jnp.int32,
        )
    y = y.astype(jnp.bfloat16) * (sx * p["scale"]).astype(jnp.bfloat16)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(jnp.bfloat16)
    return y


def forward(qparams: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """int8 twin of :func:`ecseg_tpu.models.metaseg_unet.forward`:
    (N, H, W, C) uint8/float patches -> (N, H, W, 4) softmax probabilities
    (softmax in fp32, like the float paths)."""
    levels = metaseg_unet.num_levels(qparams)
    x = x.astype(jnp.bfloat16) / jnp.asarray(255.0, jnp.bfloat16)

    skips = []
    for i in range(1, levels + 1):
        x = relu(qconv2d(x, qparams[f"enc{i}_1"]))
        x = relu(qconv2d(x, qparams[f"enc{i}_2"]))
        skips.append(x)
        x = max_pool(x)

    x = relu(qconv2d(x, qparams["bott_1"]))
    x = relu(qconv2d(x, qparams["bott_2"]))

    for i in range(levels, 0, -1):
        x = relu(qconv2d(x, qparams[f"up{i}"], transpose=True))
        x = jnp.concatenate([skips[i - 1].astype(x.dtype), x], axis=-1)
        x = relu(qconv2d(x, qparams[f"dec{i}_1"]))
        x = relu(qconv2d(x, qparams[f"dec{i}_2"]))

    logits = qconv2d(x, qparams["head"])
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
