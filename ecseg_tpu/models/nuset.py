"""NuSeT: foreground U-Net + region-proposal network, as pure JAX.

The architecture is fully specified in the reference
(src/model_layers/models.py:5-136, src/model_layers/model_RPN.py:5-46) and is
reproduced exactly so TF1 checkpoint weights (whole_norm.ckpt /
foreground.ckpt, restored at reference src/utils.py:94-101) can be imported
one-to-one:

- encoder: conv blocks 64, 128, 256, 512 (two 3x3 same-pad conv+ReLU each)
  with 2x2 maxpool between;
- the pre-bottleneck pooled feature map is exported as ``rpn_feature``;
- bottleneck: 1024, 1024;
- decoder: 3x3 stride-2 transpose convs 512 -> 256 -> 128 -> 64.  The first
  transpose conv is followed by ReLU and **no skip concat** (the level-4 skip
  is deliberately absent, models.py:79-87 comment); the remaining transpose
  convs are followed by a skip concat and **no ReLU**;
- final 3x3 conv to 2 classes, **no bias** (models.py:134);
- RPN head: 3x3x512 conv (**no activation**, model_RPN.py:23-24), 1x1 cls
  head reshaped to (H*W*A, 2) + softmax, 1x1 bbox head reshaped to (H*W*A, 4).

Input spatial dims must be multiples of 16 (the caller crops,
reference src/utils.py:138-141), which makes every shape static under jit.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .layers import (
    conv2d,
    conv2d_transpose,
    conv_params,
    max_pool,
    normal_init,
    relu,
)

ENC_WIDTHS = (64, 128, 256, 512)
BOTTLENECK = 1024
NB_CLASSES = 2
STRIDE = 16  # anchor stride (reference src/utils.py:64)


def init_unet_params(key) -> Dict:
    keys = iter(jax.random.split(key, 64))
    p: Dict = {}
    c = 1
    for i, w in enumerate(ENC_WIDTHS, start=1):
        p[f"conv{i}-1"] = conv_params(next(keys), 3, 3, c, w)
        p[f"conv{i}-2"] = conv_params(next(keys), 3, 3, w, w)
        c = w
    p["conv5-1"] = conv_params(next(keys), 3, 3, c, BOTTLENECK)
    p["conv5-2"] = conv_params(next(keys), 3, 3, BOTTLENECK, BOTTLENECK)
    # transpose convs (TF names them conv2d_transpose{,_1,_2,_3})
    p["deconv4"] = conv_params(next(keys), 3, 3, BOTTLENECK, 512)
    p["conv4-3"] = conv_params(next(keys), 3, 3, 512, 512)
    p["conv4-4"] = conv_params(next(keys), 3, 3, 512, 512)
    p["deconv3"] = conv_params(next(keys), 3, 3, 512, 256)
    p["conv3-3"] = conv_params(next(keys), 3, 3, 512, 256)
    p["conv3-4"] = conv_params(next(keys), 3, 3, 256, 256)
    p["deconv2"] = conv_params(next(keys), 3, 3, 256, 128)
    p["conv2-3"] = conv_params(next(keys), 3, 3, 256, 128)
    p["conv2-4"] = conv_params(next(keys), 3, 3, 128, 128)
    p["deconv1"] = conv_params(next(keys), 3, 3, 128, 64)
    p["conv1-3"] = conv_params(next(keys), 3, 3, 128, 64)
    p["conv1-4"] = conv_params(next(keys), 3, 3, 64, 64)
    p["final"] = conv_params(next(keys), 3, 3, 64, NB_CLASSES, use_bias=False)
    return p


def init_rpn_params(key, num_ref_anchors: int) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    import functools

    n01 = functools.partial(normal_init, stddev=0.01)
    n001 = functools.partial(normal_init, stddev=0.001)
    return {
        "rpn_conv": conv_params(k1, 3, 3, 512, 512, init=n01),
        "rpn_cls_score": conv_params(k2, 1, 1, 512, num_ref_anchors * 2, init=n01),
        "rpn_bbox_pred": conv_params(k3, 1, 1, 512, num_ref_anchors * 4, init=n001),
    }


def unet_forward(
    p: Dict, x: jnp.ndarray, valid_hw: Tuple[int, int] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(1, H, W, 1) normalized image -> (final_logits (1,H,W,2),
    rpn_feature (1,H/16,W/16,512)).  Mirrors reference models.py:5-136.

    ``valid_hw``: when the input is zero-padded up to a compile bucket
    (models/nuset_infer geometry bucketing), the true (H, W) extent.  Every
    activation is re-zeroed beyond the valid extent after each conv, so a
    valid output position computes EXACTLY what the unpadded program would
    (same-pad zero semantics at the true boundary; pool windows never
    straddle the boundary because both the crop and the buckets are /16).

    ``valid_hw`` may be TRACED scalars: the masking is iota-compare (no
    shape-dependent slicing), so all true geometries within one bucket share
    ONE compiled program -- the whole point of the bucketing (a static
    valid_hw would re-specialize the cache key per geometry and compile
    once per image size anyway).
    """

    def m(x, level):
        if valid_hw is None:
            return x
        vh, vw = valid_hw[0] >> level, valid_hw[1] >> level
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1, 1), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[2], 1), 2)
        return x * jnp.logical_and(rows < vh, cols < vw).astype(x.dtype)

    def block(name_a, name_b, x, level):
        x = m(relu(conv2d(x, p[name_a]["kernel"], p[name_a]["bias"])), level)
        x = m(relu(conv2d(x, p[name_b]["kernel"], p[name_b]["bias"])), level)
        return x

    x = m(x, 0)
    skips = []
    for i in range(1, 5):
        x = block(f"conv{i}-1", f"conv{i}-2", x, i - 1)
        skips.append(x)
        x = max_pool(x)
    rpn_feature = x

    x = block("conv5-1", "conv5-2", x, 4)

    # Up 4: relu, NO skip (models.py:79-100)
    x = m(relu(conv2d_transpose(x, p["deconv4"]["kernel"], p["deconv4"]["bias"])), 3)
    x = block("conv4-3", "conv4-4", x, 3)

    # Up 3..1: concat skip, NO relu on the transpose conv
    x = m(conv2d_transpose(x, p["deconv3"]["kernel"], p["deconv3"]["bias"]), 2)
    x = jnp.concatenate([skips[2], x], axis=-1)
    x = block("conv3-3", "conv3-4", x, 2)

    x = m(conv2d_transpose(x, p["deconv2"]["kernel"], p["deconv2"]["bias"]), 1)
    x = jnp.concatenate([skips[1], x], axis=-1)
    x = block("conv2-3", "conv2-4", x, 1)

    x = m(conv2d_transpose(x, p["deconv1"]["kernel"], p["deconv1"]["bias"]), 0)
    x = jnp.concatenate([skips[0], x], axis=-1)
    x = block("conv1-3", "conv1-4", x, 0)

    logits = conv2d(x, p["final"]["kernel"], None)
    return logits, rpn_feature


def rpn_forward(p: Dict, feat_map: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Mirrors reference model_RPN.py:5-46 (note: no activation on the 3x3)."""
    rpn = conv2d(feat_map, p["rpn_conv"]["kernel"], p["rpn_conv"]["bias"])
    cls_score = conv2d(rpn, p["rpn_cls_score"]["kernel"], p["rpn_cls_score"]["bias"])
    cls_score = cls_score.reshape(-1, 2)
    cls_prob = jax.nn.softmax(cls_score, axis=-1)
    bbox_pred = conv2d(rpn, p["rpn_bbox_pred"]["kernel"], p["rpn_bbox_pred"]["bias"])
    bbox_pred = bbox_pred.reshape(-1, 4)
    return {
        "rpn_cls_prob": cls_prob,
        "rpn_cls_score": cls_score,
        "rpn_bbox_pred": bbox_pred,
    }


def pred_mask(logits: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel fg/bg argmax (reference src/utils.py:53-55): (H, W) float32."""
    return jnp.argmax(logits, axis=3)[0].astype(jnp.float32)
