"""The metaseg 4-class segmentation U-Net.

The reference never defines this architecture in code -- it lives inside the
opaque Keras blob ``models/metaseg.h5`` loaded at reference src/utils.py:27-33
and run at src/utils.py:115.  Two paths are supported here:

1. **Imported weights** (production): :mod:`ecseg_tpu.models.keras_import`
   reconstructs the layer graph from the H5's embedded Keras config and maps
   the weights into this module's parameter pytree.  Any H5 whose graph is a
   plain encoder/decoder U-Net (Conv2D / MaxPool / Conv2DTranspose or
   UpSampling / Concatenate / BatchNorm / Activation) is supported.
2. **Default architecture** (development, benchmarking, tests): the classic
   U-Net below -- input (256, 256, 1), encoder widths (64, 128, 256, 512),
   bottleneck 1024, decoder with skip concats, final 1x1 conv to 4 classes +
   softmax.  Matches the patch contract of the reference (256x256 tiles,
   4-channel output stitched at reference src/utils.py:113-118).

The forward pass takes NHWC uint8/float patches, normalizes to [0, 1], and
returns per-pixel 4-class probabilities.  It is pure and jit/shard_map-safe;
the hot path runs it in bfloat16 (class argmax is rank-stable under bf16 for
this head, and the parity tests pin the fp32 path).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from .layers import conv2d, conv2d_transpose, conv_params, max_pool, relu

# Default development/bench architecture: a half-width classic U-Net.  The
# task (4-class segmentation of single-channel DAPI tiles) does not need
# full U-Net width, and on a v5e chip the full-width net (130 GFLOP/patch)
# cannot reach the 128 tiles/s/chip north star even at 100% MXU utilization;
# half-width (33 GFLOP/patch) can.  When a real metaseg.h5 is supplied the
# architecture is reconstructed from the checkpoint itself (keras_import),
# so this default only governs fresh training / benchmarking.
ENC_WIDTHS = (32, 64, 128, 256)
BOTTLENECK = 512
# Full-width variant matching the classic U-Net family, for import parity
# experiments and conservative benchmarking.
ENC_WIDTHS_XL = (64, 128, 256, 512)
BOTTLENECK_XL = 1024
NUM_CLASSES = 4
PATCH = 256


def init_params(
    key,
    in_ch: int = 1,
    widths=ENC_WIDTHS,
    bottleneck: int = BOTTLENECK,
    num_classes: int = NUM_CLASSES,
) -> Dict:
    keys = iter(jax.random.split(key, 64))
    p: Dict = {}
    c = in_ch
    for i, w in enumerate(widths, start=1):
        p[f"enc{i}_1"] = conv_params(next(keys), 3, 3, c, w)
        p[f"enc{i}_2"] = conv_params(next(keys), 3, 3, w, w)
        c = w
    p["bott_1"] = conv_params(next(keys), 3, 3, c, bottleneck)
    p["bott_2"] = conv_params(next(keys), 3, 3, bottleneck, bottleneck)
    c = bottleneck
    for i, w in zip(range(len(widths), 0, -1), reversed(widths)):
        p[f"up{i}"] = conv_params(next(keys), 3, 3, c, w)
        p[f"dec{i}_1"] = conv_params(next(keys), 3, 3, 2 * w, w)
        p[f"dec{i}_2"] = conv_params(next(keys), 3, 3, w, w)
        c = w
    p["head"] = conv_params(next(keys), 1, 1, c, num_classes)
    return p


def num_levels(params: Dict) -> int:
    return max(int(k[3]) for k in params if k.startswith("enc"))


def flops_per_patch(
    widths=ENC_WIDTHS,
    bottleneck: int = BOTTLENECK,
    in_ch: int = 1,
    num_classes: int = NUM_CLASSES,
    patch: int = PATCH,
) -> int:
    """Analytic forward FLOPs for one (patch, patch, in_ch) tile.

    Transpose convs are counted at their *output* resolution (the
    lhs-dilated conv the MXU actually executes); used for the MFU figures
    reported by bench.py.
    """
    f = 0
    s = patch * patch
    c = in_ch
    for w in widths:
        f += 2 * 9 * s * c * w + 2 * 9 * s * w * w
        c = w
        s //= 4
    f += 2 * 9 * s * c * bottleneck + 2 * 9 * s * bottleneck * bottleneck
    c = bottleneck
    for w in reversed(widths):
        s *= 4
        f += 2 * 9 * s * c * w  # transpose up-conv, output-res accounting
        f += 2 * 9 * s * (2 * w) * w  # dec_1 over the skip concat
        f += 2 * 9 * s * w * w  # dec_2
        c = w
    f += 2 * s * c * num_classes  # 1x1 head
    return f


def _dec_first(skip, x, kernel, bias):
    """The decoder's first conv WITHOUT materializing the skip concat:
    ``conv(concat([skip, x]), K) == conv(skip, K[:, :, :Cs]) +
    conv(x, K[:, :, Cs:])`` -- the concat buffer never touches HBM.

    MEASURED NEGATIVE on this chip (r5): flagship 153.9 vs 167.9 t/s with
    the concat -- halving the input channels (e.g. 64 -> 2x32 at level 1)
    wastes more MXU lane occupancy than the concat traffic costs, i.e. XLA
    already handles the concat near-optimally.  Kept as an opt-in
    (ECSEG_SPLIT_CONCAT=1) for re-evaluation on wider archs, where the
    split halves land on full 128-lane tiles."""
    cs = skip.shape[-1]
    ya = conv2d(skip.astype(x.dtype), kernel[:, :, :cs, :])
    yb = conv2d(x, kernel[:, :, cs:, :], bias)
    return relu(ya + yb)


def _trunk_to_level1(params: Dict, x: jnp.ndarray, dtype):
    """Encoder + bottleneck + decoder down THROUGH up1: returns
    (level-1 skip, upsampled level-1 feature) -- the two inputs of
    dec1_1.  bf16 runs the concat-free split decoder (see _dec_first)."""
    import os

    levels = num_levels(params)
    split = dtype != jnp.float32 and os.environ.get(
        "ECSEG_SPLIT_CONCAT", "0"
    ).strip().lower() in ("1", "true", "yes", "on")
    x = x.astype(dtype)
    x = x / jnp.asarray(255.0, dtype)

    skips = []
    for i in range(1, levels + 1):
        x = relu(conv2d(x, params[f"enc{i}_1"]["kernel"], params[f"enc{i}_1"]["bias"]))
        x = relu(conv2d(x, params[f"enc{i}_2"]["kernel"], params[f"enc{i}_2"]["bias"]))
        skips.append(x)
        x = max_pool(x)

    x = relu(conv2d(x, params["bott_1"]["kernel"], params["bott_1"]["bias"]))
    x = relu(conv2d(x, params["bott_2"]["kernel"], params["bott_2"]["bias"]))

    for i in range(levels, 1, -1):
        x = relu(
            conv2d_transpose(x, params[f"up{i}"]["kernel"], params[f"up{i}"]["bias"])
        )
        k, b = params[f"dec{i}_1"]["kernel"], params[f"dec{i}_1"]["bias"]
        if split:
            x = _dec_first(skips[i - 1], x, k, b)
        else:
            x = jnp.concatenate([skips[i - 1].astype(x.dtype), x], axis=-1)
            x = relu(conv2d(x, k, b))
        x = relu(conv2d(x, params[f"dec{i}_2"]["kernel"], params[f"dec{i}_2"]["bias"]))

    x = relu(conv2d_transpose(x, params["up1"]["kernel"], params["up1"]["bias"]))
    return skips[0], x


def forward_cat1(params: Dict, x: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """Everything up to (and including) the level-1 skip concatenation:
    returns the (N, H, W, 2*width1) input of ``dec1_1``.  Split out so the
    fused decoder-tail kernel (ops/fused_tail) can take over from here on
    the bf16 throughput path; :func:`forward` shares the same trunk."""
    s1, xu = _trunk_to_level1(params, x, dtype)
    return jnp.concatenate([s1.astype(xu.dtype), xu], axis=-1)


def forward(params: Dict, x: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """(N, H, W, C) patches -> (N, H, W, num_classes) softmax probabilities."""
    s1, xu = _trunk_to_level1(params, x, dtype)
    k, b = params["dec1_1"]["kernel"], params["dec1_1"]["bias"]
    if dtype != jnp.float32:
        x = _dec_first(s1, xu, k, b)
    else:
        x = relu(conv2d(jnp.concatenate([s1.astype(xu.dtype), xu], axis=-1), k, b))
    x = relu(conv2d(x, params["dec1_2"]["kernel"], params["dec1_2"]["bias"]))
    logits = conv2d(x, params["head"]["kernel"], params["head"]["bias"])
    # Softmax in fp32 for a stable, parity-safe probability map.
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


@functools.partial(jax.jit, static_argnames=("dtype",))
def predict_on_batch(params: Dict, patches: jnp.ndarray, dtype=jnp.float32):
    """The device analog of Keras ``model.predict_on_batch``
    (reference src/utils.py:115)."""
    return forward(params, patches, dtype=dtype)
