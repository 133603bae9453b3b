"""ecSeg-i and ecSeg-c per-nucleus classifiers.

Like metaseg.h5, these are opaque TF SavedModels in the reference
(``interseg_models/interseg`` and ``interseg_models/ecseg_c``, loaded at
reference src/utils.py:27-33).  The call contracts ARE specified by the
driver (reference src/interseg.py:155,167):

- ecSeg-i: (N, 256, 256) uint8 target-FISH channel -> (N, 3) softmax over
  {No-amp, EC-amp, HSR-amp};
- ecSeg-c: (N, 256, 256, 3) preprocessed (see
  :func:`ecseg_tpu.pipelines.interseg.preprocess_ecseg_c`) -> (N, 1) sigmoid
  P(Focal-amp).

Default architectures below are used until converted weights are supplied
(weights are not distributed with the reference repo either); the importer in
:mod:`ecseg_tpu.models.keras_import` maps Keras H5 graphs onto the same
functional executor.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .layers import conv2d, conv_params, max_pool, relu, normal_init


def _init_backbone(key, in_ch: int, widths=(32, 64, 128, 256)) -> Dict:
    keys = iter(jax.random.split(key, 16))
    p: Dict = {}
    c = in_ch
    for i, w in enumerate(widths, start=1):
        p[f"conv{i}"] = conv_params(next(keys), 3, 3, c, w)
        c = w
    return p


def _backbone(p: Dict, x: jnp.ndarray, n_blocks: int) -> jnp.ndarray:
    for i in range(1, n_blocks + 1):
        x = relu(conv2d(x, p[f"conv{i}"]["kernel"], p[f"conv{i}"]["bias"]))
        x = max_pool(x)
    return jnp.mean(x, axis=(1, 2))  # global average pool


def init_ecseg_i_params(key) -> Dict:
    kb, kh = jax.random.split(key)
    p = _init_backbone(kb, in_ch=1)
    p["head"] = {
        "kernel": normal_init(kh, (256, 3), 0.01),
        "bias": jnp.zeros((3,), jnp.float32),
    }
    return p


def _dense_head(params, feat):
    """Head matmul at full f32 precision: TPU's default bf16-pass MXU mode
    can flip borderline argmax/0.5-sigmoid decisions vs the CPU/TF goldens
    (same parity class as layers._precision_for)."""
    from jax import lax

    logits = lax.dot(
        feat, params["head"]["kernel"], precision=lax.Precision.HIGHEST
    )
    return logits + params["head"]["bias"]


def init_ecseg_c_params(key) -> Dict:
    kb, kh = jax.random.split(key)
    p = _init_backbone(kb, in_ch=3)
    p["head"] = {
        "kernel": normal_init(kh, (256, 1), 0.01),
        "bias": jnp.zeros((1,), jnp.float32),
    }
    return p


@jax.jit
def ecseg_i_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(N, 256, 256) uint8 -> (N, 3) softmax."""
    x = x.astype(jnp.float32)[..., None] / 255.0
    feat = _backbone(params, x, 4)
    logits = _dense_head(params, feat)
    return jax.nn.softmax(logits, axis=-1)


@jax.jit
def ecseg_c_forward(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(N, 256, 256, 3) preprocessed floats in [0,1] -> (N, 1) sigmoid."""
    x = x.astype(jnp.float32)
    feat = _backbone(params, x, 4)
    logits = _dense_head(params, feat)
    return jax.nn.sigmoid(logits)
