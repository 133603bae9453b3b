"""Shared crafted-NuSeT-weights builder for e2e tests.

Level-1 skip passthrough: class-1 logit = 5 * relu(v - thresh) where v is
the normalized input brightness.  ``thresh`` is picked per pass: whole-image
norm separates at ~0.5; foreground norm maps nuclei to ~0 and background
hugely negative, so -5 separates there.  The deep path still runs with
random weights, so the full compute graph is exercised.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ecseg_tpu.models import nuset, nuset_infer


def passthrough_nuset_params(key, thresh):
    p = nuset.init_unet_params(key)

    def pass_k(shape, src, dst, gain=1.0):
        k = np.zeros(shape, np.float32)
        k[shape[0] // 2, shape[1] // 2, src, dst] = gain
        return jnp.asarray(k)

    bias1 = np.zeros(64, np.float32)
    bias1[0] = -thresh
    p["conv1-1"]["kernel"] = pass_k((3, 3, 1, 64), 0, 0)
    p["conv1-1"]["bias"] = jnp.asarray(bias1)
    p["conv1-2"]["kernel"] = pass_k((3, 3, 64, 64), 0, 0)
    p["conv1-2"]["bias"] = jnp.zeros(64)
    # decoder: concat puts the skip first -> channel 0 is the skip's ch 0
    p["conv1-3"]["kernel"] = pass_k((3, 3, 128, 64), 0, 0)
    p["conv1-3"]["bias"] = jnp.zeros(64)
    p["conv1-4"]["kernel"] = pass_k((3, 3, 64, 64), 0, 0)
    p["conv1-4"]["bias"] = jnp.zeros(64)
    fk = np.zeros((3, 3, 64, 2), np.float32)
    fk[1, 1, 0, 1] = 5.0
    p["final"]["kernel"] = jnp.asarray(fk)
    return p


def crafted_nuset_model(**kw):
    kw.setdefault("nms_threshold", 0.01)
    kw.setdefault("bbox_min_score", 0.95)
    kw.setdefault("resize_scale", 0.3)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return nuset_infer.NuSeTModel(
        unet_whole=passthrough_nuset_params(k1, thresh=0.5),
        unet_fg=passthrough_nuset_params(k2, thresh=-5.0),
        rpn_fg=nuset.init_rpn_params(k3, nuset_infer.NUM_REF_ANCHORS),
        **kw,
    )
