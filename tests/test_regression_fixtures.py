"""Committed-output regression guards for the two long device/host chains.

The fixtures were generated with seeded default weights
(scripts in this file's header comment; regenerate by deleting the expected
files and re-running the generation block below).  Any change to the model
forward, tiling/stitch semantics, meta_inference, normalization, watershed
protocol, rescale, or the size filters shows up as a diff here.

Results must be exactly reproducible: jax's threefry PRNG and the fp32 CPU
ops are deterministic for fixed inputs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_metaseg_chain_regression():
    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.ops import tiling
    from ecseg_tpu.ops.meta_post import meta_inference
    from ecseg_tpu.pipelines import metaseg

    img = np.load(os.path.join(FIX, "metaseg_input.npy"))
    want = np.load(os.path.join(FIX, "metaseg_expected.npy"))

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    _, patches, pos = tiling.im2patches_overlap(img[..., None])
    labels = metaseg._segment_patches_jit(
        params, jnp.asarray(patches), metaseg._default_forward, tuple(map(tuple, pos))
    )
    got = meta_inference(np.asarray(labels).astype(np.int64))
    np.testing.assert_array_equal(got, want)


def test_nuset_chain_regression():
    from ecseg_tpu.models import nuset_infer

    blue = np.load(os.path.join(FIX, "nuset_input.npy"))
    want = np.load(os.path.join(FIX, "nuset_expected.npy"))
    model = nuset_infer.init_nuset_model(jax.random.PRNGKey(0))
    got = nuset_infer.nuclei_segment(blue, model, nuclei_size_t=50)
    np.testing.assert_array_equal(got, want)
