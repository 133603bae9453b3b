"""Deterministic demo weights for every model family.

The reference distributes its trained models as external blobs that are NOT
in the repo (metaseg.h5, nuset/*.ckpt, interseg SavedModels -- downloaded
from Mendeley per reference README.md:47-49), so a fresh checkout cannot
produce meaningful output.  This module crafts small deterministic weight
sets whose *shallow* paths implement brightness-threshold segmentation /
classification while the full-depth compute still runs -- every pipeline
then produces non-empty, reproducible outputs on synthetic data, which is
what the shipped examples, the end-to-end demo (scripts/make_demo_weights.py)
and integration smoke-tests need.  They are NOT trained models and are not
meant to approximate the published ones.

Crafting pattern (same as bench.py's ``_realistic_params``): level-1
encoder/decoder convs and the skip path are surgically set to pass input
brightness through to the head; all other layers keep their seeded random
init and execute at full cost.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _pass_k(shape, src, dst, gain=1.0):
    k = np.zeros(shape, np.float32)
    k[shape[0] // 2, shape[1] // 2, src, dst] = gain
    return jnp.asarray(k)


def demo_metaseg_params(key=None) -> Dict:
    """metaseg U-Net whose argmax maps brightness bands to classes:
    background < ~0.3 < nuclei < ~0.7 < ecDNA (chromosomes unused)."""
    from . import metaseg_unet

    if key is None:
        key = jax.random.PRNGKey(0)
    p = metaseg_unet.init_params(key)
    for name in ("enc1_1", "enc1_2", "dec1_1", "dec1_2"):
        p[name]["kernel"] = _pass_k(p[name]["kernel"].shape, 0, 0)
        p[name]["bias"] = jnp.zeros_like(p[name]["bias"])
    head_k = np.zeros(p["head"]["kernel"].shape, np.float32)
    head_k[0, 0, 0, 1] = 20.0  # nuclei logit = 20 b
    head_k[0, 0, 0, 3] = 40.0  # ecDNA  logit = 40 b - 14  (wins for b > 0.7)
    p["head"]["kernel"] = jnp.asarray(head_k)
    p["head"]["bias"] = jnp.asarray(np.array([6.0, 0.0, -1e3, -14.0], np.float32))
    return p


def demo_nuset_params(key, thresh: float) -> Dict:
    """NuSeT U-Net whose class-1 logit is 5*relu(brightness - thresh) via
    the level-1 skip path (the deep path runs with random weights).  Use
    thresh ~0.5 for the whole-image-norm pass and a large negative value
    for the foreground-norm pass (see nuclei_segment's two sessions,
    reference src/utils.py:92-102)."""
    from . import nuset

    p = nuset.init_unet_params(key)
    bias1 = np.zeros(64, np.float32)
    bias1[0] = -thresh
    p["conv1-1"]["kernel"] = _pass_k((3, 3, 1, 64), 0, 0)
    p["conv1-1"]["bias"] = jnp.asarray(bias1)
    p["conv1-2"]["kernel"] = _pass_k((3, 3, 64, 64), 0, 0)
    p["conv1-2"]["bias"] = jnp.zeros(64)
    p["conv1-3"]["kernel"] = _pass_k((3, 3, 128, 64), 0, 0)
    p["conv1-3"]["bias"] = jnp.zeros(64)
    p["conv1-4"]["kernel"] = _pass_k((3, 3, 64, 64), 0, 0)
    p["conv1-4"]["bias"] = jnp.zeros(64)
    fk = np.zeros((3, 3, 64, 2), np.float32)
    fk[1, 1, 0, 1] = 5.0
    p["final"]["kernel"] = jnp.asarray(fk)
    return p


def demo_nuset_tree(key=None) -> Dict:
    """The {whole, fg:{unet, rpn}} tree models/nuset.npz stores
    (consumed by pipelines.stat_fish.load_nuset_model)."""
    from . import nuset
    from .nuset_infer import NUM_REF_ANCHORS

    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "whole": demo_nuset_params(k1, thresh=0.5),
        "fg": {
            "unet": demo_nuset_params(k2, thresh=-5.0),
            "rpn": nuset.init_rpn_params(k3, NUM_REF_ANCHORS),
        },
    }


def _demo_classifier_backbone(p: Dict) -> None:
    """Make channel 0 of the backbone carry mean input brightness through
    every conv+pool block, so GAP feature 0 ~ patch brightness."""
    for i in range(1, 5):
        k = p[f"conv{i}"]["kernel"]
        p[f"conv{i}"]["kernel"] = _pass_k(k.shape, 0, 0)
        p[f"conv{i}"]["bias"] = jnp.zeros_like(p[f"conv{i}"]["bias"])


def demo_ecseg_i_params(key=None) -> Dict:
    """ecSeg-i whose prediction is brightness-banded: dim -> No-amp,
    medium -> EC-amp, bright -> HSR-amp."""
    from . import classifiers

    if key is None:
        key = jax.random.PRNGKey(1)
    p = classifiers.init_ecseg_i_params(key)
    _demo_classifier_backbone(p)
    head = np.zeros(p["head"]["kernel"].shape, np.float32)  # (256, 3)
    head[0, 1] = 30.0  # EC-amp logit = 30 b (beats No-amp's 3 for b > 0.1)
    head[0, 2] = 60.0  # HSR-amp logit = 60 b - 21 (beats EC-amp for b > 0.7)
    p["head"]["kernel"] = jnp.asarray(head)
    p["head"]["bias"] = jnp.asarray(np.array([3.0, 0.0, -21.0], np.float32))
    return p


def demo_ecseg_c_params(key=None) -> Dict:
    """ecSeg-c whose P(Focal-amp) is a sigmoid of mean brightness."""
    from . import classifiers

    if key is None:
        key = jax.random.PRNGKey(2)
    p = classifiers.init_ecseg_c_params(key)
    _demo_classifier_backbone(p)
    head = np.zeros(p["head"]["kernel"].shape, np.float32)  # (256, 1)
    head[0, 0] = 20.0
    p["head"]["kernel"] = jnp.asarray(head)
    p["head"]["bias"] = jnp.asarray(np.array([-5.0], np.float32))
    return p
