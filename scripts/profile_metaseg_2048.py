#!/usr/bin/env python3
"""End-to-end device metaseg timing at the reference's full 2048^2 image
size: forward -> stitch -> device meta_inference -> packed fetch.
At this geometry the cc_pallas entry points route to the banded
HBM-resident Pallas kernels (ops/cc_pallas_banded: ~98 s / 44 s compiles
and faster steady state vs the XLA formulations' 1202 s compile at
755 ms/labeling; the whole-map-in-VMEM form needs 212 MB VMEM and cannot
compile).  This script validates the banded product path end-to-end on
the chip and reports steady-state seconds/image."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.ops import tiling
    from ecseg_tpu.pipelines.metaseg import (
        _decode_post_blob,
        _default_forward,
        _segment_post_jit,
    )

    rng = np.random.default_rng(0)
    h = w = 2048
    img = (rng.random((h, w)) * 60).astype(np.uint8)
    for _ in range(300):
        y, x = rng.integers(0, h - 60), rng.integers(0, w - 60)
        r = int(rng.integers(3, 40))
        img[y : y + r, x : x + r] = 200
    _, patches, pos = tiling.im2patches_overlap(img[..., None])
    pos = tuple(map(tuple, pos))
    print(f"patches: {patches.shape}", flush=True)

    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        metaseg_unet.init_params(jax.random.PRNGKey(0)),
    )
    patches_d = jnp.asarray(patches)

    t0 = time.perf_counter()
    raw, blob = _segment_post_jit(params, patches_d, _default_forward, pos, jnp.bfloat16)
    blob_np = np.asarray(blob)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)
    ok, labels, num_ec = _decode_post_blob(blob_np, raw.shape[1])
    print(f"ok={ok} num_ec={num_ec} labels={labels.shape} "
          f"classes={np.unique(labels)}", flush=True)

    for rep in range(3):
        t0 = time.perf_counter()
        raw, blob = _segment_post_jit(
            params, patches_d, _default_forward, pos, jnp.bfloat16
        )
        blob_np = np.asarray(blob)
        print(f"steady-state image {rep}: {time.perf_counter() - t0:.3f} s",
              flush=True)


if __name__ == "__main__":
    main()
