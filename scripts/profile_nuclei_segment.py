#!/usr/bin/env python3
"""Decompose stat_fish's top stage: nuclei_segment at the 2048^2 geometry
(3.1 s/image in the end-to-end bench, scripts/bench_stat_fish.py).

Times each internal step separately, steady-state, with demo-scale NuSeT
weights at scale 0.3 (pipeline default geometry: NuSeT runs at 614^2).

Usage: python scripts/profile_nuclei_segment.py
Recorded result (chip, steady-state, demo weights, 26 nuclei):

    nuclei_segment TOTAL                   965.1 ms
    rescale 0.3 (host)                     124.6 ms
    whole_image_norm (host)                  2.4 ms
    nuset pass 1 (device)                  229.8 ms
    foreground_norm (host)                   4.7 ms
    nuset pass 2 + watershed               467.3 ms
    clean_image (host)                       7.5 ms
    rescale back 1/0.3 (host)              168.4 ms
    remove_small_objects (host)             12.4 ms

The levers, in value order: (1) pass 2's tail -- proposal fetches + the
HOST priority-flood watershed dominate (the device fast path exists,
ECSEG_FAST_WATERSHED, 99.82% pixel agreement); (2) pass 1's ~230 ms for a
~615^2 forward is dispatch/fetch-bound (multiple np.asarray syncs per
pass, ~35 ms each); (3) the two host skimage-parity rescales (~293 ms
combined) could ride the device matmul resize where anti-aliasing parity
allows."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    import jax.numpy as jnp

    from ecseg_tpu.models import nuset_infer
    from ecseg_tpu.models.nuset_infer import nuset_forward
    from ecseg_tpu.ops.normalization import foreground_norm, whole_image_norm
    from ecseg_tpu.ops.resize import rescale
    from ecseg_tpu.pipelines.stat_fish import load_nuset_model

    rng = np.random.default_rng(0)
    hw = 2048
    img = np.zeros((hw, hw), np.uint8)
    yy, xx = np.mgrid[:hw, :hw]
    for _ in range(26):
        cy, cx = rng.integers(120, hw - 120, 2)
        r = int(rng.integers(45, 90))
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[m] = int(rng.integers(190, 240))
    img[img == 0] = 12

    model = load_nuset_model(resize_scale=0.3)

    def t(name, fn, reps=3):
        fn()  # warm/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:34s} {dt * 1e3:9.1f} ms", flush=True)
        return out

    total0 = time.perf_counter()
    nuset_infer.nuclei_segment(img, model, 5000)
    print(f"nuclei_segment compile+first: {time.perf_counter() - total0:.1f} s",
          flush=True)
    t("nuclei_segment TOTAL", lambda: nuset_infer.nuclei_segment(img, model, 5000))

    scaled = t("rescale 0.3 (host)", lambda: rescale(img, 0.3, anti_aliasing=True))
    h16, w16 = (d // 16 * 16 for d in scaled.shape)
    scaled = scaled[:h16, :w16]
    wn = t("whole_image_norm (host)", lambda: whole_image_norm(scaled))
    m1 = t("nuset pass 1 (device)", lambda: nuset_forward(model, wn, pass_two=False))
    fg = t("foreground_norm (host)", lambda: foreground_norm(scaled, m1))
    mw = t("nuset pass 2 + watershed", lambda: nuset_forward(model, fg, pass_two=True))

    from ecseg_tpu.ops.morphology import remove_small_objects
    from ecseg_tpu.ops.normalization import clean_image  # noqa: placed here to mirror call order

    cl = t("clean_image (host)", lambda: clean_image(mw))
    up = t("rescale back 1/0.3 (host)", lambda: rescale(cl, 1 / 0.3))
    t("remove_small_objects (host)", lambda: remove_small_objects(up > 0.5, 5000))


if __name__ == "__main__":
    main()
