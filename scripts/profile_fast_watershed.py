#!/usr/bin/env python3
"""On-chip timing for the NuSeT watershed fast path vs the host parity path.

Synthesizes a realistic pass-2 scenario (touching-nuclei blob field at the
0.3-rescaled stat_fish geometry), then times:
  - host: ops/watershed.nuset_marker_watershed (C++ priority-flood when
    built, else Python) including EDT + dilation on host
  - device: ops/watershed_tpu.nuset_marker_watershed_fast (one jitted
    dilate -> EDT -> minimax-flood -> line-split program, 1-bit fetch)

and reports steady-state ms per call plus the agreement fraction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_case(rng, H=614, W=614, n=40):
    mask = np.zeros((H, W), bool)
    centers = []
    while len(centers) < n:
        cy, cx = int(rng.integers(30, H - 30)), int(rng.integers(30, W - 30))
        r = int(rng.integers(14, 26))
        yy, xx = np.ogrid[:H, :W]
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        centers.append((cy, cx, r))
    pred = mask.astype(np.float32)
    props = np.array(
        [[cx - r, cy - r, cx + r, cy + r] for cy, cx, r in centers], np.float32
    )
    scores = np.full(len(centers), 0.97, np.float32)
    return pred, scores, props


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    from ecseg_tpu.ops.watershed import nuset_marker_watershed
    from ecseg_tpu.ops.watershed_tpu import nuset_marker_watershed_fast

    rng = np.random.default_rng(0)
    cases = [make_case(rng) for _ in range(3)]

    # compile + first call
    t0 = time.perf_counter()
    fast0 = nuset_marker_watershed_fast(
        cases[0][1], cases[0][2], cases[0][0], min_score=0.95
    )
    print(f"device compile+first: {time.perf_counter() - t0:.1f} s", flush=True)

    for name, fn in [
        ("host ", nuset_marker_watershed),
        ("device", nuset_marker_watershed_fast),
    ]:
        t0 = time.perf_counter()
        outs = [fn(s, p, m, min_score=0.95) for m, s, p in cases]
        dt = (time.perf_counter() - t0) / len(cases) * 1e3
        print(f"{name}: {dt:7.1f} ms/call", flush=True)
        if name == "host ":
            host_outs = outs
        else:
            for h, d in zip(host_outs, outs):
                agree = (h == d).mean()
                print(f"  agreement vs host: {agree:.5f}", flush=True)


if __name__ == "__main__":
    main()
