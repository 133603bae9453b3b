#!/usr/bin/env python3
"""Quantify the NuSeT fast-watershed (ops/watershed_tpu) divergence from the
host parity path (ops/watershed) on randomized realistic masks.

The fast path is a minimax-path flood; it matches the host priority-flood
wherever the assignment is unique and may differ only on EXACT ridge ties
(reference src/model_layers/marker_watershed.py:84 runs skimage's
insertion-age ordered flood).  This script measures, over N random
touching-nuclei fields at the stat_fish pass-2 geometry:

  * per-image pixel agreement fast vs host (and the min across images);
  * the fraction of images with ANY divergence;
  * the tie-pixel PROXY: pixels whose fast-path decision flips when marker
    ids are permuted (count_ties=True) -- the exact set of order-dependent
    pixels, measurable without the host path;
  * how divergence compares to the proxy (divergent pixels should be a
    subset of tie-adjacent regions).

Runs on CPU or TPU (the fast pass is plain XLA).  Usage:
    python scripts/quantify_watershed_divergence.py [N]

Recorded result (N=24, CPU, seed 0, lexicographic flood + host-exact
deterministic line rules), also in README:
    pixel agreement: mean=0.998382 min=0.997207
    images with any divergence: 24/24 (100%)
    divergent px: 14644 / 1099666 foreground (1.3317%)
    tie px (order-dependence proxy): 1648 (0.1499% of foreground)
The proxy undercounts host divergence ~9x: the flood also breaks minimax
ties by propagation geometry (permutation-stable), and those can still
differ from skimage's insertion-age order.  Divergence is confined to
inter-nucleus ridge lines; nucleus COUNTS and marker placement are shared
with the parity path.  NOTE: at this density (~40 touching nuclei) genuine
age-dependent ties are pervasive, which is why the SOUND per-image gate
(ECSEG_FAST_WATERSHED=auto, ops/watershed_tpu.nuset_marker_watershed_auto)
exists: it keeps the device result only when the image has NO
order-dependent decision, and recomputes on host otherwise -- byte parity
always, device speed on tie-free images (tests/test_watershed_auto.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_case(rng, H=614, W=614, n=40):
    """Touching-nuclei blob field at the 0.3-rescaled stat_fish geometry
    (same generator as scripts/profile_fast_watershed.py)."""
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rng = np.random.default_rng(0)

    agreements, tie_fracs, div_images = [], [], 0
    tot_px = tot_div = tot_tie = 0
    for k in range(n):
        pred, scores, props = make_case(rng)
        host = nuset_marker_watershed(scores, props, pred, min_score=0.95)
        fast, tie_px = nuset_marker_watershed_fast(
            scores, props, pred, min_score=0.95, count_ties=True
        )
        fg = int(np.count_nonzero(pred))
        div = int(np.count_nonzero(host != fast))
        agreements.append(1.0 - div / host.size)
        tie_fracs.append(tie_px / max(fg, 1))
        div_images += div > 0
        tot_px += fg
        tot_div += div
        tot_tie += tie_px
        print(
            f"case {k:2d}: fg={fg:7d} divergent_px={div:5d} "
            f"tie_px(proxy)={tie_px:5d} agreement={agreements[-1]:.6f}",
            flush=True,
        )

    print()
    print(f"cases: {n} @ 614x614, ~40 touching nuclei each")
    print(
        f"pixel agreement: mean={np.mean(agreements):.6f} "
        f"min={np.min(agreements):.6f}"
    )
    print(
        f"images with any divergence: {div_images}/{n} "
        f"({100.0 * div_images / n:.0f}%)"
    )
    print(
        f"divergent px: {tot_div} / {tot_px} foreground "
        f"({100.0 * tot_div / tot_px:.4f}%)"
    )
    print(
        f"tie px (order-dependence proxy): {tot_tie} "
        f"({100.0 * tot_tie / tot_px:.4f}% of foreground; "
        f"per-image mean {np.mean(tie_fracs) * 100:.4f}%)"
    )


if __name__ == "__main__":
    main()
