#!/usr/bin/env python3
"""Half-width flagship vs full-width (xl) U-Net: segmentation-quality
evidence for the scored architecture choice (VERDICT r2 item 9).

The scored bench architecture is the half-width net (33 GFLOP/patch); the
reference's metaseg.h5 is likely the full-width classic U-Net (130
GFLOP/patch, bench `xl` line).  FLOP arithmetic alone says nothing about
whether half width LOSES SEGMENTATION QUALITY, so this script trains both
architectures with the training extension (runtime/train) under an
identical budget on synthetic DAPI data -- 4-class fields with the
pipeline's own class semantics (1=nucleus, 2=chromosome, 3=ecDNA) where
class identity depends on shape AND intensity (overlapping ranges, noise,
blur) -- and evaluates held-out full images through the product tiling
path.  Reports per-class IoU / mean IoU / pixel accuracy per arch as JSON
lines; the recorded result lives in the README perf section.

Usage: python scripts/compare_archs.py [--steps 400] [--batch 16]
       python scripts/compare_archs.py --sweep 400,2000,6000

``--sweep`` trains BOTH archs from scratch at each budget on the SAME
synthetic fields and held-out eval set (VERDICT r3 item 7: the 400-step
point alone shows xl undertrained, not where it overtakes half-width),
then prints a markdown IoU-vs-budget table for the README.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_pair(rng, hw=1024):
    """Synthetic DAPI field + 4-class ground truth.  Intensity ranges
    overlap across classes so shape/context carries information."""
    import cv2

    img = (rng.random((hw, hw)) * 55).astype(np.float32)
    lab = np.zeros((hw, hw), np.int32)
    yy, xx = np.mgrid[:hw, :hw].astype(np.float32)

    # nuclei: large ellipses, mid intensity
    for _ in range(6):
        cy, cx = rng.integers(80, hw - 80, 2)
        ry, rx = rng.integers(45, 110, 2)
        th = rng.random() * np.pi
        c, s = np.cos(th), np.sin(th)
        u = (yy - cy) * c + (xx - cx) * s
        v = -(yy - cy) * s + (xx - cx) * c
        m = (u / ry) ** 2 + (v / rx) ** 2 <= 1.0
        img[m] = rng.integers(85, 160) + rng.random(int(m.sum())) * 25
        lab[m] = 1

    # chromosomes: thin rotated bars, higher intensity
    for _ in range(40):
        cy, cx = rng.integers(30, hw - 30, 2)
        L, W = int(rng.integers(18, 48)), int(rng.integers(3, 8))
        th = rng.random() * np.pi
        c, s = np.cos(th), np.sin(th)
        u = (yy - cy) * c + (xx - cx) * s
        v = -(yy - cy) * s + (xx - cx) * c
        m = (np.abs(u) <= L / 2) & (np.abs(v) <= W / 2)
        img[m] = rng.integers(120, 200) + rng.random(int(m.sum())) * 20
        lab[m] = 2

    # ecDNA: small bright dots
    for _ in range(140):
        cy, cx = rng.integers(10, hw - 10, 2)
        r = int(rng.integers(2, 6))
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[m] = rng.integers(150, 250)
        lab[m] = 3

    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    img = np.clip(img + rng.normal(0, 6, img.shape), 0, 255).astype(np.uint8)
    return img, lab


def evaluate(params, eval_pairs, dtype):
    """Held-out full-image eval through the product tiling path."""
    import jax
    import jax.numpy as jnp

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.ops import tiling

    inter = np.zeros(4, np.int64)
    union = np.zeros(4, np.int64)
    correct = total = 0

    @jax.jit
    def fwd(params, patches):
        probs = metaseg_unet.forward(params, patches, dtype=dtype)
        return jnp.argmax(tiling.quantize_u8_jax(probs), -1).astype(jnp.int32)

    for img, lab in eval_pairs:
        _, patches, positions = tiling.im2patches_overlap(img[..., None])
        pred_patches = np.asarray(fwd(params, jnp.asarray(patches)))
        pred = tiling.stitch_labels_host(pred_patches, positions)
        h, w = pred.shape
        gt = lab[:h, :w]
        for c in range(4):
            pi, gi = pred == c, gt == c
            inter[c] += np.count_nonzero(pi & gi)
            union[c] += np.count_nonzero(pi | gi)
        correct += np.count_nonzero(pred == gt)
        total += pred.size
    iou = inter / np.maximum(union, 1)
    return iou, float(correct) / total


def train_arch(arch, train_pairs, eval_pairs, steps, batch, lr, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from ecseg_tpu.runtime.data import crop_batches
    from ecseg_tpu.runtime.train import jit_train_step_on_mesh

    kw = {}
    if arch == "xl":
        kw = dict(
            widths=metaseg_unet.ENC_WIDTHS_XL,
            bottleneck=metaseg_unet.BOTTLENECK_XL,
        )
    params = metaseg_unet.init_params(jax.random.PRNGKey(seed), **kw)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    dtype = jnp.float32
    step_fn, p_shard, _, optimizer = jit_train_step_on_mesh(
        mesh, optax.adam(lr), params_example=params, dtype=dtype
    )
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    t0 = time.perf_counter()
    for step, (x, y) in enumerate(
        crop_batches(train_pairs, batch, steps, seed=seed)
    ):
        x, n = pad_to_multiple(x, n_dev)
        y, _ = pad_to_multiple(y, n_dev)
        valid = np.arange(len(x)) < n
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid)
        )
        if step % 50 == 0 or step == steps - 1:
            print(
                f"[{arch}] step {step:4d} loss {float(loss):.4f}",
                file=sys.stderr, flush=True,
            )
    train_s = time.perf_counter() - t0

    iou, acc = evaluate(params, eval_pairs, dtype)
    return {
        "arch": arch,
        "steps": steps,
        "batch": batch,
        "train_s": round(train_s, 1),
        "iou_bg": round(float(iou[0]), 4),
        "iou_nucleus": round(float(iou[1]), 4),
        "iou_chromosome": round(float(iou[2]), 4),
        "iou_ec": round(float(iou[3]), 4),
        "mean_iou": round(float(iou.mean()), 4),
        "pixel_acc": round(acc, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-train", type=int, default=10)
    ap.add_argument("--n-eval", type=int, default=4)
    ap.add_argument(
        "--sweep",
        help="comma-separated step budgets; trains both archs at each and "
        "prints the IoU-vs-budget markdown table",
    )
    args = ap.parse_args()

    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()

    rng = np.random.default_rng(args.seed)
    print("generating synthetic DAPI fields...", file=sys.stderr, flush=True)
    train_pairs = [synth_pair(rng) for _ in range(args.n_train)]
    eval_pairs = [synth_pair(rng) for _ in range(args.n_eval)]

    budgets = (
        list(dict.fromkeys(int(s.strip()) for s in args.sweep.split(",") if s.strip()))
        if args.sweep
        else [args.steps]
    )
    by_budget = {}
    for steps in budgets:
        results = []
        for arch in ("default", "xl"):
            r = train_arch(
                arch, train_pairs, eval_pairs, steps, args.batch,
                args.lr, args.seed,
            )
            results.append(r)
            print(json.dumps(r), flush=True)
        by_budget[steps] = results
        d, x = results
        print(
            f"\n[{steps} steps] mean IoU: half-width {d['mean_iou']:.4f} vs "
            f"xl {x['mean_iou']:.4f} (gap {x['mean_iou'] - d['mean_iou']:+.4f}); "
            f"ec IoU {d['iou_ec']:.4f} vs {x['iou_ec']:.4f}",
            file=sys.stderr, flush=True,
        )

    if args.sweep:
        print("\n| steps | half mIoU | xl mIoU | half ec IoU | xl ec IoU | "
              "half train s | xl train s |", file=sys.stderr)
        print("|---|---|---|---|---|---|---|", file=sys.stderr)
        for steps, (d, x) in sorted(by_budget.items()):
            print(
                f"| {steps} | {d['mean_iou']:.3f} | {x['mean_iou']:.3f} | "
                f"{d['iou_ec']:.3f} | {x['iou_ec']:.3f} | {d['train_s']:.0f} "
                f"| {x['train_s']:.0f} |",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
