#!/usr/bin/env python3
"""Write deterministic demo weights for every model the pipelines load.

    python scripts/make_demo_weights.py [--model-dir models]
                                        [--interseg-dir interseg_models]

Produces:
  models/metaseg.npz          -> picked up by `make metaseg`
  models/nuset.npz            -> picked up by `make stat_fish`
  interseg_models/interseg.npz, interseg_models/ecseg_c.npz
                              -> picked up by `make interseg`

The reference's trained blobs are downloaded from Mendeley and are not in
the repo; these crafted weights make every pipeline produce non-empty,
reproducible output on synthetic data (see ecseg_tpu/models/demo.py).
Drop in real converted weights (scripts/convert_tf1_ckpt.py /
convert_savedmodel.py or a metaseg.h5) to override them.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_demo_inputs() -> None:
    """Synthetic example inputs for any missing example files: a metaphase
    RGB tif for metaseg/meta_overlay and an interphase BGR tif (3 nuclei,
    in-nucleus red FISH foci + diffuse signal, one green centromere spot
    each) for stat_fish/interseg/fish_distance."""
    import cv2
    import numpy as np

    os.makedirs("example_interSeg", exist_ok=True)
    path = os.path.join("example_interSeg", "cells.tif")
    if not os.path.exists(path):
        rng = np.random.default_rng(5)
        img = (rng.random((512, 640, 3)) * 2000).astype(np.uint16)
        yy, xx = np.mgrid[0:512, 0:640]
        for (y, x) in [(100, 120), (260, 300), (380, 480)]:
            inside = (yy - y) ** 2 + (xx - x) ** 2 < 45**2
            img[..., 0][inside] = 40000  # DAPI (cv2 BGR: blue)
            img[..., 2][inside] = 15000  # diffuse red (passes interseg gate)
            for dy, dx in [(-12, -8), (6, 14), (15, -15)]:
                img[y + dy - 2 : y + dy + 2, x + dx - 2 : x + dx + 2, 2] = 60000
            img[y - 4 : y, x - 18 : x - 14, 1] = 60000  # green centromere
        cv2.imwrite(path, img)
        print("wrote", path)

    os.makedirs("example_ecSeg", exist_ok=True)
    path = os.path.join("example_ecSeg", "input.tif")
    if not os.path.exists(path):
        rng = np.random.default_rng(11)
        rgb = (rng.random((700, 900, 3)) * 12).astype(np.uint8)
        rgb[100:260, 120:300, 2] = 203  # DAPI blob (blue in RGB read)
        rgb[150:170, 400:430, 0] = 235  # red FISH
        rgb[300:330, 500:540, 1] = 235  # green FISH
        cv2.imwrite(path, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        print("wrote", path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="models")
    ap.add_argument("--interseg-dir", default="interseg_models")
    ap.add_argument(
        "--no-inputs",
        action="store_true",
        help="skip generating missing example_* input images",
    )
    ap.add_argument(
        "--force",
        action="store_true",
        help="overwrite existing .npz weight files (by default existing "
        "weights -- e.g. real converted checkpoints -- are left untouched)",
    )
    args = ap.parse_args(argv)

    from ecseg_tpu.models import demo
    from ecseg_tpu.models.keras_import import save_npz_pytree

    if not args.no_inputs:
        _write_demo_inputs()
    os.makedirs(args.model_dir, exist_ok=True)
    os.makedirs(args.interseg_dir, exist_ok=True)

    def _write(out, tree_fn):
        # never silently clobber real converted weights (convert_tf1_ckpt.py
        # et al. write to these exact paths) with toy demo weights
        if os.path.exists(out) and not args.force:
            print("kept existing", out, "(use --force to overwrite)")
            return
        save_npz_pytree(out, tree_fn())
        print("wrote", out)

    _write(os.path.join(args.model_dir, "metaseg.npz"), demo.demo_metaseg_params)
    _write(os.path.join(args.model_dir, "nuset.npz"), demo.demo_nuset_tree)
    _write(os.path.join(args.interseg_dir, "interseg.npz"), demo.demo_ecseg_i_params)
    _write(os.path.join(args.interseg_dir, "ecseg_c.npz"), demo.demo_ecseg_c_params)
    return 0


if __name__ == "__main__":
    sys.exit(main())
