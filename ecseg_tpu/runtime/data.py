"""Training data pipeline for the metaseg U-Net.

The reference ships no training code (weights arrive as blobs,
reference README.md:47-49); this framework closes the loop: train on
folders in the SAME on-disk format the inference pipelines produce/consume
(`<inpath>/*.tif` DAPI images + `<inpath>/labels/*.npy` 4-class maps, the
metaseg output contract), so corrected label maps can be fed straight back
as training data.

TPU-first design: every batch is a static-shape (B, 256, 256, 1) uint8 /
(B, 256, 256) int32 pair of random crops with flip augmentation, generated
deterministically from a jax PRNG key (reproducible runs), host-side with
numpy (cheap) and prefetchable.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..core import imgio
from ..ops.meta_post import meta_preprocess

PATCH = 256


def load_training_pairs(inpath: str) -> List[Tuple[np.ndarray, np.ndarray]]:
    """All (image uint8 (H,W), labels int (H,W)) pairs in a metaseg-format
    folder; images without a labels/<name>.npy are skipped."""
    pairs = []
    for path in imgio.get_imgs(inpath):
        head, tail = os.path.split(path)
        lab_path = os.path.join(head, "labels", tail[:-4] + ".npy")
        if not os.path.exists(lab_path):
            continue
        img = meta_preprocess(imgio.imread_rgb(path))
        lab = np.load(lab_path)
        h = min(img.shape[0], lab.shape[0])
        w = min(img.shape[1], lab.shape[1])
        if h < PATCH or w < PATCH:
            continue
        pairs.append((img[:h, :w], lab[:h, :w].astype(np.int32)))
    return pairs


def crop_batches(
    pairs: List[Tuple[np.ndarray, np.ndarray]],
    batch_size: int,
    steps: int,
    seed: int = 0,
    augment: bool = True,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """``steps`` batches of random PATCH^2 crops (+ flips), deterministic in
    ``seed``."""
    if not pairs:
        return
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        xs = np.empty((batch_size, PATCH, PATCH, 1), np.uint8)
        ys = np.empty((batch_size, PATCH, PATCH), np.int32)
        for b in range(batch_size):
            img, lab = pairs[rng.integers(len(pairs))]
            y0 = rng.integers(img.shape[0] - PATCH + 1)
            x0 = rng.integers(img.shape[1] - PATCH + 1)
            xi = img[y0 : y0 + PATCH, x0 : x0 + PATCH]
            yi = lab[y0 : y0 + PATCH, x0 : x0 + PATCH]
            if augment:
                if rng.random() < 0.5:
                    xi, yi = xi[::-1], yi[::-1]
                if rng.random() < 0.5:
                    xi, yi = xi[:, ::-1], yi[:, ::-1]
                k = rng.integers(4)
                xi, yi = np.rot90(xi, k), np.rot90(yi, k)
            xs[b, ..., 0] = xi
            ys[b] = yi
        yield xs, ys
