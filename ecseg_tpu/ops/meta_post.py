"""metaseg post-processing analytics (host side, exact-parity).

Reproduces reference src/image_tools.py:15-134 operation-for-operation,
including its quirks, because the output of this chain IS the public
``labels/<name>.npy`` artifact:

- ``merge_comp``'s label loop runs ``range(1, num_features)`` and therefore
  skips the last component (image_tools.py:27) -- replicated;
- the metaphase-center test's two clauses both reduce to
  ``left and bottom and right and top`` (image_tools.py:80) -- replicated;
- ``size_thresh`` computes the ecDNA region list *before* converting small
  chromosomes to ecDNA, so converted pixels are not size-filtered
  (image_tools.py:50-58) -- replicated;
- ``np.mean([])`` of an empty region list yields NaN, making every
  comparison False (no removal) -- replicated via np.mean semantics.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage as ndi

from . import morphology as morph
from .cc import label as cc_label, regionprops

NUM_CLASSES = 4
EC_SIZE_THRESHOLD = 15  # reference src/image_tools.py:13


def _merge_comp(img: np.ndarray, class_id: int = 2) -> np.ndarray:
    """If ecDNA touches chromosome/nuclei, mark the whole 8-connected
    component as that class (reference src/image_tools.py:18-33)."""
    mask_id = 1
    if class_id == 1:
        mask_id = 2
    temp = img == mask_id
    img[temp] = 0
    s = ndi.generate_binary_structure(2, 2)
    labeled_array, num_features = ndi.label(img, structure=s)
    # Vectorized form of the reference's per-component loop
    # (``for i in range(1, num_features): if any(img[lab==i]==class_id):
    # img[lab==i]=class_id``): components are disjoint, so each iteration
    # only reads pixels no other iteration writes -- the loop is exactly a
    # per-label "touches class_id" map.  The reference's off-by-one (the
    # last label is skipped) is preserved by excluding ``num_features``.
    touching = np.unique(labeled_array[img == class_id])
    lut = np.zeros(num_features + 1, dtype=bool)
    lut[touching] = True
    lut[0] = False
    if num_features >= 1:
        lut[num_features] = False  # reference off-by-one: last label skipped
    img[lut[labeled_array]] = class_id
    img[morph.opening(img, morph.diamond(1)) == class_id] = class_id
    img[temp] = mask_id
    return img


def _fill_holes(img: np.ndarray, class_id: int) -> np.ndarray:
    temp = morph.binary_fill_holes(img == class_id)
    img[temp] = class_id
    return img


def _size_thresh(img: np.ndarray) -> np.ndarray:
    nuc_regs = regionprops(cc_label(img == 1))
    chrom_regs = regionprops(cc_label(img == 2))
    avg_chrom_size = np.mean([c.area for c in chrom_regs]) if chrom_regs else np.nan
    for r in nuc_regs:
        if r.area < avg_chrom_size:
            r.write(img, 0)

    chrom_regs = regionprops(cc_label(img == 2))
    ec_regs = regionprops(cc_label(img == 3))
    avg_ec_size = np.mean([c.area for c in ec_regs]) if ec_regs else np.nan
    for r in chrom_regs:
        if r.area < avg_ec_size:
            r.write(img, 3)

    for r in ec_regs:  # stale list (pre-conversion), as in the reference
        if r.area < EC_SIZE_THRESHOLD:
            r.write(img, 0)
    return img


def meta_inference(img: np.ndarray) -> np.ndarray:
    """Full post-processing chain (reference src/image_tools.py:15-84).
    ``img`` is the argmaxed 4-class label map; modified in place and
    returned."""
    img = _fill_holes(_fill_holes(img, 1), 2)
    img = _size_thresh(img)
    d1 = morph.diamond(1)
    img[
        morph.binary_dilation(img == 3, d1) ^ morph.binary_erosion(img == 3, d1)
    ] = 0

    chrom_regs = regionprops(cc_label(img == 2))
    nuc_regs = regionprops(cc_label(img == 1))
    c_y = np.array([c.centroid[0] for c in chrom_regs])
    c_x = np.array([c.centroid[1] for c in chrom_regs])
    n_cent = [n.centroid for n in nuc_regs]

    min_chrom_count = 5
    v = 70
    for idx, n in enumerate(n_cent):
        left = len(np.where((c_x > n[1]) & (c_x < n[1] + v))[0]) > min_chrom_count
        right = len(np.where((c_x < n[1]) & (c_x > n[1] - v))[0]) > min_chrom_count
        bottom = len(np.where((c_y < n[0]) & (c_y > n[0] - v))[0]) > min_chrom_count
        top = len(np.where((c_y > n[0]) & (c_y < n[0] + v))[0]) > min_chrom_count
        if (left * bottom & right * top) or (bottom * right & top * left):
            nuc_regs[idx].write(img, 0)

    img = _merge_comp(_merge_comp(img, 1), 2)
    img[morph.binary_dilation(img == 3, morph.diamond(1))] = 3
    return img


def meta_preprocess(img: np.ndarray) -> np.ndarray:
    """uint16 -> uint8, blue channel extraction, background-polarity fix
    (reference src/image_tools.py:86-96)."""
    import cv2

    from ..core.imgio import u16_to_u8

    img = u16_to_u8(img)
    if img.ndim > 2:
        img = img[:, :, 2]
    img = np.ascontiguousarray(img)
    _, th3 = cv2.threshold(img, 0, 1, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    if np.sum(th3) > img.shape[0] * img.shape[1] * 0.5:
        img = ~img
    return img


def count_HSR(chrom: np.ndarray, fish: np.ndarray, hsr_size_threshold: int) -> int:
    """Chromosome components overlapping >= 1 px of (size-filtered) FISH
    (reference src/image_tools.py:103-112)."""
    fish = morph.remove_small_objects(fish, hsr_size_threshold)
    chrom_labels = cc_label(chrom)
    return _count_overlapping_labels(chrom_labels, fish)


def count_colocalization(ob1: np.ndarray, ob2: np.ndarray) -> int:
    """Components of ob1 overlapping >= 1 px of ob2
    (reference src/image_tools.py:126-134)."""
    labels = cc_label(ob1)
    return _count_overlapping_labels(labels, ob2)


def _count_overlapping_labels(labels: np.ndarray, other: np.ndarray) -> int:
    """Labels from ``np.unique(labels)[1:]`` with >= 1 px of boolean mask
    ``other`` -- one pass instead of the reference's per-label image rescan
    (``np.sum((labels == r) * other) >= 1``, identical for the boolean/uint
    masks every call site passes).  ``[1:]`` drops the first unique value
    whatever it is (reference src/image_tools.py:108,131) -- replicated."""
    other = np.asarray(other)
    # The >=1-px equivalence only holds for boolean/integer masks; a float
    # mask in (0,1) would need the reference's weighted sum to reach 1.
    assert other.dtype == bool or np.issubdtype(other.dtype, np.integer), (
        f"_count_overlapping_labels requires a bool/integer mask, got {other.dtype}"
    )
    candidates = np.unique(labels)[1:]
    overlapped = np.unique(labels[np.asarray(other) != 0])
    return int(np.isin(candidates, overlapped).sum())


def intensity_metrics(I: np.ndarray) -> Tuple[float, float]:
    """(mean of nonzero, max) (reference src/image_tools.py:121-124)."""
    nz = I[I != 0]  # same raster-order selection as I[np.nonzero(I)]
    avg = np.mean(nz) if nz.size else np.nan
    return avg, np.max(I)
