"""Connected-component labeling and region properties (host side).

Replaces the reference's ``skimage.measure.label`` / ``regionprops`` /
``scipy.ndimage.label`` calls (reference src/image_tools.py:26,42-58,114-119,
src/stat_fish.py:135,224, src/max_flow_binary_mask.py:145,204).

skimage's ``label`` default connectivity for 2-D images is full (8-connected);
``connectivity=1`` is 4-connected.  Both map onto ``scipy.ndimage.label`` with
the matching binary structure, which assigns labels in the same
first-raster-encounter order.

For the on-device (TPU) labeling used by the throughput path see
:mod:`ecseg_tpu.ops.cc_tpu`.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
from scipy import ndimage as ndi


def label(
    image: np.ndarray,
    connectivity: Optional[int] = None,
    return_num: bool = False,
    background: int = 0,
):
    """skimage.measure.label-compatible labeling.

    ``connectivity=None`` means full connectivity (8-connected in 2-D), which
    is skimage's default and what every un-annotated ``measure.label`` call in
    the reference relies on.
    """
    image = np.asarray(image)
    if connectivity is None:
        connectivity = image.ndim
    structure = ndi.generate_binary_structure(image.ndim, connectivity)
    if background != 0:
        # skimage semantics: `background` pixels are background, every OTHER
        # value (including 0) is a regular foreground value, still labeled
        # value-aware.  Shift to make background 0 while keeping distinct
        # values distinct and nonzero; collapsing with `!= background` would
        # wrongly merge adjacent distinct-valued components.
        image = np.where(
            image == background, 0, image.astype(np.int64) - int(image.min()) + 1
        )
    # skimage labels *any* nonzero region; for multi-valued inputs it labels
    # each distinct value's components separately.  All reference call sites
    # pass binary or effectively-binary inputs except merge_comp
    # (image_tools.py:26), which labels a multi-class image with scipy
    # directly -- scipy treats any nonzero as foreground, so we match scipy
    # here and expose skimage's value-aware variant as label_multivalue.
    # The multivalue check runs FIRST so the common binary case pays one
    # labeling and no full-image unique sort.
    if _needs_multivalue(image):
        labels, num = _label_multivalue(image, structure)
    else:
        labels, num = ndi.label(image != 0, structure=structure)
    if return_num:
        return labels, num
    return labels


def _needs_multivalue(image: np.ndarray) -> bool:
    """>= 2 distinct nonzero values?  Comparison passes only -- np.unique is
    a full-image sort, too slow for hot host calls (CLAUDE.md)."""
    if image.dtype == bool or image.size == 0:
        return False
    mx = image.max()
    if image.min() < 0:
        return True  # negative values: rare; take the general path
    if mx == 0:
        return False
    return bool(np.any(np.logical_and(image != 0, image != mx)))


def _label_multivalue(image: np.ndarray, structure: np.ndarray):
    """skimage semantics for non-binary input: pixels of different values are
    never merged into one component."""
    out = np.zeros(image.shape, dtype=np.int64)
    next_label = 0
    for v in np.unique(image):
        if v == 0:
            continue
        lab, n = ndi.label(image == v, structure=structure)
        out[lab > 0] = lab[lab > 0] + next_label
        next_label += n
    # Relabel into first-encounter raster order to match skimage numbering.
    flat = out.ravel()
    nz = np.flatnonzero(flat)
    vals = flat[nz]
    uniq, first_idx = np.unique(vals, return_index=True)
    rank = np.empty(uniq.size, dtype=np.int64)
    rank[np.argsort(first_idx)] = np.arange(1, uniq.size + 1)
    order = np.zeros(next_label + 1, dtype=np.int64)
    order[uniq] = rank
    return order[out], next_label


def scipy_label(image: np.ndarray, connectivity: int = 1):
    """Direct scipy.ndimage.label equivalent (4-connected by default), as used
    at reference src/stat_fish.py:135 (count_blobs)."""
    structure = ndi.generate_binary_structure(2, connectivity)
    return ndi.label(image, structure=structure)


@dataclasses.dataclass
class Region:
    """Subset of skimage.measure.regionprops used by the reference pipelines:
    area, bbox, centroid, coords, slice, label."""

    label: int
    slice: Tuple[slice, slice]
    area: int
    _labels: np.ndarray = dataclasses.field(repr=False)

    @property
    def _mask(self) -> np.ndarray:
        return self._labels[self.slice] == self.label

    @property
    def bbox(self) -> Tuple[int, int, int, int]:
        sy, sx = self.slice
        return (sy.start, sx.start, sy.stop, sx.stop)

    @property
    def centroid(self) -> Tuple[np.float64, np.float64]:
        # numpy scalars, not python floats: skimage returns numpy scalars
        # and the reference's metaphase heuristic depends on the reflected
        # comparison `list > np.float64` broadcasting
        # (reference src/image_tools.py:75-78).
        # Computed by exact integer row/column-count reductions rather than
        # np.nonzero + mean: coordinate sums stay far below 2^53, so the
        # float64 division equals skimage's mean-of-coordinates bit-for-bit,
        # and this host's numpy runs nonzero ~300x slower than reductions.
        # The slice offset is folded into the INTEGER sum before the one
        # division: fl(ysum/n) + start double-rounds and can differ from
        # skimage's fl((ysum + n*start)/n) by 1 ulp (counterexample:
        # n=2519, ysum=4584346, start=3976).
        m = self._mask
        sy, sx = self.slice
        n = int(m.sum(dtype=np.int64))
        row_counts = m.sum(axis=1, dtype=np.int64)
        col_counts = m.sum(axis=0, dtype=np.int64)
        ysum = int((row_counts * np.arange(m.shape[0], dtype=np.int64)).sum())
        xsum = int((col_counts * np.arange(m.shape[1], dtype=np.int64)).sum())
        return (
            np.float64((ysum + n * sy.start) / n),
            np.float64((xsum + n * sx.start) / n),
        )

    @property
    def coords(self) -> np.ndarray:
        ys, xs = np.nonzero(self._mask)
        sy, sx = self.slice
        return np.stack([ys + sy.start, xs + sx.start], axis=1)

    def write(self, img: np.ndarray, value) -> None:
        """``img[tuple(self.coords.T)] = value`` without materializing
        coords (np.nonzero is pathologically slow on this host's numpy;
        boolean-mask assignment is not)."""
        img[self.slice][self._mask] = value

    def __getitem__(self, key: str):
        # regionprops dict-style access used at reference
        # src/model_layers/anchor_size.py:25 and marker_watershed.py:70-73.
        if key == "BoundingBox":
            return self.bbox
        if key == "Area":
            return self.area
        raise KeyError(key)


def regionprops(labels: np.ndarray) -> List[Region]:
    """Region list ordered by ascending label (skimage ordering).

    The bbox is tightened to the actual component extent, exactly like
    skimage (scipy.ndimage.find_objects already returns tight slices).
    """
    labels = np.asarray(labels)
    if labels.dtype == bool:
        raise TypeError("labels must be an integer label image, not a mask")
    objects = ndi.find_objects(labels)
    # unmasked bincount: label 0 lands in counts[0], which is never read
    # (masking first costs a slow fancy-index copy on this host's numpy)
    counts = np.bincount(labels.ravel())
    regions: List[Region] = []
    for i, sl in enumerate(objects, start=1):
        if sl is None:
            continue
        regions.append(
            Region(label=i, slice=sl, area=int(counts[i]), _labels=labels)
        )
    return regions


def count_cc(mask: np.ndarray):
    """(number of components, total foreground pixels); the 2-tuple is the
    reference's exact return shape (reference src/image_tools.py:114-119).

    The reference sums component sizes over ``np.unique(labels)[1:]`` -- it
    drops the *smallest present* label, not label 0.  On an empty mask that
    leaves no sizes and ``np.sum([])`` is the float ``0.0``; on an
    all-foreground mask label 1 itself is dropped, again giving ``0.0``.
    These tuples are stored verbatim in fish_quantification.csv cells
    (reference meta_overlay.py:70-71,79), so the float-vs-int distinction is
    string-visible and must be preserved.
    """
    labels, num = label(mask, return_num=True)
    counts = np.bincount(labels.ravel())
    present = np.flatnonzero(counts)  # == np.unique(labels), sorted
    sizes = counts[present[1:]]  # reference's unique[1:]: drop the smallest
    if sizes.size == 0:
        return num, 0.0  # np.sum([]) in the reference
    return num, int(sizes.sum())
