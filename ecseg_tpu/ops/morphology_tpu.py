"""Binary morphology ON DEVICE -- the TPU twins of ops/morphology.py.

The reference delegates morphology to skimage/scipy C code
(reference src/image_tools.py:31,64,83; src/nuset_utils/normalization.py:34-36;
src/utils.py:161; src/model_layers/marker_watershed.py:82-83 -- see SURVEY
2.7).  These device implementations are exact twins of the host versions:

  * dilation/erosion with an arbitrary (small) structuring element as a
    stack of shifted ORs/ANDs (pure VPU work, fuses under jit);
  * remove_small_objects / remove_small_holes / fill_holes built on the
    Pallas connected-component labeler (ops/cc_pallas.py) + bincount-style
    scatter-adds;
  * clean_image, the NuSeT mask cleanup (reference normalization.py:25-37).

They engage when a caller wants the whole mask-cleanup chain on device
(e.g. a future full-device NuSeT path); the current pipelines keep the host
twins because their inputs sit on the host either side of the py_func-shaped
watershed/anchor boundaries the reference mandates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cc_pallas import label_pallas


def _shift2d(x, dy: int, dx: int, fill):
    """Shift with ``fill`` entering at the edges (no wrap)."""
    H, W = x.shape
    out = jnp.roll(x, (dy, dx), (0, 1))
    if dy > 0:
        out = out.at[:dy, :].set(fill)
    elif dy < 0:
        out = out.at[dy:, :].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


def _se_offsets(footprint: np.ndarray):
    fp = np.asarray(footprint).astype(bool)
    cy, cx = (np.array(fp.shape) - 1) // 2
    return [(int(y - cy), int(x - cx)) for y, x in np.argwhere(fp)]


def binary_dilation_tpu(mask: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    """OR over the structuring element's offsets (exact twin of
    morphology.binary_dilation for symmetric footprints)."""
    mask = mask.astype(bool)
    out = jnp.zeros_like(mask)
    for dy, dx in _se_offsets(footprint):
        out = jnp.logical_or(out, _shift2d(mask, dy, dx, False))
    return out


def binary_erosion_tpu(mask: jnp.ndarray, footprint: np.ndarray) -> jnp.ndarray:
    # skimage's binary_erosion pads with True (border_value=1), so
    # out-of-bounds neighbors never erode border pixels
    mask = mask.astype(bool)
    out = jnp.ones_like(mask)
    for dy, dx in _se_offsets(footprint):
        out = jnp.logical_and(out, _shift2d(mask, -dy, -dx, True))
    return out


def _component_size_mask(mask, connectivity: int):
    """(labels, per-pixel component size, per-pixel border-touching flag)."""
    h, w = mask.shape
    lab = label_pallas(mask, connectivity=connectivity)  # -1 bg, root idx fg
    flat = jnp.where(lab.reshape(-1) < 0, h * w, lab.reshape(-1))
    sizes = jnp.zeros(h * w + 1, jnp.int32).at[flat].add(1)
    border = jnp.zeros((h, w), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    on_border = jnp.zeros(h * w + 1, bool).at[
        jnp.where(border.reshape(-1), flat, h * w)
    ].set(True)
    return lab, sizes[flat].reshape(h, w), on_border[flat].reshape(h, w)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def remove_small_objects_tpu(
    mask: jnp.ndarray, min_size, connectivity: int = 1
) -> jnp.ndarray:
    """skimage semantics: components with fewer than ``min_size`` pixels are
    removed (twin of morphology.remove_small_objects)."""
    mask = mask.astype(bool)
    _, size_map, _ = _component_size_mask(mask, connectivity)
    return jnp.logical_and(mask, size_map >= jnp.asarray(min_size))


@functools.partial(jax.jit, static_argnames=("connectivity",))
def remove_small_holes_tpu(
    mask: jnp.ndarray, area_threshold, connectivity: int = 2
) -> jnp.ndarray:
    """Twin of morphology.remove_small_holes (skimage semantics): complement,
    remove objects with size < area_threshold + 1, complement back.  Note
    border-touching background components count as holes too -- exactly as
    the host/skimage version behaves."""
    mask = mask.astype(bool)
    bg = jnp.logical_not(mask)
    _, size_map, _ = _component_size_mask(bg, connectivity)
    holes = jnp.logical_and(size_map < jnp.asarray(area_threshold) + 1, bg)
    return jnp.logical_or(mask, holes)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def binary_fill_holes_tpu(mask: jnp.ndarray, connectivity: int = 1) -> jnp.ndarray:
    """Fill every background component not connected to the border (twin of
    scipy.ndimage.binary_fill_holes, whose default structure is
    4-connected).  The 4-connected case runs as a single border-flood
    Pallas fixpoint (no labeling, no scatter)."""
    mask = mask.astype(bool)
    bg = jnp.logical_not(mask)
    if connectivity == 1:
        from .cc_pallas import flood_from_border_pallas

        reachable = flood_from_border_pallas(bg)
        return jnp.logical_or(mask, jnp.logical_and(bg, ~reachable))
    _, _, border_map = _component_size_mask(bg, connectivity)
    return jnp.logical_or(mask, jnp.logical_and(bg, ~border_map))


@jax.jit
def clean_image_tpu(mask: jnp.ndarray) -> jnp.ndarray:
    """Device twin of ops/normalization.clean_image
    (reference normalization.py:25-37): remove objects and holes smaller than
    mean_area/5; returns uint8 {0, 1}."""
    mask = mask.astype(bool)
    h, w = mask.shape
    lab = label_pallas(mask, connectivity=1)
    flat_idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    num = jnp.sum(jnp.logical_and(lab >= 0, lab == flat_idx), dtype=jnp.int32)
    total = jnp.sum(mask, dtype=jnp.int32)

    # The thresholds are evaluated EXACTLY in int32 (quotient/remainder of
    # total by 5*num) rather than in f32: jax x64 is off, and f32's ~2^-23
    # relative error on mean_area/5 can flip threshold-adjacent component
    # sizes vs the host's float64 chain.  The integer forms below are
    # provably equivalent to the host comparisons INCLUDING exact ties
    # (a tie makes the host's divisions exact, so both sides agree):
    #   keep  object:  size >= total/(5*num)   <=>  size > k or (== k, r == 0)
    #   fill  hole:    size <  total/(5*num)+1 <=>  size-1 < k or (== k, r > 0)
    # where total = k*(5*num) + r.  num == 0 degenerates to keep-all/fill-none,
    # matching the host short-circuits.
    d = jnp.maximum(5 * num, 1)
    k = total // d
    r = total % d

    _, size_map, _ = _component_size_mask(mask, 2)
    kept = jnp.logical_and(
        mask,
        jnp.logical_or(
            size_map > k, jnp.logical_and(size_map == k, r == 0)
        ),
    )
    # remove_small_holes(area_threshold=mean/5): fill bg comps with
    # size < mean/5 + 1, border-touching included (skimage semantics)
    bg = jnp.logical_not(kept)
    _, bg_size, _ = _component_size_mask(bg, 2)
    holes = jnp.logical_and(
        bg,
        jnp.logical_or(
            bg_size - 1 < k, jnp.logical_and(bg_size - 1 == k, r > 0)
        ),
    )
    return jnp.logical_or(kept, holes).astype(jnp.uint8)
