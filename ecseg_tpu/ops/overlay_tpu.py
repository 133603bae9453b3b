"""meta_overlay statistics ON DEVICE: one fused program per image.

The reference computes its 10 colocalization statistics with repeated
skimage labelings plus a python loop per component that rescans the whole
image (reference src/image_tools.py:103-134, meta_overlay.py:70-83) --
O(#components * H * W) host work.  Here every statistic reduces to the
Pallas component labeler plus one scatter:

  count_colocalization(a, b) = #roots of label(a) whose component contains
  a b-pixel -- mark each component's root index from b's pixels (one
  scatter), then count marked roots (one reduction).

All ten statistics for an image run as ONE jitted device program
(:func:`overlay_stats_tpu`), so the per-image host<->device round trip is a
single dispatch.  Counts are exact; the host twins in ops/meta_post.py are
the parity oracles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cc_pallas import label_pallas
from .morphology_tpu import remove_small_objects_tpu
from ..runtime.progcache import cached_jit


def _label_and_roots(mask):
    h, w = mask.shape
    lab = label_pallas(mask, connectivity=2)
    flat = jnp.where(lab.reshape(-1) < 0, h * w, lab.reshape(-1))
    flat_idx = jnp.arange(h * w, dtype=jnp.int32)
    roots = jnp.logical_and(flat == flat_idx, flat < h * w)
    return flat, roots


def count_cc_pair_tpu(mask):
    """(num_components, foreground px) -- device twin of ops.cc.count_cc.

    The reference's ``unique(labels)[1:]`` quirk (empty / all-foreground
    masks give the float ``0.0`` as the second element) is data-independent
    given (num, fg): the pipeline applies it host-side after device_get
    (pipelines/meta_overlay.py ``_cc_pair``), keeping this kernel int-typed.
    """
    flat, roots = _label_and_roots(mask)
    return (
        jnp.sum(roots, dtype=jnp.int32),
        jnp.sum(mask.astype(jnp.int32), dtype=jnp.int32),
    )


def _coloc_from_labels(flat, roots, all_fg, b):
    """Colocalization count from a precomputed labeling (lets one labeling
    serve several b-masks -- label_pallas is a Pallas custom call XLA cannot
    CSE, so repeated labelings of the same mask are real repeated work)."""
    hw = flat.shape[0]
    marks = jnp.zeros(hw + 1, bool).at[
        jnp.where(b.reshape(-1), flat, hw)
    ].set(True)
    n = jnp.sum(jnp.logical_and(roots, marks[:hw]), dtype=jnp.int32)
    return jnp.where(all_fg, 0, n)


def cc_pair_host_quirk(pair, hw: int):
    """Apply count_cc's ``unique(labels)[1:]`` quirk to a device (num, fg)
    pair: an empty or all-foreground mask sums sizes over an empty list, so
    the second element is the float ``0.0`` (np.sum([])) -- string-visible
    in the fish_quantification.csv tuple cells (see ops/cc.count_cc).  Kept
    here, next to the device kernel that produces the pair, so the host and
    device CSV contracts cannot drift independently."""
    num, fg = pair
    if fg == 0 or fg == hw:
        return num, 0.0
    return num, fg


def count_colocalization_tpu(a, b):
    """#components of ``a`` containing >= 1 pixel of ``b`` (device twin of
    ops.meta_post.count_colocalization, incl. the ``unique(labels)[1:]``
    quirk: an all-foreground ``a`` has no background label, so the [1:]
    drops its single component and the host returns 0)."""
    flat, roots = _label_and_roots(a)
    return _coloc_from_labels(flat, roots, jnp.all(a.astype(bool)), b)


def count_HSR_tpu(chrom, fish, hsr_size_threshold):
    """Chromosome components overlapping size-filtered FISH (device twin of
    ops.meta_post.count_HSR; the size filter uses skimage's default
    4-connectivity, matching the host remove_small_objects default)."""
    fish_big = remove_small_objects_tpu(fish, hsr_size_threshold, connectivity=1)
    return count_colocalization_tpu(chrom, fish_big)


@cached_jit
def overlay_stats_tpu(red, green, nuclei, chrom, ec, hsr_size_threshold=20):
    """All ten meta_overlay statistics in one device program
    (reference meta_overlay.py:68-83 dataflow, identical values).

    Returns a dict of int32 scalars/pairs keyed like the host variables.
    """
    red = red.astype(bool)
    green = green.astype(bool)
    fish = jnp.logical_and(green, ~nuclei.astype(bool))
    fish2 = jnp.logical_and(red, ~nuclei.astype(bool))
    nc = ~chrom.astype(bool)
    fish_nc = jnp.logical_and(fish, nc)
    fish2_nc = jnp.logical_and(fish2, nc)
    ec = ec.astype(bool)
    chrom = chrom.astype(bool)

    # one labeling per distinct `a` mask, shared across every statistic
    # that labels it (ec serves 4, chrom and fish_nc 2 each)
    ec_l = (*_label_and_roots(ec), jnp.all(ec))
    fish_nc_l = (*_label_and_roots(fish_nc), jnp.all(fish_nc))
    chrom_l = (*_label_and_roots(chrom), jnp.all(chrom))
    fish2_nc_flat, fish2_nc_roots = _label_and_roots(fish2_nc)

    def px(mask):
        return jnp.sum(mask.astype(jnp.int32), dtype=jnp.int32)

    def hsr(fish_ch):
        big = remove_small_objects_tpu(
            fish_ch, hsr_size_threshold, connectivity=1
        )
        return _coloc_from_labels(*chrom_l, big)

    return {
        "num_ecDNA": (jnp.sum(ec_l[1], dtype=jnp.int32), px(ec)),
        "num_FISH": (jnp.sum(fish_nc_l[1], dtype=jnp.int32), px(fish_nc)),
        "num_ecDNA_FISH": _coloc_from_labels(*ec_l, fish),
        "num_HSR": hsr(fish),
        "num_FISH2": (jnp.sum(fish2_nc_roots, dtype=jnp.int32), px(fish2_nc)),
        "num_FISH_FISH2": _coloc_from_labels(*fish_nc_l, fish2_nc),
        "num_ecDNA_FISH2": _coloc_from_labels(*ec_l, fish2),
        "num_ecDNA_FISH_FISH2": _coloc_from_labels(
            *ec_l, jnp.logical_and(fish2, fish)
        ),
        "num_HSR2": hsr(fish2),
    }
