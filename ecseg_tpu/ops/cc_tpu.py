"""Connected-component labeling ON DEVICE (TPU).

The reference counts ecDNA via host-side ``skimage.measure.label``
(reference src/image_tools.py:114-119) after copying the segmentation back to
the host.  On TPU that host round-trip dominates; instead we label on device
with the classic data-parallel scheme:

  1. every foreground pixel starts with its own flat index as label;
  2. *run propagation*: segmented min-scans along rows and columns
     (``lax.associative_scan`` with a reset at background pixels) spread the
     min label across an entire 4-connected run in one log-depth pass --
     this is what makes convergence fast (O(#bends), not O(diameter));
  3. *diagonal hop*: one 8-neighborhood shift/min (only for
     connectivity=2), pure VPU work;
  4. *pointer jumping*: ``labels = labels[labels]`` -- collapses label chains
     logarithmically (a flat gather);
  5. repeat until fixpoint (``lax.while_loop``).

After convergence every component carries the flat index of its first pixel
in raster order; roots are pixels whose label equals their own index, so the
component count is a single reduction.  Final labels are identical to a
canonical min-index labeling, so downstream on-device reductions (sizes,
colocalization) are exact, and component *counts* match skimage's labeling
exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _neighbor_min(lab: jnp.ndarray, sentinel: jnp.ndarray, connectivity: int):
    """Min label over the 4- or 8-neighborhood, treating out-of-bounds as
    sentinel."""
    p = jnp.pad(lab, 1, constant_values=0)
    p = jnp.where(
        jnp.pad(jnp.ones_like(lab, dtype=bool), 1, constant_values=False),
        p,
        sentinel,
    )
    H, W = lab.shape
    shifts4 = [(0, 1), (1, 0), (2, 1), (1, 2)]
    shifts8 = shifts4 + [(0, 0), (0, 2), (2, 0), (2, 2)]
    shifts = shifts8 if connectivity == 2 else shifts4
    m = lab
    for (dy, dx) in shifts:
        m = jnp.minimum(m, lax.dynamic_slice(p, (dy, dx), (H, W)))
    return m


def _segmented_min_scan(lab, reset, axis, reverse):
    """Prefix-min of ``lab`` along ``axis`` that restarts at ``reset``
    pixels (background): the segmented-scan operator is associative, so this
    lowers to a log-depth lax.associative_scan."""

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), jnp.logical_or(ar, br)

    v, _ = lax.associative_scan(combine, (lab, reset), axis=axis, reverse=reverse)
    return v


@functools.partial(
    jax.jit, static_argnames=("connectivity", "max_iters", "fast_sweeps")
)
def label_tpu(
    mask: jnp.ndarray,
    connectivity: int = 2,
    max_iters: int = 256,
    fast_sweeps: int = 12,
) -> jnp.ndarray:
    """Label a binary mask on device.

    Returns an int32 (H, W) image: background pixels are -1; each component's
    pixels all carry the flat raster index of the component's first pixel.

    Structure (tuned for blob-like biological masks):
      phase A: ``fast_sweeps`` unconditional neighbor-min sweeps -- pure VPU
        shift/min traffic, no reductions, no gathers.  Fully labels every
        component of radius <= fast_sweeps (ecDNA blobs and nuclei at the
        working scale) in one pass over the image per sweep.
      phase B: one path-compression, then a fixpoint loop of segmented
        min-scans (whole runs per pass) + neighbor min + compression that
        only executes if phase A did not converge (snake/labyrinth masks).
    """
    mask = mask.astype(bool)
    H, W = mask.shape
    n = H * W
    sentinel = jnp.int32(n)
    flat_idx = jnp.arange(n, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(mask, flat_idx, sentinel)
    reset = jnp.logical_not(mask)

    def neighbor_sweep(new):
        return jnp.where(mask, _neighbor_min(new, sentinel, connectivity), sentinel)

    def scan_sweep(new):
        # run-level propagation along both axes, both directions
        for axis in (1, 0):
            for reverse in (False, True):
                new = _segmented_min_scan(new, reset, axis, reverse)
        new = jnp.where(mask, new, sentinel)
        if connectivity == 2:
            new = jnp.where(mask, _neighbor_min(new, sentinel, 2), sentinel)
        return new

    def compress(new):
        # full path compression: labels = labels[labels] to fixpoint
        # (pure gathers; each halves the chain depth)
        def c_body(state):
            flat, _ = state
            ext = jnp.concatenate([flat, jnp.array([sentinel])])
            jumped = ext[flat]
            return jumped, jnp.any(jumped != flat)

        flat, _ = lax.while_loop(
            lambda s: s[1], c_body, (new.reshape(-1), jnp.bool_(True))
        )
        return flat.reshape(H, W)

    # phase A
    for _ in range(fast_sweeps):
        lab = neighbor_sweep(lab)

    def body(state):
        lab, _, it = state
        new = scan_sweep(lab)
        new = jnp.where(mask, compress(new), sentinel)
        changed = jnp.any(new != lab)
        return new, changed, it + 1

    def cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < max_iters)

    # phase B entry check: converged iff one more sweep changes nothing
    probe = neighbor_sweep(lab)
    need_b = jnp.any(probe != lab)
    lab, _, _ = lax.while_loop(cond, body, (probe, need_b, jnp.int32(0)))
    return jnp.where(mask, lab, jnp.int32(-1))


@functools.partial(jax.jit, static_argnames=("connectivity",))
def count_cc_tpu(mask: jnp.ndarray, connectivity: int = 2):
    """On-device (num_components, total_foreground_pixels) -- the device
    analog of reference src/image_tools.py:114-119."""
    lab = label_tpu(mask, connectivity=connectivity)
    H, W = mask.shape
    flat_idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    roots = jnp.logical_and(lab >= 0, lab == flat_idx)
    return jnp.sum(roots, dtype=jnp.int32), jnp.sum(
        mask.astype(jnp.int32), dtype=jnp.int32
    )


@functools.partial(jax.jit, static_argnames=("connectivity",))
def component_sizes_tpu(mask: jnp.ndarray, connectivity: int = 2):
    """Per-pixel component size map (size broadcast to every member pixel),
    useful for on-device size thresholding (remove_small_objects analog)."""
    lab = label_tpu(mask, connectivity=connectivity)
    H, W = mask.shape
    n = H * W
    flat_lab = jnp.where(lab.reshape(-1) < 0, n, lab.reshape(-1))
    sizes = jnp.zeros(n + 1, dtype=jnp.int32).at[flat_lab].add(1)
    return jnp.where(lab >= 0, sizes[flat_lab].reshape(H, W), 0)
