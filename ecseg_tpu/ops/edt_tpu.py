"""Exact Euclidean distance transform ON DEVICE.

The reference gets EDT from compiled hosts: ``cv2.distanceTransform`` (L1,
reference src/max_flow_binary_mask.py:161) and
``scipy.ndimage.distance_transform_edt`` (marker_watershed.py:83) -- see
SURVEY 2.7.  This is the TPU-native twin, EXACT (not jump-flooding):

  phase 1 (columns): per-pixel vertical distance to the nearest background
  pixel in the same column, via two segmented "distance since last reset"
  scans (log-depth lax.associative_scan), giving g(y, x);

  phase 2 (rows): d2(y, x) = min over x' of g(y, x')^2 + (x - x')^2,
  evaluated as a min-plus reduction over horizontal shifts.  Shifts are
  processed in increasing |offset| inside a lax.while_loop that STOPS once
  offset^2 exceeds the current global maximum of d2 -- no later shift can
  improve any pixel then.  For blob-like biological masks the loop ends
  after ~max-thickness steps, so the cost is proportional to the true
  feature scale, not the image width, while remaining exact for any input.

Conventions match scipy.ndimage.distance_transform_edt: distance from each
NONZERO pixel to the nearest zero pixel; zero pixels get 0.  ``edt_sq_tpu``
returns exact squared distances as int32 (bit-comparable to scipy's
squares); ``edt_tpu`` returns float32 distances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _dist_since_reset(is_reset, axis, reverse):
    """Per-pixel count of steps since the last reset pixel along ``axis``
    (resets get 0; a prefix with no reset gets a large sentinel).  Segmented
    Hillis-Steele formulated as an associative scan over (dist, has_reset)."""
    big = jnp.int32(1 << 20)
    d0 = jnp.where(is_reset, 0, big)
    # (distance, span) monoid: combine((d1,l1),(d2,l2)) = (min(d1+l2, d2),
    # l1+l2) -- d is the distance to the nearest reset looking backwards
    # through the combined span
    ln = jnp.ones_like(d0)

    def comb(a, b):
        d1, l1 = a
        d2, l2 = b
        return jnp.minimum(d1 + l2, d2), l1 + l2

    d, _ = lax.associative_scan(comb, (d0, ln), axis=axis, reverse=reverse)
    return d


def _column_pass(mask):
    """g(y, x): vertical distance to the nearest zero pixel in column x
    (big sentinel if the column has none)."""
    is_zero = jnp.logical_not(mask)
    down = _dist_since_reset(is_zero, axis=0, reverse=False)
    up = _dist_since_reset(is_zero, axis=0, reverse=True)
    return jnp.minimum(down, up)


@jax.jit
def edt_sq_tpu(mask: jnp.ndarray) -> jnp.ndarray:
    """Exact squared EDT (int32) of a binary mask, scipy conventions.

    int32 bounds: valid squared distances are < H^2 + W^2 (~2.1e6 for
    1024^2 images); the no-zero-in-column / no-zero-at-all sentinel is
    2^30, kept clear of overflow (the min-plus add is sentinel + off^2 with
    off^2 <= max(d2) <= 2^30, within int32 range).  The scheme therefore
    requires H^2 + W^2 < 2^30 (each side < ~23170 px) -- beyond that a
    valid distance would collide with the sentinel and sentinel + off^2
    would overflow int32; asserted below rather than silently corrupting."""
    mask = mask.astype(bool)
    H, W = mask.shape
    if H * H + W * W >= 1 << 30:  # static shapes: a plain python check
        raise ValueError(
            f"edt_sq_tpu int32 scheme supports H^2+W^2 < 2^30; got {H}x{W}"
        )
    sent = jnp.int32(1 << 30)
    g = _column_pass(mask)
    g2 = jnp.where(g > (1 << 19), sent, g * g)  # column-without-zero sentinel

    d2 = g2  # offset 0
    big = jnp.full_like(g2, sent)
    pad_l = jnp.concatenate([g2, big], axis=1)  # slice at off -> shift left
    pad_r = jnp.concatenate([big, g2], axis=1)  # slice at W-off -> shift right

    def body(state):
        d2, off = state
        o2 = off * off
        left = lax.dynamic_slice(pad_l, (0, off), (H, W))
        right = lax.dynamic_slice(pad_r, (0, W - off), (H, W))
        d2 = jnp.minimum(d2, jnp.minimum(left, right) + o2)
        return d2, off + 1

    def cond(state):
        d2, off = state
        # a shift of `off` adds off^2; once that exceeds the worst current
        # distance nothing can improve
        return jnp.logical_and(off < W, (off * off) <= jnp.max(d2))

    d2, _ = lax.while_loop(cond, body, (d2, jnp.int32(1)))
    # masks with no zero pixel at all: scipy returns +inf-ish distances; we
    # saturate at the sentinel (callers in this codebase always have bg)
    return jnp.where(mask, jnp.minimum(d2, sent), 0)


@jax.jit
def edt_tpu(mask: jnp.ndarray) -> jnp.ndarray:
    """Exact EDT (float32) of a binary mask -- device twin of
    scipy.ndimage.distance_transform_edt."""
    return jnp.sqrt(edt_sq_tpu(mask).astype(jnp.float32))


@jax.jit
def l1_distance_tpu(mask: jnp.ndarray) -> jnp.ndarray:
    """Exact L1 (cityblock) distance transform -- device twin of
    cv2.distanceTransform(..., DIST_L1, 3) as used by the min-cut center
    detector (reference max_flow_binary_mask.py:161).  Computed by the
    classic two-scan chamfer relaxation expressed as row/column segmented
    scans iterated to fixpoint (L1 relaxation converges in 2 passes)."""
    mask = mask.astype(bool)
    big = jnp.int32(1 << 20)

    def pass_axis(d, axis):
        fwd = lax.associative_scan(
            lambda a, b: (jnp.minimum(a[0] + b[1], b[0]), a[1] + b[1]),
            (d, jnp.ones_like(d)),
            axis=axis,
        )[0]
        bwd = lax.associative_scan(
            lambda a, b: (jnp.minimum(a[0] + b[1], b[0]), a[1] + b[1]),
            (d, jnp.ones_like(d)),
            axis=axis,
            reverse=True,
        )[0]
        return jnp.minimum(fwd, bwd)

    d = jnp.where(mask, big, 0)

    def body(state):
        d, _ = state
        new = pass_axis(pass_axis(d, 0), 1)
        return new, jnp.any(new != d)

    d, _ = lax.while_loop(
        lambda s: s[1], body, (d, jnp.bool_(True))
    )
    return d
