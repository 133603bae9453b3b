"""Overlap tiling and seam-aware stitching.

Reproduces the reference's axondeepseg-derived patch logic exactly
(reference src/image_tools.py:148-252), including its asymmetric rim-copy
branches (the ``L_pos[i][1] != h_l`` axis mix-up at image_tools.py:242 is
replicated bug-for-bug, as stitched borders feed the argmax that defines the
public seg.npy output).

Two implementations are provided:

- host (numpy) -- the parity reference, byte-exact;
- device (JAX) -- a static-shape batched stitcher used by the TPU pipeline;
  for any fixed image geometry it produces outputs identical to the host
  version (covered by tests), while keeping the whole patch batch on device.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

OVERLAP = 25
SCW = 256  # context window (model input) size
NUM_CLASSES = 4


def patch_positions(
    height: int, width: int, overlap_value: int = OVERLAP, scw: int = SCW
) -> List[Tuple[int, int]]:
    """Prediction-window positions for an image of the given size
    (reference src/image_tools.py:156-178)."""
    ch = height - 2 * overlap_value  # cropped height
    cw = width - 2 * overlap_value
    spw = scw - 2 * overlap_value

    qh, rh = divmod(ch, spw)
    qw, rw = divmod(cw, spw)

    L_h = [spw * e for e in range(qh)]
    L_w = [spw * e for e in range(qw)]
    if rh != 0:
        L_h.append(ch - spw)
    if rw != 0:
        L_w.append(cw - spw)

    xx, yy = np.meshgrid(L_h, L_w)
    P = [np.ravel(xx), np.ravel(yy)]
    return [(int(P[0][i]), int(P[1][i])) for i in range(len(P[0]))]


def im2patches_overlap(
    img: np.ndarray, overlap_value: int = OVERLAP, scw: int = SCW
):
    """Slice ``img`` (H, W[, C]) into scw x scw patches at the overlap
    positions (reference src/image_tools.py:148-186).

    Returns ``(img, patches, positions)`` where ``patches`` is a stacked
    array of shape (N, scw, scw[, C]).
    """
    pos = patch_positions(img.shape[0], img.shape[1], overlap_value, scw)
    patches = np.stack([img[y : y + scw, x : x + scw] for (y, x) in pos])
    return img, patches, pos


def patches2im_overlap(
    patches: Sequence[np.ndarray],
    positions: Sequence[Tuple[int, int]],
    overlap_value: int = OVERLAP,
    scw: int = SCW,
) -> np.ndarray:
    """Stitch per-patch predictions into one float canvas, byte-exact with
    reference src/image_tools.py:188-252.

    ``patches``: (N, scw, scw, C) predictions.  Returns (h_l+scw, w_l+scw, C).
    """
    ov = overlap_value
    spw = scw - 2 * ov
    L_pos = [list(p) for p in positions]
    h_l, w_l = np.max(np.stack(L_pos), axis=0)
    nch = patches[0].shape[-1]
    new_img = np.zeros((h_l + scw, w_l + scw, nch), dtype=np.float64)

    for i, e in enumerate(patches):
        if L_pos[i][0] == 0:
            if L_pos[i][1] == 0:
                new_img[0:ov, 0:ov] = e[0:ov, 0:ov]
                new_img[ov : scw - ov, 0:ov] = e[ov:-ov, 0:ov]
                new_img[0:ov, ov : scw - ov] = e[0:ov, ov:-ov]
            else:
                if L_pos[i][1] == w_l:
                    new_img[0:ov, -ov:] = e[0:ov, -ov:]
                new_img[0:ov, L_pos[i][1] + ov : L_pos[i][1] + scw - ov] = e[
                    0:ov, ov:-ov
                ]

        if L_pos[i][1] == 0:
            if L_pos[i][0] != 0:
                new_img[L_pos[i][0] + ov : L_pos[i][0] + scw - ov, 0:ov] = e[
                    ov:-ov, 0:ov
                ]

        if L_pos[i][0] == h_l:
            if L_pos[i][1] == w_l:
                new_img[-ov:, -ov:] = e[-ov:, -ov:]
                new_img[h_l + ov : -ov, -ov:] = e[ov:-ov, -ov:]
                new_img[-ov:, w_l + ov : -ov] = e[-ov:, ov:-ov]
            else:
                if L_pos[i][1] == 0:
                    new_img[-ov:, 0:ov] = e[-ov:, 0:ov]
                new_img[-ov:, L_pos[i][1] + ov : L_pos[i][1] + scw - ov] = e[
                    -ov:, ov:-ov
                ]

        # NOTE: the reference compares the *column* position to h_l here
        # (image_tools.py:242); replicated as-is for parity.
        if L_pos[i][1] == w_l:
            if L_pos[i][1] != h_l:
                new_img[L_pos[i][0] + ov : L_pos[i][0] + scw - ov, -ov:] = e[
                    ov:-ov, -ov:
                ]

    for i, e in enumerate(patches):
        y = L_pos[i][0] + ov
        x = L_pos[i][1] + ov
        new_img[y : y + spw, x : x + spw] = e[ov:-ov, ov:-ov]

    return new_img


# ---------------------------------------------------------------------------
# Device (JAX) path
# ---------------------------------------------------------------------------


def _stitch_plan(positions, overlap_value, scw, h_l, w_l):
    """Precompute the exact (src_slice -> dst_slice) copy list the host
    stitcher performs, as static data for the JAX stitcher."""
    ov = overlap_value
    spw = scw - 2 * ov
    copies = []  # (patch_idx, src_y0, src_x0, dst_y0, dst_x0, sh, sw)
    H = h_l + scw
    W = w_l + scw

    def add(i, src_y, src_x, dst_y, dst_x, sh, sw):
        if sh > 0 and sw > 0:
            copies.append((i, src_y, src_x, dst_y, dst_x, sh, sw))

    for i, (py, px) in enumerate(positions):
        if py == 0:
            if px == 0:
                add(i, 0, 0, 0, 0, ov, ov)
                add(i, ov, 0, ov, 0, scw - 2 * ov, ov)
                add(i, 0, ov, 0, ov, ov, scw - 2 * ov)
            else:
                if px == w_l:
                    add(i, 0, scw - ov, 0, W - ov, ov, ov)
                add(i, 0, ov, 0, px + ov, ov, scw - 2 * ov)
        if px == 0 and py != 0:
            add(i, ov, 0, py + ov, 0, scw - 2 * ov, ov)
        if py == h_l:
            if px == w_l:
                add(i, scw - ov, scw - ov, H - ov, W - ov, ov, ov)
                add(i, ov, scw - ov, h_l + ov, W - ov, H - ov - (h_l + ov), ov)
                add(i, scw - ov, ov, H - ov, w_l + ov, ov, W - ov - (w_l + ov))
            else:
                if px == 0:
                    add(i, scw - ov, 0, H - ov, 0, ov, ov)
                add(i, scw - ov, ov, H - ov, px + ov, ov, scw - 2 * ov)
        if px == w_l and px != h_l:  # replicated reference quirk (see above)
            add(i, ov, scw - ov, py + ov, W - ov, scw - 2 * ov, ov)

    for i, (py, px) in enumerate(positions):
        add(i, ov, ov, py + ov, px + ov, spw, spw)
    return copies, H, W


@functools.lru_cache(maxsize=64)
def _stitch_plan_cached(positions_key, overlap_value, scw, h_l, w_l):
    return _stitch_plan(list(positions_key), overlap_value, scw, h_l, w_l)


def stitch_patches_jax(
    patches,
    positions: Sequence[Tuple[int, int]],
    overlap_value: int = OVERLAP,
    scw: int = SCW,
):
    """JAX stitcher: identical copy semantics to :func:`patches2im_overlap`
    but expressed as a static sequence of ``dynamic_update_slice`` writes so
    the whole operation stays on device and fuses under jit.

    ``patches``: (N, scw, scw, C) array (device).  Returns (H, W, C).
    """
    import jax.numpy as jnp
    from jax import lax

    pos_arr = np.asarray(positions)
    h_l = int(pos_arr[:, 0].max())
    w_l = int(pos_arr[:, 1].max())
    copies, H, W = _stitch_plan_cached(
        tuple(map(tuple, positions)), overlap_value, scw, h_l, w_l
    )
    C = patches.shape[-1]
    canvas = jnp.zeros((H, W, C), dtype=patches.dtype)
    for (i, sy, sx, dy, dx, sh, sw) in copies:
        block = lax.dynamic_slice(patches[i], (sy, sx, 0), (sh, sw, C))
        canvas = lax.dynamic_update_slice(canvas, block, (dy, dx, 0))
    return canvas


def stitch_argmax_jax(
    probs,
    positions: Sequence[Tuple[int, int]],
    overlap_value: int = OVERLAP,
    scw: int = SCW,
):
    """Fused device path: per-patch uint8 quantization + channel argmax,
    THEN stitch the 1-channel label map.

    Exactly equivalent to ``argmax(img_as_ubyte(stitch(probs)))``
    (reference src/utils.py:116-118) because the stitcher only *copies*
    patch pixels (no blending), so the per-pixel argmax commutes with the
    copy -- but it moves 4x less data through HBM.
    """
    import jax.numpy as jnp

    labels = jnp.argmax(quantize_u8_jax(probs), axis=-1).astype(jnp.int32)[
        ..., None
    ]
    return stitch_patches_jax(labels, positions, overlap_value, scw)[..., 0]


def quantize_u8_values_jax(probs):
    """EXACT device twin of :func:`img_as_ubyte_float` for f32 inputs:
    round-half-even(255 * p) of the EXACT product, as the host computes via
    float64 (a float32 p widens losslessly and 255 * p fits 32 < 53 bits).

    A single f32 multiply is not enough: fl32(255p) rounds the product
    first, and for 128 f32 values in [0, 1] that rounding crosses a
    half-integer so the final rint flips by 1 vs the host (e.g.
    p = 0.0019607844296842813f: fl32 product is exactly 0.5 -> byte 0,
    float64 product 0.50000000294 -> byte 1).  jax x64 is off on this
    attachment, so the exact product is carried as a double-single pair:
    a Veltkamp 12-bit split of p makes both partial 255-products exact,
    Fast2Sum recovers the residual, and the residual's sign corrects the
    boundary cases.  XLA does not reassociate f32 arithmetic, so the
    error-free transformations survive compilation.  Shared by every
    quantize site (this stitcher, pipelines/metaseg, bench.py) so the
    byte contract cannot drift."""
    import jax.numpy as jnp

    p = probs.astype(jnp.float32)
    c = p * 4097.0  # 2^12 + 1: Veltkamp split constant
    p_hi = c - (c - p)
    p_lo = p - p_hi
    a = p_hi * 255.0  # exact: 12 + 8 significant bits <= 24
    b = p_lo * 255.0  # exact
    s = a + b  # fl32(255p), the only rounding
    resid = b - (s - a)  # Fast2Sum: 255p == s + resid exactly
    q = jnp.round(s)  # round-half-even
    diff = s - q  # exact (Sterbenz)
    q = jnp.where(jnp.logical_and(diff == 0.5, resid > 0), q + 1.0, q)
    q = jnp.where(jnp.logical_and(diff == -0.5, resid < 0), q - 1.0, q)
    return jnp.clip(q, 0, 255)


def quantize_u8_jax(probs):
    """uint8 view of :func:`quantize_u8_values_jax` (same exact
    arithmetic; split out because Mosaic kernels cannot cast f32->uint8
    and argmax consumers only need the integer-valued f32 bytes)."""
    import jax.numpy as jnp

    return quantize_u8_values_jax(probs).astype(jnp.uint8)


def stitch_labels_host(
    label_patches: np.ndarray,
    positions: Sequence[Tuple[int, int]],
    overlap_value: int = OVERLAP,
    scw: int = SCW,
) -> np.ndarray:
    """Stitch per-patch LABEL maps (N, scw, scw) int on the host using the
    same precomputed copy plan as the device stitcher, so all three stitchers
    (host float, device, host label) share identical copy semantics.  Used by
    the mesh-sharded folder path, where the forward+argmax runs in packed
    cross-image device batches and only small int8/int32 label patches return
    to the host."""
    pos_arr = np.asarray(positions)
    h_l = int(pos_arr[:, 0].max())
    w_l = int(pos_arr[:, 1].max())
    copies, H, W = _stitch_plan_cached(
        tuple(map(tuple, positions)), overlap_value, scw, h_l, w_l
    )
    canvas = np.zeros((H, W), dtype=label_patches.dtype)
    for (i, sy, sx, dy, dx, sh, sw) in copies:
        canvas[dy : dy + sh, dx : dx + sw] = label_patches[i][
            sy : sy + sh, sx : sx + sw
        ]
    return canvas


def img_as_ubyte_float(x: np.ndarray) -> np.ndarray:
    """skimage ``img_as_ubyte`` for float input in [0, 1]: multiply by 255,
    round half-to-even, clip (used at reference src/utils.py:117)."""
    return np.clip(np.rint(np.asarray(x, dtype=np.float64) * 255), 0, 255).astype(
        np.uint8
    )
