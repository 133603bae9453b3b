"""Zero-DC Gaussian matched filter ("least squares") FISH foci detection and
the stat_fish image helpers.

Parity targets: reference src/stat_fish.py:28-142 (kernel construction,
thresholding, boundaries, channel merge, blob counting).  The matched-filter
convolution exists in two twins:

  * host (:func:`ecseg_tpu.ops.conv_host.conv2d_same_tf`) -- exact TF-'SAME'
    correlation alignment, the parity reference;
  * device (:func:`conv2d_same_tf_jax` / :func:`get_thresholded_jax`) --
    ``lax.conv_general_dilated`` with the same explicit asymmetric padding,
    jit-compiled for the TPU path; the full per-channel thresholding
    (conv > threshold OR channel-max, AND intensity gate, AND cell mask)
    runs in one fused device program.
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
import scipy.stats

from .cc import regionprops, scipy_label
from .conv_host import conv2d_same_tf
from ..runtime.progcache import cached_jit


def scipy_sampled_gaussian_kernel(kernel_shape, sigma: float = 1) -> np.ndarray:
    """reference stat_fish.py:28-38."""
    if not isinstance(kernel_shape, np.ndarray):
        kernel_shape = np.array(kernel_shape)
    centers = (kernel_shape / 2) - 0.5
    axes = [
        np.arange(n) - c for n, c in zip(kernel_shape, centers)
    ]  # y-axis, x-axis
    ky, kx = axes
    grid = np.linalg.norm(
        np.dstack(np.meshgrid(kx, ky)), axis=2
    ).astype(np.float64)
    gaussian = scipy.stats.norm.pdf(grid, scale=sigma)
    return gaussian / gaussian.sum()


def get_gaussian_proj_kernel(kernel_size, sigma: float) -> np.ndarray:
    """Gaussian minus its projection onto the constant kernel, normalized
    (reference stat_fish.py:41-55).  Returns a 2-D kernel (the reference
    appends singleton conv dims; we keep it 2-D)."""
    g = scipy_sampled_gaussian_kernel(kernel_size, sigma=sigma)
    c = np.ones(kernel_size)
    c = c / np.linalg.norm(c)
    g_proj = np.dot(g.flatten(), c.flatten()) * c
    g_perp = g - g_proj
    return g_perp / np.linalg.norm(g_perp)


def get_thresholded(
    I: np.ndarray,
    segmented_cells: np.ndarray,
    gaussian_stdev: float,
    normal_threshold: float,
    color_sensitivity,
    gaussian_kernel_shape,
) -> np.ndarray:
    """Per-FISH-channel center detection (reference stat_fish.py:73-88).
    ``I`` is the BGR image; channels 1.. are the FISH channels.  Returns
    (H, W, n_channels-1) int array with values {0, 255} (segmented_cells is
    the 0/255 nuclei mask)."""
    kernel = get_gaussian_proj_kernel(gaussian_kernel_shape, gaussian_stdev)
    num_channels = I.shape[-1]
    chans = [I[..., c].astype(np.float64) for c in range(1, num_channels)]
    normal_coefficients = np.dstack(
        [conv2d_same_tf(ch, kernel) for ch in chans]
    )
    max_pixels = np.dstack(
        [(ch == ch.max()) * bool(ch.max()) for ch in chans]
    ).astype(int)
    centers = ((normal_coefficients > normal_threshold) + max_pixels).astype(bool)

    thresholded = (
        centers * (I[..., 1:] > np.asarray(color_sensitivity))
    ).astype(int)
    thresholded *= np.dstack([segmented_cells] * (num_channels - 1))
    return thresholded


def conv2d_same_tf_jax(x, kernel):
    """Device twin of :func:`ecseg_tpu.ops.conv_host.conv2d_same_tf`: 2-D
    correlation with TF-'SAME' zero padding (lo = (k-1)//2, hi = k-1-lo per
    axis), stride 1.  ``x`` (H, W) or (B, H, W); ``kernel`` (kh, kw)."""
    import jax.numpy as jnp
    from jax import lax

    x = jnp.asarray(x)
    kernel = jnp.asarray(kernel, jnp.float32)
    kh, kw = kernel.shape
    pad = (
        ((kh - 1) // 2, kh - 1 - (kh - 1) // 2),
        ((kw - 1) // 2, kw - 1 - (kw - 1) // 2),
    )
    squeeze_batch = x.ndim == 2
    if squeeze_batch:
        x = x[None]
    y = lax.conv_general_dilated(
        x[..., None].astype(jnp.float32),
        kernel[..., None, None],
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # TPU default f32 conv runs in reduced bf16-pass MXU precision
        # (~0.3 absolute error on O(100) coefficients) -- enough to flip
        # `coeffs > normal_threshold` pixels vs the host oracle.  HIGHEST
        # is load-bearing for device/host parity, same class as the
        # resize_linear_matmul precision pin.
        precision=lax.Precision.HIGHEST,
    )[..., 0]
    return y[0] if squeeze_batch else y


@cached_jit(
    static_argnames=("gaussian_stdev", "normal_threshold", "kernel_shape")
)
def get_thresholded_jax(
    I,
    segmented_cells,
    gaussian_stdev: float,
    normal_threshold: float,
    color_sensitivity,
    kernel_shape: Tuple[int, int],
):
    """Device twin of :func:`get_thresholded`: the whole per-FISH-channel
    center detection (reference stat_fish.py:73-88) as one jitted program.
    The projection kernel is a small host-precomputed constant (pure function
    of static (shape, sigma)); everything image-sized stays on device.

    Output matches the host function exactly: int32 (H, W, C-1) whose values
    are {0, <segmented_cells value>} (the reference multiplies the boolean
    centers by the 0/255 nuclei mask)."""
    import jax.numpy as jnp

    kernel = jnp.asarray(
        get_gaussian_proj_kernel(np.array(kernel_shape), gaussian_stdev)
    )
    I = jnp.asarray(I)
    fish = I[..., 1:].astype(jnp.float32)  # (H, W, C-1)
    chans = jnp.moveaxis(fish, -1, 0)  # (C-1, H, W)
    coeffs = conv2d_same_tf_jax(chans, kernel)  # (C-1, H, W)
    ch_max = jnp.max(chans, axis=(1, 2), keepdims=True)
    max_pixels = jnp.logical_and(chans == ch_max, ch_max > 0)
    centers = jnp.logical_or(coeffs > normal_threshold, max_pixels)
    sens = jnp.asarray(color_sensitivity, jnp.float32).reshape(-1, 1, 1)
    out = jnp.logical_and(centers, chans > sens).astype(jnp.int32)
    cells = jnp.asarray(segmented_cells).astype(jnp.int32)
    return jnp.moveaxis(out, 0, -1) * cells[..., None]


@cached_jit(
    static_argnames=("gaussian_stdev", "normal_threshold", "kernel_shape")
)
def _get_thresholded_packed_jax(
    fish_u8,
    cells_packed,
    gaussian_stdev: float,
    normal_threshold: float,
    color_sensitivity,
    kernel_shape: Tuple[int, int],
):
    """Transfer-packed device twin of :func:`get_thresholded` for the
    stat_fish hot path.  Inputs: the FISH channels only ((H, W, C-1) uint8 --
    the DAPI channel never participates, reference stat_fish.py:73-88) and
    the nuclei mask as a 1-bit host-packed bitmap; output: the boolean
    per-channel center maps, 1-bit packed ((C-1, H, ceil(W/8)) uint8).

    Rationale: this attachment moves ~27 MB/s each way, and the r3 bench
    charged 1.8 s/2048^2-image to "matched filter (device)" -- almost all of
    it the (H, W, 2) int32 result fetch (33 MB) plus the full-BGR upload.
    Packed, the same program moves ~9 MB up / 1 MB down.  Values are
    bit-identical: centers are boolean and the {0, 255} scaling is applied
    by the caller (:func:`get_thresholded_unpack`)."""
    import jax.numpy as jnp

    from .packing import pack_mask_1bit_jax, unpack_mask_1bit_jax

    kernel = jnp.asarray(
        get_gaussian_proj_kernel(np.array(kernel_shape), gaussian_stdev)
    )
    fish = jnp.asarray(fish_u8)
    h, w = fish.shape[0], fish.shape[1]
    chans = jnp.moveaxis(fish.astype(jnp.float32), -1, 0)  # (C-1, H, W)
    coeffs = conv2d_same_tf_jax(chans, kernel)
    ch_max = jnp.max(chans, axis=(1, 2), keepdims=True)
    max_pixels = jnp.logical_and(chans == ch_max, ch_max > 0)
    centers = jnp.logical_or(coeffs > normal_threshold, max_pixels)
    sens = jnp.asarray(color_sensitivity, jnp.float32).reshape(-1, 1, 1)
    cells = unpack_mask_1bit_jax(cells_packed, w) != 0
    out = jnp.logical_and(
        jnp.logical_and(centers, chans > sens), cells[None]
    )
    return jnp.stack([pack_mask_1bit_jax(out[c]) for c in range(out.shape[0])])


def get_thresholded_device_packed(
    I: np.ndarray,
    segmented_cells: np.ndarray,
    gaussian_stdev: float,
    normal_threshold: float,
    color_sensitivity,
    gaussian_kernel_shape,
) -> np.ndarray:
    """Drop-in device replacement for :func:`get_thresholded` (same host
    API/values) built on :func:`_get_thresholded_packed_jax`: packs the
    cell mask up, unpacks the center bitmaps down, and rescales by the
    mask's foreground value (0/255 in the pipeline, reference
    stat_fish.py:86 multiplies by the mask).  Returns a WRITABLE int32
    (H, W, C-1) array ({0, 255}); callers mutate it in place
    (count_blobs contract)."""
    from .packing import pack_mask_1bit_host, unpack_mask_1bit

    h, w = segmented_cells.shape
    fish = np.ascontiguousarray(I[..., 1:])
    cells_packed = pack_mask_1bit_host(segmented_cells)
    packed = np.asarray(
        _get_thresholded_packed_jax(
            fish,
            cells_packed,
            float(gaussian_stdev),
            float(normal_threshold),
            tuple(np.asarray(color_sensitivity).tolist()),
            tuple(gaussian_kernel_shape),
        )
    )
    fg_value = int(segmented_cells.max()) if segmented_cells.any() else 0
    out = np.empty((h, w, packed.shape[0]), np.int32)
    for c in range(packed.shape[0]):
        out[..., c] = unpack_mask_1bit(packed[c], w)
    out *= fg_value
    return out


def get_boundaries(s: np.ndarray, line_thickness: int = 1) -> np.ndarray:
    """Label-boundary visualization (reference stat_fish.py:91-107): detects
    horizontal/vertical label changes with [1]*t + [-1]*t kernels; returns
    (H, W, 3) int with (b, -b, b) channels, b in {0, 255}.

    Formulated as int32 shifted-window sums and an int16 result instead of
    the generic int64 conv: the int64 form moved ~400 MB of host memory per
    2048^2 image (0.52 s on this 1-core box, squarely on the stat_fish tail
    critical path) vs ~0.13 s here.  Values are identical: label sums of
    ``line_thickness`` labels fit int32, and every consumer either compares
    against small constants or wraps through uint8, where int16 and int64
    agree."""
    s = np.asarray(s)
    if s.dtype == np.int64 and (s.size == 0 or int(s.max()) < 2**30):
        s = s.astype(np.int32)  # halve the shifted-window traffic
    elif s.dtype != np.int64 and s.dtype != np.int32:
        s = s.astype(np.int32)  # signed accumulator (uint would wrap)
    t = line_thickness

    def change(axis):
        # conv with [1]*t + [-1]*t over TF-'SAME' zero padding == (sum of
        # the t labels left of the tap) - (sum of the t right); nonzero
        # means a label change inside the window
        k = 2 * t
        plo, phi = (k - 1) // 2, k - 1 - (k - 1) // 2
        pad = [(0, 0), (0, 0)]
        pad[axis] = (plo, phi)
        xp = np.pad(s, pad)
        H, W = s.shape
        acc = np.zeros(s.shape, xp.dtype)
        for a in range(k):
            sl = [slice(None), slice(None)]
            sl[axis] = slice(a, a + (H if axis == 0 else W))
            view = xp[tuple(sl)]
            if a < t:
                acc += view
            else:
                acc -= view
        return acc != 0  # label change across the window

    boundary = change(0) | change(1)
    b = boundary.astype(np.int16) * 255
    return np.dstack([b, -b, b])


def merge_channels(img: np.ndarray, aqua_rgb) -> np.ndarray:
    """Fold a 4th (aqua) channel into BGR (reference stat_fish.py:110-115)."""
    if img.shape[-1] == 3:
        return img
    assert img.shape[-1] == 4
    # int64 promotion (numpy 1.x semantics the reference ran under; numpy 2
    # would otherwise wrap the uint8 multiply)
    aqua = img[..., -1].astype(np.int64)
    img = img[..., :-1] + np.dstack([coeff * aqua / 255 for coeff in aqua_rgb[::-1]])
    return np.minimum(img, 255).astype(np.uint8)


def cell_splice_segmentation(i, thresh, s, region):
    """Crop the raw image / threshold map / instance mask to a region's
    bbox (reference stat_fish.py:118-123)."""
    y_sl, x_sl = region.slice
    img_splice = i[y_sl.start : y_sl.stop, x_sl.start : x_sl.stop, :]
    thresh_splice = thresh[y_sl.start : y_sl.stop, x_sl.start : x_sl.stop, :]
    seg_splice = (
        s[y_sl.start : y_sl.stop, x_sl.start : x_sl.stop] == region.label
    ).astype(int)
    return img_splice, thresh_splice, seg_splice, (y_sl, x_sl)


def get_scale(labeled_segmented_cells, target_median_nuclei_size) -> float:
    """sqrt(target / median nucleus area) (reference stat_fish.py:127-132)."""
    areas = [r.area for r in regionprops(labeled_segmented_cells)]
    median = np.median(areas) if areas else np.nan
    return float(np.sqrt(target_median_nuclei_size / median))


def count_blobs(fish_splice: np.ndarray, cell_seg: np.ndarray, min_cc_size) -> int:
    """4-connected blob count with in-place removal of sub-threshold blobs
    from ``fish_splice`` (the reference mutates its input, stat_fish.py:134-142;
    callers rely on it)."""
    labeled_array, blob_count = scipy_label(fish_splice * cell_seg)
    for blob in regionprops(labeled_array):
        if blob.area < min_cc_size:
            y_sl, x_sl = blob.slice
            component = (
                labeled_array[y_sl.start : y_sl.stop, x_sl.start : x_sl.stop]
                == blob.label
            ).astype(int)
            fish_splice[y_sl.start : y_sl.stop, x_sl.start : x_sl.stop] -= (
                255 * component
            )
            blob_count -= 1
    return blob_count
