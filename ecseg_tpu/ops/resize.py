"""skimage-compatible resize / rescale on scipy.ndimage, plus a JAX variant.

The reference uses ``skimage.transform.rescale``/``resize``
(reference src/utils.py:135-136,156-157; src/interseg.py:46,154).  skimage
implements these on ``scipy.ndimage.zoom(grid_mode=True)`` with an optional
gaussian anti-aliasing prefilter; we reproduce that directly (skimage itself
is not a dependency):

- mode names are numpy.pad-style and map onto scipy.ndimage modes
  ('reflect' -> 'mirror', 'symmetric' -> 'reflect', 'edge' -> 'nearest');
- ``preserve_range=False`` first converts integer images to float via
  img_as_float (divide by dtype max);
- anti-aliasing sigma per axis: ``max(0, (downscale_factor - 1) / 2)``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage as ndi

_NDI_MODE = {
    "reflect": "mirror",
    "symmetric": "reflect",
    "edge": "nearest",
    "constant": "constant",
    "wrap": "grid-wrap",
}


def img_as_float(image: np.ndarray) -> np.ndarray:
    if np.issubdtype(image.dtype, np.floating):
        return image
    info = np.iinfo(image.dtype)
    if info.min < 0:
        raise NotImplementedError("signed integer images not supported")
    return image.astype(np.float64) / info.max


def resize(
    image: np.ndarray,
    output_shape: Sequence[int],
    order: int = 1,
    mode: str = "reflect",
    cval: float = 0.0,
    clip: bool = True,
    preserve_range: bool = False,
    anti_aliasing: Optional[bool] = None,
    anti_aliasing_sigma=None,
) -> np.ndarray:
    image = np.asarray(image)
    output_shape = tuple(output_shape)
    # Trailing (e.g. channel) axes not covered by output_shape keep their size.
    if len(output_shape) < image.ndim:
        output_shape = output_shape + image.shape[len(output_shape) :]

    input_shape = image.shape
    factors = np.divide(input_shape, output_shape)

    if anti_aliasing is None:
        anti_aliasing = (
            not image.dtype == bool
            and not (np.issubdtype(image.dtype, np.integer) and order == 0)
            and any(x < y for x, y in zip(output_shape, input_shape))
        )

    if not preserve_range:
        image = img_as_float(image)
    else:
        image = image.astype(np.float64)

    ndi_mode = _NDI_MODE.get(mode, mode)
    if anti_aliasing:
        if anti_aliasing_sigma is None:
            anti_aliasing_sigma = np.maximum(0, (factors - 1) / 2)
        filtered = ndi.gaussian_filter(
            image, anti_aliasing_sigma, cval=cval, mode=ndi_mode
        )
    else:
        filtered = image

    zoom_factors = [1 / f for f in factors]
    out = ndi.zoom(
        filtered, zoom_factors, order=order, mode=ndi_mode, cval=cval, grid_mode=True
    )
    if clip:
        out = np.clip(out, image.min(), image.max())
    return out


def rescale(
    image: np.ndarray,
    scale: float,
    order: int = 1,
    mode: str = "reflect",
    cval: float = 0.0,
    clip: bool = True,
    preserve_range: bool = False,
    anti_aliasing: Optional[bool] = None,
) -> np.ndarray:
    """skimage.transform.rescale for 2-D images (reference src/utils.py:136,157)."""
    image = np.asarray(image)
    output_shape = tuple(
        int(d) for d in np.maximum(np.round(np.multiply(image.shape[:2], scale)), 1)
    )
    return resize(
        image,
        output_shape,
        order=order,
        mode=mode,
        cval=cval,
        clip=clip,
        preserve_range=preserve_range,
        anti_aliasing=anti_aliasing,
    )


def resize_jax(image, output_shape: Tuple[int, int], antialias: bool = False):
    """Device-side bilinear resize with half-pixel centers (the same sampling
    grid as ``ndi.zoom(grid_mode=True)``), for the TPU hot path.  Note
    jax.image.resize clamps at borders while the host resize mirrors
    (ndi 'mirror'); for border-exact device resizing use
    :func:`resize_linear_matmul`."""
    import jax.image

    shape = tuple(output_shape) + tuple(image.shape[2:])
    return jax.image.resize(image, shape, method="linear", antialias=antialias)


def _zoom_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) order-1 interpolation operator reproducing
    ``ndi.zoom(..., order=1, mode='mirror', grid_mode=True)`` exactly:
    half-pixel sample centers, linear weights, mirror boundary
    (index -1 -> 1, n -> n-2)."""
    coords = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(coords).astype(np.int64)
    frac = coords - lo

    def mirror(i):
        i = np.where(i < 0, -i, i)
        if n_in > 1:
            i = np.where(i >= n_in, 2 * (n_in - 1) - i, i)
        else:
            i = np.zeros_like(i)
        return i

    W = np.zeros((n_out, n_in), np.float64)
    rows = np.arange(n_out)
    np.add.at(W, (rows, mirror(lo)), 1.0 - frac)
    np.add.at(W, (rows, mirror(lo + 1)), frac)
    return W


def resize_linear_matmul(image, output_shape: Tuple[int, int]):
    """Device resize as two MXU matmuls with host-precomputed exact zoom
    operators: out = Wy @ image @ Wx^T.  Matches the host :func:`resize`
    (order=1, mode='reflect'->ndi 'mirror', no anti-aliasing) including the
    border rows where jax.image.resize's clamping differs.  ``image`` is a
    2-D (H, W) array; shapes must be static under jit.

    Precision note: TPU's default f32 matmul runs in reduced (bf16-pass)
    precision, and the fractional interpolation weights are not
    bf16-representable -- without HIGHEST the device result drifts ~1e-3
    from the host oracle and flips threshold-adjacent pixels downstream
    (nuset_infer._cleanup_pass binarizes at an exact cutoff).  The CPU test
    suite cannot catch this (CPU matmuls are always full f32), so the
    override is load-bearing for the device/host byte-equality contract."""
    import jax.numpy as jnp
    from jax import lax

    h_in, w_in = image.shape
    h_out, w_out = output_shape
    wy = jnp.asarray(_zoom_matrix(h_in, h_out), jnp.float32)
    wx = jnp.asarray(_zoom_matrix(w_in, w_out), jnp.float32)
    out = lax.dot(wy, image.astype(jnp.float32), precision=lax.Precision.HIGHEST)
    return lax.dot(out, wx.T, precision=lax.Precision.HIGHEST)
