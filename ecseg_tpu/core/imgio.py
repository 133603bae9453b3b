"""Image I/O with the reference's exact channel-order and rounding semantics.

The reference mixes two readers with different conventions:

- ``skimage.io.imread`` (RGB channel order, native dtype) in metaseg /
  meta_overlay / interseg (reference src/utils.py:110, meta_overlay.py:59,
  interseg.py:113);
- ``cv2.imread`` (8-bit, BGR channel order) in stat_fish
  (reference src/stat_fish.py:207).

Both are reproduced here on top of OpenCV so the pipelines see identical
pixel values.
"""

from __future__ import annotations

import glob
import os
from typing import List

import cv2
import numpy as np


def imread_rgb(path: str) -> np.ndarray:
    """Read an image preserving dtype, RGB channel order (skimage semantics)."""
    if path.endswith(".npy"):
        return np.load(path)
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(f"could not read image: {path}")
    if img.ndim == 3 and img.shape[2] == 3:
        img = img[..., ::-1]  # BGR -> RGB
    elif img.ndim == 3 and img.shape[2] == 4:
        img = img[..., [2, 1, 0, 3]]  # BGRA -> RGBA
    return np.ascontiguousarray(img)


def imread_bgr8(path: str) -> np.ndarray:
    """Read an image the way ``cv2.imread(path)`` does: 8-bit, 3-channel BGR
    (reference src/stat_fish.py:207)."""
    img = cv2.imread(path)  # IMREAD_COLOR: always 8-bit BGR
    if img is None:
        raise FileNotFoundError(f"could not read image: {path}")
    return img


def imwrite(path: str, img: np.ndarray) -> bool:
    """cv2.imwrite pass-through (expects BGR for 3-channel input).

    ``.tif`` outputs are written UNCOMPRESSED by default: cv2's default is
    LZW, which costs 0.21 s per 2048^2 RGB image on this 1-core host for a
    ~5% size win on microscopy noise (measured) -- stat_fish writes four of
    them per image, squarely on its critical path.  Pixels are identical
    and every consumer (cv2, tf, interseg's readback) decodes both;
    ``ECSEG_TIF_LZW=1`` restores the reference's byte-level encoding."""
    if path.lower().endswith((".tif", ".tiff")) and os.environ.get(
        "ECSEG_TIF_LZW", "0"
    ).strip().lower() not in ("1", "true", "yes", "on"):
        return cv2.imwrite(path, img, [cv2.IMWRITE_TIFF_COMPRESSION, 1])
    return cv2.imwrite(path, img)


def u16_to_u8(img: np.ndarray) -> np.ndarray:
    """uint16 -> uint8 with OpenCV ``convertScaleAbs(alpha=255/65535)``
    semantics: round-half-to-even then saturate
    (reference src/image_tools.py:98-101)."""
    if img.dtype == np.uint16:
        scaled = img.astype(np.float64) * (255.0 / 65535.0)
        img = np.clip(np.rint(scaled), 0, 255).astype(np.uint8)
    return img


def get_imgs(inpath: str) -> List[str]:
    """Discover inputs: ``*.tif`` then ``*.npy`` (reference src/utils.py:105-107)."""
    return glob.glob(os.path.join(inpath, "*.tif")) + glob.glob(
        os.path.join(inpath, "*.npy")
    )


# metaseg label-map palette: ListedColormap(['#386cb0','#ffff99','#7fc97f',
# '#f0027f']) applied with vmin=0, vmax=4 (reference src/metaseg.py:47,52).
# With 4 colors and vmax=4 the class->color mapping is v -> color[v] for
# v in {0,1,2,3} (v=4 never occurs).
METASEG_PALETTE_RGB = np.array(
    [
        [0x38, 0x6C, 0xB0],  # 0 background  (#386cb0)
        [0xFF, 0xFF, 0x99],  # 1 nuclei      (#ffff99)
        [0x7F, 0xC9, 0x7F],  # 2 chromosome  (#7fc97f)
        [0xF0, 0x02, 0x7F],  # 3 ecDNA       (#f0027f)
    ],
    dtype=np.uint8,
)


def save_label_png(path: str, labels: np.ndarray) -> None:
    """Save a 4-class label map as the colormapped PNG the reference writes
    with ``plt.imsave(..., cmap=ListedColormap(...), vmin=0, vmax=4)``
    (reference src/metaseg.py:47-52).

    Parity contract: PIXEL-level, not file-byte-level.  The reference's
    matplotlib writer emits an RGBA PNG with matplotlib's encoder settings;
    this writes the identical per-pixel palette colors as RGB via cv2, so
    the decoded images match but file bytes differ.  The quantitative
    outputs (``labels/*.npy``, the CSVs) are the bit-exact contract; the PNG
    is a visualization."""
    idx = np.clip(labels.astype(np.int64), 0, 3)
    rgb = METASEG_PALETTE_RGB[idx]
    cv2.imwrite(path, rgb[..., ::-1])  # cv2 expects BGR


def save_gray_inverted(path: str, img: np.ndarray) -> None:
    """Write ``cv2.bitwise_not(img)`` as grayscale (reference src/utils.py:112,
    src/image_tools.py:143-144).  cv2.imwrite returns False (no exception)
    when the directory is missing -- create it and check, or the mandated
    artifact silently vanishes for public-API callers that bypass main()."""
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    if not cv2.imwrite(path, 255 - np.asarray(img, dtype=np.uint8)):
        raise IOError(f"failed to write {path}")
