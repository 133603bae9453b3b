"""ECSEG_TIF_LZW toggle (core/imgio.imwrite): .tif outputs are written
UNCOMPRESSED by default on this 1-core host (LZW costs 0.21 s per 2048^2
RGB write, four of which sit on stat_fish's critical path); =1 restores
cv2's default LZW encoding, matching the reference's bytes.  Decoded
pixels must be identical either way."""

import os

import cv2
import numpy as np

from ecseg_tpu.core import imgio


def test_tif_lzw_toggle_pixels_identical(tmp_path, monkeypatch):
    img = np.zeros((64, 96, 3), np.uint8)  # flat -> LZW actually shrinks it
    img[8:30, 10:40] = (40, 200, 120)
    img[50:60, 60:90, 2] = 255

    raw = str(tmp_path / "raw.tif")
    lzw = str(tmp_path / "lzw.tif")
    monkeypatch.delenv("ECSEG_TIF_LZW", raising=False)
    assert imgio.imwrite(raw, img)
    monkeypatch.setenv("ECSEG_TIF_LZW", "1")
    assert imgio.imwrite(lzw, img)

    np.testing.assert_array_equal(cv2.imread(raw), img)
    np.testing.assert_array_equal(cv2.imread(lzw), img)
    assert os.path.getsize(raw) > os.path.getsize(lzw)


def test_non_tif_paths_ignore_the_toggle(tmp_path, monkeypatch):
    img = np.zeros((16, 16, 3), np.uint8)
    monkeypatch.delenv("ECSEG_TIF_LZW", raising=False)
    png = str(tmp_path / "x.png")
    assert imgio.imwrite(png, img)
    np.testing.assert_array_equal(cv2.imread(png), img)
