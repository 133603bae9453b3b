import os

import cv2
import numpy as np
import pandas as pd
import pytest

from ecseg_tpu.core.config import Config
from ecseg_tpu.pipelines import meta_overlay


@pytest.fixture
def overlay_folder(tmp_path):
    d = tmp_path / "ov"
    d.mkdir()
    (d / "labels").mkdir()
    (d / "dapi").mkdir()
    H, W = 128, 160
    # RGB tif (written BGR for cv2)
    rgb = np.zeros((H, W, 3), np.uint8)
    rgb[10:20, 10:20, 1] = 200  # green blob (FISH)
    rgb[40:45, 40:45, 0] = 200  # red blob
    rgb[..., 2] = 30
    cv2.imwrite(str(d / "img.tif"), rgb[..., ::-1])  # store as BGR
    # label map: ec blob colocated with the green blob, chrom elsewhere
    seg = np.zeros((H, W), np.int64)
    seg[10:20, 10:20] = 3  # ecDNA under the green FISH
    seg[60:80, 60:90] = 2  # chromosome
    seg[100:120, 10:40] = 1  # nucleus
    np.save(str(d / "labels" / "img.npy"), seg)
    return str(d)


def test_meta_overlay_end_to_end(overlay_folder):
    cfg = Config(
        raw={"meta_overlay": {"inpath": overlay_folder, "color_sensitivity": 85}}
    )
    assert meta_overlay.main(config=cfg) == 0
    assert os.path.exists(os.path.join(overlay_folder, "red", "img.tif.png"))
    assert os.path.exists(os.path.join(overlay_folder, "green", "img.tif.png"))
    df = pd.read_csv(os.path.join(overlay_folder, "fish_quantification.csv"))
    assert list(df.columns) == [
        "image_name",
        "# of ecDNA (DAPI)",
        "# of ecDNA (green)",
        "# of ecDNA (red)",
        "# of ecDNA (DAPI and green)",
        "# of ecDNA (DAPI and red)",
        "# of ecDNA (red and green)",
        "# of ecDNA (DAPI and red and green)",
        "# of HSR (red)",
        "# of HSR (green)",
    ]
    row = df.iloc[0]
    assert row["image_name"] == "img.tif"
    # count_cc cells are stored as "(count, px)" tuples -- reference quirk
    assert row["# of ecDNA (DAPI)"] == "(1, 100)"
    assert row["# of ecDNA (green)"] == "(1, 100)"
    assert row["# of ecDNA (DAPI and green)"] == 1
    assert row["# of ecDNA (DAPI and red)"] == 0


def test_meta_overlay_empty_fish_tuple_cells(tmp_path):
    """An image whose FISH channels never clear color_sensitivity and whose
    label map has no ecDNA must store "(0, 0.0)" -- the reference's
    np.sum([]) float -- in the three count_cc CSV cells (reference
    src/image_tools.py:114-119 via meta_overlay.py:70-71,79)."""
    d = tmp_path / "ov_empty"
    d.mkdir()
    (d / "labels").mkdir()
    (d / "dapi").mkdir()
    H, W = 64, 64
    rgb = np.full((H, W, 3), 20, np.uint8)  # everything below sensitivity 85
    cv2.imwrite(str(d / "img.tif"), rgb[..., ::-1])
    seg = np.zeros((H, W), np.int64)
    seg[10:30, 10:30] = 1  # a nucleus, but no ecDNA anywhere
    np.save(str(d / "labels" / "img.npy"), seg)

    cfg = Config(raw={"meta_overlay": {"inpath": str(d), "color_sensitivity": 85}})
    assert meta_overlay.main(config=cfg) == 0
    df = pd.read_csv(os.path.join(str(d), "fish_quantification.csv"))
    row = df.iloc[0]
    assert row["# of ecDNA (DAPI)"] == "(0, 0.0)"
    assert row["# of ecDNA (green)"] == "(0, 0.0)"
    assert row["# of ecDNA (red)"] == "(0, 0.0)"


def test_meta_overlay_validations(tmp_path):
    cfg = Config(
        raw={"meta_overlay": {"inpath": str(tmp_path), "color_sensitivity": 85}}
    )
    assert meta_overlay.main(config=cfg) == 2  # no labels/ folder

    with pytest.raises(Exception):
        Config(
            raw={"meta_overlay": {"inpath": str(tmp_path), "color_sensitivity": 300}}
        ).meta_overlay


def test_meta_overlay_skips_grayscale(tmp_path):
    d = tmp_path / "ov2"
    d.mkdir()
    (d / "labels").mkdir()
    (d / "dapi").mkdir()
    cv2.imwrite(str(d / "g.tif"), np.zeros((32, 32), np.uint8))
    cfg = Config(raw={"meta_overlay": {"inpath": str(d), "color_sensitivity": 85}})
    # grayscale image: skipped; no rows -> no csv columns reorder crash
    assert meta_overlay.main(config=cfg) in (0, 2)
