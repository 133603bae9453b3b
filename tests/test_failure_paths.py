"""Failure-handling contract (SURVEY 5.3): every driver exits 2 on bad
config/paths (reference metaseg.py:19-21, meta_overlay.py:22-36,
stat_fish.py:175-177, interseg.py:55-61) with the reference's messages; the
validation quirks (color range, FISH_color) are enforced."""

import numpy as np
import pytest

from ecseg_tpu.core.config import Config
from ecseg_tpu.pipelines import (
    fish_distance,
    interseg,
    meta_overlay,
    metaseg,
    stat_fish,
)


def _cfg(**sections):
    return Config(raw=sections, path=None)


def test_metaseg_missing_inpath_exits_2(capsys):
    rc = metaseg.main(config=_cfg(metaseg={"inpath": "./no_such_dir"}))
    assert rc == 2
    assert "Input folder does not exist" in capsys.readouterr().out


def test_meta_overlay_missing_inpath_exits_2():
    cfg = _cfg(meta_overlay={"inpath": "./no_such_dir", "color_sensitivity": 85})
    assert meta_overlay.main(config=cfg) == 2


def test_meta_overlay_missing_labels_folder_exits_2(tmp_path, capsys):
    cfg = _cfg(
        meta_overlay={"inpath": str(tmp_path), "color_sensitivity": 85}
    )
    assert meta_overlay.main(config=cfg) == 2
    assert "labels" in capsys.readouterr().out


def test_meta_overlay_missing_section_exits_2():
    assert meta_overlay.main(config=_cfg()) == 2


def test_stat_fish_missing_inpath_exits_2():
    cfg = _cfg(
        stat_fish={
            "inpath": "./no_such_dir",
            "scale": 1,
            "use_min_cut": False,
            "nuclei_size_T": 100,
        }
    )
    assert stat_fish.main(config=cfg) == 2


def test_interseg_missing_inpath_exits_2():
    cfg = _cfg(
        interseg={
            "inpath": "./no_such_dir",
            "FISH_color": "green",
            "has_centromeric_probe": False,
        }
    )
    assert interseg.main(config=cfg) == 2


def test_interseg_bad_fish_color_exits_2(tmp_path, capsys):
    cfg = _cfg(
        interseg={
            "inpath": str(tmp_path),
            "FISH_color": "blue",
            "has_centromeric_probe": False,
        }
    )
    assert interseg.main(config=cfg) == 2
    assert "green" in capsys.readouterr().out


def test_fish_distance_missing_annotated_asserts(tmp_path):
    cfg = _cfg(
        fish_distance_calculation={
            "inpath": str(tmp_path),
            "centromere_probe_color": "green",
            "fish_probe_color": "red",
            "max_centromeric_spots": 3,
        }
    )
    # the reference asserts on a missing annotated/ (f_d_c.py:69)
    with pytest.raises(AssertionError):
        fish_distance.main(config=cfg)


def test_meta_overlay_skips_non_rgb(tmp_path, capsys):
    import cv2

    (tmp_path / "labels").mkdir()
    (tmp_path / "dapi").mkdir()
    gray = (np.random.default_rng(0).random((64, 64)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "gray.tif"), gray)
    np.save(str(tmp_path / "labels" / "gray.npy"), np.zeros((64, 64), np.int64))
    cfg = _cfg(meta_overlay={"inpath": str(tmp_path), "color_sensitivity": 85})
    rc = meta_overlay.main(config=cfg)
    assert rc == 0
    assert "isn't an RGB image" in capsys.readouterr().out
