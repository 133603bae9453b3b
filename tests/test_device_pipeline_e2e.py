"""Pipeline-level host == device equality: every ``use_device_path`` branch
in the pipeline ``main``s is forced on and off via ECSEG_DEVICE_PIPELINE and
the resulting artifacts (CSV bytes, label .npy bytes) must be identical.
The device ops run under Pallas interpret mode on the CPU test mesh, so the
exact device code path executes without TPU hardware.
"""

import os

import cv2
import numpy as np
import pytest

from ecseg_tpu.core.config import Config


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def _make_metaseg_folder(root, rng):
    d = root
    os.makedirs(d, exist_ok=True)
    img = (rng.random((320, 384)) * 60).astype(np.uint8)
    img[40:120, 50:130] = 200  # nucleus-like blob
    img[200:210, 200:206] = 180
    img[250:253, 300:303] = 230  # small bright blob
    cv2.imwrite(os.path.join(d, "sample.tif"), img)
    return d


def _run_metaseg(folder, device, monkeypatch):
    import jax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.pipelines import metaseg

    tiny = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    monkeypatch.setattr(
        metaseg, "load_model", lambda *a, **k: (tiny, metaseg._default_forward)
    )
    monkeypatch.setenv("ECSEG_DEVICE_PIPELINE", "1" if device else "0")
    cfg = Config(raw={"metaseg": {"inpath": folder}})
    assert metaseg.main(config=cfg) == 0
    return {
        "npy": _read(os.path.join(folder, "labels", "sample.npy")),
        "csv": _read(os.path.join(folder, "ec_quantification.csv")),
    }


def test_metaseg_device_branch_matches_host(tmp_path, rng, monkeypatch):
    state = rng.bit_generator.state
    host_dir = _make_metaseg_folder(str(tmp_path / "host"), rng)
    rng.bit_generator.state = state
    dev_dir = _make_metaseg_folder(str(tmp_path / "dev"), rng)
    assert _read(os.path.join(host_dir, "sample.tif")) == _read(
        os.path.join(dev_dir, "sample.tif")
    )

    host = _run_metaseg(host_dir, device=False, monkeypatch=monkeypatch)
    dev = _run_metaseg(dev_dir, device=True, monkeypatch=monkeypatch)
    assert host["npy"] == dev["npy"]
    assert host["csv"] == dev["csv"]


def _make_overlay_folder(root):
    d = root
    os.makedirs(os.path.join(d, "labels"), exist_ok=True)
    os.makedirs(os.path.join(d, "dapi"), exist_ok=True)
    H, W = 128, 160
    rgb = np.zeros((H, W, 3), np.uint8)
    rgb[10:20, 10:20, 1] = 200  # green FISH over the ec blob
    rgb[40:45, 40:45, 0] = 200  # red blob
    rgb[..., 2] = 30
    cv2.imwrite(os.path.join(d, "img.tif"), rgb[..., ::-1])
    seg = np.zeros((H, W), np.int64)
    seg[10:20, 10:20] = 3
    seg[60:80, 60:90] = 2
    seg[100:120, 10:40] = 1
    np.save(os.path.join(d, "labels", "img.npy"), seg)

    # second image: FISH below sensitivity and no ec -> degenerate
    # "(0, 0.0)" count_cc tuples must survive the device branch too
    rgb2 = np.full((H, W, 3), 20, np.uint8)
    cv2.imwrite(os.path.join(d, "img2.tif"), rgb2[..., ::-1])
    seg2 = np.zeros((H, W), np.int64)
    seg2[30:60, 30:60] = 1
    np.save(os.path.join(d, "labels", "img2.npy"), seg2)
    return d


def test_meta_overlay_device_branch_matches_host(tmp_path, monkeypatch):
    from ecseg_tpu.pipelines import meta_overlay

    outs = {}
    for name, device in [("host", False), ("dev", True)]:
        d = _make_overlay_folder(str(tmp_path / name))
        monkeypatch.setenv("ECSEG_DEVICE_PIPELINE", "1" if device else "0")
        cfg = Config(
            raw={"meta_overlay": {"inpath": d, "color_sensitivity": 85}}
        )
        assert meta_overlay.main(config=cfg) == 0
        outs[name] = _read(os.path.join(d, "fish_quantification.csv"))
    assert outs["host"] == outs["dev"]
    assert b"(0, 0.0)" in outs["dev"]  # degenerate tuple cell, device branch


def _make_interphase_folder(root):
    d = root
    os.makedirs(d, exist_ok=True)
    H = W = 160
    img = np.zeros((H, W, 3), np.uint8)  # BGR on disk
    img[..., 0] = 20
    yy, xx = np.mgrid[:H, :W]
    c1 = (yy - 50) ** 2 + (xx - 50) ** 2 <= 30**2
    c2 = (yy - 110) ** 2 + (xx - 110) ** 2 <= 30**2
    img[..., 0][c1 | c2] = 220
    for (y, x) in [(50, 50), (110, 110)]:
        img[y - 1 : y + 2, x - 1 : x + 2, 1] = 220
        img[y + 6 : y + 9, x + 6 : x + 9, 2] = 220
    cv2.imwrite(os.path.join(d, "cells.tif"), img)
    return d


def test_stat_fish_device_branch_matches_host(tmp_path, monkeypatch):
    """The matched-filter device program (mf.get_thresholded_jax) must
    produce byte-identical stat_fish outputs incl. the saved lsq tif (the
    thresholded map itself)."""
    import glob

    from _nusetutil import crafted_nuset_model

    from ecseg_tpu.pipelines import stat_fish

    model = crafted_nuset_model()
    monkeypatch.setattr(stat_fish, "load_nuset_model", lambda **kw: model)

    outs = {}
    for name, device in [("host", False), ("dev", True)]:
        d = _make_interphase_folder(str(tmp_path / name))
        monkeypatch.setenv("ECSEG_DEVICE_PIPELINE", "1" if device else "0")
        cfg = Config(
            raw={
                "stat_fish": {
                    "inpath": d,
                    "scale": 1,
                    "use_min_cut": False,
                    "nuclei_size_T": 500,
                }
            }
        )
        assert stat_fish.main(config=cfg) == 0
        ann = os.path.join(d, "annotated")
        lsq = glob.glob(os.path.join(ann, "cells", "cells_lsq_*.tif"))
        assert len(lsq) == 1
        outs[name] = {
            "csv": _read(os.path.join(ann, "stat_fish_lsq.csv")),
            "lsq_name": os.path.basename(lsq[0]),
            "lsq": _read(lsq[0]),
            "npy": _read(
                os.path.join(ann, "cells", "cells__segmentation_min_cut.npy")
            ),
        }
    assert outs["host"]["csv"] == outs["dev"]["csv"]
    assert outs["host"]["lsq_name"] == outs["dev"]["lsq_name"]
    assert outs["host"]["lsq"] == outs["dev"]["lsq"]
    assert outs["host"]["npy"] == outs["dev"]["npy"]
