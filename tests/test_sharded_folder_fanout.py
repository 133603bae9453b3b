"""Multi-device folder fan-out for meta_overlay and interseg: images are
embarrassingly parallel in the reference (per-image loops at
src/meta_overlay.py:56-95 and src/interseg.py:105-253), so on a multi-device
mesh both pipelines fan images out data-parallel, one worker thread per
device.  Output bytes (CSVs, PNGs) must be identical to the sequential path
-- rows re-emitted in input order.  Runs on the conftest-forced 8-CPU mesh."""

import os

import cv2
import numpy as np
import pandas as pd
import pytest

from ecseg_tpu.core.config import Config


def _overlay_folder(d, n=5):
    os.makedirs(os.path.join(d, "labels"), exist_ok=True)
    os.makedirs(os.path.join(d, "dapi"), exist_ok=True)
    H, W = 96, 128
    rng = np.random.default_rng(11)
    for k in range(n):
        rgb = np.zeros((H, W, 3), np.uint8)
        rgb[..., 2] = 25
        for _ in range(4 + k):
            y, x = rng.integers(0, H - 10), rng.integers(0, W - 10)
            rgb[y : y + 6, x : x + 6, rng.integers(0, 2)] = 200
        cv2.imwrite(os.path.join(d, f"im{k}.tif"), rgb[..., ::-1])
        seg = np.zeros((H, W), np.int64)
        seg[10 + k : 20 + k, 10:20] = 3
        seg[40:55, 40 + 2 * k : 70] = 2
        seg[70:90, 5:30] = 1
        np.save(os.path.join(d, "labels", f"im{k}.npy"), seg)


def test_meta_overlay_sharded_matches_sequential(tmp_path, monkeypatch):
    from ecseg_tpu.pipelines import meta_overlay

    outs = {}
    for mode, env in [("seq", "0"), ("shard", "1")]:
        monkeypatch.setenv("ECSEG_OVERLAY_SHARD", env)
        d = str(tmp_path / mode)
        _overlay_folder(d)
        cfg = Config(
            raw={"meta_overlay": {"inpath": d, "color_sensitivity": 85}}
        )
        assert meta_overlay.main(config=cfg) == 0
        files = {}
        with open(os.path.join(d, "fish_quantification.csv"), "rb") as f:
            files["csv"] = f.read()
        for color in ("red", "green"):
            for k in range(5):
                p = os.path.join(d, color, f"im{k}.tif.png")
                with open(p, "rb") as f:
                    files[f"{color}/im{k}"] = f.read()
        outs[mode] = files
    assert set(outs["seq"]) == set(outs["shard"])
    for k in outs["seq"]:
        assert outs["seq"][k] == outs["shard"][k], k
    # row order must follow input (get_imgs/glob) order, not completion order
    from ecseg_tpu.core import imgio

    df = pd.read_csv(str(tmp_path / "shard" / "fish_quantification.csv"))
    want = [os.path.basename(p) for p in imgio.get_imgs(str(tmp_path / "shard"))]
    assert list(df["image_name"]) == want


def _interseg_folder(d, n=3):
    """n images, each with 3 nuclei exercising the gates; pre-made
    stat_fish outputs (seg tif + csv rows)."""
    H = W = 320
    rows = []
    rng = np.random.default_rng(5)
    ann = os.path.join(d, "annotated")
    for k in range(n):
        name = f"cells{k}"
        img = np.zeros((H, W, 3), np.uint8)
        img[..., 0] = 15
        seg = np.zeros((H, W), np.uint8)
        yy, xx = np.mgrid[:H, :W]
        centers = [(60, 60), (60, 220), (220, 120 + 10 * k)]
        brightness = [(160, 90), (2, 90), (150, 0)]
        for (y, x), (red, green) in zip(centers, brightness):
            m = (yy - y) ** 2 + (xx - x) ** 2 <= (28 + k) ** 2
            seg[m] = 255
            img[..., 2][m] = red
            img[..., 1][m] = green
            img[..., 0][m] = 200
        noise = (rng.random((H, W)) * 30).astype(np.uint8)
        img[..., 2] = np.where(seg > 0, img[..., 2] + noise // 2, img[..., 2])
        cv2.imwrite(os.path.join(d, f"{name}.tif"), img)
        sub = os.path.join(ann, name)
        os.makedirs(sub, exist_ok=True)
        cv2.imwrite(os.path.join(sub, f"{name}_segmentation.tif"), seg)
        for c in centers:
            rows.append(
                {
                    "image_name": name,
                    "nucleus_center": f"{c[0]}_{c[1]}",
                    "Avg fish intensity (green)": float(rng.integers(40, 90)),
                    "Avg fish intensity (red)": float(rng.integers(90, 160)),
                }
            )
    pd.DataFrame(rows).to_csv(os.path.join(ann, "stat_fish_lsq.csv"), index=False)


def test_interseg_sharded_matches_sequential(tmp_path, monkeypatch):
    import jax

    from ecseg_tpu.models import classifiers
    from ecseg_tpu.pipelines import interseg

    i_params = classifiers.init_ecseg_i_params(jax.random.PRNGKey(1))
    c_params = classifiers.init_ecseg_c_params(jax.random.PRNGKey(2))
    monkeypatch.setattr(
        interseg,
        "load_classifier_models",
        lambda has_cent, model_dir="interseg_models": (i_params, c_params),
    )

    outs = {}
    for mode, env in [("seq", "0"), ("shard", "1")]:
        monkeypatch.setenv("ECSEG_INTERSEG_SHARD", env)
        d = str(tmp_path / mode)
        os.makedirs(d)
        _interseg_folder(d)
        cfg = Config(
            raw={
                "interseg": {
                    "inpath": d,
                    "FISH_color": "red",
                    "has_centromeric_probe": True,
                }
            }
        )
        assert interseg.main(config=cfg) == 0
        with open(os.path.join(d, "interphase_prediction_red.csv"), "rb") as f:
            outs[mode] = f.read()
    assert outs["seq"] == outs["shard"]
    # input (get_imgs/glob) order preserved across images, not completion order
    from ecseg_tpu.core import imgio

    df = pd.read_csv(str(tmp_path / "shard" / "interphase_prediction_red.csv"))
    want = [
        os.path.basename(p)[:-4]
        for p in imgio.get_imgs(str(tmp_path / "shard"))
    ]
    assert list(df["image_name"].unique()) == want
    assert len(df) >= 9
