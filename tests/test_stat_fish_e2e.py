"""End-to-end stat_fish -> interseg -> fish_distance on a synthetic image.

NuSeT weights are crafted so the level-1 skip path passes brightness through
(the deep path still runs with random weights): the predicted mask is
"above-mean brightness", giving a deterministic segmentation without trained
checkpoints.
"""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecseg_tpu.core.config import Config
from ecseg_tpu.core.config import StatFishParams
from ecseg_tpu.models import nuset, nuset_infer


from _nusetutil import crafted_nuset_model


@pytest.fixture(scope="module")
def crafted_model():
    return crafted_nuset_model()


@pytest.fixture(scope="module")
def synthetic_interphase(tmp_path_factory):
    d = tmp_path_factory.mktemp("interphase")
    H = W = 160
    img = np.zeros((H, W, 3), np.uint8)  # BGR on disk
    img[..., 0] = 20  # dim DAPI background
    yy, xx = np.mgrid[:H, :W]
    c1 = (yy - 50) ** 2 + (xx - 50) ** 2 <= 30**2
    c2 = (yy - 110) ** 2 + (xx - 110) ** 2 <= 30**2
    img[..., 0][c1 | c2] = 220  # nuclei in DAPI/blue
    # FISH foci: green + red inside each nucleus
    for (y, x) in [(50, 50), (110, 110)]:
        img[y - 1 : y + 2, x - 1 : x + 2, 1] = 220  # green
        img[y + 6 : y + 9, x + 6 : x + 9, 2] = 220  # red
    cv2.imwrite(str(d / "cells.tif"), img)
    return str(d)


def test_nuclei_segment_crafted(crafted_model, synthetic_interphase):
    img = cv2.imread(os.path.join(synthetic_interphase, "cells.tif"))
    seg = nuset_infer.nuclei_segment(img[:, :, 0], crafted_model, 500)
    assert seg.dtype == np.uint8
    assert set(np.unique(seg)).issubset({0, 255})
    assert seg[50, 50] == 255 and seg[110, 110] == 255
    assert seg[10, 150] == 0


def test_stat_fish_interseg_fish_distance_e2e(
    crafted_model, synthetic_interphase, monkeypatch
):
    import pandas as pd

    from ecseg_tpu.pipelines import fish_distance, interseg, stat_fish

    inpath = synthetic_interphase
    cfg = Config(
        raw={
            "stat_fish": {
                "inpath": inpath,
                "scale": 1,
                "use_min_cut": True,
                "nuclei_size_T": 500,
            },
            "interseg": {
                "inpath": inpath,
                "FISH_color": "red",
                "has_centromeric_probe": False,
            },
            "fish_distance_calculation": {
                "inpath": inpath,
                "centromere_probe_color": "green",
                "fish_probe_color": "red",
                "max_centromeric_spots": 3,
            },
        }
    )
    monkeypatch.setattr(
        stat_fish, "load_nuset_model", lambda **kw: crafted_model
    )
    assert stat_fish.main(config=cfg) == 0

    ann = os.path.join(inpath, "annotated")
    assert os.path.isdir(ann)
    csv = pd.read_csv(os.path.join(ann, "stat_fish_lsq.csv"))
    assert len(csv) == 2  # two nuclei
    expected_cols = [
        "image_name", "nucleus_center",
        "#_FISH_pixels (green)", "#_FISH_foci (green)",
        "Avg fish intensity (green)", "Max fish intensity (green)",
        "#_FISH_pixels (red)", "#_FISH_foci (red)",
        "Avg fish intensity (red)", "Max fish intensity (red)",
        "#_DAPI_pixels",
        "#_FISH_pixels (green and red)", "#_FISH_foci (green and red)",
    ]
    assert list(csv.columns) == expected_cols
    assert (csv["#_FISH_foci (green)"] >= 1).all()
    assert (csv["#_FISH_foci (red)"] >= 1).all()
    assert (csv["#_DAPI_pixels"] > 500).all()
    img_dir = os.path.join(ann, "cells")
    for suffix in [
        "_segmentation.tif",
        "_segmentation_corrected_min_cut.tif",
        "_original_with_segmentation.tif",
        "_original.tif",
        "__segmentation_min_cut.npy",
    ]:
        assert os.path.exists(os.path.join(img_dir, "cells" + suffix)), suffix
    import glob as _glob

    assert _glob.glob(os.path.join(img_dir, "cells_lsq_*.tif"))
    # provenance copies
    assert os.path.exists(os.path.join(ann, "stat_fish_params.yaml"))

    # ---- interseg on the stat_fish outputs
    assert interseg.main(config=cfg) == 0
    pred = pd.read_csv(os.path.join(inpath, "interphase_prediction_red.csv"))
    assert list(pred.columns) == [
        "image_name", "nucleus_center", "interSeg_label", "ecSeg-i_label",
    ]
    assert len(pred) == 2
    assert set(pred["interSeg_label"]).issubset(
        {"No-amp", "EC-amp", "HSR-amp", "No_Prediction (Low_TRGT_brightness)"}
    )

    # ---- fish_distance on the stat_fish outputs
    assert fish_distance.main(config=cfg) == 0
    dist = pd.read_csv(os.path.join(inpath, "centromere_distances.csv"))
    assert list(dist.columns) == ["normalized_distance"]
    assert len(dist) == 2
    assert (dist["normalized_distance"] >= 0).all()


def test_stat_fish_fast_watershed_toggle(
    crafted_model, synthetic_interphase, monkeypatch, tmp_path
):
    """ECSEG_FAST_WATERSHED=1 drives the full stat_fish main through the
    device minimax-flood watershed (ops/watershed_tpu) and still produces a
    schema-complete CSV; on this well-separated synthetic input the result
    matches the parity path exactly."""
    import shutil

    import pandas as pd

    from ecseg_tpu.pipelines import stat_fish

    inpath = str(tmp_path / "fastws")
    shutil.copytree(
        synthetic_interphase, inpath,
        ignore=shutil.ignore_patterns("annotated*", "*.csv"),
    )
    cfg = Config(
        raw={
            "stat_fish": {
                "inpath": inpath,
                "scale": 1,
                "use_min_cut": True,
                "nuclei_size_T": 500,
            }
        }
    )
    monkeypatch.setattr(
        stat_fish, "load_nuset_model", lambda **kw: crafted_model
    )
    monkeypatch.setenv("ECSEG_FAST_WATERSHED", "1")
    assert stat_fish.main(config=cfg) == 0
    fast_csv = pd.read_csv(
        os.path.join(inpath, "annotated", "stat_fish_lsq.csv")
    )

    ref_csv_path = os.path.join(
        synthetic_interphase, "annotated", "stat_fish_lsq.csv"
    )
    if os.path.exists(ref_csv_path):  # parity run from the e2e test above
        ref_csv = pd.read_csv(ref_csv_path)
        pd.testing.assert_frame_equal(fast_csv, ref_csv)
    else:
        assert len(fast_csv) == 2


def test_stat_fish_archives_previous_annotated(
    crafted_model, synthetic_interphase, monkeypatch
):
    from ecseg_tpu.pipelines import stat_fish

    cfg = Config(
        raw={
            "stat_fish": {
                "inpath": synthetic_interphase,
                "scale": 1,
                "use_min_cut": False,
                "nuclei_size_T": 500,
            }
        }
    )
    monkeypatch.setattr(
        stat_fish, "load_nuset_model", lambda **kw: crafted_model
    )
    assert os.path.isdir(os.path.join(synthetic_interphase, "annotated"))
    assert stat_fish.main(config=cfg) == 0
    import glob as _glob

    archived = _glob.glob(os.path.join(synthetic_interphase, "annotated_*"))
    assert archived, "previous annotated/ must be archived with a timestamp"


def test_stat_fish_sharded_matches_sequential(
    crafted_model, monkeypatch, tmp_path
):
    """Multi-chip stat_fish (images fanned out data-parallel over the
    device mesh, host tails on the worker pool) must produce byte-identical
    artifacts to the sequential path -- including the 'auto' scale rule,
    which resolves on the FIRST image before the fan-out starts."""
    import cv2

    from ecseg_tpu.pipelines import stat_fish

    monkeypatch.setattr(stat_fish, "load_nuset_model", lambda **kw: crafted_model)

    def make_folder(d, n=4):
        os.makedirs(d, exist_ok=True)
        H = W = 160
        for k in range(n):
            img = np.zeros((H, W, 3), np.uint8)
            img[..., 0] = 20
            yy, xx = np.mgrid[:H, :W]
            for c, (y, x) in enumerate([(50, 50), (110, 110)]):
                r = 25 + 3 * k + 4 * c
                m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
                img[..., 0][m] = 220
                img[y - 1 : y + 2, x - 1 : x + 2, 1] = 220
                img[y + 6 : y + 9, x + 6 : x + 9, 2] = 220
            cv2.imwrite(os.path.join(d, f"im{k}.tif"), img)

    outs = {}
    # tail1/tail4 size the single-device host-tail pool
    # (ECSEG_STAT_FISH_TAIL_WORKERS, default 2) to its backpressure
    # extremes: 1 serializes every tail behind the inflight bound, 4 never
    # applies backpressure with 4 images -- CSV/npy/tif bytes must not
    # depend on the overlap schedule
    for mode, env, workers in [
        ("seq", "0", None),
        ("shard", "1", None),
        ("tail1", "0", "1"),
        ("tail4", "0", "4"),
    ]:
        monkeypatch.setenv("ECSEG_STAT_FISH_SHARD", env)
        if workers is None:
            monkeypatch.delenv(
                "ECSEG_STAT_FISH_TAIL_WORKERS", raising=False
            )
        else:
            monkeypatch.setenv("ECSEG_STAT_FISH_TAIL_WORKERS", workers)
        d = str(tmp_path / mode)
        make_folder(d)
        cfg = Config(
            raw={
                "stat_fish": {
                    "inpath": d,
                    "scale": "auto",
                    "use_min_cut": True,
                    "nuclei_size_T": 400,
                }
            }
        )
        assert stat_fish.main(config=cfg) == 0
        ann = os.path.join(d, "annotated")
        files = {}
        for root, _, fs in os.walk(ann):
            for f in fs:
                if f.endswith((".csv", ".npy", ".tif")):
                    rel = os.path.relpath(os.path.join(root, f), ann)
                    with open(os.path.join(root, f), "rb") as fh:
                        files[rel] = fh.read()
        outs[mode] = files
    for other in ("shard", "tail1", "tail4"):
        assert set(outs["seq"]) == set(outs[other]), other
        for k in outs["seq"]:
            assert outs["seq"][k] == outs[other][k], (other, k)
