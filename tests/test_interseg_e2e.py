"""interseg pipeline e2e: the batched-classifier device path vs a
per-region host oracle (reference control flow, batch-of-1 predicts).

The pipeline gathers every nucleus crop of an image and classifies them in
ONE device batch per model (padded to a multiple of 8); the reference
classifies per region with batch-of-1 ``predict`` calls
(reference src/interseg.py:129-242).  This test byte-pins that seam: the
oracle below replays the reference's per-region loop against the SAME
classifier weights and the CSVs must match exactly -- including the
oversized-region grid tiling, the brightness/centromere/kurtosis gates, and
the padded-batch independence (pad entries must not perturb real rows).
"""

import os

import cv2
import numpy as np
import pandas as pd
import pytest
from scipy.stats import kurtosis

from ecseg_tpu.core.config import Config


@pytest.fixture(scope="module")
def interseg_fixture(tmp_path_factory):
    """An interphase folder with pre-made stat_fish outputs: 4 nuclei --
    a normal one, a dim one (brightness gate), one without centromere
    signal (cent gate), and one oversized (> 256 bbox, grid-tiled)."""
    d = str(tmp_path_factory.mktemp("interseg_e2e"))
    H = W = 680
    rng = np.random.default_rng(3)
    img = np.zeros((H, W, 3), np.uint8)  # BGR on disk
    img[..., 0] = 15  # dim DAPI floor
    seg = np.zeros((H, W), np.uint8)

    yy, xx = np.mgrid[:H, :W]

    def disk(y, x, r):
        return (yy - y) ** 2 + (xx - x) ** 2 <= r * r

    # nucleus 1: normal, bright red target + green centromere
    m1 = disk(60, 60, 35)
    # nucleus 2: dim in the target channel -> Low_TRGT_brightness
    m2 = disk(60, 220, 30)
    # nucleus 3: bright target, NO centromere -> Low_CENT_Brightness
    m3 = disk(60, 380, 30)
    # nucleus 4: oversized blob (bbox > 256 on both axes) -> grid tiling
    m4 = disk(420, 340, 258)

    for m, red, green in [(m1, 160, 90), (m2, 2, 90), (m3, 160, 0), (m4, 140, 60)]:
        seg[m] = 255
        img[..., 2][m] = red  # BGR red channel
        img[..., 1][m] = green
        img[..., 0][m] = 200
    # speckle so resized crops are not constant (keep the dim nucleus dim)
    noise = (rng.random((H, W)) * 40).astype(np.uint8)
    img[..., 2] = np.where((seg > 0) & ~m2, img[..., 2] + noise, img[..., 2])

    cv2.imwrite(os.path.join(d, "cells.tif"), img)
    sub = os.path.join(d, "annotated", "cells")
    os.makedirs(sub, exist_ok=True)
    cv2.imwrite(os.path.join(sub, "cells_segmentation.tif"), seg)

    # stat_fish CSV: only image_name + the cent-channel intensity column
    # feed interseg (kurtosis quality over 'Avg fish intensity (green)')
    pd.DataFrame(
        {
            "image_name": ["cells"] * 4,
            "nucleus_center": ["60_60", "60_220", "60_360", "290_210"],
            "Avg fish intensity (green)": [80.0, 85.0, 2.0, 60.0],
            "Avg fish intensity (red)": [150.0, 4.0, 150.0, 140.0],
        }
    ).to_csv(os.path.join(d, "annotated", "stat_fish_lsq.csv"), index=False)
    return d


def _models():
    import jax

    from ecseg_tpu.models import classifiers

    i_params = classifiers.init_ecseg_i_params(jax.random.PRNGKey(1))
    c_params = classifiers.init_ecseg_c_params(jax.random.PRNGKey(2))
    return i_params, c_params


def _oracle_csv(inpath, i_params, c_params, fish_index=0):
    """The reference's per-region control flow (src/interseg.py:105-258)
    with batch-of-1 classifier calls, emitting the same CSV bytes."""
    import numpy as np

    from ecseg_tpu.core import imgio
    from ecseg_tpu.models import classifiers
    from ecseg_tpu.ops.cc import label as cc_label, regionprops
    from ecseg_tpu.ops.resize import resize
    from ecseg_tpu.pipelines.interseg import (
        ECSEG_C_LABEL_MAP,
        ECSEG_I_LABEL_MAP,
        INTERSEG_LABEL_MAP,
        im2patches_grid,
        preprocess_ecseg_c,
    )

    name = "cells"
    stat = pd.read_csv(
        os.path.join(inpath, "annotated/stat_fish_lsq.csv"),
        keep_default_na=False,
        na_values=["_"],
    )
    img_rows = stat[stat["image_name"] == name]
    quality = kurtosis(img_rows["Avg fish intensity (green)"])
    quality_pass = quality <= 3

    I = imgio.u16_to_u8(imgio.imread_rgb(os.path.join(inpath, "cells.tif")))
    seg = imgio.imread_rgb(
        os.path.join(inpath, "annotated", name, f"{name}_segmentation.tif")
    )
    if seg.ndim == 3:
        seg = seg[..., 0]
    h, w = seg.shape
    I = I[:h, :w, :]
    I = np.dstack([I[..., fish_index], I[..., 1 - fish_index], I[..., 2]])

    labmap = cc_label(seg != 0)
    names, centroids, ilab, clab, slab = [], [], [], [], []

    def predict1_i(patch):  # batch-of-1, NO padding
        return np.asarray(classifiers.ecseg_i_forward(i_params, patch[None]))[0]

    def predict1_c(patch):
        return np.asarray(classifiers.ecseg_c_forward(c_params, patch[None]))[0]

    def classify(p, center):
        names.append(name)
        centroids.append(f"{int(center[0])}_{int(center[1])}")
        pi = predict1_i(p[..., 0])
        label_i = ECSEG_I_LABEL_MAP[int(np.argmax(pi))]
        ilab.append(label_i)
        if p[..., 1].max() > 10 and quality_pass:
            pc = predict1_c(preprocess_ecseg_c(p))[0]
            label_c = ECSEG_C_LABEL_MAP[int(pc > 0.5)]
            clab.append(label_c)
            slab.append(INTERSEG_LABEL_MAP[(label_c, label_i)])
        else:
            if not quality_pass:
                clab.append("No_Prediction (Failed Centromeric Quality Score)")
            else:
                clab.append("No_Prediction (Low_CENT_Brightness)")
            slab.append(label_i)

    def skip(reason, center):
        names.append(name)
        centroids.append(f"{int(center[0])}_{int(center[1])}")
        ilab.append(reason)
        clab.append(reason)
        slab.append(reason)

    for region in regionprops(labmap):
        center = region.centroid
        inside = region._mask
        temp = I[region.slice] * np.expand_dims(inside, -1)
        if np.sum(temp[..., 0]) / np.sum(inside) < 12.75:
            skip("No_Prediction (Low_TRGT_brightness)", center)
            continue
        bb = region.bbox
        rh, rw = bb[2] - bb[0], bb[3] - bb[1]
        if rh <= 256 and rw <= 256:
            p = resize(
                temp[: min(256, rh), : min(256, rw)], (256, 256),
                preserve_range=True,
            ).astype("uint8")
            classify(p, center)
        else:
            for p in im2patches_grid(temp):
                if not p.any():
                    skip("No_Prediction (Segmentation_Empty)", center)
                    continue
                classify(p, center)

    df = pd.DataFrame()
    df["image_name"] = np.array(names)
    df["nucleus_center"] = np.array(centroids)
    df["interSeg_label"] = slab
    df["ecSeg-c_label"] = clab
    df["ecSeg-i_label"] = ilab
    return df.to_csv(index=False)


def test_interseg_batched_matches_per_region_oracle(
    interseg_fixture, monkeypatch
):
    from ecseg_tpu.pipelines import interseg

    i_params, c_params = _models()
    monkeypatch.setattr(
        interseg,
        "load_classifier_models",
        lambda has_cent, model_dir="interseg_models": (i_params, c_params),
    )
    cfg = Config(
        raw={
            "interseg": {
                "inpath": interseg_fixture,
                "FISH_color": "red",
                "has_centromeric_probe": True,
            }
        }
    )
    assert interseg.main(config=cfg) == 0
    with open(
        os.path.join(interseg_fixture, "interphase_prediction_red.csv")
    ) as f:
        got = f.read()

    want = _oracle_csv(interseg_fixture, i_params, c_params)
    assert got == want

    # the fixture must actually exercise every gate
    assert "No_Prediction (Low_TRGT_brightness)" in got
    assert "No_Prediction (Low_CENT_Brightness)" in got
    df = pd.read_csv(
        os.path.join(interseg_fixture, "interphase_prediction_red.csv")
    )
    assert len(df) > 4  # the oversized nucleus contributes multiple patches
