"""interseg: per-nucleus ecDNA/HSR amplification classification.

Parity target: reference src/interseg.py:49-258.  Reads stat_fish outputs
(``annotated/stat_fish_lsq.csv`` + ``<img>_segmentation.tif``), relabels
nuclei, and per region: skips if mean target-FISH brightness < 12.75; crops
the bbox (<= 256^2) and resizes to 256x256 for the ecSeg-i 3-class softmax on
the target-FISH channel; optionally gates ecSeg-c (sigmoid Focal-amp) on
centromere brightness > 10 and a kurtosis quality score <= 3.  Oversized
regions are tiled into non-overlapping 256^2 patches (resized, per-patch
predictions, empty-patch guard).  Emits
``interphase_prediction_<color>.csv``.
"""

from __future__ import annotations

import math
import os
import sys
from typing import Optional

import numpy as np
import pandas as pd
from scipy.stats import kurtosis

from ..core import imgio
from ..core.config import Config, load_config
from ..ops.cc import label as cc_label, regionprops
from ..ops.resize import resize
from ..runtime.trace import stage

ECSEG_I_MODEL = "interseg"
ECSEG_C_MODEL = "ecseg_c"

ECSEG_I_LABEL_MAP = {0: "No-amp", 1: "EC-amp", 2: "HSR-amp"}
ECSEG_C_LABEL_MAP = {0: "No-amp", 1: "Focal-amp"}
INTERSEG_LABEL_MAP = {
    ("No-amp", "No-amp"): "No-amp",
    ("No-amp", "EC-amp"): "No-amp",
    ("No-amp", "HSR-amp"): "No-amp",
    ("Focal-amp", "No-amp"): "No-amp",
    ("Focal-amp", "EC-amp"): "EC-amp",
    ("Focal-amp", "HSR-amp"): "HSR-amp",
}


def preprocess_ecseg_c(x: np.ndarray) -> np.ndarray:
    """Per-image channel normalization, round to 1/255 steps
    (reference src/utils.py:166-173)."""
    x = np.asarray(x, np.float32)
    dapi_norm = x[..., 2].max()
    fish_norm = x[..., :2].max(axis=(0, 1))
    norm = np.concatenate([fish_norm, [dapi_norm]]).reshape(1, 1, 3)
    return np.rint((x / norm) * 255) / 255


def im2patches_grid(img: np.ndarray, overlap: int = 75, scw: int = 256):
    """interseg's LOCAL tiling (reference src/interseg.py:27-47): plain
    non-overlapping grid of 256^2 crops, each resized to 256x256; images
    smaller than 256 on an axis use the full extent."""
    h, w = img.shape[:2]
    patches = []
    for i in range(0, math.ceil(h / scw)):
        min_row = i * scw
        if h < 256:
            max_row = h
        else:
            max_row = min_row + scw
            if max_row > h:
                continue
        for j in range(0, math.ceil(w / scw)):
            min_col = j * scw
            if w < 256:
                max_col = w
            else:
                max_col = min_col + scw
                if max_col > w:
                    continue
            patches.append(
                resize(
                    img[min_row:max_row, min_col:max_col],
                    (256, 256),
                    preserve_range=True,
                ).astype("uint8")
            )
    return patches


def load_classifier_models(has_centromeric_probe: bool, model_dir: str = "interseg_models"):
    """Resolve each classifier, in priority order (mirrors metaseg's loader):

    1. ``<model_dir>/<name>.h5``  -- the reference SavedModel converted once
       with scripts/convert_savedmodel.py, executed through the keras_import
       graph reconstructor (architecture from the checkpoint itself);
    2. ``<model_dir>/<name>.npz`` -- cached converted pytree for the default
       architecture;
    3. seeded random default architecture (development).

    Returns (i_params_or_model, c_params_or_model); a KerasModel is returned
    for H5 sources and a params pytree otherwise -- the prediction wrappers
    in :func:`main` accept both.
    """
    import jax

    from ..models import classifiers
    from ..models.keras_import import import_keras_h5, load_npz_pytree

    def resolve(name, default_init, key):
        h5 = os.path.join(model_dir, f"{name}.h5")
        if os.path.exists(h5):
            return import_keras_h5(h5)
        npz = os.path.join(model_dir, f"{name}.npz")
        if os.path.exists(npz):
            return load_npz_pytree(npz)
        return default_init(jax.random.PRNGKey(key))

    i_model = resolve(ECSEG_I_MODEL, classifiers.init_ecseg_i_params, 1)
    c_model = None
    if has_centromeric_probe:
        c_model = resolve(ECSEG_C_MODEL, classifiers.init_ecseg_c_params, 2)
    return i_model, c_model


def main(argv=None, config: Optional[Config] = None) -> int:
    from ..runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    from ..models import classifiers

    if config is None:
        config = load_config()
    try:
        var = config.interseg
    except Exception as e:
        print(str(e))
        return 2
    inpath = var.inpath
    fish_color = var.FISH_color.lower()
    has_centromeric_probe = var.has_centromeric_probe

    if not os.path.isdir(inpath):
        print("Input folder does not exist. Exiting...")
        return 2
    # FISH_color validation (reference interseg.py:59-61) happens in
    # IntersegConfig.__post_init__, caught above with the reference wording
    fish_index = var.fish_index

    os.makedirs(os.path.join(inpath, "annotated"), exist_ok=True)

    image_paths = imgio.get_imgs(inpath)
    ecseg_i_params, ecseg_c_params = load_classifier_models(has_centromeric_probe)

    def _pad8(batch):
        """Pad the batch axis to a multiple of 8 so recompiles are bounded
        (one program per padded size, not per nucleus count)."""
        n = batch.shape[0]
        rem = (-n) % 8
        if rem:
            batch = np.concatenate(
                [batch, np.zeros((rem,) + batch.shape[1:], batch.dtype)]
            )
        return batch, n

    from ..models.keras_import import KerasModel

    def _batched(model, default_fwd):
        """Prediction wrapper over either an imported Keras graph or a
        default-architecture params pytree.  Input shapes mirror the
        reference exactly (interseg.py:155 feeds the bare target channel)."""
        if isinstance(model, KerasModel):
            def predict(patches):
                padded, n = _pad8(patches)
                return np.asarray(model.predict(padded))[:n]
        else:
            def predict(patches):
                padded, n = _pad8(patches)
                return np.asarray(default_fwd(model, padded))[:n]
        return predict

    # (N,256,256) uint8 target-FISH channel -> (N,3) softmax
    predict_i_batch = _batched(ecseg_i_params, classifiers.ecseg_i_forward)
    # (N,256,256,3) preprocessed -> (N,1) sigmoid
    predict_c_batch = _batched(ecseg_c_params, classifiers.ecseg_c_forward)

    stat_fish_results = pd.read_csv(
        os.path.join(inpath, "annotated/stat_fish_lsq.csv"),
        keep_default_na=False,
        na_values=["_"],
    )

    def _decode(path):
        """Reader-thread stage: raw image + stat_fish segmentation reads."""
        ps = os.path.split(path)
        img = imgio.u16_to_u8(imgio.imread_rgb(path))
        seg_path = os.path.join(
            ps[0], "annotated", ps[1][:-4], f"{ps[1][:-4]}_segmentation.tif"
        )
        seg = imgio.imread_rgb(seg_path)
        return img, seg

    from ..runtime.batching import prefetch_map

    def _process_image(i, I, segmented_cells, predict_i, predict_c):
        """One image end-to-end: gather nucleus crops (host), one device
        batch per classifier, assemble rows.  Returns the per-image frame."""
        path_split = os.path.split(i)
        print("Processing image: ", i)

        img_rows = stat_fish_results[
            stat_fish_results["image_name"] == path_split[1][:-4]
        ]
        cent_channel = ["red", "green"][1 - fish_index]
        quality = (
            kurtosis(img_rows[f"Avg fish intensity ({cent_channel})"])
            if len(stat_fish_results)
            else float("inf")
        )
        quality_pass = quality <= 3

        if segmented_cells.ndim == 3:
            segmented_cells = segmented_cells[..., 0]

        imheight, imwidth = segmented_cells.shape
        I = I[:imheight, :imwidth, :]
        I = np.dstack([I[..., fish_index], I[..., 1 - fish_index], I[..., 2]])

        segmented_cells = cc_label(segmented_cells != 0)
        regions = regionprops(segmented_cells)

        # ---- phase 1: collect every nucleus crop (host) ------------------
        # The reference classifies each nucleus with a batch-of-1 predict
        # (reference src/interseg.py:155); here all crops of the image are
        # gathered first and classified in ONE device batch per model.
        names, centroids = [], []
        entries = []  # per row: ("skip", reason) or ("patch", idx)
        patches = []  # (256, 256, 3) uint8 crops, indexed by entries

        def add_row(entry):
            names.append(path_split[-1][:-4])
            center = entry_center[0]
            centroids.append(f"{int(center[0])}_{int(center[1])}")
            entries.append(entry)

        for region in regions:
            entry_center = [region.centroid]
            # everything read downstream lives inside the region's tight
            # bbox (the mask is zero elsewhere), so crop FIRST: the
            # reference's full-image `I * mask` (interseg.py:131-132) costs
            # O(regions * 3*H*W) host work and fresh image-sized pages,
            # which this VM populates at 10-25 MB/s (CLAUDE.md).  The gate
            # value and the patches are bit-identical.
            inside = region._mask
            temp = I[region.slice] * np.expand_dims(inside, -1)

            if np.sum(temp[..., 0]) / np.sum(inside) < 12.75:
                add_row(("skip", "No_Prediction (Low_TRGT_brightness)"))
                continue

            bb = region.bbox
            h = bb[2] - bb[0]
            w = bb[3] - bb[1]
            if h <= 256 and w <= 256:
                nuclei = temp[: min(256, h), : min(256, w)]
                patches.append(
                    resize(nuclei, (256, 256), preserve_range=True).astype("uint8")
                )
                add_row(("patch", len(patches) - 1))
            else:
                nuclei = temp
                for p in im2patches_grid(nuclei):
                    if not p.any():
                        add_row(("skip", "No_Prediction (Segmentation_Empty)"))
                        continue
                    patches.append(p)
                    add_row(("patch", len(patches) - 1))

        # ---- phase 2: one device batch per classifier --------------------
        if patches:
            batch = np.stack(patches)  # (N, 256, 256, 3)
            with stage("interseg.predict_i"):
                probs_i = predict_i(batch[..., 0])
            if has_centromeric_probe:
                cent_ok = batch[..., 1].max(axis=(1, 2)) > 10
                c_rows = np.nonzero(cent_ok & quality_pass)[0]
                if len(c_rows):
                    pre = np.stack([preprocess_ecseg_c(batch[k]) for k in c_rows])
                    with stage("interseg.predict_c"):
                        probs_c = predict_c(pre)
                    c_prob = dict(zip(c_rows.tolist(), probs_c[:, 0].tolist()))
                else:
                    c_prob = {}

        # ---- phase 3: assemble rows in collection order -------------------
        # (the reference also accumulates per-class probability lists here,
        # interseg.py:124-125,157-160, but never writes them; dropped)
        ecseg_i_label, ecseg_c_label, interseg_label = [], [], []
        for entry in entries:
            if entry[0] == "skip":
                reason = entry[1]
                interseg_label.append(reason)
                ecseg_i_label.append(reason)
                if has_centromeric_probe:
                    ecseg_c_label.append(reason)
                continue

            k = entry[1]
            label_i = ECSEG_I_LABEL_MAP[int(np.argmax(probs_i[k]))]
            ecseg_i_label.append(label_i)

            if has_centromeric_probe and k in c_prob:
                pc = c_prob[k]
                label_c = ECSEG_C_LABEL_MAP[int(pc > 0.5)]
                ecseg_c_label.append(label_c)
                interseg_label.append(INTERSEG_LABEL_MAP[(label_c, label_i)])
            else:
                if has_centromeric_probe and not quality_pass:
                    ecseg_c_label.append(
                        "No_Prediction (Failed Centromeric Quality Score)"
                    )
                elif has_centromeric_probe:  # cent brightness <= 10
                    ecseg_c_label.append("No_Prediction (Low_CENT_Brightness)")
                interseg_label.append(label_i)

        df = pd.DataFrame()
        df["image_name"] = np.array(names)
        df["nucleus_center"] = np.array(centroids)
        df["interSeg_label"] = interseg_label
        if has_centromeric_probe:
            df["ecSeg-c_label"] = ecseg_c_label
        df["ecSeg-i_label"] = ecseg_i_label
        return df

    # Multi-device: images fan out data-parallel (the reference is a
    # per-image loop, src/interseg.py:105-253), one worker thread per device
    # with the classifier weights replicated onto that device; frames are
    # re-emitted in input order so the CSV bytes match the sequential path.
    # ECSEG_INTERSEG_SHARD=0 forces sequential.
    import jax

    devices = jax.devices()
    shard = len(devices) > 1 and os.environ.get(
        "ECSEG_INTERSEG_SHARD", "1"
    ).strip().lower() not in ("0", "false", "no", "off")

    dfs = []
    if not shard:
        for i, (I, segmented_cells) in prefetch_map(_decode, image_paths):
            dfs.append(
                _process_image(
                    i, I, segmented_cells, predict_i_batch, predict_c_batch
                )
            )
    else:
        import concurrent.futures as cf

        def _replicate(model, dev):
            if model is None:
                return None
            put = lambda t: jax.device_put(t, dev)
            if isinstance(model, KerasModel):
                return KerasModel(
                    jax.tree.map(put, model.params), model._forward, model.config
                )
            return jax.tree.map(put, model)

        predictors = {}
        for dev in devices:
            predictors[dev] = (
                _batched(_replicate(ecseg_i_params, dev), classifiers.ecseg_i_forward),
                _batched(_replicate(ecseg_c_params, dev), classifiers.ecseg_c_forward),
            )

        def _work(idx, i, I, seg):
            dev = devices[idx % len(devices)]
            with jax.default_device(dev):
                p_i, p_c = predictors[dev]
                return _process_image(i, I, seg, p_i, p_c)

        results = {}
        inflight = {}
        with cf.ThreadPoolExecutor(max_workers=len(devices)) as pool:
            for idx, (i, (I, seg)) in enumerate(prefetch_map(_decode, image_paths)):
                # bound host memory: at most 2 images in flight per device
                while len(inflight) >= 2 * len(devices):
                    oldest = min(inflight)
                    results[oldest] = inflight.pop(oldest).result()
                inflight[idx] = pool.submit(_work, idx, i, I, seg)
            for k in sorted(inflight):
                results[k] = inflight[k].result()
        dfs = [results[k] for k in sorted(results)]

    path_split = os.path.split(image_paths[-1]) if image_paths else None
    if dfs and path_split is not None:
        out = pd.concat(dfs)
        out.to_csv(
            os.path.join(path_split[0], f"interphase_prediction_{fish_color}.csv"),
            index=False,
        )
    from ..runtime import fallbacks

    fallbacks.report()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
