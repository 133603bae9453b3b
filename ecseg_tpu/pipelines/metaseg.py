"""metaseg: folder-batch 4-class DAPI segmentation.

Pipeline parity target: reference src/metaseg.py:12-57 + src/utils.py:109-120.
Per image: read -> meta_preprocess -> save inverted DAPI -> overlap-patchify
-> U-Net forward (whole patch stack in ONE device batch) -> stitch -> uint8
-> channel argmax -> meta_inference -> count ecDNA -> write
labels/<name>.png (palette PNG), labels/<name>.npy, and one
``ec_quantification.csv`` row (note the reference writes
"ec_quantification.csv", not the README's "ec_quantifications" --
metaseg.py:57).

TPU design: the patchify -> forward -> stitch -> argmax chain is a single
jitted function per image geometry; only the final int label map returns to
the host for the (sequential, data-dependent) meta_inference pass.  On a
multi-chip mesh the patch batch is sharded over the data axis (see
ecseg_tpu.parallel).
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core import imgio
from ..core.config import Config, load_config
from ..models import metaseg_unet
from ..ops import tiling
from ..ops.cc import count_cc
from ..ops.meta_post import meta_inference, meta_preprocess

MODEL_NAME = "metaseg.h5"


@functools.partial(jax.jit, static_argnames=("positions", "dtype"))
def _segment_patches_jit(params, patches_u8, positions, dtype=jnp.float32):
    """Patches (N,256,256,1) uint8 -> stitched argmax label map (H, W) int32,
    entirely on device."""
    probs = metaseg_unet.forward(params, patches_u8, dtype=dtype)
    canvas = tiling.stitch_patches_jax(probs, positions)
    # reference converts the stitched float map to uint8 BEFORE the argmax
    # (src/utils.py:117-118); rounding can change ties, so replicate it.
    canvas_u8 = jnp.clip(jnp.round(canvas * 255.0), 0, 255).astype(jnp.uint8)
    return jnp.argmax(canvas_u8, axis=2).astype(jnp.int32)


def meta_segment(
    params: Dict, image_path: str, *, dtype=jnp.float32, save_dapi: bool = True
) -> np.ndarray:
    """Device forward + host meta_inference for one image
    (reference src/utils.py:109-120)."""
    I = imgio.imread_rgb(image_path)
    I = meta_preprocess(I)
    if save_dapi:
        path_split = os.path.split(image_path)
        imgio.save_gray_inverted(
            os.path.join(path_split[0], "dapi", path_split[1]), I
        )
    _, patches, pos = tiling.im2patches_overlap(I[..., None])
    labels = _segment_patches_jit(
        params, jnp.asarray(patches), tuple(map(tuple, pos)), dtype
    )
    labels = np.asarray(labels).astype(np.int64)
    return meta_inference(labels)


def load_params(model_dir: str = "models", key: Optional[jax.Array] = None) -> Dict:
    """Load converted metaseg weights (<model_dir>/metaseg.npz produced by
    scripts/convert_keras_h5.py) or fall back to the documented default
    architecture with seeded random init."""
    npz_path = os.path.join(model_dir, "metaseg.npz")
    if os.path.exists(npz_path):
        from ..models.keras_import import load_npz_pytree

        return load_npz_pytree(npz_path)
    if key is None:
        key = jax.random.PRNGKey(0)
    return metaseg_unet.init_params(key)


def main(argv=None, config: Optional[Config] = None) -> int:
    if config is None:
        config = load_config()
    var = config.metaseg
    inpath = var.inpath

    if not os.path.isdir(inpath):
        print("Input folder does not exist. Exiting...")
        return 2

    os.makedirs(os.path.join(inpath, "dapi"), exist_ok=True)
    os.makedirs(os.path.join(inpath, "labels"), exist_ok=True)

    params = load_params()
    image_paths = imgio.get_imgs(inpath)

    rows = []
    path_split = None
    print("Reading from: ", inpath)
    for i in image_paths:
        print("Processing image: ", i)
        I = meta_segment(params, i)
        num_ecDNA = count_cc(I == 3)[0]
        path_split = os.path.split(i)
        outpath = os.path.join(path_split[0], "labels", path_split[1][:-4])
        print("Saving labels: ", i, " to ", outpath)
        imgio.save_label_png(outpath + ".png", I.astype("uint8"))
        np.save(outpath, I)
        rows.append({"image name": path_split[1], "# of ec": num_ecDNA})

    df = pd.DataFrame(rows, columns=["image name", "# of ec"])
    if path_split is not None:
        out_csv = os.path.join(path_split[0], "ec_quantification.csv")
        print("Saving ec quantification to", out_csv)
        df.to_csv(out_csv, index=False)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
