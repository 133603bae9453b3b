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


def _default_forward(params, patches_u8, dtype):
    return metaseg_unet.forward(params, patches_u8, dtype=dtype)


@functools.partial(
    jax.jit, static_argnames=("forward_fn", "positions", "dtype")
)
def _segment_patches_jit(
    params, patches_u8, forward_fn, positions, dtype=jnp.float32
):
    """Patches (N,256,256,1) uint8 -> stitched argmax label map (H, W) int32,
    entirely on device.  The uint8 quantization happens before the argmax
    exactly as the reference does (src/utils.py:117-118); per-patch argmax
    then label stitching is bit-identical to stitching the float canvas
    first (the stitcher only copies) but 4x cheaper on HBM."""
    probs = forward_fn(params, patches_u8, dtype)
    return tiling.stitch_argmax_jax(probs, positions)


def _prepare_image(image_path: str, save_dapi: bool = True):
    """Host stage: decode -> meta_preprocess -> save inverted DAPI ->
    patchify.  Runs on reader threads (runtime.batching.prefetch_map) so TIFF
    decode overlaps device compute."""
    I = imgio.imread_rgb(image_path)
    I = meta_preprocess(I)
    if save_dapi:
        path_split = os.path.split(image_path)
        imgio.save_gray_inverted(
            os.path.join(path_split[0], "dapi", path_split[1]), I
        )
    _, patches, pos = tiling.im2patches_overlap(I[..., None])
    return patches, tuple(map(tuple, pos))


def meta_segment(
    model, image_path: str, *, dtype=jnp.float32, save_dapi: bool = True
) -> np.ndarray:
    """Device forward + host meta_inference for one image
    (reference src/utils.py:109-120).  ``model`` is (params, forward_fn) from
    :func:`load_model` or a bare params dict for the default architecture."""
    if isinstance(model, tuple):
        params, forward_fn = model
    else:
        params, forward_fn = model, _default_forward
    patches, pos = _prepare_image(image_path, save_dapi)
    labels = _segment_patches_jit(
        params, jnp.asarray(patches), forward_fn, pos, dtype
    )
    labels = np.asarray(labels).astype(np.int64)
    return meta_inference(labels)


def load_model(model_dir: str = "models", key: Optional[jax.Array] = None):
    """Resolve the metaseg model, in priority order:

    1. ``<model_dir>/metaseg.h5``  -- the reference's Keras blob, executed
       directly through the keras_import graph reconstructor (no TF needed);
    2. ``<model_dir>/metaseg.npz`` -- converted default-architecture weights;
    3. seeded random default architecture (development).

    Returns (params, forward_fn) for :func:`meta_segment`.
    """
    h5_path = os.path.join(model_dir, "metaseg.h5")
    if os.path.exists(h5_path):
        from ..models.keras_import import import_keras_h5

        km = import_keras_h5(h5_path)

        def keras_forward(params, patches_u8, dtype, _fwd=km._forward):
            return _fwd(params, patches_u8.astype(jnp.float32))

        return km.params, keras_forward

    npz_path = os.path.join(model_dir, "metaseg.npz")
    if os.path.exists(npz_path):
        from ..models.keras_import import load_npz_pytree

        return load_npz_pytree(npz_path), _default_forward
    if key is None:
        key = jax.random.PRNGKey(0)
    return metaseg_unet.init_params(key), _default_forward


# back-compat alias
def load_params(model_dir: str = "models", key: Optional[jax.Array] = None):
    return load_model(model_dir, key)


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

    model = load_model()
    image_paths = imgio.get_imgs(inpath)

    if isinstance(model, tuple):
        params, forward_fn = model
    else:
        params, forward_fn = model, _default_forward

    from ..runtime.batching import prefetch_map

    rows = []
    path_split = None
    print("Reading from: ", inpath)
    for i, (patches, pos) in prefetch_map(_prepare_image, image_paths):
        print("Processing image: ", i)
        labels = _segment_patches_jit(
            params, jnp.asarray(patches), forward_fn, pos, jnp.float32
        )
        I = meta_inference(np.asarray(labels).astype(np.int64))
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
