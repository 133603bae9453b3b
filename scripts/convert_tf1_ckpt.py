#!/usr/bin/env python3
"""Convert the NuSeT TF1 checkpoints (whole_norm.ckpt / foreground.ckpt,
restored in the reference at src/utils.py:94-101) into the ecseg-tpu pytree
cache ``models/nuset.npz``.

Requires TensorFlow ONLY to read the checkpoint format (it is not a runtime
dependency of the framework); run this once in any environment with TF:

    python scripts/convert_tf1_ckpt.py models/nuset models/nuset.npz

Variable-name mapping (TF1 graph as built by reference src/utils.py:48,74):
  model_U-Net/conv{L}-{i}/{kernel,bias}      -> unet["conv{L}-{i}"]
  model_U-Net/conv2d_transpose{,_1,_2,_3}/..-> unet["deconv{4,3,2,1}"]
  model_U-Net/final/kernel                   -> unet["final"] (no bias)
  model_RPN/rpn_conv/3x3/...                 -> rpn["rpn_conv"]
  model_RPN/rpn_cls_score/..., rpn_bbox_pred -> rpn["rpn_cls_score","rpn_bbox_pred"]

Transpose-conv kernels are stored by TF as (H, W, out, in) and converted to
the framework's HWIO (H, W, in, out).
"""

import sys

import numpy as np


def convert(ckpt_dir: str, out_path: str) -> None:
    try:
        import tensorflow as tf  # noqa
    except ImportError:
        sys.exit(
            "TensorFlow is required to read TF1 checkpoints. Run this script "
            "in an environment with TF installed (it is not needed at runtime)."
        )
    from tensorflow.python.training import py_checkpoint_reader

    from ecseg_tpu.models.keras_import import save_npz_pytree

    def read_ckpt(path):
        reader = py_checkpoint_reader.NewCheckpointReader(path)
        return {
            name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()
        }

    def map_unet(vars_):
        unet = {}
        deconv_names = {
            "conv2d_transpose": "deconv4",
            "conv2d_transpose_1": "deconv3",
            "conv2d_transpose_2": "deconv2",
            "conv2d_transpose_3": "deconv1",
        }
        for name, val in vars_.items():
            if not name.startswith("model_U-Net/"):
                continue
            parts = name.split("/")
            layer, leaf = parts[1], parts[-1]
            if leaf not in ("kernel", "bias"):
                continue  # optimizer slots (.../Adam, .../Adam_1) etc.
            if layer in deconv_names:
                key = deconv_names[layer]
                if leaf == "kernel":
                    val = np.transpose(val, (0, 1, 3, 2))  # (H,W,out,in)->HWIO
            else:
                key = layer
            unet.setdefault(key, {})[leaf] = val
        return unet

    def map_rpn(vars_):
        rpn = {}
        names = {
            "rpn_conv": "rpn_conv",
            "rpn_cls_score": "rpn_cls_score",
            "rpn_bbox_pred": "rpn_bbox_pred",
        }
        for name, val in vars_.items():
            if not name.startswith("model_RPN/"):
                continue
            parts = name.split("/")
            layer, leaf = parts[1], parts[-1]
            if leaf not in ("kernel", "bias"):
                continue  # optimizer slots
            for k, v in names.items():
                if layer.startswith(k):
                    rpn.setdefault(v, {})[leaf] = val
                    break
            else:
                raise ValueError(
                    f"unrecognized RPN variable scope {name!r}: an npz "
                    "silently missing RPN weights would only fail at "
                    "forward time"
                )
        return rpn

    whole = read_ckpt(f"{ckpt_dir}/whole_norm.ckpt")
    fg = read_ckpt(f"{ckpt_dir}/foreground.ckpt")
    tree = {
        "whole": map_unet(whole),
        "fg": {"unet": map_unet(fg), "rpn": map_rpn(fg)},
    }
    save_npz_pytree(out_path, tree)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    convert(
        sys.argv[1] if len(sys.argv) > 1 else "models/nuset",
        sys.argv[2] if len(sys.argv) > 2 else "models/nuset.npz",
    )
