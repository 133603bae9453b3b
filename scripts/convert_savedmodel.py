#!/usr/bin/env python3
"""Convert the ecSeg-i / ecSeg-c TF SavedModels (reference
``interseg_models/interseg`` and ``interseg_models/ecseg_c``, loaded at
reference src/utils.py:27-33) into H5 files the runtime's TF-free
keras_import can execute, or directly into npz pytrees.

Requires TensorFlow only at conversion time:

    python scripts/convert_savedmodel.py interseg_models/interseg interseg_models/interseg.h5
    python scripts/convert_savedmodel.py interseg_models/ecseg_c  interseg_models/ecseg_c.h5

The runtime then consumes the H5 through
ecseg_tpu.models.keras_import.import_keras_h5 (no TF).
"""

import os
import sys

# The reference SavedModels were written by TF-2.8-era (legacy) Keras; load
# them with the legacy implementation, not Keras 3.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")


def convert(savedmodel_dir: str, out_h5: str) -> None:
    try:
        import tensorflow as tf
    except ImportError:
        sys.exit(
            "TensorFlow is required to read SavedModels. Run this script in "
            "an environment with TF installed (not needed at runtime)."
        )
    model = tf.keras.models.load_model(savedmodel_dir)
    model.save(out_h5, save_format="h5")
    print(f"wrote {out_h5}")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
