"""ecseg-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the ecSeg/interSeg
cancer-cell microscopy analysis framework.

The reference (UCRajkumar/ecSeg) is a TF/Keras + OpenCV/scipy/skimage batch
pipeline.  This package re-designs every component TPU-first:

- ``ecseg_tpu.models``    -- metaseg U-Net, NuSeT (U-Net + RPN), ecSeg-i/-c
  classifiers as pure-functional JAX models over parameter pytrees, plus
  Keras-H5 / TF1-checkpoint weight importers.
- ``ecseg_tpu.ops``       -- the op library: overlap tiling/stitching,
  connected components (host + on-device label propagation), morphology,
  distance transforms, marker watershed, min-cut instance splitting, NMS,
  matched filters, Otsu, resize.
- ``ecseg_tpu.parallel``  -- jax.sharding Mesh / shard_map data-parallel
  execution of the patch batch across TPU chips.
- ``ecseg_tpu.pipelines`` -- the five user-facing tasks (metaseg,
  meta_overlay, stat_fish, interseg, fish_distance_calculation) preserving
  the reference's config.yaml schema and on-disk folder/CSV contract.
"""

__version__ = "0.1.0"
