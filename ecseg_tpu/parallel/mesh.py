"""Device mesh and sharding layout.

The reference's only parallel construct is ``tf.distribute.MirroredStrategy``
around model load (reference src/metaseg.py:33-36).  The TPU-native design
replaces that with a ``jax.sharding.Mesh`` over two logical axes:

- ``data``  -- the patch/tile batch axis.  Patches from all images in a
  folder are packed into device-filling batches and sharded here; the only
  cross-chip traffic in inference is the final per-image metric reduction
  (a ``psum``-shaped all-reduce XLA inserts automatically), which rides ICI.
- ``model`` -- optional tensor parallelism for the widest U-Net layers:
  bottleneck/decoder conv kernels are sharded on their output-channel dim,
  giving GSPMD freedom to keep big activations distributed.

Inference has no gradient traffic, so data parallelism is embarrassingly
parallel; training (ecseg_tpu.runtime.train) adds the usual grad all-reduce,
which GSPMD also derives from these same shardings.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, model_axis: int = 1
) -> Mesh:
    """A (data, model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices % model_axis != 0:
        raise ValueError(f"{n_devices} devices not divisible by model axis {model_axis}")
    if len(devices) < n_devices:
        raise ValueError(
            f"make_mesh needs {n_devices} devices but jax.devices() has "
            f"{len(devices)} on platform {devices[0].platform!r}. For a "
            "virtual mesh set JAX_PLATFORMS=cpu and XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n_devices} before "
            "importing jax."
        )
    grid = np.array(devices[:n_devices]).reshape(n_devices // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def leaf_sharding_rule(mesh: Mesh):
    """Per-leaf sharding rule: wide conv kernels (out-channels >= 256 and
    divisible by the model axis) shard over 'model'; everything else
    replicates.  Applied to params AND optimizer moments (which mirror param
    shapes), so Adam state lives distributed alongside its kernel."""
    model_size = mesh.shape["model"]

    def spec(leaf):
        if (
            model_size > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim == 4
            and leaf.shape[-1] >= 256
            and leaf.shape[-1] % model_size == 0
        ):
            return NamedSharding(mesh, P(None, None, None, "model"))
        return NamedSharding(mesh, P())

    return spec


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    return jax.tree.map(leaf_sharding_rule(mesh), params)


def shard_patch_batch(mesh: Mesh) -> NamedSharding:
    """Sharding for a (N, H, W, C) patch batch: N split over 'data'."""
    return NamedSharding(mesh, P("data", None, None, None))


def pad_to_multiple(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (device-count alignment for the
    sharded batch); returns (padded, original_n)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad = np.zeros((rem,) + x.shape[1:], dtype=x.dtype)
        x = np.concatenate([x, pad], axis=0)
    return x, n
