"""Training support for the metaseg U-Net.

The reference ships inference only (weights downloaded from Mendeley,
README.md:47-49); this framework additionally supports (re)training /
fine-tuning the segmentation U-Net on TPU meshes, which is how new metaseg
checkpoints are produced without Keras.

The train step is a single pjit-compiled function: batch sharded over the
mesh 'data' axis, wide conv kernels optionally sharded over 'model'
(tensor parallelism); GSPMD derives the gradient all-reduce / weight
all-gather collectives from the shardings, riding ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..models import metaseg_unet
from ..parallel.mesh import param_shardings, shard_patch_batch


def softmax_xent_loss(
    params: Dict,
    batch_x,
    batch_y,
    dtype=jnp.float32,
    remat: bool = False,
    valid=None,
):
    """Mean pixel cross-entropy. batch_x (N,H,W,C) uint8, batch_y (N,H,W) int.

    ``valid``: optional (N,) bool mask excluding pad samples from the loss.
    Batches padded to the device count (parallel.mesh.pad_to_multiple) append
    all-zero samples; without the mask those fabricated black/class-0 pixels
    bias every gradient step and the printed loss.

    ``remat=True`` wraps the U-Net forward in ``jax.checkpoint``: encoder
    activations are recomputed during the backward pass instead of kept in
    HBM, trading ~1/3 extra conv FLOPs for roughly halving the activation
    footprint -- the standard lever for growing the per-chip batch on
    256^2-patch training.  Gradients are numerically identical either way
    (covered by tests)."""
    if remat:
        # close over dtype: jax.checkpoint abstractifies positional/keyword
        # args, and a dtype class is not an array
        probs = jax.checkpoint(
            lambda p, x: metaseg_unet.forward(p, x, dtype=dtype)
        )(params, batch_x)
    else:
        probs = metaseg_unet.forward(params, batch_x, dtype=dtype)
    logp = jnp.log(jnp.maximum(probs, 1e-12))
    onehot = jax.nn.one_hot(batch_y, probs.shape[-1], dtype=logp.dtype)
    xent = -jnp.sum(onehot * logp, axis=-1)  # (N, H, W)
    if valid is None:
        return jnp.mean(xent)
    per_sample = jnp.mean(xent, axis=(1, 2))
    vm = valid.astype(per_sample.dtype)
    return jnp.sum(per_sample * vm) / jnp.maximum(jnp.sum(vm), 1.0)


def make_train_step(
    optimizer: optax.GradientTransformation, dtype=jnp.float32, remat: bool = False
):
    def train_step(params, opt_state, batch_x, batch_y, valid=None):
        loss, grads = jax.value_and_grad(softmax_xent_loss)(
            params, batch_x, batch_y, dtype, remat, valid
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def jit_train_step_on_mesh(
    mesh,
    optimizer: Optional[optax.GradientTransformation] = None,
    params_example: Optional[Dict] = None,
    dtype=jnp.float32,
    remat: bool = False,
):
    """Compile the full training step over a mesh with real dp/tp shardings.
    The jitted step takes ``(params, opt_state, batch_x, batch_y, valid)``
    with ``valid`` a (N,) bool mask excluding pad samples from the loss.

    Returns ``(jitted_step, param_sharding_tree, batch_sharding, optimizer)``.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-4)
    from ..parallel.mesh import leaf_sharding_rule
    from jax.sharding import NamedSharding, PartitionSpec as P

    p_shard = param_shardings(params_example, mesh)
    b_shard = shard_patch_batch(mesh)
    repl = NamedSharding(mesh, P())
    y_shard = NamedSharding(mesh, P("data", None, None))
    opt_state_example = optimizer.init(params_example)
    # Adam moments mirror param shapes; the same leaf rule shards them.
    o_shard = jax.tree.map(leaf_sharding_rule(mesh), opt_state_example)

    v_shard = NamedSharding(mesh, P("data"))
    step = make_train_step(optimizer, dtype=dtype, remat=remat)
    jitted = jax.jit(
        step,
        in_shardings=(p_shard, o_shard, b_shard, y_shard, v_shard),
        out_shardings=(p_shard, o_shard, repl),
    )
    return jitted, p_shard, b_shard, optimizer
