"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    from ecseg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_sharded_inference_matches_single_device():
    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.parallel.mesh import (
        make_mesh, pad_to_multiple, param_shardings, shard_patch_batch,
    )

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    rng = np.random.default_rng(0)
    x = (rng.random((6, 32, 32, 1)) * 255).astype(np.uint8)

    ref = np.asarray(metaseg_unet.forward(params, jnp.asarray(x)))

    mesh = make_mesh(8)
    xp, n = pad_to_multiple(x, 8)
    fn = jax.jit(
        metaseg_unet.forward,
        in_shardings=(param_shardings(params, mesh), shard_patch_batch(mesh)),
    )
    out = np.asarray(fn(params, jnp.asarray(xp)))[:n]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_dryrun_multichip_entrypoint():
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_train_step_loss_decreases():
    import optax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.runtime.train import make_train_step, softmax_xent_loss

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(opt))
    rng = np.random.default_rng(0)
    x = (rng.random((4, 32, 32, 1)) * 255).astype(np.uint8)
    y = (rng.random((4, 32, 32)) * 4).astype(np.int32)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, jnp.asarray(x), jnp.asarray(y))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
