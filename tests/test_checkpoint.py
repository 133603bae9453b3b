"""Training checkpoint save/restore round-trip and crash-safe latest."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ecseg_tpu.models import metaseg_unet
from ecseg_tpu.runtime.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from ecseg_tpu.runtime.train import make_train_step


def test_roundtrip_and_resume(tmp_path, rng):
    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step_fn = jax.jit(make_train_step(opt))
    x = jnp.asarray((rng.random((2, 32, 32, 1)) * 255).astype(np.uint8))
    y = jnp.asarray((rng.random((2, 32, 32)) * 4).astype(np.int32))

    for step in range(3):
        params, opt_state, _ = step_fn(params, opt_state, x, y)
        save_checkpoint(str(tmp_path), step, params, opt_state)

    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and "step_00000002" in latest

    template = {
        "params": jax.tree.map(np.zeros_like, params),
        "opt_state": jax.tree.map(np.zeros_like, opt_state),
        "step": 0,
    }
    r_params, r_opt, r_step = restore_checkpoint(latest, like=template)
    assert r_step == 2
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        params,
        r_params,
    )

    # resumed training continues identically to uninterrupted training
    cont_params, _, loss_a = step_fn(params, opt_state, x, y)
    res_params, _, loss_b = step_fn(
        jax.tree.map(jnp.asarray, r_params), jax.tree.map(jnp.asarray, r_opt), x, y
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        cont_params,
        res_params,
    )


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    assert latest_checkpoint(str(tmp_path / "missing")) is None
