"""Multi-chip sharding on the virtual 8-device CPU mesh.

Every test that needs the 8-device mesh falls back to a fresh subprocess
(with the platform forced) when jax was already initialized on another
platform in this process -- so the suite passes on the real-TPU box too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from _meshutil import on_virtual_cpu_mesh, rerun_self_in_subprocess


def _mesh_test(test_name):
    """Returns True if the caller should proceed in-process; otherwise the
    test already re-ran (and passed) in a subprocess."""
    if on_virtual_cpu_mesh(8):
        return True
    rerun_self_in_subprocess(__file__, test_name)
    return False


def test_eight_virtual_devices():
    if not _mesh_test("test_eight_virtual_devices"):
        return
    assert len(jax.devices()) >= 8


def test_make_mesh_shapes():
    if not _mesh_test("test_make_mesh_shapes"):
        return
    from ecseg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model_axis=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 8, "model": 1}


def test_make_mesh_too_few_devices_message():
    from ecseg_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="needs 512 devices"):
        make_mesh(512)


def test_sharded_inference_matches_single_device():
    if not _mesh_test("test_sharded_inference_matches_single_device"):
        return
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
    # dryrun_multichip forces its own subprocess + virtual platform, so this
    # passes regardless of the in-process jax backend.
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


def test_sharded_folder_segmentation_matches_per_image(tmp_path, rng):
    """segment_folder_sharded on the 8-device mesh == the per-image path,
    with patches genuinely distributed over all devices (VERDICT item 4)."""
    if not _mesh_test("test_sharded_folder_segmentation_matches_per_image"):
        return
    import cv2

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.ops import tiling
    from ecseg_tpu.pipelines import metaseg

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    paths = []
    for k, (h, w) in enumerate([(462, 874), (512, 700), (306, 306)]):
        img = (rng.random((h, w)) * 4000).astype(np.uint16)
        img[h // 4 : h // 2, w // 4 : w // 2] = 52000
        p = str(tmp_path / f"im{k}.tif")
        assert cv2.imwrite(p, img)
        paths.append(p)
    (tmp_path / "dapi").mkdir()

    # reference: per-image jit path
    ref = {}
    for p in paths:
        patches, pos = metaseg._prepare_image(p, save_dapi=False)
        lab = metaseg._segment_patches_jit(
            params, jnp.asarray(patches), metaseg._default_forward, pos
        )
        ref[p] = np.asarray(lab).astype(np.int64)

    # sharded: cross-image packed batches over the 8-device mesh
    from ecseg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    got = dict(
        metaseg.segment_folder_sharded(
            params, paths, mesh=mesh, batch_patches=16, save_dapi=False
        )
    )
    assert set(got) == set(ref)
    for p in paths:
        np.testing.assert_array_equal(got[p], ref[p])


def test_stitch_labels_host_matches_device(rng):
    from ecseg_tpu.ops import tiling

    for h, w in [(256, 256), (462, 874)]:
        pos = tiling.patch_positions(h, w)
        n = len(pos)
        labs = (rng.random((n, 256, 256)) * 4).astype(np.int32)
        dev = np.asarray(
            tiling.stitch_patches_jax(
                jnp.asarray(labs)[..., None], tuple(map(tuple, pos))
            )
        )[..., 0]
        host = tiling.stitch_labels_host(labs, pos)
        np.testing.assert_array_equal(host, dev)


def test_remat_train_step_matches_plain():
    """jax.checkpoint rematerialization changes memory, not math."""
    import optax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.runtime.train import make_train_step

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    opt = optax.adam(1e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((2, 32, 32, 1)) * 255).astype(np.uint8))
    y = jnp.asarray((rng.random((2, 32, 32)) * 4).astype(np.int32))

    outs = []
    for remat in (False, True):
        p, s = params, opt.init(params)
        step = jax.jit(make_train_step(opt, remat=remat))
        p, s, loss = step(p, s, x, y)
        outs.append((p, float(loss)))
    (p0, l0), (p1, l1) = outs
    np.testing.assert_allclose(l0, l1, rtol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        p0,
        p1,
    )


def test_pad_samples_do_not_bias_loss_or_grads():
    """Batches padded to the device count must not contaminate the loss:
    stepping on (real batch) == stepping on (real batch + zero pads +
    valid mask) exactly (r2 review finding: pads biased toward class 0)."""
    import optax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.runtime.train import make_train_step

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(1), widths=(8, 16), bottleneck=32
    )
    # SGD: the update is linear in the gradient, so pad-sample leakage shows
    # up directly (adam's eps-normalized step-1 update amplifies benign
    # reduction-order noise instead)
    opt = optax.sgd(0.1)
    rng = np.random.default_rng(1)
    x = (rng.random((3, 32, 32, 1)) * 255).astype(np.uint8)
    y = (rng.random((3, 32, 32)) * 4).astype(np.int32)
    xp = np.concatenate([x, np.zeros((5, 32, 32, 1), np.uint8)])
    yp = np.concatenate([y, np.zeros((5, 32, 32), np.int32)])
    valid = np.arange(8) < 3

    step = jax.jit(make_train_step(opt))
    p0, s0, l0 = step(
        params, opt.init(params), jnp.asarray(x), jnp.asarray(y),
        jnp.ones((3,), bool),
    )
    p1, s1, l1 = step(
        params, opt.init(params), jnp.asarray(xp), jnp.asarray(yp),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        p0,
        p1,
    )


def test_mesh_step_forwards_remat_and_masks_pads():
    """jit_train_step_on_mesh must honor remat= (r2 review finding: the
    script flag was parsed but dropped) and take the valid mask."""
    import optax

    from _meshutil import on_virtual_cpu_mesh, rerun_self_in_subprocess

    if not on_virtual_cpu_mesh():
        rerun_self_in_subprocess(
            __file__, "test_mesh_step_forwards_remat_and_masks_pads"
        )
        return

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.parallel.mesh import make_mesh
    from ecseg_tpu.runtime.train import jit_train_step_on_mesh

    mesh = make_mesh(8, model_axis=2)
    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=256
    )
    losses = []
    for remat in (False, True):
        opt = optax.adam(1e-3)
        step, p_shard, b_shard, opt = jit_train_step_on_mesh(
            mesh, opt, params_example=params, remat=remat
        )
        p = jax.device_put(params, p_shard)
        x = jax.device_put(jnp.zeros((8, 32, 32, 1), jnp.uint8), b_shard)
        y = jnp.zeros((8, 32, 32), jnp.int32)
        valid = jnp.asarray(np.arange(8) < 6)
        _, _, loss = step(p, opt.init(p), x, y, valid)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-7)


def test_segment_folder_sharded_device_matches_per_image(tmp_path):
    """The device-post sharded path (stitch + meta_inference on each
    image's home device, packed-blob fetches) must equal the per-image
    chain, across a full group, a remainder group, and a mixed geometry."""
    import os

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.ops.cc import count_cc
    from ecseg_tpu.ops.meta_post import meta_inference
    from ecseg_tpu.parallel.mesh import make_mesh
    from ecseg_tpu.pipelines import metaseg

    mesh = make_mesh(8, model_axis=2)
    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    rng = np.random.default_rng(0)
    paths = []
    for k in range(9):
        h, w = (320, 384) if k != 5 else (300, 300)
        img = (rng.random((h, w)) * 60).astype(np.uint8)
        img[h // 4 : h // 2, w // 4 : w // 2] = 200
        img[20:24, 30:33] = 230
        p = str(tmp_path / f"im{k:02d}.tif")
        cv2.imwrite(p, img)
        paths.append(p)

    got = list(
        metaseg.segment_folder_sharded_device(
            (params, metaseg._default_forward), paths, mesh=mesh,
            save_dapi=False,
        )
    )
    assert [g[0] for g in got] == paths
    for p, I, num in got:
        patches, pos = metaseg._prepare_image(p, save_dapi=False)
        lab = np.asarray(
            metaseg._segment_patches_jit(
                params, jnp.asarray(patches), metaseg._default_forward, pos,
                jnp.float32,
            )
        ).astype(np.int64)
        want_I = meta_inference(lab)
        assert np.array_equal(I, want_I), p
        assert num == count_cc(want_I == 3)[0], p
