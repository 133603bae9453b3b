"""Demo weight crafting (ecseg_tpu.models.demo + scripts/make_demo_weights)."""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from ecseg_tpu.models import classifiers, demo, metaseg_unet


@pytest.fixture(scope="module")
def demo_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("demo_weights")
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "make_demo_weights.py",
    )
    subprocess.run(
        [
            sys.executable,
            script,
            "--model-dir",
            str(root / "models"),
            "--interseg-dir",
            str(root / "interseg_models"),
            "--no-inputs",
        ],
        check=True,
    )
    return root


def test_script_writes_all_four_files(demo_dirs):
    assert (demo_dirs / "models" / "metaseg.npz").exists()
    assert (demo_dirs / "models" / "nuset.npz").exists()
    assert (demo_dirs / "interseg_models" / "interseg.npz").exists()
    assert (demo_dirs / "interseg_models" / "ecseg_c.npz").exists()


def test_script_keeps_existing_weights_without_force(demo_dirs, tmp_path):
    """Real converted weights at the target paths must survive a rerun --
    only --force overwrites (advisor finding r1)."""
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "make_demo_weights.py",
    )
    mdir, idir = tmp_path / "models", tmp_path / "interseg_models"
    mdir.mkdir()
    idir.mkdir()
    sentinel = b"REAL-WEIGHTS-SENTINEL"
    (mdir / "metaseg.npz").write_bytes(sentinel)
    args = [sys.executable, script, "--model-dir", str(mdir),
            "--interseg-dir", str(idir), "--no-inputs"]
    subprocess.run(args, check=True)
    assert (mdir / "metaseg.npz").read_bytes() == sentinel  # untouched
    assert (mdir / "nuset.npz").exists()  # missing ones still written
    subprocess.run(args + ["--force"], check=True)
    assert (mdir / "metaseg.npz").read_bytes() != sentinel  # now replaced


def test_metaseg_demo_weights_band_brightness(demo_dirs):
    from ecseg_tpu.pipelines.metaseg import load_model

    params, forward_fn = load_model(str(demo_dirs / "models"))
    x = np.zeros((1, 64, 64, 1), np.uint8)
    x[0, :, :21] = 10  # background band
    x[0, :, 21:42] = 128  # nuclei band
    x[0, :, 42:] = 230  # ecDNA band
    probs = forward_fn(params, jnp.asarray(x), jnp.float32)
    lab = np.asarray(jnp.argmax(probs, -1))[0]
    # check away from band borders (conv halo)
    assert lab[32, 10] == 0
    assert lab[32, 31] == 1
    assert lab[32, 55] == 3


def test_nuset_demo_weights_segment_a_blob(demo_dirs):
    from ecseg_tpu.pipelines.stat_fish import load_nuset_model

    model = load_nuset_model(
        str(demo_dirs / "models"),
        bbox_min_score=0.95,
        nms_threshold=0.01,
        resize_scale=0.3,
    )
    from ecseg_tpu.models import nuset_infer

    H = W = 160
    img = np.full((H, W), 20, np.uint8)
    yy, xx = np.mgrid[:H, :W]
    img[(yy - 80) ** 2 + (xx - 80) ** 2 <= 30**2] = 220
    seg = nuset_infer.nuclei_segment(img, model, 500)
    assert seg[80, 80] == 255
    assert seg[8, 8] == 0


def test_classifier_demo_weights_band_brightness(demo_dirs):
    from ecseg_tpu.models.keras_import import load_npz_pytree

    p_i = load_npz_pytree(str(demo_dirs / "interseg_models" / "interseg.npz"))
    patches = np.stack(
        [
            np.full((256, 256), 10, np.uint8),
            np.full((256, 256), 100, np.uint8),
            np.full((256, 256), 240, np.uint8),
        ]
    )
    pred = np.asarray(classifiers.ecseg_i_forward(p_i, jnp.asarray(patches)))
    assert list(pred.argmax(-1)) == [0, 1, 2]

    p_c = load_npz_pytree(str(demo_dirs / "interseg_models" / "ecseg_c.npz"))
    xc = np.stack(
        [
            np.full((256, 256, 3), 0.02, np.float32),
            np.full((256, 256, 3), 0.9, np.float32),
        ]
    )
    pc = np.asarray(classifiers.ecseg_c_forward(p_c, jnp.asarray(xc)))[:, 0]
    assert pc[0] < 0.5 < pc[1]
