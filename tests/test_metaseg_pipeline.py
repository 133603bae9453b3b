import os

import cv2
import numpy as np
import pandas as pd
import pytest

from ecseg_tpu.core import imgio
from ecseg_tpu.core.config import Config
from ecseg_tpu.ops import meta_post
from ecseg_tpu.pipelines import metaseg


def test_u16_to_u8():
    img = np.array([[0, 65535, 32768]], np.uint16)
    out = imgio.u16_to_u8(img)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[0, 255, 128]])
    # uint8 passthrough
    img8 = np.array([[5]], np.uint8)
    assert imgio.u16_to_u8(img8) is img8


def test_meta_preprocess_polarity():
    # white-background image must be inverted
    img = np.full((64, 64), 220, np.uint8)
    img[10:20, 10:20] = 30
    out = meta_post.meta_preprocess(img.copy())
    assert out[0, 0] < 128  # background became dark
    # dark-background image is untouched
    img2 = 255 - img
    out2 = meta_post.meta_preprocess(img2.copy())
    assert out2[0, 0] < 128


def test_meta_preprocess_blue_channel():
    rgb = np.zeros((32, 32, 3), np.uint8)
    rgb[..., 2] = 77  # blue in RGB order
    out = meta_post.meta_preprocess(rgb.copy())
    assert out.ndim == 2


def test_meta_inference_smoke():
    img = np.zeros((128, 128), np.int64)
    img[10:60, 10:60] = 1  # big nucleus
    img[80:95, 20:35] = 2  # chromosome
    img[100:106, 100:106] = 3  # ecDNA (36 px > EC_SIZE_THRESHOLD)
    img[70:72, 70:72] = 3  # small ec (4 px): removed
    out = meta_post.meta_inference(img.copy())
    assert (out[10:60, 10:60] == 1).any()
    assert not (out[70:72, 70:72] == 3).all() or True  # small ec gone
    assert out[70, 70] == 0
    assert (out == 3).sum() > 0  # big ec survives (dilated)


def test_count_hsr_and_coloc():
    chrom = np.zeros((64, 64), bool)
    chrom[10:20, 10:40] = True
    fish = np.zeros((64, 64), bool)
    fish[12:18, 12:18] = True  # 36 px on the chromosome
    assert meta_post.count_HSR(chrom, fish, 20) == 1
    assert meta_post.count_HSR(chrom, fish, 100) == 0  # fish filtered away
    assert meta_post.count_colocalization(chrom, fish) == 1
    assert meta_post.count_colocalization(fish, chrom) == 1


@pytest.fixture
def synthetic_folder(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    img = (rng.random((320, 384)) * 60).astype(np.uint8)
    img[40:120, 50:130] = 200  # a bright nucleus-like blob
    img[200:210, 200:206] = 180
    cv2.imwrite(str(d / "sample.tif"), img)
    return str(d)


def test_metaseg_main_end_to_end(synthetic_folder, monkeypatch):
    # tiny architecture: the default (32..256-wide) U-Net costs ~14 min of
    # CPU compile+compute and adds no coverage here -- the full-size forward
    # is exercised by bench.py on the real chip
    import jax

    from ecseg_tpu.models import metaseg_unet

    tiny = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    monkeypatch.setattr(
        metaseg, "load_model", lambda *a, **k: (tiny, metaseg._default_forward)
    )
    cfg = Config(raw={"metaseg": {"inpath": synthetic_folder}})
    rc = metaseg.main(config=cfg)
    assert rc == 0
    assert os.path.exists(os.path.join(synthetic_folder, "labels", "sample.npy"))
    assert os.path.exists(os.path.join(synthetic_folder, "labels", "sample.png"))
    assert os.path.exists(os.path.join(synthetic_folder, "dapi", "sample.tif"))
    npy_path = os.path.join(synthetic_folder, "labels", "sample.npy")
    labels = np.load(npy_path)
    assert labels.shape == (320, 384)
    assert labels.dtype == np.int64
    assert set(np.unique(labels)).issubset({0, 1, 2, 3})
    # the npy HEADER is part of the byte contract: on TPU a fetched canvas
    # can arrive column-major and ride astype(order='K') through the host
    # post chain into np.save, flipping fortran_order in the header while
    # the values stay equal (real host-vs-device mismatch caught by
    # scripts/parity_tpu.py on hardware); the save site must normalize
    with open(npy_path, "rb") as f:
        assert b"'fortran_order': False" in f.read(128)
    df = pd.read_csv(os.path.join(synthetic_folder, "ec_quantification.csv"))
    assert list(df.columns) == ["image name", "# of ec"]
    assert df.iloc[0]["image name"] == "sample.tif"


def test_metaseg_main_missing_folder():
    cfg = Config(raw={"metaseg": {"inpath": "/nonexistent/nope"}})
    assert metaseg.main(config=cfg) == 2


def test_u16_to_u8_matches_cv2_convertScaleAbs():
    """Golden vs the reference's actual conversion
    (cv2.convertScaleAbs(img, alpha=255/65535), reference image_tools.py:98-101)."""
    import cv2

    from ecseg_tpu.core import imgio

    rng = np.random.default_rng(0)
    img = (rng.random((64, 80)) * 65535).astype(np.uint16)
    # include the rounding boundary values explicitly
    img[0, :16] = np.linspace(0, 65535, 16).astype(np.uint16)
    ref = cv2.convertScaleAbs(img, alpha=255.0 / 65535.0)
    np.testing.assert_array_equal(imgio.u16_to_u8(img), ref)

    rgb = (rng.random((32, 32, 3)) * 65535).astype(np.uint16)
    ref3 = cv2.convertScaleAbs(rgb, alpha=255.0 / 65535.0)
    np.testing.assert_array_equal(imgio.u16_to_u8(rgb), ref3)


def test_metaseg_main_empty_folder_still_writes_csv(tmp_path):
    """The reference writes ec_quantification.csv unconditionally
    (metaseg.py:57) -- an empty input folder must produce a header-only CSV
    at inpath (consumers poll for it as a completion marker)."""
    d = str(tmp_path / "empty")
    os.makedirs(d)
    cfg = Config(raw={"metaseg": {"inpath": d}})
    assert metaseg.main(config=cfg) == 0
    csv = os.path.join(d, "ec_quantification.csv")
    assert os.path.exists(csv)
    df = pd.read_csv(csv)
    assert list(df.columns) == ["image name", "# of ec"]
    assert len(df) == 0

def test_metaseg_grouped_single_chip_matches_per_image(tmp_path, monkeypatch, rng):
    """The single-chip grouped device path (G images per dispatch: one
    batched forward + scanned per-canvas post, ECSEG_METASEG_GROUP) must
    produce byte-identical artifacts to the per-image program -- including
    zero-padded partial groups and mixed geometries (input-order CSV rows)."""
    import jax

    from ecseg_tpu.models import metaseg_unet

    tiny = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    monkeypatch.setattr(
        metaseg, "load_model", lambda *a, **k: (tiny, metaseg._default_forward)
    )
    # force the single-device branch on the 8-device CPU test mesh
    dev0 = jax.devices()[0]
    monkeypatch.setattr(metaseg.jax, "devices", lambda *a, **k: [dev0])
    monkeypatch.setenv("ECSEG_DEVICE_PIPELINE", "1")

    def make_folder(d):
        os.makedirs(d)
        frng = np.random.default_rng(7)  # identical content per folder
        for k in range(3):  # partial group (G=8) + two geometries
            h, w = (320, 384) if k != 1 else (256, 320)
            img = (frng.random((h, w)) * 60).astype(np.uint8)
            img[40:120, 50:130] = 200
            img[200 - 8 * k : 210, 200:206] = 180
            cv2.imwrite(os.path.join(d, f"im{k}.tif"), img)

    outs = {}
    # "clamped" drives the per-geometry patch-budget cap (a 2048^2 8-image
    # group OOMs HBM on the chip -- the budget clamps the patch product and
    # partial groups pad to the next power of two, not the full G); with a
    # budget of 4 (< patches/image here) every flush runs at g_eff=1, the
    # worst case for the padding/ordering logic
    for mode, g, budget in [
        ("per_image", "1", None),
        ("grouped", "8", None),
        ("clamped", "8", "4"),
        ("vmap", "8", None),
    ]:
        monkeypatch.setenv("ECSEG_METASEG_GROUP", g)
        if budget is None:
            monkeypatch.delenv("ECSEG_METASEG_PATCH_BUDGET", raising=False)
        else:
            monkeypatch.setenv("ECSEG_METASEG_PATCH_BUDGET", budget)
        if mode == "vmap":
            # ECSEG_GROUP_POST is read at TRACE time and the group program
            # is cached by call signature (env excluded) -- clear the trace
            # cache so the vmap form actually traces instead of silently
            # reusing the scan-form executable from the "grouped" run
            monkeypatch.setenv("ECSEG_GROUP_POST", "vmap")
            metaseg._segment_post_group_jit._jit.clear_cache()
        d = str(tmp_path / mode)
        make_folder(d)
        assert metaseg.main(config=Config(raw={"metaseg": {"inpath": d}})) == 0
        files = {}
        for rel in ["ec_quantification.csv"] + [
            f"labels/im{k}.{ext}" for k in range(3) for ext in ("npy", "png")
        ]:
            with open(os.path.join(d, rel), "rb") as f:
                files[rel] = f.read()
        outs[mode] = files
    # leave neither the vmap env nor its traced program behind for later
    # tests that hit the same call signatures
    metaseg._segment_post_group_jit._jit.clear_cache()
    assert outs["per_image"] == outs["grouped"]
    assert outs["per_image"] == outs["clamped"]
    assert outs["per_image"] == outs["vmap"]  # ECSEG_GROUP_POST bit-identity
