"""Parity tests for ops/resize.py (the parity-critical 0.3x NuSeT rescale,
reference src/utils.py:135-136,156-157).

scikit-image is not installable in this sandbox (zero egress), so instead of
golden skimage fixtures the implementation is pinned three independent ways:

  1. an explicit-formula bilinear oracle (pure numpy: half-pixel centers,
     edge clamp) -- the sampling grid ndi.zoom(grid_mode=True, order=1) and
     skimage resize both define;
  2. torch.nn.functional.interpolate (align_corners=False), an independent
     C++ implementation of the same sampling;
  3. the anti-aliasing decomposition: resize(aa=True) must equal a gaussian
     prefilter with skimage's documented sigma max(0, (factor-1)/2) followed
     by resize(aa=False).
"""

import numpy as np
import pytest
from scipy import ndimage as ndi

from ecseg_tpu.ops.resize import img_as_float, rescale, resize


def _bilinear_edge_oracle(img, out_shape):
    """Half-pixel-center bilinear sampling with edge clamping, written from
    the definition (no scipy/ndi)."""
    H, W = img.shape
    OH, OW = out_shape
    ry, rx = H / OH, W / OW
    ys = (np.arange(OH) + 0.5) * ry - 0.5
    xs = (np.arange(OW) + 0.5) * rx - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    ty = ys - y0
    tx = xs - x0
    y0c = np.clip(y0, 0, H - 1)
    y1c = np.clip(y0 + 1, 0, H - 1)
    x0c = np.clip(x0, 0, W - 1)
    x1c = np.clip(x0 + 1, 0, W - 1)
    a = img[np.ix_(y0c, x0c)]
    b = img[np.ix_(y0c, x1c)]
    c = img[np.ix_(y1c, x0c)]
    d = img[np.ix_(y1c, x1c)]
    top = a * (1 - tx) + b * tx
    bot = c * (1 - tx) + d * tx
    return top * (1 - ty[:, None]) + bot * ty[:, None]


@pytest.mark.parametrize("out_shape", [(30, 40), (97, 61), (200, 260)])
def test_resize_matches_bilinear_oracle(rng, out_shape):
    img = rng.random((100, 130))
    got = resize(img, out_shape, mode="edge", anti_aliasing=False)
    want = _bilinear_edge_oracle(img, out_shape)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("out_shape", [(30, 40), (150, 200)])
def test_resize_matches_torch_bilinear(rng, out_shape):
    torch = pytest.importorskip("torch")

    img = rng.random((100, 130)).astype(np.float32)
    got = resize(
        img.astype(np.float64), out_shape, mode="edge", anti_aliasing=False
    )
    want = (
        torch.nn.functional.interpolate(
            torch.from_numpy(img)[None, None],
            size=out_shape,
            mode="bilinear",
            align_corners=False,
            antialias=False,
        )[0, 0]
        .numpy()
        .astype(np.float64)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_anti_aliasing_is_gaussian_prefilter(rng):
    img = rng.random((120, 90))
    factors = np.divide(img.shape, (36, 27))
    sigma = np.maximum(0, (factors - 1) / 2)
    pre = ndi.gaussian_filter(img, sigma, mode="mirror")
    np.testing.assert_allclose(
        resize(img, (36, 27), anti_aliasing=True),
        np.clip(resize(pre, (36, 27), anti_aliasing=False), img.min(), img.max()),
        rtol=1e-10,
    )


def test_rescale_nuset_path_shapes_and_range(rng):
    """The exact pipeline path: uint16 -> rescale 0.3 (aa) -> rescale 1/0.3
    (reference src/utils.py:135-157)."""
    img = (rng.random((700, 900)) * 60000).astype(np.uint16)
    small = rescale(img, 0.3, anti_aliasing=True)
    # skimage output shape: round(dim * scale)
    assert small.shape == (round(700 * 0.3), round(900 * 0.3)) == (210, 270)
    # preserve_range=False divides uint16 by 65535
    assert 0.0 <= small.min() and small.max() <= 1.0
    back = rescale(small, 1 / 0.3)
    assert back.shape == (round(210 / 0.3), round(270 / 0.3)) == (700, 900)


def test_rescale_scale_one_is_near_identity(rng):
    img = rng.random((64, 64))
    out = rescale(img, 1.0, anti_aliasing=False)
    np.testing.assert_allclose(out, img, atol=1e-12)


def test_constant_image_invariance():
    img = np.full((50, 70), 0.37)
    out = resize(img, (15, 21), anti_aliasing=True)
    np.testing.assert_allclose(out, 0.37, atol=1e-12)


def test_uint8_preserve_range_flag(rng):
    img = (rng.random((40, 40)) * 255).astype(np.uint8)
    kept = resize(img, (20, 20), preserve_range=True, anti_aliasing=False)
    scaled = resize(img, (20, 20), preserve_range=False, anti_aliasing=False)
    np.testing.assert_allclose(kept / 255.0, scaled, rtol=1e-10)


def test_resize_linear_matmul_matches_host_resize(rng):
    """The matmul-operator device resize must match the host resize
    (order=1, mirror boundary, no anti-aliasing) to f32 accuracy,
    INCLUDING border rows where jax.image.resize's clamping differs."""
    from ecseg_tpu.ops.resize import resize, resize_linear_matmul

    for in_hw, out_hw in [((48, 60), (160, 200)), ((45, 45), (150, 150)),
                          ((30, 50), (13, 21))]:
        img = rng.random(in_hw)
        img[0, :] = 0.0
        img[1, :] = 1.0  # border-sensitive content (mirror vs clamp)
        want = resize(img, out_hw, anti_aliasing=False)
        got = np.asarray(resize_linear_matmul(img.astype(np.float32), out_hw))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_resize_linear_matmul_mask_support_matches(rng):
    """Binarized support after upscale (the nuclei_segment cleanup
    threshold) is identical between host and device resizes."""
    from ecseg_tpu.ops.resize import rescale, resize_linear_matmul

    m = (rng.random((48, 60)) < 0.3).astype(np.uint8)
    host = rescale(m, 1 / 0.3)  # img_as_float path, values {0, 1/255}-ish
    out_hw = host.shape
    dev = np.asarray(resize_linear_matmul(m.astype(np.float32), out_hw))
    lo_h, hi_h = host.min(), host.max()
    lo_d, hi_d = dev.min(), dev.max()
    supp_host = ((host - lo_h) / (hi_h - lo_h) * 255).astype(np.uint8) > 0
    supp_dev = ((dev - lo_d) / (hi_d - lo_d) * 255).astype(np.uint8) > 0
    np.testing.assert_array_equal(supp_dev, supp_host)
