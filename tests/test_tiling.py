import numpy as np
import pytest

from ecseg_tpu.ops import tiling


def _reference_positions(h, w, overlap_value=25, scw=256):
    """Direct transcription of the position math for cross-checking."""
    cropped_h = h - 2 * overlap_value
    cropped_w = w - 2 * overlap_value
    spw = scw - 2 * overlap_value
    qh, rh = divmod(cropped_h, spw)
    qw, rw = divmod(cropped_w, spw)
    L_h = [spw * e for e in range(qh)]
    L_w = [spw * e for e in range(qw)]
    if rh != 0:
        L_h.append(cropped_h - spw)
    if rw != 0:
        L_w.append(cropped_w - spw)
    xx, yy = np.meshgrid(L_h, L_w)
    P = [np.ravel(xx), np.ravel(yy)]
    return [(int(P[0][i]), int(P[1][i])) for i in range(len(P[0]))]


@pytest.mark.parametrize("h,w", [(1024, 1024), (512, 700), (256, 256), (300, 258)])
def test_positions(h, w):
    assert tiling.patch_positions(h, w) == _reference_positions(h, w)


@pytest.mark.parametrize("h,w", [(1024, 1024), (512, 700), (462, 874)])
def test_patchify_roundtrip_interior(h, w, rng):
    """The stitched canvas must reproduce the source values on the interior
    prediction grid (identity 'model')."""
    img = rng.random((h, w, 1))
    _, patches, pos = tiling.im2patches_overlap(img)
    # fake a 4-channel prediction by broadcasting the input
    preds = np.repeat(patches, 4, axis=-1)
    out = tiling.patches2im_overlap(preds, pos)
    assert out.shape == (h, w, 4)
    ov = tiling.OVERLAP
    np.testing.assert_allclose(out[ov:-ov, ov:-ov, 0], img[ov:-ov, ov:-ov, 0])


@pytest.mark.parametrize("h,w", [(1024, 1024), (512, 700), (256, 256), (462, 874)])
def test_jax_stitcher_matches_host(h, w, rng):
    img = rng.random((h, w, 1)).astype(np.float32)
    _, patches, pos = tiling.im2patches_overlap(img)
    preds = np.concatenate(
        [patches, patches * 2, patches + 1, patches * 0.5], axis=-1
    ).astype(np.float32)
    host = tiling.patches2im_overlap(preds, pos)
    dev = np.asarray(tiling.stitch_patches_jax(preds, tuple(map(tuple, pos))))
    np.testing.assert_allclose(dev, host.astype(np.float32), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("h,w", [(512, 700), (256, 256)])
def test_stitch_argmax_matches_reference_order(h, w, rng):
    """argmax(u8(stitch(probs))) == stitch_argmax_jax(probs) -- the fused
    device path must match the reference operation order exactly."""
    img = rng.random((h, w, 1)).astype(np.float32)
    _, patches, pos = tiling.im2patches_overlap(img)
    probs = rng.random((len(pos), 256, 256, 4)).astype(np.float32)
    host = tiling.patches2im_overlap(probs, pos)
    host_u8 = tiling.img_as_ubyte_float(host)
    ref_labels = np.argmax(host_u8, axis=2)
    fused = np.asarray(
        tiling.stitch_argmax_jax(probs, tuple(map(tuple, pos)))
    )
    np.testing.assert_array_equal(fused, ref_labels)


def test_img_as_ubyte_float():
    x = np.array([0.0, 0.5, 1.0, 0.999, 0.001])
    out = tiling.img_as_ubyte_float(x)
    np.testing.assert_array_equal(out, [0, 128, 255, 255, 0])


def test_quantize_u8_jax_exact_at_boundaries(rng):
    """quantize_u8_jax must equal the host rint(float64(p)*255) for EVERY
    f32 input -- a plain f32 multiply mis-rounds 128 boundary values (r2
    review finding, counterexample p=0.0019607844296842813)."""
    import jax.numpy as jnp

    from ecseg_tpu.ops.tiling import img_as_ubyte_float, quantize_u8_jax

    vals = [np.float32(0.0019607844296842813)]
    # a ladder of f32 neighbors around every half-integer boundary
    for k in range(255):
        t = np.float32((k + 0.5) / 255.0)
        for _ in range(6):
            vals.append(t)
            t = np.nextafter(t, np.float32(0), dtype=np.float32)
        t = np.float32((k + 0.5) / 255.0)
        for _ in range(6):
            t = np.nextafter(t, np.float32(1e9), dtype=np.float32)
            vals.append(t)
    vals.extend(rng.random(4096).astype(np.float32))
    vals.extend([np.float32(0), np.float32(1), np.float32(0.5)])
    p = np.asarray(vals, np.float32)
    want = img_as_ubyte_float(p)
    got = np.asarray(quantize_u8_jax(jnp.asarray(p)))
    np.testing.assert_array_equal(got, want)
