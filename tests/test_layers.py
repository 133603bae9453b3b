import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecseg_tpu.models import layers


def test_conv2d_same_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)

    y = np.asarray(layers.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    yt = F.conv2d(xt, wt, torch.from_numpy(b), padding=1)
    yt = yt.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size", [8, 9])
def test_conv2d_transpose_matches_torch(rng, size):
    """TF conv2d_transpose('SAME', stride 2, k 3) pads asymmetrically
    (grad-of-conv with SAME pads (0, 1)), which equals the FULL torch
    conv_transpose2d (padding=0) truncated to 2*input on each spatial axis."""
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, size, size, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)  # HWIO, I=in

    y = np.asarray(layers.conv2d_transpose(jnp.asarray(x), jnp.asarray(w)))
    assert y.shape == (1, 2 * size, 2 * size, 6)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    # torch wants (in, out, kh, kw)
    wt = torch.from_numpy(w).permute(2, 3, 0, 1)
    yt = F.conv_transpose2d(xt, wt, stride=2, padding=0)
    yt = yt.permute(0, 2, 3, 1).numpy()[:, : 2 * size, : 2 * size, :]
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-4)


def test_max_pool(rng):
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    y = np.asarray(layers.max_pool(jnp.asarray(x)))
    assert y.shape == (1, 4, 4, 2)
    assert y[0, 0, 0, 0] == x[0, 0:2, 0:2, 0].max()


def test_glorot_uniform_bounds():
    k = jax.random.PRNGKey(0)
    w = layers.glorot_uniform(k, (3, 3, 16, 32))
    limit = np.sqrt(6.0 / (3 * 3 * 16 + 3 * 3 * 32))
    assert np.abs(np.asarray(w)).max() <= limit


def test_metaseg_unet_shapes():
    from ecseg_tpu.models import metaseg_unet

    params = metaseg_unet.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 256, 256, 1), jnp.uint8)
    y = metaseg_unet.forward(params, x)
    assert y.shape == (2, 256, 256, 4)
    probs = np.asarray(y)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_nuset_shapes():
    from ecseg_tpu.models import nuset

    p = nuset.init_unet_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 96, 1), jnp.float32)
    logits, feat = nuset.unet_forward(p, x)
    assert logits.shape == (1, 64, 96, 2)
    assert feat.shape == (1, 4, 6, 512)
    rp = nuset.init_rpn_params(jax.random.PRNGKey(1), num_ref_anchors=21)
    pred = nuset.rpn_forward(rp, feat)
    assert pred["rpn_cls_prob"].shape == (4 * 6 * 21, 2)
    assert pred["rpn_bbox_pred"].shape == (4 * 6 * 21, 4)
