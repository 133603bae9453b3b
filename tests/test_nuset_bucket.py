"""Geometry bucketing: bucket-padded NuSeT passes must be bit-identical to
the unpadded programs (masked forward + -inf anchor masking)."""

import numpy as np
import pytest

from _nusetutil import crafted_nuset_model

from ecseg_tpu.models import nuset_infer


@pytest.fixture(scope="module")
def model():
    return crafted_nuset_model()


def _norm_image(rng, h, w):
    img = rng.random((h, w)).astype(np.float32) * 0.2
    img[h // 4 : h // 2, w // 4 : w // 2] = 1.5  # a bright blob
    img -= img.mean()
    img /= img.std()
    return img


@pytest.mark.parametrize("hw", [(96, 160), (160, 208)])
def test_bucketed_pass1_matches_unbucketed(model, rng, hw):
    img = _norm_image(rng, *hw)
    want = nuset_infer.nuset_forward(model, img, pass_two=False, bucket=False)
    got = nuset_infer.nuset_forward(model, img, pass_two=False, bucket=True)
    assert got.shape == want.shape == hw
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("hw", [(96, 160)])
def test_bucketed_pass2_matches_unbucketed(model, rng, hw):
    img = _norm_image(rng, *hw)
    want = nuset_infer.nuset_forward(model, img, pass_two=True, bucket=False)
    got = nuset_infer.nuset_forward(model, img, pass_two=True, bucket=True)
    np.testing.assert_array_equal(got, want)


def test_bucket_dim_bounds_compile_count():
    # a realistically mixed-size folder lands in very few buckets
    sizes = [600, 608, 614, 640, 512, 700, 702, 688]
    buckets = {nuset_infer._bucket_dim(s) for s in sizes}
    assert buckets == {512, 640, 768}
    assert all(b % 16 == 0 for b in buckets)
    assert nuset_infer._bucket_dim(16) == 128  # floor bucket


def test_one_program_per_bucket(model, rng):
    """The bucketing's entire value is ONE compile per bucket: valid_hw is a
    traced scalar pair, not a static cache key, so distinct true geometries
    in the same bucket must NOT add jit cache entries (r2 review finding:
    static valid_hw silently re-specialized per geometry)."""
    base = nuset_infer._mask_pass._cache_size()
    for hw in [(96, 112), (80, 128), (112, 96), (48, 64)]:  # one bucket: 128x128
        nuset_infer.nuset_forward(model, _norm_image(rng, *hw), pass_two=False)
    assert nuset_infer._mask_pass._cache_size() <= base + 1

    base2 = nuset_infer._mask_and_feat_pass._cache_size()
    basep = nuset_infer._proposal_pass._cache_size()
    for hw in [(96, 112), (80, 128)]:
        nuset_infer.nuset_forward(model, _norm_image(rng, *hw), pass_two=True)
    assert nuset_infer._mask_and_feat_pass._cache_size() <= base2 + 1
    assert nuset_infer._proposal_pass._cache_size() <= basep + 1


def test_aligned_size_skips_padding(model, rng):
    # /128-aligned inputs take the identical (valid_hw=None) program
    img = _norm_image(rng, 128, 256)
    a = nuset_infer.nuset_forward(model, img, pass_two=False, bucket=True)
    b = nuset_infer.nuset_forward(model, img, pass_two=False, bucket=False)
    np.testing.assert_array_equal(a, b)
