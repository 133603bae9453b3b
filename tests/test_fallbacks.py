"""Device->host fallback counters (runtime/fallbacks) fire on each forced
fallback mechanism and the pipeline summary line reports them."""

import numpy as np
import pytest

from ecseg_tpu.runtime import fallbacks


@pytest.fixture(autouse=True)
def _clean_counters():
    fallbacks.reset()
    yield
    fallbacks.reset()


def test_counter_api():
    assert fallbacks.counts() == {}
    assert fallbacks.summary() == "fallbacks: none"
    fallbacks.record("x")
    fallbacks.record("x")
    fallbacks.record("y", 3)
    assert fallbacks.counts() == {"x": 2, "y": 3}
    assert fallbacks.summary() == "fallbacks: x=2 y=3"
    line = fallbacks.report()
    assert line.startswith("[ecseg] fallbacks:")
    fallbacks.reset()
    assert fallbacks.counts() == {}


def test_meta_post_ok_false_records():
    """A component-budget overflow clears the device meta_inference ``ok``
    flag; decoding the blob must count the host fallback."""
    from ecseg_tpu.pipelines.metaseg import _decode_post_blob, _post_blob_jit

    # > MAX_NUC isolated nuclei pixels (8-connected): grid spaced by 2
    img = np.zeros((96, 96), np.int32)
    img[::2, ::2] = 1  # 48*48 = 2304 components > MAX_NUC (512)
    blob = np.asarray(_post_blob_jit(img))
    ok, _labels, _num = _decode_post_blob(blob, img.shape[1])
    assert not ok
    assert fallbacks.counts().get(fallbacks.META_POST_OK) == 1


def test_meta_post_ok_true_does_not_record():
    from ecseg_tpu.pipelines.metaseg import _decode_post_blob, _post_blob_jit

    img = np.zeros((96, 96), np.int32)
    img[10:30, 10:30] = 1
    img[50:60, 50:54] = 2
    blob = np.asarray(_post_blob_jit(img))
    ok, _labels, _num = _decode_post_blob(blob, img.shape[1])
    assert ok
    assert fallbacks.counts() == {}


def test_pallas_vmem_gate_records(monkeypatch):
    """Beyond the Pallas compile envelope, label_pallas takes the XLA
    fallback and the gate hit is counted (trace-time, once per geometry)."""
    from ecseg_tpu.ops import cc_pallas

    monkeypatch.setattr(cc_pallas, "_interpret", lambda: False)
    # beyond BOTH the in-VMEM envelope and the banded HBM bound: XLA
    # fallback, recorded
    h, w = 9000, 9000
    assert not cc_pallas._fits_vmem(h, w)
    # records embed the geometry (round-4: a bench-tail fallback line must
    # identify the culprit program): pallas_vmem_gate[9000x9000]
    assert (
        sum(
            n
            for k, n in fallbacks.counts().items()
            if k.startswith(fallbacks.PALLAS_VMEM)
        )
        >= 1
    )
    assert f"{fallbacks.PALLAS_VMEM}[9000x9000]" in fallbacks.counts()
    # within an envelope: no new records -- in-VMEM for small maps, banded
    # for the 2048^2 microscopy class (a Pallas path, not a fallback)
    fallbacks.reset()
    assert cc_pallas._fits_vmem(256, 256)
    assert cc_pallas._fits_vmem(1024, 1024)
    assert not cc_pallas._fits_vmem(2048, 2048)  # routes banded, no record
    assert fallbacks.counts() == {}


def test_native_build_failure_records(monkeypatch, tmp_path):
    import ecseg_tpu.native as native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    monkeypatch.setattr(native, "_build", lambda: False)
    # point at a missing .so so the (mocked, failing) build is attempted
    monkeypatch.setattr(native, "_SO", str(tmp_path / "nope.so"))
    assert native._load() is None
    assert fallbacks.counts().get(fallbacks.NATIVE_BUILD) == 1
    # negative cache: a second call must not re-count
    assert native._load() is None
    assert fallbacks.counts().get(fallbacks.NATIVE_BUILD) == 1
