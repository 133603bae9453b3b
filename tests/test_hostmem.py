"""Host allocator tuning (ecseg_tpu.runtime.hostmem)."""

import numpy as np

from ecseg_tpu.runtime.hostmem import tune_host_allocator


def test_tune_host_allocator_is_idempotent_and_succeeds_on_glibc():
    first = tune_host_allocator()
    second = tune_host_allocator()
    # this environment is glibc Linux, so the mallopt must take effect
    assert first is True
    assert second is True


def test_allocations_still_work_after_tune():
    tune_host_allocator()
    a = np.zeros((512, 512), np.int32)
    assert int(np.bincount(a.ravel())[0]) == 512 * 512
