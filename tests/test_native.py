"""Native C++ kernels vs Python/scipy references: bit-exact agreement."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from ecseg_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_native_cc_matches_scipy(rng, connectivity):
    mask = rng.random((120, 90)) > 0.55
    s = ndi.generate_binary_structure(2, connectivity)
    ref_labels, ref_n = ndi.label(mask, structure=s)
    out, n = native.cc_label(mask, connectivity=connectivity)
    assert n == ref_n
    np.testing.assert_array_equal(out, ref_labels)


def test_native_maxflow_matches_python(rng):
    from ecseg_tpu.ops import maxflow as mf

    m = np.zeros((40, 70), np.int64)
    yy, xx = np.mgrid[:40, :70]
    m[(yy - 20) ** 2 + (xx - 17) ** 2 <= 144] = 1
    m[(yy - 20) ** 2 + (xx - 52) ** 2 <= 144] = 1
    m[18:23, 28:42] = 1
    c1, c2 = (20, 17), (20, 52)

    g, _ = mf._build_graph(m, c1, c2, 5)
    py_g1, py_g2 = mf._partition_min_cut(m, g, c1, c2)
    nat = native.maxflow_partition(m, c1, c2, 5)
    assert nat is not None
    nat_g1, flow = nat
    np.testing.assert_array_equal(nat_g1, py_g1)
    assert flow > 0


def test_native_watershed_matches_python(rng):
    import ecseg_tpu.ops.watershed as ws

    image = rng.random((30, 30))
    markers = np.zeros((30, 30), np.int64)
    markers[5, 5] = 1
    markers[25, 25] = 2
    markers[5, 25] = 3
    mask = rng.random((30, 30)) > 0.1
    for wsl in (False, True):
        nat = native.watershed(image, np.where(mask, markers, 0), mask,
                               connectivity=1, watershed_line=wsl)
        # force the Python path by calling the body with native disabled
        import os

        os.environ["ECSEG_NO_NATIVE"] = "1"
        try:
            native._lib = None
            py = ws.watershed(image, markers, mask, watershed_line=wsl)
        finally:
            del os.environ["ECSEG_NO_NATIVE"]
            native._lib = None
        np.testing.assert_array_equal(nat, py)
