"""ctypes bindings for the native host kernels (cc_maxflow.cpp).

The library is built by ``make native`` (or on first import, if a compiler
is available); every entry point has a pure-Python fallback in
ecseg_tpu/ops, and the test suite asserts the two agree bit-for-bit.

Set ``ECSEG_NO_NATIVE=1`` to force the Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libecseg_native.so")
_SRC = os.path.join(_HERE, "cc_maxflow.cpp")

_lib = None
_load_failed = False  # negative cache: never retry a failed build/dlopen
# per call (stat_fish's min-cut calls this once per recursive split; each
# doomed retry would spawn a multi-second g++ subprocess)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except subprocess.CalledProcessError as e:
        import sys

        print(
            "ecseg native build failed (python fallbacks stay active):\n"
            + e.stderr.decode(errors="replace")[-2000:],
            file=sys.stderr,
        )
        return False
    except Exception:
        return False


def _record_native_fallback() -> None:
    """Count the build/dlopen failure once (runtime/fallbacks); an explicit
    ECSEG_NO_NATIVE opt-out is not a failure and is never recorded."""
    try:
        from ..runtime import fallbacks

        fallbacks.record(fallbacks.NATIVE_BUILD)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("ECSEG_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            _load_failed = True
            _record_native_fallback()
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _load_failed = True
        _record_native_fallback()
        return None

    lib.cc_label.restype = ctypes.c_int64
    lib.cc_label.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.maxflow_partition.restype = ctypes.c_int64
    lib.maxflow_partition.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.watershed.restype = None
    lib.watershed.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def cc_label(mask: np.ndarray, connectivity: int = 2):
    """(labels int64, num) or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    H, W = mask.shape
    out = np.empty((H, W), np.int64)
    n = lib.cc_label(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H,
        W,
        connectivity,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out, int(n)


def maxflow_partition(
    img: np.ndarray, start: Tuple[int, int], target: Tuple[int, int], dist: int
):
    """(group1 int32 mask, flow) or None."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.int32)
    H, W = img.shape
    group1 = np.empty((H, W), np.int32)
    flow = lib.maxflow_partition(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        H,
        W,
        int(start[0]),
        int(start[1]),
        int(target[0]),
        int(target[1]),
        int(dist),
        group1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return group1, int(flow)


def watershed(
    image: np.ndarray,
    markers: np.ndarray,
    mask: np.ndarray,
    connectivity: int = 1,
    watershed_line: bool = False,
):
    """int64 label image or None."""
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.float64)
    markers = np.ascontiguousarray(markers, dtype=np.int64)
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    H, W = image.shape
    out = np.empty((H, W), np.int64)
    lib.watershed(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        markers.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H,
        W,
        connectivity,
        1 if watershed_line else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out
