"""Host allocator tuning for the numpy post-processing stages.

On this TPU attachment's kernel, first-touch page faults on fresh ``mmap``'d
allocations run at ~25 MB/s (measured: 5 s to fill a fresh 128 MB buffer,
then 7 GB/s on the second pass).  glibc's malloc serves every allocation
above ``M_MMAP_THRESHOLD`` via a fresh mmap, so each large numpy temporary
(label images, masks, bincounts over 2048x2048 tiles) paid that fault cost
-- e.g. ``np.bincount`` over a fresh 16 MB zeros array measured 2.4 s cold
vs 25 ms after this tune.  Raising the threshold keeps big buffers on the
sbrk heap, where pages are faulted once and then *reused* across numpy
allocations.

Every pipeline ``main()`` and bench.py call :func:`tune_host_allocator`
once at startup.  The trade-off (the heap's high-water mark is not returned
to the OS) is right for batch pipelines that allocate same-shaped images in
a loop.
"""

from __future__ import annotations

import ctypes
import ctypes.util

# glibc malloc.h
M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3

_done = False


def tune_host_allocator(threshold_bytes: int = 1 << 30) -> bool:
    """Raise glibc's mmap threshold so large numpy buffers are heap-served
    and reused, and disable heap trimming so freed top-of-heap blocks keep
    their faulted pages (glibc otherwise returns them to the OS, and the
    next image-sized allocation pays the ~25 MB/s fault cost all over
    again).  Idempotent; returns True if the tune took effect (glibc
    present and mallopt accepted the values), False otherwise (non-glibc
    platforms -- a silent no-op)."""
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6")
        ok = bool(libc.mallopt(M_MMAP_THRESHOLD, ctypes.c_int(threshold_bytes)))
        ok = bool(libc.mallopt(M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1))) and ok
    except (OSError, AttributeError):
        return False
    _done = ok
    return ok
