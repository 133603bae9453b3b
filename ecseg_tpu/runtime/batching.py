"""Async host→device pipeline for folder-batch inference.

The reference processes images strictly sequentially: read -> preprocess ->
predict -> postprocess per image (reference src/metaseg.py:42-54).  On TPU
the decode/preprocess (host, OpenCV) and the U-Net forward (device) should
overlap; this module provides a small prefetching executor:

  reader thread(s): imread -> meta_preprocess -> patchify   (CPU)
  main thread:      device forward/stitch/argmax (async dispatch)
                    -> host meta_inference of the PREVIOUS image while the
                       device crunches the current one

With JAX's async dispatch, simply submitting the next device call before
materializing the previous result already double-buffers the device; the
thread pool additionally hides TIFF decode latency.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterable, Iterator, Tuple, TypeVar

T = TypeVar("T")
U = TypeVar("U")


def prefetch_map(
    fn: Callable[[T], U],
    items: Iterable[T],
    prefetch: int = 2,
    max_workers: int = 2,
) -> Iterator[Tuple[T, U]]:
    """Map ``fn`` over ``items`` on a thread pool, yielding in order while
    keeping up to ``prefetch`` results in flight."""
    items = list(items)
    if not items:
        return
    with cf.ThreadPoolExecutor(max_workers=max_workers) as pool:
        futures = {}
        n = len(items)
        next_submit = 0
        for next_submit in range(min(prefetch, n)):
            futures[next_submit] = pool.submit(fn, items[next_submit])
        next_submit = min(prefetch, n)
        for i in range(n):
            result = futures.pop(i).result()
            if next_submit < n:
                futures[next_submit] = pool.submit(fn, items[next_submit])
                next_submit += 1
            yield items[i], result
