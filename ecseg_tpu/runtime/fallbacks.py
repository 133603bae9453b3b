"""Device->host fallback counters.

Three mechanisms can silently degrade a device pipeline run to the host
oracle: (1) the device meta_inference ``ok`` flag (component-budget
overflow / centroid near-tie, ops/meta_post_tpu), (2) the Pallas VMEM
compile-envelope gate (ops/cc_pallas._fits_vmem / the stitch VMEM budget),
and (3) a failed native-library build (ecseg_tpu/native).  The outputs are
bit-identical either way -- that is the parity contract -- but a run where
every image quietly falls back is a *performance* regression that was
previously invisible.  This module makes the events countable:

* each mechanism calls :func:`record` with a short kind string;
* pipeline mains print a one-line summary via :func:`report` (always --
  ``fallbacks: none`` is the healthy signal), and the ``ECSEG_TRACE=1``
  stage table is accompanied by the same line;
* tests assert the counters fire on forced fallbacks
  (tests/test_fallbacks.py).

Counters are process-global and thread-safe (stat_fish's lookahead tail
thread records from off-main threads).
"""

from __future__ import annotations

import threading
from collections import Counter
from typing import Dict

_lock = threading.Lock()
_counts: Counter = Counter()

# Canonical kind strings (callers pass these; new kinds are allowed):
META_POST_OK = "meta_post_ok_false"  # device meta_inference said redo-on-host
PALLAS_VMEM = "pallas_vmem_gate"  # geometry beyond the Pallas envelope
NATIVE_BUILD = "native_build_failed"  # C++ lib unavailable -> Python paths


def record(kind: str, n: int = 1) -> None:
    """Count one device->host fallback event of the given kind."""
    with _lock:
        _counts[kind] += n


def counts() -> Dict[str, int]:
    with _lock:
        return dict(_counts)


def reset() -> None:
    with _lock:
        _counts.clear()


def summary() -> str:
    """One line: ``fallbacks: none`` or ``fallbacks: kind=3 kind2=1``."""
    c = counts()
    if not c:
        return "fallbacks: none"
    return "fallbacks: " + " ".join(
        f"{k}={v}" for k, v in sorted(c.items())
    )


def report(out=None) -> str:
    """Print and return the summary line (pipeline mains call this once at
    the end of every run)."""
    line = "[ecseg] " + summary()
    print(line, file=out, flush=True)
    return line
