"""Lightweight per-stage tracing for the pipelines.

The reference has no tracing at all (SURVEY 5.1 -- progress is print/tqdm
only).  This framework adds an opt-in stage timer:

    ECSEG_TRACE=1 make metaseg

prints a per-stage wall-time table (count / total / mean / max) when the
pipeline finishes.  Stages nest freely; timings are attributed to the
innermost stage.  With ``ECSEG_TRACE_DIR=<dir>`` a device-level
``jax.profiler`` trace is also captured around the whole run, viewable in
XProf/TensorBoard (the TPU-native analog of a CUDA nsys capture).

Zero overhead when disabled: ``stage()`` returns a no-op context manager.
"""

from __future__ import annotations

import atexit
import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, List, Optional


class Tracer:
    def __init__(self, enabled: Optional[bool] = None):
        if enabled is None:
            enabled = os.environ.get("ECSEG_TRACE", "") not in ("", "0")
        self.enabled = enabled
        self._times: Dict[str, List[float]] = defaultdict(list)
        self._profile_dir = os.environ.get("ECSEG_TRACE_DIR") or None
        self._profiling = False
        # per-thread nesting stacks: stat_fish's lookahead tail thread
        # opens stages concurrently with the main thread
        self._local = threading.local()

    def _stack(self) -> List[float]:
        st = getattr(self._local, "child_time", None)
        if st is None:
            st = self._local.child_time = [0.0]
        return st

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        # self-time accounting: a stage's recorded time excludes the time
        # of stages nested inside it, so the report columns sum to real
        # wall time ("timings are attributed to the innermost stage")
        stack = self._stack()
        stack.append(0.0)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - t0
            inner = stack.pop()
            self._times[name].append(elapsed - inner)
            stack[-1] += elapsed

    def start_device_profile(self):
        if self._profile_dir and not self._profiling:
            import jax

            jax.profiler.start_trace(self._profile_dir)
            self._profiling = True

    def stop_device_profile(self):
        if self._profiling:
            import jax

            jax.profiler.stop_trace()
            self._profiling = False

    def report(self, out=None) -> str:
        if not self._times:
            return ""
        lines = [
            f"{'stage':34s} {'n':>5s} {'total_s':>9s} {'mean_ms':>9s} {'max_ms':>9s}"
        ]
        for name, ts in sorted(
            self._times.items(), key=lambda kv: -sum(kv[1])
        ):
            lines.append(
                f"{name:34s} {len(ts):5d} {sum(ts):9.3f} "
                f"{1e3 * sum(ts) / len(ts):9.2f} {1e3 * max(ts):9.2f}"
            )
        text = "\n".join(lines)
        print("\n[ecseg trace]\n" + text, file=out)
        return text

    def reset(self):
        self._times.clear()


_tracer: Optional[Tracer] = None


def tracer() -> Tracer:
    global _tracer
    if _tracer is None:
        _tracer = Tracer()
        if _tracer.enabled:
            _tracer.start_device_profile()
            atexit.register(_tracer.stop_device_profile)
            atexit.register(_tracer.report)
    return _tracer


def stage(name: str):
    """Module-level shortcut: ``with trace.stage("forward"): ...``"""
    return tracer().stage(name)
