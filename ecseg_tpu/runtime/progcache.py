"""On-disk compiled-program cache: second-process compile latency killer.

The reference starts segmenting immediately (reference src/metaseg.py:33-42);
on this TPU attachment a fresh process pays minutes of XLA compiles for the
U-Net-sized pipeline programs (144 s for the 2048^2 metaseg program) and the
stock jax persistent compilation cache NEVER hits across processes
(COMPILE_CACHE_PROBE.json: 27 entries written, child compile 106 s,
``cache_hit: false``).  The same probe shows the lower primitive DOES work:
``jax.experimental.serialize_executable`` round-trips a compiled PJRT
executable through bytes and reloads in ~0.1 s with bit-equal results.

``cached_jit`` builds the program cache on that primitive:

    seg = cached_jit(segment_fn, static_argnames=("positions",))
    out = seg(x, positions=pos)          # drop-in for jax.jit(...)(...)

Per distinct call signature (static values + dynamic leaf shapes/dtypes) the
wrapper lowers the function ONCE (pure tracing, no compile), hashes the
StableHLO text together with the jax version / platform / device kind, and
then either deserializes a previously saved executable from
``$ECSEG_PROG_CACHE`` (default ``~/.cache/ecseg_tpu/progs``) or compiles and
serializes it.  Keying on the lowered program text makes staleness
structurally impossible: ANY change to the traced computation (code, shapes,
statics, flag-dependent branches) changes the key.

Safety valves:

- enabled only on non-CPU backends by default (CPU compiles are fast and the
  test suite runs on a forced-CPU mesh); ``ECSEG_PROG_CACHE=0`` disables,
  ``ECSEG_PROG_CACHE=<dir>`` enables + relocates, ``=1`` enables at the
  default location (any backend).
- every load/compile/serialize failure falls back to the plain ``jax.jit``
  path and is counted (runtime/fallbacks: ``progcache_error``) -- the cache
  can only ever cost a compile, never an answer.
- a signature collision that slips a mismatched executable through is caught
  by the PJRT input-aval check at call time and falls back the same way.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
import threading
from typing import Any, Callable, Dict, Optional, Tuple

_FORMAT_VERSION = 1


def jax_block(tree) -> None:
    """Synchronize a pytree of device results by materializing every leaf:
    on this attachment ``block_until_ready`` does not actually block (see
    CLAUDE.md), so host fetches are the only reliable barrier."""
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf)


def _env() -> str:
    return os.environ.get("ECSEG_PROG_CACHE", "").strip()


def enabled() -> bool:
    v = _env()
    if v.lower() in ("0", "false", "no", "off"):
        return False
    if v:
        return True
    # default: on for real accelerator backends, off on CPU
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - jax must import anyway
        return False


def cache_dir() -> str:
    v = _env()
    if v and v.lower() not in ("0", "1", "false", "no", "off", "true", "yes"):
        return v
    return os.path.join(
        os.path.expanduser("~"), ".cache", "ecseg_tpu", "progs"
    )


def _backend_fingerprint() -> str:
    import jax

    dev = jax.devices()[0]
    return (
        f"v{_FORMAT_VERSION}|jax={jax.__version__}|plat={dev.platform}"
        f"|kind={dev.device_kind}"
    )


def _leaf_sig(leaf: Any) -> Tuple:
    # shape/dtype signature mirroring jit's dispatch key closely enough;
    # a collision is caught by the executable's own input-aval check
    import numpy as np

    if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
        return (tuple(leaf.shape), str(leaf.dtype))
    a = np.asarray(leaf)
    return (tuple(a.shape), str(a.dtype), "py", type(leaf).__name__)


class _Stats:
    __slots__ = ("loads", "compiles", "errors")

    def __init__(self):
        self.loads = 0
        self.compiles = 0
        self.errors = 0


# fast-start background builds, process-wide (see ready_or_build_async)
_BUILDS: list = []
_BUILDS_LOCK = threading.Lock()
_CANCEL_BUILDS = threading.Event()


def drain_builds(cancel_pending: bool = True) -> None:
    """Wait for every in-flight fast-start build.  MUST run before a
    pipeline main returns: a process exiting with a compile RPC in flight
    leaves the relay compiling an orphan, which stalls the NEXT process's
    requests for up to the full compile time (the documented wedge on this
    attachment).  With ``cancel_pending`` (default) builds that have not
    yet issued their compile/load RPC abort early instead of starting one;
    builds already compiling are joined to completion either way."""
    if cancel_pending:
        _CANCEL_BUILDS.set()
    try:
        while True:
            with _BUILDS_LOCK:
                live = [t for t in _BUILDS if t.is_alive()]
                _BUILDS[:] = live
                if not live:
                    return
                th = live[0]
            th.join()
    finally:
        if cancel_pending:
            _CANCEL_BUILDS.clear()


class CachedJit:
    """Drop-in for ``jax.jit(fn, static_argnames=...)`` with an on-disk
    executable cache keyed by the lowered StableHLO."""

    def __init__(
        self,
        fn: Callable,
        static_argnames: Tuple[str, ...] = (),
        name: Optional[str] = None,
    ):
        import functools

        import jax

        import inspect

        self._fn = fn
        self._static = tuple(static_argnames)
        self._pysig = inspect.signature(fn)
        self._jit = jax.jit(fn, static_argnames=static_argnames or None)
        self._memo: Dict[Tuple, Any] = {}
        self._lock = threading.Lock()
        self._building: Dict[Tuple, threading.Event] = {}
        self._name = name or getattr(fn, "__name__", "prog")
        self.stats = _Stats()
        functools.update_wrapper(self, fn)

    # -- signature -------------------------------------------------------
    def _bind(self, args, kw):
        """Normalize every call to one canonical all-kwargs layout.  A PJRT
        ``Compiled`` must be invoked with its DYNAMIC args in exactly the
        positional/keyword layout it was lowered with (statics stripped), so
        both the lowering and the executable call below use the bound-name
        dict -- then any positional/keyword mix at the call site replays
        correctly.  Returns (memo_sig, dynamic_kwargs, all_kwargs)."""
        import jax

        bound = self._pysig.bind(*args, **kw)
        bound.apply_defaults()
        all_kw = dict(bound.arguments)
        statics = tuple(
            (k, all_kw[k]) for k in self._static if k in all_kw
        )
        dyn = {k: v for k, v in all_kw.items() if k not in self._static}
        leaves, treedef = jax.tree_util.tree_flatten(dyn)
        sig = (statics, treedef, tuple(_leaf_sig(l) for l in leaves))
        return sig, dyn, all_kw

    # -- build -----------------------------------------------------------
    def _disk_key(self, lowered) -> str:
        h = hashlib.sha256()
        h.update(_backend_fingerprint().encode())
        h.update(lowered.as_text().encode())
        return h.hexdigest()[:40]

    def _load(self, path: str):
        from jax.experimental.serialize_executable import deserialize_and_load

        with open(path, "rb") as f:
            rec = pickle.load(f)
        return deserialize_and_load(
            rec["blob"], rec["in_tree"], rec["out_tree"]
        )

    def _store(self, path: str, compiled) -> None:
        from jax.experimental.serialize_executable import serialize

        blob, in_tree, out_tree = serialize(compiled)
        rec = {"blob": blob, "in_tree": in_tree, "out_tree": out_tree}
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                pickle.dump(rec, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, path)  # atomic: concurrent writers both win
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def _build(self, all_kw, cancellable: bool = False):
        import time as _time

        # debug lines go to stderr: bench.py's scored contract is a single
        # JSON line on stdout, which these prints must never corrupt
        debug = os.environ.get("ECSEG_PROG_CACHE_DEBUG", "") not in ("", "0")
        t0 = _time.perf_counter()
        lowered = self._jit.lower(**all_kw)
        t_lower = _time.perf_counter() - t0
        if cancellable and _CANCEL_BUILDS.is_set():
            return None  # cancelled before any compile/load RPC went out
        path = os.path.join(
            cache_dir(), f"{self._name}-{self._disk_key(lowered)}.pjrt"
        )
        if os.path.exists(path):
            try:
                t0 = _time.perf_counter()
                ex = self._load(path)
                self.stats.loads += 1
                if debug:
                    print(
                        f"[progcache] {self._name}: lower {t_lower:.1f}s "
                        f"load {_time.perf_counter() - t0:.1f}s (HIT)",
                        file=sys.stderr,
                        flush=True,
                    )
                return ex
            except Exception as e:
                from . import fallbacks

                fallbacks.record("progcache_error")
                self.stats.errors += 1
                if debug:
                    print(
                        f"[progcache] {self._name}: LOAD FAILED "
                        f"{type(e).__name__}: {e}",
                        file=sys.stderr,
                        flush=True,
                    )
                # corrupt / incompatible entry: recompile and overwrite
        t0 = _time.perf_counter()
        compiled = lowered.compile()
        self.stats.compiles += 1
        if debug:
            print(
                f"[progcache] {self._name}: lower {t_lower:.1f}s "
                f"compile {_time.perf_counter() - t0:.1f}s (MISS)",
                file=sys.stderr,
                flush=True,
            )
        try:
            self._store(path, compiled)
        except Exception:
            from . import fallbacks

            fallbacks.record("progcache_error")
            self.stats.errors += 1
        return compiled

    # -- async fast-start ------------------------------------------------
    def likely_cached(self) -> bool:
        """Cheap disk probe: does ANY serialized executable exist for this
        program name?  Loading one costs ~1 s (+ the first-call lottery, in
        the background) -- worth starting even on a short folder -- while a
        cold COMPILE can take minutes whose only beneficiary is a future
        process, and the no-orphan drain would stall this one at exit.
        Name-level, not signature-level (the exact key needs a 3 s
        lowering): a stale same-name entry just means one background
        compile that callers gated on folder length anyway."""
        try:
            import glob

            return bool(
                glob.glob(os.path.join(cache_dir(), f"{self._name}-*.pjrt"))
            )
        except Exception:
            return False

    def ready(self, *args, **kw) -> bool:
        """Pure non-blocking probe: True when a call with these args would
        run at steady-state speed (memoized executable, or the plain-jit
        path because caching is off / statics are unhashable)."""
        if not enabled():
            return True
        try:
            sig, _, _ = self._bind(args, kw)
        except TypeError:
            return True
        with self._lock:
            return sig in self._memo

    def ready_or_build_async(self, *args, **kw) -> bool:
        """Non-blocking readiness probe for the fast-start protocol: True
        when this call signature already has a memoized executable (a call
        with these args returns at steady-state speed); otherwise start ONE
        daemon thread that builds it -- lower, disk-load-or-compile, and a
        discarded WARMUP call on the given args so the deserialized
        executable's expensive first invocation (48-150 s for the banded
        2048^2 program on this attachment, measured) also stays off the
        caller's critical path -- and return False.  Compiles do not block
        concurrent dispatches on this relay (measured: ~27 ms trivial
        dispatches throughout a 182 s Mosaic compile), which is what makes
        the overlap worth having.  With the cache disabled (CPU), returns
        True: callers fall through to the normal blocking path.

        Callers MUST call :func:`drain_builds` before process exit: a build
        abandoned mid-compile keeps compiling server-side on this relay and
        serializes the NEXT process's requests for minutes (the documented
        wedge).  drain cancels builds that have not yet issued the compile
        RPC and joins the ones that have."""
        if not enabled():
            return True
        try:
            sig, dyn, all_kw = self._bind(args, kw)
        except TypeError:
            return True  # plain-jit path; nothing to pre-build
        with self._lock:
            if sig in self._memo:
                return True
            if sig in self._building:
                return False
            evt = self._building[sig] = threading.Event()

        def _bg():
            ex: Any = None
            try:
                if not _CANCEL_BUILDS.is_set():
                    ex = self._build(all_kw, cancellable=True)
            except Exception:
                from . import fallbacks

                fallbacks.record("progcache_error")
                self.stats.errors += 1
                ex = False
            if ex is not None and ex is not False and not _CANCEL_BUILDS.is_set():
                try:
                    jax_block(ex(**dyn))  # warmup; result discarded
                except Exception:
                    from . import fallbacks

                    fallbacks.record("progcache_error")
                    self.stats.errors += 1
                    ex = False
            with self._lock:
                if ex is not None:
                    self._memo[sig] = ex
                self._building.pop(sig, None)
            evt.set()

        th = threading.Thread(
            target=_bg, daemon=True, name=f"progcache-build-{self._name}"
        )
        with _BUILDS_LOCK:
            _BUILDS.append(th)
        th.start()
        return False

    # -- call ------------------------------------------------------------
    def __call__(self, *args, **kw):
        if not enabled():
            return self._jit(*args, **kw)
        try:
            sig, dyn, all_kw = self._bind(args, kw)
        except TypeError:  # unhashable static -> plain jit handles it
            return self._jit(*args, **kw)
        import jax

        if any(
            isinstance(l, jax.core.Tracer)
            for l in jax.tree_util.tree_leaves(dyn)
        ):
            # called under an enclosing trace (another jit/vmap is inlining
            # this program): a PJRT executable cannot take tracers -- the
            # plain jit composes, and the OUTER program is what gets cached
            return self._jit(*args, **kw)
        ex = self._memo.get(sig)
        if ex is None:
            # a fast-start background build in flight for this signature?
            # wait for it instead of compiling the same program twice
            evt = self._building.get(sig)
            if evt is not None:
                evt.wait()
                ex = self._memo.get(sig)
        if ex is None:
            with self._lock:
                ex = self._memo.get(sig)
                if ex is None:
                    try:
                        ex = self._build(all_kw)
                    except Exception:
                        from . import fallbacks

                        fallbacks.record("progcache_error")
                        self.stats.errors += 1
                        ex = False  # poison: this signature uses plain jit
                    self._memo[sig] = ex
        if ex is False:
            return self._jit(*args, **kw)
        try:
            return ex(**dyn)
        except Exception:
            # aval mismatch on a signature collision, executable/runtime
            # incompatibility, ... -- the plain jit path is always correct
            from . import fallbacks

            fallbacks.record("progcache_error")
            self.stats.errors += 1
            return self._jit(*args, **kw)

    def lower(self, *args, **kw):
        return self._jit.lower(*args, **kw)

    def _cache_size(self) -> int:
        # mirrors jax.jit's compiled-program counter (tests assert geometry
        # bucketing via it); executables memoized here count the same way
        n = len(self._memo)
        try:
            n += self._jit._cache_size()
        except Exception:
            pass
        return n


def cached_jit(
    fn: Optional[Callable] = None,
    *,
    static_argnames: Tuple[str, ...] = (),
    name: Optional[str] = None,
):
    """Decorator/factory: ``cached_jit(fn)`` or
    ``@cached_jit(static_argnames=("k",))``."""
    if fn is None:

        def deco(f):
            return CachedJit(f, static_argnames=static_argnames, name=name)

        return deco
    return CachedJit(fn, static_argnames=static_argnames, name=name)
