"""On-disk executable cache (runtime/progcache).

Validates the three contracts the pipelines rely on:
1. cached results are value-identical to plain jit (all call layouts);
2. a fresh wrapper (the fresh-process analog) LOADS instead of compiling;
3. every failure mode falls back to plain jit (never a wrong answer).

The real cross-process compile-latency win is measured on the chip by
scripts/progcache_validate.py (COMPILE_CACHE_PROBE.json documents why the
stock persistent cache cannot do this: it never hits across processes on
this attachment, while serialize_executable round-trips in ~0.1 s).
"""

import os

import numpy as np
import pytest

from ecseg_tpu.runtime import progcache
from ecseg_tpu.runtime.progcache import CachedJit, cached_jit


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("ECSEG_PROG_CACHE", str(tmp_path))
    assert progcache.enabled()
    assert progcache.cache_dir() == str(tmp_path)
    return tmp_path


def _fn(x, y, k=2):
    return (x @ y) * k


def test_disabled_on_cpu_by_default(monkeypatch):
    monkeypatch.delenv("ECSEG_PROG_CACHE", raising=False)
    import jax

    if jax.default_backend() == "cpu":
        assert not progcache.enabled()
    monkeypatch.setenv("ECSEG_PROG_CACHE", "0")
    assert not progcache.enabled()


def test_value_identity_all_call_layouts(cache_env):
    import jax

    g = cached_jit(_fn, static_argnames=("k",))
    a = np.arange(64 * 64, dtype=np.float32).reshape(64, 64) / 1e3
    b = np.eye(64, dtype=np.float32) * 3
    want = np.asarray(jax.jit(_fn, static_argnames=("k",))(a, b, k=3))
    got_kw = np.asarray(g(a, b, k=3))
    got_pos = np.asarray(g(a, b, 3))  # positional static
    got_dynkw = np.asarray(g(a, y=b, k=3))  # keyword dynamic
    assert np.array_equal(want, got_kw)
    assert np.array_equal(want, got_pos)
    assert np.array_equal(want, got_dynkw)
    # one signature -> one executable, no fallbacks
    assert len(g._memo) == 1
    assert g.stats.errors == 0
    # defaulted static is a distinct signature
    got_default = np.asarray(g(a, b))
    assert np.array_equal(
        got_default, np.asarray(jax.jit(_fn, static_argnames=("k",))(a, b))
    )
    assert len(g._memo) == 2


def test_fresh_wrapper_loads_from_disk(cache_env):
    a = np.ones((32, 32), np.float32)
    b = np.eye(32, dtype=np.float32)
    g1 = cached_jit(_fn, static_argnames=("k",))
    r1 = np.asarray(g1(a, b, k=5))
    if g1.stats.errors:  # serialization unsupported on this backend
        pytest.skip("executable serialization unsupported here")
    assert g1.stats.compiles == 1
    g2 = cached_jit(_fn, static_argnames=("k",))
    r2 = np.asarray(g2(a, b, k=5))
    assert np.array_equal(r1, r2)
    assert g2.stats.loads == 1 and g2.stats.compiles == 0


def test_corrupt_entry_recompiles(cache_env):
    a = np.ones((16, 16), np.float32)
    b = np.eye(16, dtype=np.float32)
    g1 = cached_jit(_fn, static_argnames=("k",))
    np.asarray(g1(a, b, k=2))
    entries = [p for p in os.listdir(cache_env) if p.endswith(".pjrt")]
    if not entries:
        pytest.skip("executable serialization unsupported here")
    with open(os.path.join(cache_env, entries[0]), "wb") as f:
        f.write(b"garbage")
    g2 = cached_jit(_fn, static_argnames=("k",))
    r = np.asarray(g2(a, b, k=2))
    assert np.array_equal(r, np.asarray(_fn(a, b, 2)))
    assert g2.stats.compiles == 1  # recompiled past the corrupt blob


def test_pytree_and_none_args(cache_env):
    def fn(params, x, valid_hw=None):
        y = x * params["w"] + params["b"]
        if valid_hw is not None:
            y = y * valid_hw[0]
        return y.sum()

    params = {"w": np.float32(2.0), "b": np.float32(1.0)}
    x = np.ones((8, 8), np.float32)
    g = cached_jit(fn)
    assert float(g(params, x)) == float(fn(params, x))
    assert float(g(params, x, (np.float32(3.0), np.float32(1.0)))) == float(
        fn(params, x, (3.0, 1.0))
    )
    assert len(g._memo) == 2  # None vs pair: distinct signatures


def test_cache_size_api(cache_env):
    # a local def: jax.jit's own program cache is keyed by function
    # identity, so the module-level _fn would carry counts from other tests
    def fn(x, y, k=2):
        return (x @ y) * k

    g = cached_jit(fn, static_argnames=("k",))
    assert g._cache_size() == 0
    np.asarray(g(np.ones((8, 8), np.float32), np.eye(8, dtype=np.float32)))
    assert g._cache_size() == 1


def test_decorator_forms():
    @cached_jit
    def f1(x):
        return x + 1

    @cached_jit(static_argnames=("k",))
    def f2(x, k=1):
        return x + k

    assert isinstance(f1, CachedJit) and isinstance(f2, CachedJit)
    assert float(f1(np.float32(1.0))) == 2.0
    assert float(f2(np.float32(1.0), k=2)) == 3.0
