#!/usr/bin/env python3
"""Probe compile-latency mitigation options on this TPU attachment
(VERDICT r3 item 6: first-pass compiles cost minutes and the persistent
compilation cache does not engage; the reference starts segmenting
immediately, reference src/metaseg.py:33-42).

Three mechanisms are probed with a mid-sized U-Net-like program:

1. the jax persistent compilation cache (jax_compilation_cache_dir):
   does a cache entry appear, and does a SECOND process hit it?
2. PJRT executable serialization (jax.experimental.serialize_executable):
   can a lowered+compiled executable round-trip through bytes?  This is
   the primitive an on-disk program cache needs.
3. jax.export round-trip time (for completeness: export ships StableHLO,
   which RECOMPILES on load -- expected no win, measured to confirm).

Writes COMPILE_CACHE_PROBE.json at the repo root with per-mechanism
verdicts.  Usage: python scripts/aot_cache_probe.py [--child <dir>]
(the --child form is the second-process cache probe, spawned internally).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build():
    import jax
    import jax.numpy as jnp

    from ecseg_tpu.models import metaseg_unet

    params = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(16, 32, 64), bottleneck=128
    )

    @jax.jit
    def fn(params, x):
        return metaseg_unet.forward(params, x, dtype=jnp.bfloat16).sum(
            axis=(1, 2, 3)
        )

    x = jnp.zeros((4, 256, 256, 1), jnp.uint8)
    return fn, params, x


def _child_main(cache_dir: str) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    fn, params, x = _build()
    t0 = time.perf_counter()
    import numpy as np

    np.asarray(fn(params, x))
    print(f"CHILD_COMPILE_S={time.perf_counter() - t0:.2f}", flush=True)


def main() -> int:
    if "--child" in sys.argv:
        _child_main(sys.argv[sys.argv.index("--child") + 1])
        return 0

    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    import tempfile

    import numpy as np

    record: dict = {}

    cache_dir = tempfile.mkdtemp(prefix="ecseg_cache_probe_")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    record["backend"] = jax.default_backend()

    fn, params, x = _build()
    t0 = time.perf_counter()
    np.asarray(fn(params, x))
    cold_s = time.perf_counter() - t0
    record["cold_compile_s"] = round(cold_s, 2)
    entries = []
    for r, _, fs in os.walk(cache_dir):
        entries += [os.path.join(r, f) for f in fs]
    record["cache_entries_written"] = len(entries)
    record["cache_bytes"] = sum(os.path.getsize(p) for p in entries)

    # second process: does it hit the cache?
    env = dict(os.environ)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", cache_dir],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
    )
    child_wall = time.perf_counter() - t0
    child_compile = None
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_COMPILE_S="):
            child_compile = float(line.split("=")[1])
    record["child_compile_s"] = child_compile
    record["child_wall_s"] = round(child_wall, 2)
    record["cache_hit"] = (
        child_compile is not None
        and record["cache_entries_written"] > 0
        and child_compile < max(2.0, 0.3 * cold_s)
    )

    # PJRT executable serialization
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )

        lowered = jax.jit(fn.__wrapped__).lower(params, x)
        compiled = lowered.compile()
        t0 = time.perf_counter()
        blob, in_tree, out_tree = serialize(compiled)
        ser_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reloaded = deserialize_and_load(blob, in_tree, out_tree)
        load_s = time.perf_counter() - t0
        got = np.asarray(reloaded(params, x))
        want = np.asarray(fn(params, x))
        record["serialize_executable"] = {
            "supported": True,
            "blob_bytes": len(blob),
            "serialize_s": round(ser_s, 2),
            "deserialize_s": round(load_s, 2),
            "bit_equal": bool(np.array_equal(got, want)),
        }
    except Exception as e:  # noqa: BLE001 - probe records any failure mode
        record["serialize_executable"] = {
            "supported": False,
            "error": f"{type(e).__name__}: {e}",
        }

    # jax.export round trip (expected: recompiles on load)
    try:
        from jax import export as jexport

        exp = jexport.export(jax.jit(fn.__wrapped__))(params, x)
        blob = exp.serialize()
        t0 = time.perf_counter()
        back = jexport.deserialize(blob)
        np.asarray(back.call(params, x))
        record["export_roundtrip"] = {
            "supported": True,
            "blob_bytes": len(blob),
            "load_plus_first_call_s": round(time.perf_counter() - t0, 2),
        }
    except Exception as e:  # noqa: BLE001
        record["export_roundtrip"] = {
            "supported": False,
            "error": f"{type(e).__name__}: {e}",
        }

    out_path = os.path.join(REPO, "COMPILE_CACHE_PROBE.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(record, indent=1, sort_keys=True))
    import shutil

    shutil.rmtree(cache_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
