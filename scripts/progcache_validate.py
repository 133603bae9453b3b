#!/usr/bin/env python3
"""Cross-process compile-latency validation for the executable cache
(VERDICT r3 item 6: a fresh process paid minutes of XLA compiles before
segmenting -- the reference starts immediately, reference
src/metaseg.py:33-42 -- and the stock persistent cache never hits on this
attachment, COMPILE_CACHE_PROBE.json).

Runs the metaseg pipeline on ONE 2048^2 image in TWO fresh subprocesses
with ``ECSEG_PROG_CACHE`` pointed at a fresh directory:

  run 1: cold -- compiles the pipeline programs, serializes them to disk;
  run 2: warm -- a brand-new process must deserialize instead of compile.

Writes ``PROGCACHE_TPU.json`` at the repo root with both wall times, the
artifact equality check (run 2's outputs must be byte-identical to run
1's), and the pass verdict (run 2 < 60 s).

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
os.chdir({workdir!r})
cfg = Config(raw={{"metaseg": {{"inpath": {inpath!r}}}}})
rc = metaseg.main(config=cfg)
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
    child = _CHILD.format(repo=REPO, workdir=workdir, inpath=inpath)

    record = {"hw": hw, "cache_dir_entries": {}}
    hashes = {}
    for run in (1, 2):
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
        sys.stderr.write(out.stderr[-2000:])
        record[f"run{run}_wall_s"] = round(wall, 1)
        record[f"run{run}_rc"] = out.returncode
        record["cache_dir_entries"][f"after_run{run}"] = len(
            [p for p in os.listdir(cache) if p.endswith(".pjrt")]
        ) if os.path.isdir(cache) else 0
        hashes[run] = _collect(inpath)
        print(
            f"[progcache] run {run}: rc={out.returncode} wall={wall:.1f}s "
            f"cache_entries={record['cache_dir_entries'][f'after_run{run}']}",
            flush=True,
        )

    record["artifacts_equal"] = hashes[1] == hashes[2]
    record["pass"] = (
        record["run1_rc"] == 0
        and record["run2_rc"] == 0
        and record["artifacts_equal"]
        and record["run2_wall_s"] < 60.0
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
