#!/usr/bin/env python3
"""TPU-hardware parity artifact (VERDICT r3 item 4).

Runs ALL FIVE pipelines (`make metaseg|meta_overlay|stat_fish|interseg|
fish_distance_calculation` equivalents) on the REAL chip with deterministic
demo weights, under BOTH ``ECSEG_DEVICE_PIPELINE`` branches, and
byte-compares every produced artifact (CSV/npy/tif/png).  The CPU test
suite asserts the same equality under Pallas interpret mode
(tests/test_device_pipeline_e2e.py); this script is the missing proof on
hardware, where bf16-pass MXU matmuls, Mosaic lowering, and the real Pallas
kernels run (the reference's contract is its output files --
reference src/utils.py:109-120 and the SURVEY §1 folder contract).

Writes ``PARITY_TPU.json`` at the repo root: pass/fail per artifact plus
the per-branch fallback counters.  Exit 0 iff all artifacts match.

Usage:  python scripts/parity_tpu.py          # on the TPU attachment
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _collect(root: str):
    """Relative path -> sha256 for every pipeline artifact under root."""
    out = {}
    for r, _, fs in os.walk(root):
        for f in fs:
            p = os.path.join(r, f)
            out[os.path.relpath(p, root)] = _sha(p)
    return out


def _run_branch(branch: str, workdir: str, inputs: dict) -> dict:
    """One full five-pipeline run under ECSEG_DEVICE_PIPELINE=branch.
    Returns {'artifacts': {rel: sha}, 'fallbacks': {...}, 'rcs': {...}}."""
    from ecseg_tpu.core.config import Config
    from ecseg_tpu.pipelines import (
        fish_distance,
        interseg,
        meta_overlay,
        metaseg,
        stat_fish,
    )
    from ecseg_tpu.runtime import fallbacks

    d = os.path.join(workdir, f"run_{branch}")
    meta_dir = os.path.join(d, "meta")
    inter_dir = os.path.join(d, "inter")
    shutil.copytree(inputs["meta"], meta_dir)
    shutil.copytree(inputs["inter"], inter_dir)

    os.environ["ECSEG_DEVICE_PIPELINE"] = branch
    # fast start would serve these small folders through the host oracle
    # and never exercise the device post programs -- the whole point of
    # the device branch here -- so force it off (compiles included)
    os.environ["ECSEG_FAST_START"] = "0"
    fallbacks.reset()
    cfg = Config(
        raw={
            "metaseg": {"inpath": meta_dir},
            "meta_overlay": {"inpath": meta_dir, "color_sensitivity": 85},
            "stat_fish": {
                "inpath": inter_dir,
                "scale": 1,
                "use_min_cut": True,
                "nuclei_size_T": 5000,
            },
            "interseg": {
                "inpath": inter_dir,
                "FISH_color": "red",
                "has_centromeric_probe": True,
            },
            "fish_distance_calculation": {
                "inpath": inter_dir,
                "centromere_probe_color": "green",
                "fish_probe_color": "red",
                "max_centromeric_spots": 3,
            },
        }
    )
    rcs = {}
    for name, main in [
        ("metaseg", metaseg.main),
        ("meta_overlay", meta_overlay.main),
        ("stat_fish", stat_fish.main),
        ("interseg", interseg.main),
        ("fish_distance_calculation", fish_distance.main),
    ]:
        t0 = time.perf_counter()
        rcs[name] = main(config=cfg)
        print(
            f"[parity_tpu] branch={branch} {name}: rc={rcs[name]} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
        assert rcs[name] == 0, f"{name} failed (rc={rcs[name]}) on branch {branch}"
    return {
        "artifacts": _collect(d),
        "fallbacks": fallbacks.counts(),
        "rcs": rcs,
    }


def main() -> int:
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    import jax

    backend = jax.default_backend()
    device_kind = jax.devices()[0].device_kind
    if backend != "tpu":
        print(
            f"[parity_tpu] WARNING: backend is {backend!r}, not tpu -- this "
            "run does not prove hardware parity",
            flush=True,
        )

    workdir = tempfile.mkdtemp(prefix="ecseg_parity_")
    os.chdir(workdir)
    # deterministic demo weights + example inputs, generated fresh in the
    # workdir (pipelines resolve models/ + interseg_models/ relative to cwd)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_demo_weights

    make_demo_weights.main([])
    # a second metaseg/meta_overlay input so the grouped single-chip path
    # sees a multi-image folder, and a second interphase geometry
    import cv2
    import numpy as np

    rng = np.random.default_rng(23)
    rgb = (rng.random((700, 900, 3)) * 12).astype(np.uint8)
    rgb[80:200, 500:650, 2] = 210
    rgb[220:240, 100:130, 0] = 230
    rgb[400:430, 700:740, 1] = 230
    cv2.imwrite(
        os.path.join("example_ecSeg", "input2.tif"),
        cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
    )
    # big-geometry coverage (VERDICT r4 item 6): a 2048^2 image routes the
    # device branch through the banded HBM-resident fixpoints and the
    # ECSEG_METASEG_PATCH_BUDGET group cap (121 patches -> partial group),
    # and a 1040x1300 image adds a THIRD geometry so the grouped dispatcher
    # handles mixed-geometry folders with partial groups in one run -- the
    # r4 F-order npy bug class only surfaces on the real backend
    big = (rng.random((2048, 2048, 3)) * 12).astype(np.uint8)
    for _ in range(60):
        y, x = rng.integers(0, 2048 - 160, 2)
        h, w = rng.integers(8, 150, 2)
        big[y : y + h, x : x + w, 2] = 210  # DAPI blobs incl. nucleus-sized
    for _ in range(80):
        y, x = rng.integers(0, 2048 - 12, 2)
        big[y : y + 6, x : x + 6, rng.integers(0, 2)] = 235  # FISH foci
    cv2.imwrite(
        os.path.join("example_ecSeg", "input_2048.tif"),
        cv2.cvtColor(big, cv2.COLOR_RGB2BGR),
    )
    mid = (rng.random((1040, 1300, 3)) * 12).astype(np.uint8)
    mid[200:420, 300:560, 2] = 205
    mid[600:640, 900:950, 0] = 230
    mid[100:130, 1100:1140, 1] = 230
    cv2.imwrite(
        os.path.join("example_ecSeg", "input_mid.tif"),
        cv2.cvtColor(mid, cv2.COLOR_RGB2BGR),
    )

    inputs = {
        "meta": os.path.join(workdir, "example_ecSeg"),
        "inter": os.path.join(workdir, "example_interSeg"),
    }

    t0 = time.perf_counter()
    results = {}
    for branch in ("0", "1"):  # host oracle first, then the device branch
        results[branch] = _run_branch(branch, workdir, inputs)
    os.environ.pop("ECSEG_DEVICE_PIPELINE", None)

    host, dev = results["0"]["artifacts"], results["1"]["artifacts"]
    only_host = sorted(set(host) - set(dev))
    only_dev = sorted(set(dev) - set(host))
    common = sorted(set(host) & set(dev))
    mismatch = [k for k in common if host[k] != dev[k]]
    ok = not (only_host or only_dev or mismatch)

    record = {
        "pass": ok,
        "backend": backend,
        "device_kind": device_kind,
        "n_artifacts": len(common),
        "n_equal": len(common) - len(mismatch),
        "mismatched": mismatch,
        "only_in_host_branch": only_host,
        "only_in_device_branch": only_dev,
        "fallbacks_host_branch": results["0"]["fallbacks"],
        "fallbacks_device_branch": results["1"]["fallbacks"],
        "wall_s": round(time.perf_counter() - t0, 1),
        "corpus_geometries": {
            "metaseg": ["700x900 x2 (grouped pair)", "2048x2048 (banded kernels + patch-budget partial group)", "1040x1300 (third geometry, partial group)"],
            "interphase": ["512x640"],
        },
        "fast_start": "forced off (device branch must execute the device post programs)",
        "note": (
            "all five pipelines run twice on the same inputs "
            "(ECSEG_DEVICE_PIPELINE=0 vs 1) with deterministic demo "
            "weights; every CSV/npy/tif/png byte-compared"
        ),
    }
    out_path = os.path.join(REPO, "PARITY_TPU.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[parity_tpu] {'PASS' if ok else 'FAIL'}: "
          f"{record['n_equal']}/{record['n_artifacts']} artifacts equal; "
          f"wrote {out_path}", flush=True)
    shutil.rmtree(workdir, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
