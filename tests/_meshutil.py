"""Helpers for mesh tests: detect the virtual CPU mesh, or re-run a test in
a fresh interpreter with the platform forced (for boxes whose sitecustomize
pins jax to a real accelerator before pytest starts)."""

import os
import re
import subprocess
import sys


def on_virtual_cpu_mesh(n: int = 8) -> bool:
    """True iff jax is (or will initialize) on >= n CPU devices in-process."""
    import jax

    devs = jax.devices()
    return len(devs) >= n and devs[0].platform == "cpu"


def rerun_self_in_subprocess(test_file: str, test_name: str) -> None:
    """Re-run exactly this test in a fresh interpreter with the virtual CPU
    mesh forced.  Raises on failure so the outer test fails too."""
    if os.environ.get("_ECSEG_MESH_SUBPROC") == "1":
        raise RuntimeError("virtual CPU mesh unavailable even in subprocess")
    env = dict(os.environ)
    env["_ECSEG_MESH_SUBPROC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # disable axon sitecustomize boot
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    subprocess.run(
        [sys.executable, "-m", "pytest", "-q", f"{test_file}::{test_name}"],
        env=env,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
