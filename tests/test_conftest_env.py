"""The suite must be hermetic: CPU-only, regardless of chip state.

This box's sitecustomize re-pins jax to the axon TPU platform whenever
``PALLAS_AXON_POOL_IPS`` is set -- overriding ``JAX_PLATFORMS`` -- so the
root conftest.py must scrub it from the environment before any test (or any
test-spawned subprocess: make_demo_weights, the training e2e) imports jax.
A regression here makes the whole suite hang whenever the real chip is busy
or wedged.
"""

import os
import subprocess
import sys

import jax


def test_axon_pinning_env_is_scrubbed():
    assert "PALLAS_AXON_POOL_IPS" not in os.environ
    assert os.environ.get("JAX_PLATFORMS") == "cpu"


def test_suite_runs_on_virtual_cpu_mesh():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    assert len(devs) >= 8


def test_subprocesses_inherit_cpu_platform():
    """A bare interpreter spawned from a test must come up on CPU too."""
    out = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.default_backend())"],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    )
    assert out.stdout.strip().splitlines()[-1] == "cpu"
