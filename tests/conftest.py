"""Test configuration: force JAX onto a virtual 8-device CPU platform so the
multi-chip sharding paths are exercised without TPU hardware.  The root
conftest.py does the env forcing; this file adds fixtures and a subprocess
fallback for environments where jax was already initialized on another
platform before pytest collected the suite."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
