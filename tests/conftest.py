"""Test configuration: force JAX onto a virtual 8-device CPU platform so the
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
