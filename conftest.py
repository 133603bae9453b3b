"""Root test configuration: force JAX onto a virtual 8-device CPU platform
(before any test module can import jax) so the multi-chip sharding paths are
exercised without TPU hardware.  Runs at rootdir collection time, earlier
than tests/conftest.py.

Env vars alone are not enough on accelerator boxes whose sitecustomize
registers a PJRT plugin and sets ``jax_platforms`` via jax.config (the
config value wins over JAX_PLATFORMS) -- so the config is updated here too,
before any backend initializes."""

import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocess hermeticity: this box's sitecustomize re-pins jax to the axon
# TPU platform (overriding JAX_PLATFORMS) whenever PALLAS_AXON_POOL_IPS is
# set.  Tests that spawn subprocesses (make_demo_weights, the training e2e)
# must NOT inherit it, or the whole suite hangs whenever the chip is busy or
# wedged -- the suite is CPU-only by design.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+",
    "",
    os.environ.get("XLA_FLAGS", ""),
)
os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - jax always importable in this env
    pass

# This kernel faults fresh mmap pages at ~25 MB/s; keep large numpy buffers
# on the reusable heap (see ecseg_tpu/runtime/hostmem.py) so image-sized
# test fixtures do not pay multi-second first-touch costs.
try:
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
except Exception:  # pragma: no cover
    pass
