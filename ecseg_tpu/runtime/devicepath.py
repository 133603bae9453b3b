"""Host-vs-device branch selection for the pipelines.

Several pipeline stages have two equivalent implementations: a host twin
(the parity oracle, always available) and an on-device TPU program.  By
default the device branch engages when the default JAX backend is a TPU.
``ECSEG_DEVICE_PIPELINE=1``/``0`` overrides the choice -- the test suite
forces BOTH branches through the full pipeline ``main``s on the CPU mesh
(device ops run under Pallas interpret mode there) and asserts
byte-identical outputs.
"""

from __future__ import annotations

import os


def fast_watershed() -> bool:
    """Opt-in throughput mode: run NuSeT's marker watershed as a device
    minimax-flood program (ops/watershed_tpu.nuset_marker_watershed_fast)
    instead of the host priority-flood parity path.  Default OFF -- the fast
    path may differ from the host on exact ridge ties, so it is never chosen
    implicitly (ECSEG_FAST_WATERSHED=1 enables it;
    ECSEG_FAST_WATERSHED=check also counts tie-decided pixels per image,
    see :func:`fast_watershed_check`)."""
    return os.environ.get("ECSEG_FAST_WATERSHED", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
        "check",
    )


def fast_watershed_check() -> bool:
    """``ECSEG_FAST_WATERSHED=check``: fast path + per-image tie
    accounting -- each watershed runs a second flood with permuted marker
    ids and the pixels whose decision flips are counted in
    runtime/fallbacks (``fast_watershed_tie_px`` /
    ``fast_watershed_tie_images``), so the opt-in's order-dependence is
    measured on the user's own data instead of assumed.  NOTE: this is a
    lower bound on host divergence (geometry-broken minimax ties are
    stable under the permutation); the measured host-agreement numbers
    live in scripts/quantify_watershed_divergence.py + README."""
    return (
        os.environ.get("ECSEG_FAST_WATERSHED", "").strip().lower() == "check"
    )


def use_device_path() -> bool:
    v = os.environ.get("ECSEG_DEVICE_PIPELINE")
    if v is not None and v.strip() != "":
        s = v.strip().lower()
        if s in ("1", "true", "yes", "on"):
            return True
        if s in ("0", "false", "no", "off"):
            return False
        import sys

        print(
            f"ECSEG_DEVICE_PIPELINE={v!r} not understood "
            "(use 1/0); falling back to the backend default",
            file=sys.stderr,
        )
    import jax

    return jax.default_backend() == "tpu"
