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


def fast_watershed_mode() -> str:
    """NuSeT marker-watershed execution mode, from ECSEG_FAST_WATERSHED:

    - ``'host'``  (``0``/``off``/``host``): host priority-flood parity path
      only;
    - ``'auto'``  (``auto``, or UNSET when the device pipeline is on): run
      the device minimax-flood WITH its per-image parity certificate; keep
      the device result only when certificate-clean (then it equals the
      host result bit-for-bit), recompute on host otherwise -- byte parity
      maintained, device speed on the clean common case
      (ops/watershed_tpu.nuset_marker_watershed_auto);
    - ``'on'``    (``1``/``true``/``yes``): device fast path unconditionally
      (may differ from host on order-dependent ridge ties);
    - ``'check'`` (``check``): ``on`` + per-image permuted-flood tie
      accounting (see :func:`fast_watershed_check`).
    """
    v = os.environ.get("ECSEG_FAST_WATERSHED", "").strip().lower()
    if v in ("", "default"):
        return "auto" if use_device_path() else "host"
    if v in ("0", "false", "no", "off", "host"):
        return "host"
    if v == "auto":
        return "auto"
    if v == "check":
        return "check"
    return "on"


def fast_watershed() -> bool:
    """True when the UNGATED device fast path is forced
    (ECSEG_FAST_WATERSHED=1/check) -- the result may differ from the host
    parity path on order-dependent ridge ties.  The default on the device
    pipeline is the parity-GATED ``auto`` mode (:func:`fast_watershed_mode`)."""
    return fast_watershed_mode() in ("on", "check")


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
