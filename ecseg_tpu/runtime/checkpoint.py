"""Training checkpoint / resume.

The reference has no training and therefore no training checkpoints; its
only resume construct is stat_fish's tmp-dir + atomic-rename output pattern
(reference src/stat_fish.py:180,315-317 -- SURVEY 5.4), which the stat_fish
pipeline reproduces.  This module adds the training-side analog for the
framework's own (re)training path: step-tagged orbax checkpoints of
(params, opt_state, step), with the same crash-safe property -- a partial
write never clobbers the last good checkpoint (orbax writes to a tmp dir
and renames on commit).

Falls back to flat .npz pytrees when orbax is unavailable.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None


def save_checkpoint(ckpt_dir: str, step: int, params: Any, opt_state: Any) -> str:
    """Write a step-tagged checkpoint; returns its path.  Atomic: the
    directory/file appears only once fully written."""
    os.makedirs(ckpt_dir, exist_ok=True)
    ocp = _orbax()
    state = {"params": params, "opt_state": opt_state, "step": step}
    if ocp is not None:
        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
        ckptr = ocp.PyTreeCheckpointer()
        # force=True overwrites an existing step dir -- re-reaching a saved
        # step after a resume must not crash the run (the npz fallback below
        # already overwrites via os.replace; keep the two backends aligned)
        ckptr.save(path, state, force=True)
        return path
    # npz fallback: write tmp then rename (same atomicity contract)
    from ..models.keras_import import save_npz_pytree

    path = os.path.join(ckpt_dir, f"step_{step:08d}.npz")
    tmp = path + ".tmp.npz"
    save_npz_pytree(tmp, jax.tree.map(np.asarray, state))
    os.replace(tmp, path)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = [
        e for e in os.listdir(ckpt_dir) if re.match(r"step_\d{8}(\.npz)?$", e)
    ]
    if not entries:
        return None
    return os.path.join(ckpt_dir, max(entries))


def restore_checkpoint(path: str, like: Optional[Any] = None) -> Tuple[Any, Any, int]:
    """Load (params, opt_state, step).  ``like`` (a matching state pytree)
    restores exact leaf types under orbax; optional for npz."""
    ocp = _orbax()
    if path.endswith(".npz"):
        from ..models.keras_import import load_npz_pytree

        state = load_npz_pytree(path)
        return state["params"], state["opt_state"], int(state["step"])
    assert ocp is not None, "orbax checkpoint path but orbax unavailable"
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path, item=like) if like is not None else ckptr.restore(path)
    return state["params"], state["opt_state"], int(state["step"])
