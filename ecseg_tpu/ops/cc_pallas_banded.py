"""Banded HBM-resident fixpoints: connected-component labeling and flood
reachability for maps too large to hold in VMEM.

The whole-map-in-VMEM kernels (ops/cc_pallas) are gated at the 1024^2
class: a 2048^2 (2056x2176-padded) variant measures 212 MB of scoped VMEM
against the chip's 128 MB -- a 76-minute Mosaic compile that then fails
(negative result, round 3).  This module is the geometry-scalable form:

  * the label/flood STATE lives in HBM (``pl.ANY``) and is updated IN
    PLACE (``input_output_aliases``);
  * a sequential grid sweeps row BANDS through a VMEM scratch block via
    async DMA; each visit runs a small fixed schedule (3x3 sweeps around
    one _B_STEPS-capped segmented scan pass) on the block and writes the
    band back;
  * the grid walks the bands top-down then bottom-up (Gauss-Seidel: a
    band's halo rows already hold this pass's updates from the previous
    band, so information crosses the whole map in ONE directional pass);
  * all updates are monotone on the min- (labels) / max- (reachability)
    lattice, so the clamped, overlapping edge windows are safe, and an
    outer ``lax.while_loop`` repeats down+up passes until a full pass
    changes nothing (exact fixpoint, never the schedule cap).

Outputs are bit-identical to the in-VMEM kernels / the XLA formulations:
canonical min-flat-index labels, exact reachability.  cc_pallas routes
maps between its in-VMEM envelope and ``_BANDED_MAX_MAP_BYTES`` here;
beyond that the XLA fallbacks take over.

On non-TPU backends the kernels run in Pallas interpret mode (the CPU
suite pins banded == unblocked equality by forcing small bands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cc_pallas import (
    _COL_PAD,
    _interpret,
    _padded_dims,
    _segscan_axis,
    _segscan_max_axis,
    _sweep3x3,
    _sweep_cross,
)

_BAND = 256  # rows per band (DMA'd through VMEM); tests shrink this
_HALO = 8  # rows of already-updated neighbor context per band visit
_SENT = 8  # sentinel rows memset around the block (self-masking rolls)
# Outer-pass safety bound; each down+up pass moves information across the
# whole map (Gauss-Seidel) plus 2**_B_STEPS px within bands, so realistic
# masks converge in 2-4 passes; the loop exits on the exact fixpoint.
_MAX_PASSES = 4096

# Largest map the banded path accepts (padded bytes).  Covers 4096^2-class
# microscopy scans; the bound is HBM-side so it is generous.
_BANDED_MAX_MAP_BYTES = 256 * 1024 * 1024


def _band_geometry(hp: int):
    band, halo, sent = _BAND, _HALO, _SENT
    n_bands = -(-hp // band)
    block_h = sent + band + 2 * halo + sent
    return band, halo, sent, n_bands, block_h


def fits_banded(h: int, w: int) -> bool:
    hp, wp = _padded_dims(h, w)
    band, halo, _, _, _ = _band_geometry(hp)
    return hp >= band + 2 * halo and hp * wp * 4 <= _BANDED_MAX_MAP_BYTES


def _local_schedule(blk, big, connectivity, block_h, wp, is_flood, mp):
    """One band visit: iterate (capped segscan pass + 3x3 sweep) to LOCAL
    convergence while the block is in VMEM -- a 2048-px-wide run takes
    ~ wp / 2**_B_STEPS local iterations here, each ~sub-ms, instead of one
    full DMA pass over the whole map per 256-px step (measured 689 ms/map
    with the fixed one-iteration schedule; local convergence cuts the
    outer passes to the cross-band minimum).  The outer pass loop still
    owns global convergence."""
    if is_flood:
        def sweep(s):
            n = jnp.maximum(s, jnp.roll(s, 1, 1))
            n = jnp.maximum(n, jnp.roll(s, -1, 1))
            if connectivity == 2:
                n = jnp.maximum(n, jnp.roll(n, 1, 0))
                n = jnp.maximum(n, jnp.roll(n, -1, 0))
            else:
                n = jnp.maximum(n, jnp.roll(s, 1, 0))
                n = jnp.maximum(n, jnp.roll(s, -1, 0))
            return jnp.where(mp != 0, n, 0)

        def segpass(s):
            new = _segscan_max_axis(s, mp, 1, wp, _COL_PAD, 1)
            return _segscan_max_axis(new, mp, 0, block_h, _SENT, 1)

    else:
        sweep_ = _sweep3x3 if connectivity == 2 else _sweep_cross

        def sweep(s):
            return sweep_(s, big)

        def segpass(s):
            new = _segscan_axis(s, big, 1, wp, _COL_PAD, 1)
            return _segscan_axis(new, big, 0, block_h, _SENT, 1)

    def body(st):
        v, _, it = st
        nv = sweep(segpass(v))
        changed = jnp.max(jnp.where(nv != v, 1, 0)) > 0
        return nv, changed, it + 1

    def cond(st):
        _, changed, it = st
        # bound: each iteration extends runs by 2**_B_STEPS along both axes
        return jnp.logical_and(changed, it < 64)

    out, _, _ = lax.while_loop(
        cond, body, (sweep(blk), jnp.bool_(True), jnp.int32(0))
    )
    return out


def _banded_pass_kernel(hp, wp, connectivity, is_flood):
    """One pallas_call = one full down-then-up Gauss-Seidel pass over all
    bands.  State (and for floods the traversable mask) lives in ANY/HBM;
    the changed flag accumulates in SMEM."""
    band, halo, sent, n_bands, block_h = _band_geometry(hp)
    # sentinel rows: label kernel = background (big); flood = not-reached
    sent_val = 0 if is_flood else hp * wp
    win = band + 2 * halo

    def kernel(*refs):
        big = jnp.int32(hp * wp)
        if is_flood:
            mask_any, _state_in, out_any, changed_ref = refs
        else:
            _state_in, out_any, changed_ref = refs

        i = pl.program_id(0)
        b = jnp.where(i < n_bands, i, 2 * n_bands - 1 - i)
        # band, halo, hp are all multiples of 8 (sublane tile), so every
        # dynamic row offset below is 8-aligned -- Mosaic needs the hint to
        # prove vector load/store alignment
        row0 = pl.multiple_of(jnp.minimum(b * band, hp - band), 8)
        lo = pl.multiple_of(jnp.clip(row0 - halo, 0, hp - win), 8)

        def inner(vblk, vmask, sem_a, sem_b):
            d_in = pltpu.make_async_copy(
                out_any.at[pl.ds(lo, win), :],
                vblk.at[pl.ds(sent, win), :],
                sem_a,
            )
            d_in.start()
            if is_flood:
                d_m = pltpu.make_async_copy(
                    mask_any.at[pl.ds(lo, win), :],
                    vmask.at[pl.ds(sent, win), :],
                    sem_b,
                )
                d_m.start()
            vblk[pl.ds(0, sent), :] = jnp.full((sent, wp), sent_val, jnp.int32)
            vblk[pl.ds(block_h - sent, sent), :] = jnp.full(
                (sent, wp), sent_val, jnp.int32
            )
            if is_flood:
                vmask[pl.ds(0, sent), :] = jnp.zeros((sent, wp), jnp.int32)
                vmask[pl.ds(block_h - sent, sent), :] = jnp.zeros(
                    (sent, wp), jnp.int32
                )
            d_in.wait()
            if is_flood:
                d_m.wait()

            off = pl.multiple_of(sent + (row0 - lo), 8)
            old_band = vblk[pl.ds(off, band), :]
            new = _local_schedule(
                vblk[:],
                big,
                connectivity,
                block_h,
                wp,
                is_flood,
                vmask[:] if is_flood else None,
            )
            vblk[:] = new
            new_band = vblk[pl.ds(off, band), :]
            delta = jnp.max(jnp.where(new_band != old_band, 1, 0)).astype(
                jnp.int32
            )

            d_out = pltpu.make_async_copy(
                vblk.at[pl.ds(off, band), :],
                out_any.at[pl.ds(row0, band), :],
                sem_a,
            )
            d_out.start()

            @pl.when(i == 0)
            def _():
                changed_ref[0, 0] = 0

            changed_ref[0, 0] = jnp.maximum(changed_ref[0, 0], delta)
            d_out.wait()

        pl.run_scoped(
            inner,
            pltpu.VMEM((block_h, wp), jnp.int32),
            pltpu.VMEM((block_h, wp) if is_flood else (8, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        )

    return kernel, 2 * n_bands


def _banded_fixpoint(state0, hp, wp, connectivity, is_flood, mask=None):
    """Outer loop: repeat down+up banded passes until a pass changes
    nothing.  ``state0`` (hp, wp) int32; returns the converged state."""
    kernel, n_steps = _banded_pass_kernel(hp, wp, connectivity, is_flood)
    n_in = 2 if is_flood else 1

    def one_pass(state):
        ins = ([mask] if is_flood else []) + [state]
        out, changed = pl.pallas_call(
            kernel,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((hp, wp), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            input_output_aliases={n_in - 1: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # block + segscan temporaries for a (288, wp) band window
                # run ~25 MB scoped; the default cap is 16 MB
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=_interpret(),
        )(*ins)
        return out, changed[0, 0]

    def cond(s):
        _, changed, it = s
        return jnp.logical_and(changed != 0, it < _MAX_PASSES)

    def body(s):
        state, _, it = s
        state, changed = one_pass(state)
        return state, changed, it + 1

    state, _, _ = lax.while_loop(
        cond, body, (state0, jnp.int32(1), jnp.int32(0))
    )
    return state


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_banded(mask: jnp.ndarray, connectivity: int = 2) -> jnp.ndarray:
    """Canonical min-flat-index labeling via banded passes; identical
    output contract to cc_pallas.label_pallas / cc_tpu.label_tpu."""
    h, w = mask.shape
    hp, wp = _padded_dims(h, w)
    big = hp * wp
    mp = jnp.pad(mask.astype(jnp.int32), ((0, hp - h), (0, wp - w)))
    rows = lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    lab0 = jnp.where(mp != 0, rows * wp + cols, big)
    lab = _banded_fixpoint(lab0, hp, wp, connectivity, False)
    r, c = lab // wp, lab % wp
    return jnp.where(lab == big, -1, r * w + c)[:h, :w].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def flood_banded(
    traversable: jnp.ndarray, seeds: jnp.ndarray, connectivity: int = 2
) -> jnp.ndarray:
    """Boolean reachability from seeds through the traversable mask via
    banded passes; identical to cc_pallas.flood_from_seeds_pallas."""
    h, w = traversable.shape
    hp, wp = _padded_dims(h, w)
    mp = jnp.pad(traversable.astype(jnp.int32), ((0, hp - h), (0, wp - w)))
    s0 = jnp.pad(
        jnp.logical_and(traversable != 0, seeds != 0).astype(jnp.int32),
        ((0, hp - h), (0, wp - w)),
    )
    out = _banded_fixpoint(s0, hp, wp, connectivity, True, mask=mp)
    return out[:h, :w] != 0
