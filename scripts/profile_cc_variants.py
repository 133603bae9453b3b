#!/usr/bin/env python3
"""Fixpoint-schedule experiments for the cc_pallas labeler.

The device meta_inference chain is ~10 VMEM fixpoint kernels (labelings +
floods) at ~4-6 ms each on 1024^2 maps -- the whole 51.6 ms budget.  A CPU
simulation (convergence counts are data-dependent only) shows realistic
masks need <=4 plain sweeps + 2 scan iterations, while the production
schedule burns up to 24 plain sweeps (_A_CHUNKS=6) before switching to
scans.  This script times schedule variants of the SAME fixpoint on chip:

  * a_chunks in {6 (prod), 1, 0}
  * scan-step limit: full-width Hillis-Steele (11 steps) vs 256-px runs
    (8 steps; the outer loop already iterates to the true fixpoint, so
    shorter scans stay exact -- components wider than the limit just take
    one more iteration)
  * batched (3, H, W) labeling -- one kernel for size_thresh's three
    independent class labelings

Usage: python scripts/profile_cc_variants.py [N]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecseg_tpu.ops.cc_pallas import (
    _COL_PAD,
    _ROW_PAD,
    _interpret,
    _padded_dims,
    _sweep3x3,
)


def _segscan_axis_lim(lab, big, axis, size, border, idx_along, nsteps):
    """_segscan_axis with an explicit step budget (propagation distance
    2**nsteps); exactness is preserved by the caller's outer fixpoint."""

    def one_dir(v, f, sgn):
        for s in range(nsteps):
            d = 1 << s
            vs = jnp.roll(v, sgn * d, axis)
            fs = jnp.roll(f, sgn * d, axis)
            if d > border:
                if sgn > 0:
                    bad = idx_along < d
                else:
                    bad = idx_along >= size - d
                fs = jnp.where(bad, 1, fs)
                vs = jnp.where(bad, big, vs)
            v = jnp.where(f != 0, v, jnp.minimum(v, vs))
            f = jnp.maximum(f, fs)
        return v

    f0 = jnp.where(lab == big, 1, 0).astype(jnp.int32)
    fwd = one_dir(lab, f0, +1)
    bwd = one_dir(lab, f0, -1)
    return jnp.where(lab == big, big, jnp.minimum(fwd, bwd))


def _runlen(fg, axis, sgn, nsteps):
    """Contiguous foreground run length ending at p walking in -sgn
    direction (inclusive of p; background = 0), saturating at 2**nsteps.
    One roll per doubling step; the result is loop-invariant for the whole
    B phase."""
    r = fg.astype(jnp.int32)
    for s in range(nsteps):
        d = 1 << s
        rs = jnp.roll(r, sgn * d, axis)
        r = r + jnp.where(r == d, rs, 0)
    return r


def _segscan_axis_dist(lab, big, axis, dists, nsteps):
    """Segmented min-scan with PRECOMPUTED run lengths: per step one roll
    of the value map + a compare against the static dist map, instead of
    rolling a flag map alongside (half the rolls of the flag form)."""
    d_fwd, d_bwd = dists

    def one_dir(v, dist, sgn):
        for s in range(nsteps):
            d = 1 << s
            vs = jnp.roll(v, sgn * d, axis)
            v = jnp.minimum(v, jnp.where(dist > d, vs, big))
        return v

    fwd = one_dir(lab, d_fwd, +1)
    bwd = one_dir(lab, d_bwd, -1)
    return jnp.where(lab == big, big, jnp.minimum(fwd, bwd))


def _variant_fixpoint_dist(mp, hp, wp, a_chunks, chunk, nsteps):
    big = jnp.int32(hp * wp)
    rows = lax.broadcasted_iota(jnp.int32, mp.shape, mp.ndim - 2)
    cols = lax.broadcasted_iota(jnp.int32, mp.shape, mp.ndim - 1)
    idx = rows * wp + cols
    fg = mp != 0
    lab0 = jnp.where(fg, idx, big)
    ax_r, ax_c = mp.ndim - 2, mp.ndim - 1

    def delta(new, lab):
        return jnp.max(jnp.where(new != lab, 1, 0)) > 0

    def a_body(state):
        lab, _, it = state
        new = lab
        for _ in range(chunk):
            new = _sweep3x3(new, big)
        return new, delta(new, lab), it + 1

    def a_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < a_chunks)

    lab = _sweep3x3(lab0, big)
    changed = jnp.bool_(True)
    if a_chunks:
        lab, changed, _ = lax.while_loop(
            a_cond, a_body, (lab, changed, jnp.int32(0))
        )

    # loop-invariant run lengths (the padded border is background, so wraps
    # self-mask exactly like the flag form)
    dists_c = (_runlen(fg, ax_c, +1, nsteps), _runlen(fg, ax_c, -1, nsteps))
    dists_r = (_runlen(fg, ax_r, +1, nsteps), _runlen(fg, ax_r, -1, nsteps))

    def b_step(state):
        lab, _, it = state
        new = _segscan_axis_dist(lab, big, ax_c, dists_c, nsteps)
        new = _segscan_axis_dist(new, big, ax_r, dists_r, nsteps)
        new = _sweep3x3(new, big)
        return new, delta(new, lab), it + 1

    def b_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < 8192)

    lab, _, _ = lax.while_loop(b_cond, b_step, (lab, changed, jnp.int32(0)))
    return lab, idx, big


def _variant_fixpoint(mp, hp, wp, a_chunks, chunk, scan_steps):
    big = jnp.int32(hp * wp)
    rows = lax.broadcasted_iota(jnp.int32, mp.shape, mp.ndim - 2)
    cols = lax.broadcasted_iota(jnp.int32, mp.shape, mp.ndim - 1)
    idx = rows * wp + cols
    lab0 = jnp.where(mp != 0, idx, big)

    def delta(new, lab):
        return jnp.max(jnp.where(new != lab, 1, 0)) > 0

    def a_body(state):
        lab, _, it = state
        new = lab
        for _ in range(chunk):
            new = _sweep3x3(new, big)
        return new, delta(new, lab), it + 1

    def a_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < a_chunks)

    lab = _sweep3x3(lab0, big)
    changed = jnp.bool_(True)
    if a_chunks:
        lab, changed, _ = lax.while_loop(
            a_cond, a_body, (lab, changed, jnp.int32(0))
        )

    ax_r, ax_c = mp.ndim - 2, mp.ndim - 1
    if scan_steps is None:
        row_steps = max(1, int(np.ceil(np.log2(wp))))
        col_steps = max(1, int(np.ceil(np.log2(hp))))
    else:
        row_steps = col_steps = scan_steps

    def b_step(state):
        lab, _, it = state
        new = _segscan_axis_lim(lab, big, ax_c, wp, _COL_PAD, cols, row_steps)
        new = _segscan_axis_lim(new, big, ax_r, hp, _ROW_PAD, rows, col_steps)
        new = _sweep3x3(new, big)
        return new, delta(new, lab), it + 1
    # (the production _segscan_axis now self-generates its iota and takes a
    # strip count; this script keeps its own _segscan_axis_lim twin so the
    # variants stay self-contained)

    def b_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < 8192)

    lab, _, _ = lax.while_loop(b_cond, b_step, (lab, changed, jnp.int32(0)))
    return lab, idx, big


def make_label_variant(h, w, a_chunks, chunk, scan_steps, batch=1, dist=False):
    hp, wp = _padded_dims(h, w)
    fix = _variant_fixpoint_dist if dist else _variant_fixpoint

    def kernel(mask_ref, out_ref):
        if batch == 1:
            mp = jnp.pad(
                mask_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w))
            )
        else:
            mp = jnp.pad(
                mask_ref[:].astype(jnp.int32),
                ((0, 0), (0, hp - h), (0, wp - w)),
            )
        lab, idx, big = fix(mp, hp, wp, a_chunks, chunk, scan_steps)
        out_ref[0, 0] = jnp.sum(
            jnp.where(jnp.logical_and(lab == idx, lab != big), 1, 0),
            dtype=jnp.int32,
        )

    @jax.jit
    def run(mask):
        m = mask.astype(jnp.int32)
        if batch == 1:
            m = m[None]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024
            ),
            interpret=_interpret(),
        )(m)[0, 0]

    return run


def _label_maps(rng, n, shape=(1024, 1024)):
    out = np.zeros((n,) + shape, np.int32)
    for k in range(n):
        for lab, cnt, rmax in [(1, 8, 60), (2, 40, 12), (3, 120, 7)]:
            for _ in range(cnt):
                y = rng.integers(0, shape[0] - rmax)
                x = rng.integers(0, shape[1] - rmax)
                r = int(rng.integers(2, rmax))
                out[k, y : y + r, x : x + r] = lab
    return out


def bench(name, fn, xs, n_iter):
    @jax.jit
    def loop(xs):
        def step(c, x):
            return c + fn(x), ()

        out, _ = lax.scan(step, jnp.int32(0), xs)
        return out

    ref = np.asarray(loop(xs))  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        np.asarray(loop(xs))
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{name}: {dt / n_iter * 1000:.2f} ms/iter (roots-sum {int(ref)})",
        flush=True,
    )
    return int(ref)


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rng = np.random.default_rng(0)
    imgs = _label_maps(rng, n_iter)
    h, w = imgs.shape[1:]

    masks1 = jnp.asarray(imgs == 1)  # nuclei-sized: the hard case
    stacked = jnp.asarray(
        np.stack([imgs == 1, imgs == 2, imgs == 3], 1).astype(np.int32)
    )  # (n, 3, h, w)

    ref = None
    for name, (ac, ch, ss, dist) in [
        ("prod   a=6x4 full-scan", (6, 4, None, False)),
        ("fast   a=1x4 full-scan", (1, 4, None, False)),
        ("fast   a=1x4 scan<=256", (1, 4, 8, False)),
        ("fast   a=2x4 scan<=256", (2, 4, 8, False)),
        ("noA    a=0   scan<=256", (0, 4, 8, False)),
        ("dist   a=1x4 distB 256", (1, 4, 8, True)),
        ("dist   a=0   distB 256", (0, 4, 8, True)),
        ("dist   a=2x4 distB 256", (2, 4, 8, True)),
    ]:
        fn = make_label_variant(h, w, ac, ch, ss, batch=1, dist=dist)
        got = bench(f"label[{name}]", fn, masks1, n_iter)
        if ref is None:
            ref = got
        assert got == ref, f"variant {name} wrong root count: {got} vs {ref}"

    fn3 = make_label_variant(h, w, 1, 4, 8, batch=3, dist=True)
    bench("label3x[a=1x4 distB 256]", fn3, stacked, n_iter)


if __name__ == "__main__":
    main()
