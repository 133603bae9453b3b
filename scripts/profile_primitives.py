#!/usr/bin/env python3
"""Probe TPU primitive costs relevant to the scatter-free component-stats
redesign (scan-amortized; see profile_meta_post.py)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hw = 1024 * 1024
    rng = np.random.default_rng(0)
    # flat root ids with ~1500 distinct roots + background sentinel
    roots_true = np.sort(rng.choice(hw, size=1500, replace=False))
    flat_np = roots_true[rng.integers(0, 1500, size=hw)].astype(np.int32)
    flat_np[rng.random(hw) < 0.7] = hw  # background
    flat = jnp.asarray(flat_np)
    table = jnp.asarray(rng.random(2048).astype(np.float32))
    perm = jnp.asarray(rng.permutation(hw).astype(np.int32))
    vals = jnp.asarray(rng.random(hw).astype(np.float32))

    def bench(name, fn, *args):
        # scan over n_iter GENUINELY different inputs: a `x + 0*i`
        # perturbation is constant-folded by XLA and silently hoists the
        # whole body out of the loop
        def stackit(x):
            outs = [x]
            for k in range(1, n_iter):
                outs.append(jnp.roll(x, k, axis=0))
            return jnp.stack(outs)

        xs = tuple(stackit(a) for a in args)

        @jax.jit
        def loop(*xs):
            def step(c, a):
                r = fn(*a)
                return c + jnp.sum(r).astype(jnp.float32), ()

            out, _ = lax.scan(step, jnp.float32(0), xs)
            return out

        np.asarray(loop(*xs))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(loop(*xs))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt / n_iter * 1000:.2f} ms/iter", flush=True)

    bench("top_k(1M, 2048)", lambda f: lax.top_k(-f, 2048)[0], flat)
    bench("cumsum(1M)", lambda f: jnp.cumsum(f), flat)
    bench(
        "perm-scatter(1M unique)",
        lambda p: jnp.zeros(hw, jnp.float32).at[p].set(vals, unique_indices=True),
        perm,
    )
    bench("gather 1M from 2048-table", lambda f: table[jnp.clip(f, 0, 2047)], flat)
    bench(
        "searchsorted(2048-table, 1M queries)",
        lambda f: jnp.searchsorted(jnp.arange(2048, dtype=jnp.int32) * 512, f),
        flat,
    )
    bench("gather 1M from 1M (perm)", lambda p: vals[p], perm)
    bench(
        "sort+cumsum+runsizes",
        lambda f: _runsizes(f, hw),
        flat,
    )


def _runsizes(flat, hw):
    v = jnp.sort(flat)
    f = jnp.concatenate([jnp.ones(1, jnp.int32), (v[1:] != v[:-1]).astype(jnp.int32)])
    ranks = jnp.cumsum(f) - 1  # nondecreasing
    idx = jnp.searchsorted(ranks, jnp.arange(2048, dtype=jnp.int32))
    return idx


if __name__ == "__main__":
    main()
