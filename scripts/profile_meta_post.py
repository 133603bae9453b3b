#!/usr/bin/env python3
"""Microbenchmark the device meta_inference building blocks with the
relay-dispatch cost amortized: each piece runs N iterations inside ONE
jitted lax.scan, so per-iteration time = (call time - ~40ms dispatch) / N.

Usage: python scripts/profile_meta_post.py [N]
"""

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
    from ecseg_tpu.ops.cc_pallas import label_pallas
    from ecseg_tpu.ops.meta_post_tpu import (
        _component_sums,
        _flat_roots,
        meta_inference_tpu,
    )
    from ecseg_tpu.ops.morphology_tpu import binary_fill_holes_tpu

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    img = np.zeros((1024, 1024), np.int32)
    for lab, n, rmax in [(1, 8, 60), (2, 40, 12), (3, 120, 7)]:
        for _ in range(n):
            y, x = rng.integers(0, 1000), rng.integers(0, 1000)
            r = int(rng.integers(2, rmax))
            img[y : y + r, x : x + r] = lab
    imgd = jnp.asarray(img)
    mask = imgd == 1
    hw = img.size

    def bench(name, fn, arg):
        @jax.jit
        def loop(x):
            def step(c, i):
                # vary the input trivially so XLA cannot hoist the body
                r = fn(jnp.logical_xor(x, i == -1) if x.dtype == bool else x + 0 * i)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.int32),
                    r,
                    jnp.int32(0),
                )
                return c + s, ()

            out, _ = lax.scan(step, jnp.int32(0), jnp.arange(n_iter))
            return out

        np.asarray(loop(arg))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(loop(arg))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt / n_iter * 1000:.2f} ms/iter "
              f"(call {dt * 1000:.0f} ms / {n_iter})", flush=True)

    bench("label_pallas", lambda m: label_pallas(m), mask)

    def scat(m):
        flat = _flat_roots(m)
        return jnp.zeros(hw + 1, jnp.int32).at[flat].add(1)

    bench("label+scatter_add(sizes)", scat, mask)

    def nonzero_roots(m):
        flat = _flat_roots(m)
        idx = jnp.arange(hw, dtype=jnp.int32)
        is_root = jnp.logical_and(flat == idx, flat < hw)
        return jnp.nonzero(is_root, size=2048, fill_value=hw)[0]

    bench("label+nonzero(2048)", nonzero_roots, mask)

    bench("label+sort", lambda m: jnp.sort(_flat_roots(m)), mask)
    bench("label+argsort", lambda m: jnp.argsort(_flat_roots(m)), mask)

    def eq_matmul(m):
        # dense one-hot segment count over compacted roots: blocked
        # compare + f32 matmul (exact; see meta_post_tpu notes)
        flat = _flat_roots(m)
        roots = nonzero_roots(m)

        def step(acc, blk):
            eq = (blk[:, None] == roots[None, :]).astype(jnp.float32)
            ones = jnp.ones((1, blk.shape[0]), jnp.float32)
            return acc + (ones @ eq)[0].astype(jnp.int32), ()

        blocks = flat.reshape(-1, 8192)
        acc, _ = lax.scan(step, jnp.zeros(2048, jnp.int32), blocks)
        return acc

    bench("label+eq-matmul-count", eq_matmul, mask)

    bench("fill_holes(scatter form)", binary_fill_holes_tpu, mask)
    bench(
        "component_sums(scatter form)",
        lambda m: _component_sums(m, hw, 2048)["n"][0],
        mask,
    )
    bench("meta_inference FULL", lambda x: meta_inference_tpu(x)[0], imgd)


if __name__ == "__main__":
    main()
