#!/usr/bin/env python3
"""Microbenchmark the device meta_inference building blocks.

Each piece runs inside ONE jitted lax.scan over N genuinely DIFFERENT
inputs (scan xs), so the relay dispatch (~40 ms) amortizes away and XLA
cannot constant-fold/hoist the body (a `x + 0*i` perturbation is folded to
`x` and silently hoists everything -- measured the hard way).

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


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    from ecseg_tpu.ops.cc_pallas import flood_from_border_pallas, label_pallas
    from ecseg_tpu.ops.meta_post_tpu import (
        _compact_roots,
        _component_sums,
        _flat_roots,
        meta_inference_tpu,
    )
    from ecseg_tpu.ops.morphology_tpu import binary_fill_holes_tpu

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(_label_maps(rng, n_iter))
    masks = imgs == 1
    hw = imgs.shape[1] * imgs.shape[2]

    def bench(name, fn, xs):
        @jax.jit
        def loop(xs):
            def step(c, x):
                r = fn(x)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.int32),
                    r,
                    jnp.int32(0),
                )
                return c + s, ()

            out, _ = lax.scan(step, jnp.int32(0), xs)
            return out

        np.asarray(loop(xs))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(loop(xs))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt / n_iter * 1000:.2f} ms/iter "
              f"(call {dt * 1000:.0f} ms / {n_iter})", flush=True)

    bench("label_pallas", lambda m: label_pallas(m), masks)
    bench("flood_border", lambda m: flood_from_border_pallas(~m), masks)
    bench("fill_holes(flood form)", binary_fill_holes_tpu, masks)

    def scat(m):
        flat = _flat_roots(m)
        return jnp.zeros(hw + 1, jnp.int32).at[flat].add(1)

    bench("label+scatter_add(sizes)", scat, masks)

    def nonzero_roots(m):
        flat = _flat_roots(m)
        idx = jnp.arange(hw, dtype=jnp.int32)
        is_root = jnp.logical_and(flat == idx, flat < hw)
        return jnp.nonzero(is_root, size=2048, fill_value=hw)[0]

    bench("label+nonzero(2048)", nonzero_roots, masks)
    bench("label+compact_roots", lambda m: _compact_roots(_flat_roots(m), hw, 2048), masks)
    bench("label+sort", lambda m: jnp.sort(_flat_roots(m)), masks)

    def lut_gather(m):
        # the scatter-LUT-then-per-pixel-gather pattern used by size maps
        flat = _flat_roots(m)
        lut = jnp.zeros(hw + 1, jnp.int32).at[flat].add(1)
        return lut[flat]

    bench("label+scatterLUT+gather1M", lut_gather, masks)

    def eq_matmul_sums(m):
        # blocked one-hot segment sums over compacted roots (scatter-free)
        flat = _flat_roots(m)
        roots = _compact_roots(flat, hw, 2048)
        w = m.shape[1]
        idx = jnp.arange(hw, dtype=jnp.int32)
        payload = jnp.stack(
            [
                jnp.ones(hw, jnp.float32),
                (idx // w >> 6).astype(jnp.float32),
                (idx // w & 63).astype(jnp.float32),
                (idx % w >> 6).astype(jnp.float32),
                (idx % w & 63).astype(jnp.float32),
            ]
        )  # (5, hw)
        rootsf = roots.astype(jnp.float32)

        def step(acc, blk):
            fb, pb = blk
            eq = (fb[:, None] == rootsf[None, :]).astype(jnp.float32)
            return acc + (pb @ eq).astype(jnp.int32), ()

        nblk = 128
        fblocks = flat.astype(jnp.float32).reshape(nblk, -1)
        pblocks = payload.reshape(5, nblk, -1).transpose(1, 0, 2)
        acc, _ = lax.scan(
            step, jnp.zeros((5, 2048), jnp.int32), (fblocks, pblocks)
        )
        return acc

    bench("label+eq-matmul-sums(5)", eq_matmul_sums, masks)

    bench(
        "component_sums(current)",
        lambda m: _component_sums(m, hw, 2048)["n"][0],
        masks,
    )
    from ecseg_tpu.ops.meta_post_tpu import (
        _metaphase_removal,
        _merge_comp,
        _size_thresh,
        _fill_holes_class,
    )

    bench("size_thresh", lambda x: _size_thresh(x, hw)[0], imgs)
    bench("metaphase_removal", lambda x: _metaphase_removal(x, hw)[0], imgs)
    bench("merge_comp(1)", lambda x: _merge_comp(x, 1, hw), imgs)
    bench("fill_holes_class(1)", lambda x: _fill_holes_class(x, 1), imgs)
    bench("meta_inference FULL", lambda x: meta_inference_tpu(x)[0], imgs)

    if "--vmap" in sys.argv:
        # scan-vs-vmap comparison (VERDICT r4 item 2): the scan rows above
        # process one canvas per step; these rows run the SAME stage vmapped
        # over all N canvases in one call -- the Pallas fixpoints become
        # sequential grid steps (no change) while every XLA stage (sort
        # chains, cumsums, morphology shifts) batches, so the delta is the
        # batching win of the group post chain
        def bench_vmap(name, fn, xs):
            @jax.jit
            def batched(xs):
                r = jax.vmap(fn)(xs)
                return jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.int32),
                    r,
                    jnp.int32(0),
                )

            np.asarray(batched(xs))  # compile
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                np.asarray(batched(xs))
            dt = (time.perf_counter() - t0) / reps
            print(
                f"{name} [vmap x{len(xs)}]: {dt / len(xs) * 1000:.2f} ms/iter "
                f"(call {dt * 1000:.0f} ms)",
                flush=True,
            )

        bench_vmap("label_pallas", lambda m: label_pallas(m), masks)
        bench_vmap("size_thresh", lambda x: _size_thresh(x, hw)[0], imgs)
        bench_vmap(
            "metaphase_removal", lambda x: _metaphase_removal(x, hw)[0], imgs
        )
        bench_vmap("merge_comp(1)", lambda x: _merge_comp(x, 1, hw), imgs)
        bench_vmap("fill_holes_class(1)", lambda x: _fill_holes_class(x, 1), imgs)
        bench_vmap("meta_inference FULL", lambda x: meta_inference_tpu(x)[0], imgs)


if __name__ == "__main__":
    main()
