"""Stage-split profiling for the bench hot path on the real chip.

Times, per 1024x1024 tile batch: U-Net forward alone, forward+stitch,
forward+stitch+CC (the full bench path), and CC alone, to find where the
time goes.  Sync by materializing a tiny reduction to the host (axon's
block_until_ready does not block).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench
from ecseg_tpu.models import metaseg_unet
from ecseg_tpu.ops import tiling
from ecseg_tpu.ops.cc_tpu import count_cc_tpu

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else bench.BATCH_TILES
ITERS = 6


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(out)  # compile + sync
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / ITERS
    tiles_s = BATCH / dt
    print(f"{name:28s} {dt*1e3:8.1f} ms/batch  {tiles_s:8.1f} tiles/s")
    return dt


def main():
    bench.BATCH_TILES = BATCH
    h = w = 1024
    positions = tuple(map(tuple, tiling.patch_positions(h, w)))
    params = bench._realistic_params(
        jax.random.PRNGKey(0), metaseg_unet.ENC_WIDTHS, metaseg_unet.BOTTLENECK
    )
    rng = np.random.default_rng(0)
    tiles = (rng.random((BATCH, h, w)) * 80).astype(np.uint8)
    for b in range(BATCH):
        for _ in range(120):
            y, x = rng.integers(0, h - 12), rng.integers(0, w - 12)
            r = rng.integers(2, 7)
            tiles[b, y : y + r, x : x + r] = 230
    batch = jnp.asarray(
        np.stack([tiling.im2patches_overlap(t[..., None])[1] for t in tiles])
    )
    print(f"batch tiles={BATCH} patches/tile={batch.shape[1]}")

    @jax.jit
    def fwd_only(params, batch):
        def one(t):
            p = metaseg_unet.forward(params, t, dtype=jnp.bfloat16)
            return jnp.sum(p[..., 3], dtype=jnp.float32)

        return jax.vmap(one)(batch)

    @jax.jit
    def fwd_stitch(params, batch):
        def one(t):
            p = metaseg_unet.forward(params, t, dtype=jnp.bfloat16)
            lab = tiling.stitch_argmax_jax(p, positions)
            return jnp.sum(lab, dtype=jnp.int32)

        return jax.vmap(one)(batch)

    @jax.jit
    def full(params, batch):
        def one(t):
            p = metaseg_unet.forward(params, t, dtype=jnp.bfloat16)
            lab = tiling.stitch_argmax_jax(p, positions)
            n, _ = count_cc_tpu(lab == 3, connectivity=2)
            return n

        return jax.vmap(one)(batch)

    t_f = timeit("forward only", fwd_only, params, batch)
    t_fs = timeit("forward + stitch/argmax", fwd_stitch, params, batch)
    t_full = timeit("forward + stitch + CC", full, params, batch)
    print(
        f"\nimplied: stitch={1e3*(t_fs-t_f):.1f} ms  CC={1e3*(t_full-t_fs):.1f} ms"
        f"  (per {BATCH}-tile batch)"
    )
    flop_patch = 32.7e9
    print(
        f"fwd MFU ~= {BATCH*25*flop_patch/t_f/1e12:.1f} TFLOP/s"
    )


if __name__ == "__main__":
    main()
