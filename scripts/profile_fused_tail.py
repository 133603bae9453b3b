#!/usr/bin/env python3
"""Fused decoder tail (ops/fused_tail) vs the XLA chain, on chip.

Times the level-1 decoder tail (dec1_1 -> dec1_2 -> head -> softmax ->
exact u8 quantize -> argmax) from the concatenated (skip1, up1) activation
at bench geometry: bf16, batches of 256^2x64 patch activations.  The XLA
chain writes/reads ~18 MB of HBM intermediates per patch; the fused kernel
keeps them in VMEM.  Also reports label agreement (disagreements are
quantize-level ties from f32 accumulation order; the integer-weight case
in tests/test_fused_tail.py is bit-exact).

Usage: python scripts/profile_fused_tail.py [N_PATCHES]
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
    from ecseg_tpu.models.layers import conv2d, relu
    from ecseg_tpu.ops import tiling
    from ecseg_tpu.ops.fused_tail import fused_dec1_head

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    c1, c2, ncls = 64, 32, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.random((n, 256, 256, c1)) * 0.6).astype(np.float32)
    ).astype(jnp.bfloat16)
    mk = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.15).astype(np.float32))
    w1, b1, w2, b2, wh, bh = (
        mk(3, 3, c1, c2), mk(c2), mk(3, 3, c2, c2), mk(c2),
        mk(1, 1, c2, ncls), mk(ncls),
    )

    def labels_xla(x):
        y = relu(conv2d(x, w1, b1))
        y = relu(conv2d(y, w2, b2))
        logits = conv2d(y, wh, bh)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.argmax(tiling.quantize_u8_jax(probs), -1).astype(jnp.int32)

    def labels_fused(x):
        return fused_dec1_head(x, w1, b1, w2, b2, wh, bh)

    # device->host fetches run at ~27 MB/s on this attachment, so the timed
    # functions return a tiny histogram, not the 12.5 MB label map
    def summarize(lab):
        return jnp.stack(
            [jnp.sum(lab == k, dtype=jnp.int32) for k in range(4)]
        )

    xla_t = jax.jit(lambda x: summarize(labels_xla(x)))
    fused_t = jax.jit(lambda x: summarize(labels_fused(x)))

    def bench(name, fn):
        out = np.asarray(fn(x))  # compile
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = np.asarray(fn(x))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt / n * 1e3:.3f} ms/patch ({dt * 1e3:.1f} ms / {n})",
              flush=True)
        return out

    bench("XLA tail chain", xla_t)
    bench("fused tail kernel", fused_t)
    a = np.asarray(jax.jit(labels_xla)(x[:4]))
    b = np.asarray(jax.jit(labels_fused)(x[:4]))
    print(f"label agreement (4 patches): {(a == b).mean():.6f}", flush=True)


if __name__ == "__main__":
    main()
