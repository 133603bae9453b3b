#!/usr/bin/env python3
"""Microbench: lhs-dilated transpose conv vs subkernel (pixel-shuffle)
decomposition, at the flagship U-Net's decoder shapes.

A 3x3 stride-2 'SAME' transpose conv writes each output parity class
(oy%2, ox%2) from a fixed congruence class of kernel taps, so it is exactly
four small convs over the UNDILATED input -- (2x2, 2x1, 1x2, 1x1) taps, 9/4
MACs per output pixel on average instead of 9 -- followed by a space
interleave.  If XLA:TPU executes the lhs-dilated form literally, 3/4 of its
MXU work multiplies inserted zeros and the decomposition should win ~2-3x
on these layers.

Each variant runs inside ONE jitted lax.scan over genuinely different
inputs (no constant folding), synced with np.asarray.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ecseg_tpu.models.layers import conv2d_transpose

_DN = ("NHWC", "HWIO", "NHWC")


def convt_decomposed(x, kernel, bias=None):
    """3x3 stride-2 'SAME' transpose conv via 4 parity subkernels + pixel
    shuffle; bit-equal MAC set to conv2d_transpose (order may differ)."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3
    n, h, w, _ = x.shape
    flipped = jnp.flip(kernel, (0, 1))
    # conv2d_transpose pads the dilated input with (kh-1-pad_lo, kh-1-pad_hi)
    # = (2-0, 2-1) = (2, 1) for k=3, s=2 and slides the flipped 3x3 kernel.
    # Output index o reads dilated positions o, o+1, o+2 (with pad 2 on the
    # low side): dilated coordinate d holds input d//2 when d even (offset by
    # the pad), zero otherwise.  Working out the congruences for pad_lo=2:
    #   out[2i, 2j]     = sum over taps (a,b) in {0,2}x{0,2} -> 2x2 conv
    #   out[2i, 2j+1]   = taps {0,2}x{1}                     -> 2x1
    #   out[2i+1, 2j]   = taps {1}x{0,2}                     -> 1x2
    #   out[2i+1, 2j+1] = tap  {1}x{1}                       -> 1x1
    # each over the input padded by 1 on the low side only.
    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))

    def sub(taps_y, taps_x):
        k = flipped[jnp.asarray(taps_y)[:, None], jnp.asarray(taps_x)[None, :]]
        return lax.conv_general_dilated(
            xp, k.astype(x.dtype), (1, 1), "VALID", dimension_numbers=_DN
        )

    # tap index t reads dilated d = o + t - ... ; derived + verified vs
    # conv2d_transpose below (exact match on integer inputs).
    ee = sub((0, 2), (0, 2))  # (n, h+... ) -> (n, h, w, cout)
    eo = sub((0, 2), (1,))[:, :, 1:, :]
    oe = sub((1,), (0, 2))[:, 1:, :, :]
    oo = sub((1,), (1,))[:, 1:, 1:, :]
    # interleave: out[2i+a, 2j+b]
    out = jnp.stack(
        [jnp.stack([ee, eo], axis=3), jnp.stack([oe, oo], axis=3)], axis=2
    )  # (n, h, 2, w, 2, cout)
    out = out.reshape(n, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def convt_packed2x2(x, kernel, bias=None):
    """Same parity decomposition packed into ONE dense 2x2 conv with 4*cout
    output channels (unused taps zero-padded) + pixel shuffle.

    Per output pixel this is 2*2*cin MACs vs the lhs-dilated form's
    3*3*cin = 44% of the MAC count, in a single MXU-friendly contraction;
    the question is whether that beats XLA's native lowering once the
    shuffle relayout is paid.  MAC set per output pixel is identical to
    conv2d_transpose plus exact zeros (order may differ).
    """
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3
    n, h, w, _ = x.shape
    flipped = jnp.flip(kernel, (0, 1))
    # K2[u, v, :, (a, b, co)]: tap (u, v) of the window xp[i+u, j+v]
    # contributing to out[2i+a, 2j+b].
    k2 = jnp.zeros((2, 2, cin, 2, 2, cout), kernel.dtype)
    for u in (0, 1):
        for v in (0, 1):
            k2 = k2.at[u, v, :, 0, 0].set(flipped[2 * u, 2 * v])  # ee
    for u in (0, 1):
        k2 = k2.at[u, 1, :, 0, 1].set(flipped[2 * u, 1])  # eo
        k2 = k2.at[1, u, :, 1, 0].set(flipped[1, 2 * u])  # oe
    k2 = k2.at[1, 1, :, 1, 1].set(flipped[1, 1])  # oo
    k2 = k2.reshape(2, 2, cin, 4 * cout)

    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = lax.conv_general_dilated(
        xp, k2.astype(x.dtype), (1, 1), "VALID", dimension_numbers=_DN
    )  # (n, h, w, 4*cout)
    y = y.reshape(n, h, w, 2, 2, cout)
    out = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()

    rng = np.random.default_rng(0)

    # correctness check first (integers -> exact in f32)
    x = jnp.asarray(
        rng.integers(-4, 5, (2, 16, 16, 8)).astype(np.float32)
    )
    k = jnp.asarray(rng.integers(-4, 5, (3, 3, 8, 6)).astype(np.float32))
    want = np.asarray(conv2d_transpose(x, k))
    got = np.asarray(convt_decomposed(x, k))
    assert want.shape == got.shape, (want.shape, got.shape)
    assert np.array_equal(want, got), (
        f"mismatch: {np.abs(want - got).max()}"
    )
    got2 = np.asarray(convt_packed2x2(x, k))
    assert np.array_equal(want, got2), (
        f"packed mismatch: {np.abs(want - got2).max()}"
    )
    print("decomposition exact", flush=True)

    # decoder shapes of the flagship half-width net on a 25-patch tile,
    # batched as in bench (~100 patches per conv here to bound VMEM/HBM)
    shapes = [
        (100, 16, 16, 512, 256),
        (100, 32, 32, 256, 128),
        (100, 64, 64, 128, 64),
        (100, 128, 128, 64, 32),
    ]
    n_iter = 4

    for (n, h, w, cin, cout) in shapes:
        xs = jnp.asarray(
            rng.standard_normal((n_iter, n, h, w, cin), np.float32)
        ).astype(jnp.bfloat16)
        kern = jnp.asarray(
            rng.standard_normal((3, 3, cin, cout), np.float32)
        ).astype(jnp.bfloat16)

        def bench(name, fn):
            @jax.jit
            def loop(xs):
                def step(c, xx):
                    return c + jnp.sum(fn(xx, kern).astype(jnp.float32)), ()

                out, _ = lax.scan(step, jnp.float32(0), xs)
                return out

            np.asarray(loop(xs))
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                np.asarray(loop(xs))
            dt = (time.perf_counter() - t0) / reps / n_iter
            gflop = 2 * 9 * n * (2 * h) * (2 * w) * cin * cout / 1e9
            print(
                f"{name} {n}x{h}x{w}x{cin}->{cout}: {dt * 1000:.2f} ms "
                f"({gflop / dt / 1000:.1f} TFLOP/s at output-res accounting)",
                flush=True,
            )

        if os.environ.get("CONVT_PACKED_ONLY"):
            bench("packed2x2  ", lambda xx, kk: convt_packed2x2(xx, kk))
        else:
            bench("lhs_dilated", lambda xx, kk: conv2d_transpose(xx, kk))
            bench("decomposed ", lambda xx, kk: convt_decomposed(xx, kk))
            bench("packed2x2  ", lambda xx, kk: convt_packed2x2(xx, kk))


if __name__ == "__main__":
    main()
