"""Fused level-1 decoder tail: dec1_1 -> dec1_2 -> head -> softmax ->
exact uint8 quantize -> argmax as ONE Pallas kernel per patch.

**Status: a kept, documented NEGATIVE RESULT -- wired only behind
``bench.py --fused-tail`` (experiment mode), not into any default path.**
The premise: the per-layer forward profile shows the 256^2-level convs
HBM-bandwidth-bound -- XLA writes and re-reads every intermediate
activation (dec1_1 out 4 MB, dec1_2 out 4 MB, probs 1 MB per patch, ~x2
for write+read; ~18 MB/patch of removable traffic ~= 2.2 ms/chunk-tile).
Measured on chip (scripts/profile_fused_tail.py, 50-patch batches): the
fused kernel runs ~0.2 ms/patch SLOWER than the whole XLA tail.  Cause:
Mosaic's (8, 128) lane tiling rejects ref slicing on sub-128-lane arrays,
so every channel dim must pad to 128 -- which multiplies the tail's MACs
by 2x (dec1_1, cin 64->128), 4x (dec1_2, 32->128) and 32x (head) and
erases the HBM saving.  The un-padded variant fails to lower ("Slice
shape along dimension 3 must be aligned to tiling (128)") after a ~20 min
Mosaic grind.  Same conclusion as the transpose-conv trail
(ops/convt_pallas.py): for <=64-channel 256^2 layers, XLA's native conv
lowering is already near the achievable floor on this hardware and the
VMEM-fusion lever does not pay at these widths.

Formulation: each 3x3 'SAME' conv is an im2col-slab matmul -- per 32-row
slab, the 9 shifted taps concatenate along lanes into (32*256, 9*cin) and
one MXU matmul against the (9*cin, cout) repacked kernel computes the
conv with full lane utilization (per-tap matmuls at cin=32..64 would run
the 128-wide MXU at 25-50%).  f32 accumulation, bias+ReLU fused; the head
(1x1) is a plain matmul; softmax / quantize_u8 / argmax run in f32 on the
VPU using the same Veltkamp exact-quantize arithmetic as ops/tiling.

Numerics: the MAC set per output pixel equals the XLA convs; only the f32
accumulation order differs (one dot per pixel instead of XLA's schedule),
so this is a THROUGHPUT-mode path (bf16 serving, like bench.py's default
arch) -- it is NOT wired into the f32 host==device byte-parity pipeline.
Equivalence is tested as exact label agreement against the XLA chain on
integer-exact weights and near-total agreement on random bf16 weights
(tests/test_fused_tail.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH = 256
_SLAB = 32  # rows per im2col slab


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pack3x3(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3, 3, cin, cout) -> (9*cin, cout), tap-major to match the
    kernel's lane concatenation order (dy, dx, cin)."""
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3
    return kernel.reshape(9 * cin, cout)


def _quantize_u8_argmax(probs_f32):
    """argmax over the CANONICAL exact uint8 quantize (ops/tiling) -- the
    integer-valued f32 form, since Mosaic cannot cast f32->uint8 and the
    argmax is identical either way; one shared implementation keeps the
    byte contract from drifting."""
    from .tiling import quantize_u8_values_jax

    return jnp.argmax(quantize_u8_values_jax(probs_f32), axis=-1).astype(
        jnp.int32
    )


def _tail_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, wh_ref, bh_ref,
                 out_ref, x2_ref, x3_ref, *, h, w, c1, c2):
    """x_ref: (1, h+2, w, c1) bf16 -- the patch with one zero row above and
    below (column halo handled by masking rolls).  Emits (1, h, w) int32."""

    def conv3x3(src_ref, top_pad, cin, wref, bref, dst_ref):
        """im2col-slab 3x3 'SAME' conv + bias + ReLU from ``src_ref``
        ((h + 2*top_pad, w, cin) VMEM) into ``dst_ref`` ((h, w, cout))."""
        cout = dst_ref.shape[-1]
        n_slabs = h // _SLAB
        for s in range(n_slabs):
            r0 = s * _SLAB
            taps = []
            for dy in (0, 1, 2):
                # rows [r0 + dy - 1, ...) in unpadded coords; src is padded
                # by ``top_pad`` zero rows, so the read offset is r0+dy-1+top_pad
                if top_pad:
                    rows = src_ref[r0 + dy : r0 + dy + _SLAB, :, :]
                else:
                    lo = r0 + dy - 1
                    if lo < 0:
                        rows = jnp.pad(
                            src_ref[0 : _SLAB - 1, :, :], ((1, 0), (0, 0), (0, 0))
                        )
                    elif lo + _SLAB > h:
                        rows = jnp.pad(
                            src_ref[lo : h, :, :], ((0, 1), (0, 0), (0, 0))
                        )
                    else:
                        rows = src_ref[lo : lo + _SLAB, :, :]
                cols = lax.broadcasted_iota(jnp.int32, (_SLAB, w, 1), 1)
                for dx, keep in ((1, None), (0, cols > 0), (2, cols < w - 1)):
                    # roll-by-0 lowers to a zero-size slice in Mosaic
                    t = rows if dx == 1 else jnp.roll(rows, 1 - dx, 1)
                    if keep is not None:
                        t = jnp.where(keep, t, 0)
                    taps.append(t)
            # tap order above is (dy, dx') with dx' in (1,0,2): reorder to
            # (dy, 0..2) to match pack3x3's row-major reshape
            taps = [taps[3 * dy + k] for dy in range(3) for k in (1, 0, 2)]
            x9 = jnp.concatenate(
                [t.reshape(_SLAB * w, cin) for t in taps], axis=1
            )
            y = jax.lax.dot_general(
                x9, wref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = jnp.maximum(y + bref[:].astype(jnp.float32), 0.0)
            dst_ref[r0 : r0 + _SLAB, :, :] = y.reshape(
                _SLAB, w, cout
            ).astype(dst_ref.dtype)

    conv3x3(x_ref.at[0], 1, c1, w1_ref, b1_ref, x2_ref)
    conv3x3(x2_ref, 0, c2, w2_ref, b2_ref, x3_ref)

    # 1x1 head + f32 softmax + exact quantize + argmax, slab by slab
    ncls = wh_ref.shape[-1]
    for s in range(h // _SLAB):
        r0 = s * _SLAB
        rows = x3_ref[r0 : r0 + _SLAB, :, :].reshape(_SLAB * w, c2)
        logits = jax.lax.dot_general(
            rows, wh_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bh_ref[:].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[0, r0 : r0 + _SLAB, :] = _quantize_u8_argmax(probs).reshape(
            _SLAB, w
        )


_LANE = 128  # Mosaic lane tile: every kernel-side channel dim pads to this
# (sub-128 lane dims cannot be ref-sliced); the pad channels carry zero
# weights, so the arithmetic is exactly the unpadded computation


@jax.jit
def fused_dec1_head(x_cat, w1, b1, w2, b2, wh, bh):
    """relu-conv(dec1_1) -> relu-conv(dec1_2) -> 1x1 head -> softmax ->
    exact-u8-quantize -> argmax, fused.  ``x_cat`` (N, 256, 256, c1) bf16
    (concat of skip1 and the up1 output); returns (N, 256, 256) int32
    labels.  Weights HWIO."""
    n, h, w, c1 = x_cat.shape
    assert h == PATCH and w == PATCH, (h, w)
    c2_real = w2.shape[2]
    ncls_real = wh.shape[3]
    c1p = -(-c1 // _LANE) * _LANE
    c2 = _LANE
    ncls = _LANE

    def padc(a, axis, to):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, to - a.shape[axis])
        return jnp.pad(a, pad)

    # pad input channels and every weight in/out channel dim to the lane
    # tile; head logits pad with -inf bias so softmax sends them to exactly
    # 0 probability (argmax can never pick them: the true max prob >= 1/4
    # quantizes to >= 64)
    x_cat = padc(x_cat, 3, c1p)
    w1 = padc(padc(w1, 2, c1p), 3, c2)
    b1 = padc(b1, 0, c2)
    w2 = padc(padc(w2, 2, c2), 3, c2)
    b2 = padc(b2, 0, c2)
    wh = padc(padc(wh, 2, c2), 3, ncls)
    bh = jnp.concatenate(
        [bh, jnp.full(ncls - ncls_real, -jnp.inf, bh.dtype)]
    )
    c1 = c1p
    del c2_real, ncls_real

    xp = jnp.pad(x_cat, ((0, 0), (1, 1), (0, 0), (0, 0)))
    w1p = pack3x3(w1).astype(x_cat.dtype)
    w2p = pack3x3(w2).astype(x_cat.dtype)
    whp = wh.reshape(wh.shape[2], ncls).astype(x_cat.dtype)

    kernel = functools.partial(_tail_kernel, h=h, w=w, c1=c1, c2=c2)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w, c1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c1, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * c2, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, ncls), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ncls,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((h, w, c2), x_cat.dtype),
            pltpu.VMEM((h, w, c2), x_cat.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # measured scoped need at c-pad=128: 114 MB (chip VMEM is 128)
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(xp, w1p, b1, w2p, b2, whp, bh)
