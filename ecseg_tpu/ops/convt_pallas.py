"""Packed 3x3/stride-2 'SAME' transpose convolution as a Pallas TPU kernel.

**Status: a kept, documented NEGATIVE RESULT -- not wired into any model.**
The premise was that XLA's lhs-dilated lowering executes 9 MACs per output
pixel even though each stride-2 output parity touches only a 2x2 input
window (4/9 of the work).  Per-layer timing on the chip
(scripts/profile_layers.py) refuted the premise: the lhs-dilated up-convs
measure at 2.6-3.3x the bf16 peak under literal 9-tap accounting, i.e.
**XLA already strength-reduces the dilated conv to the 4-parity form**
(~9/4 MACs per output pixel at ~82% MXU utilization).  This kernel's dense
packed 2x2 contraction executes 4 MACs per parity-pixel (16 vs XLA's 9 per
2x2 output quad, the zero taps are multiplied), so it cannot win on any
level; the same arithmetic killed the earlier XLA-level packed2x2 and
depth-to-space reformulations (README "negative results").

The kernel remains as the repo's reference for the layout technique that
makes a fused pixel shuffle free on TPU (exact, tested vs the lhs-dilated
lowering in tests/test_convt_pallas.py):

- input  x (N, h, w, cin) is pre-padded (outside, cheap) to
  xp (N, h+1, W8, cin) with one zero row on top, one zero column on the
  left, and right-padding to W8 = w + 8 so in-kernel reshapes that merge
  the untiled (G, h) dims into the sublane dim are layout-preserving;
- the packed weights W[u] have lane order (v, a, b, cout): one matmul per
  u in {0, 1} computes both v taps and all four parities at once,
  Y_u = xp[:, u:u+h] @ W[u] with rows G*h*W8 (MXU-sized), f32 accumulate;
- acc[..., (a,b,c)] = Y_0 + Y_1 combined with a one-sublane shift for the
  v=1 lanes; bias + ReLU fused;
- the output is written as (N, h, 2, w, 2*cout): slicing parity ``a`` is
  a static index on an untiled dim, the (b, c) lane order matches the
  true output's trailing (2w, cout) layout, and the caller's final
  ``reshape(N, 2h, 2w, cout)`` is a pure row-major view (no copy).

Per output pixel the MAC set equals :func:`layers.conv2d_transpose` plus
exact zero products; only the f32 accumulation order differs, so integer
inputs match bit-exactly and bf16 inputs match to accumulation-order ulps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-level patch-group sizes tuned to keep the f32 Y/acc buffers inside a
# raised-but-safe VMEM envelope (see _group_size).
_VMEM_BUDGET = 48 * 1024 * 1024


def _interpret() -> bool:
    # same convention as cc_pallas: off-TPU (the CPU test mesh) the kernel
    # runs in Pallas interpret mode, so one code path serves CI and chip
    return jax.default_backend() != "tpu"


def pack_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3, 3, cin, cout) transpose-conv kernel -> packed (2, cin, 8*cout).

    W[u][:, m] with m = ((v*2 + a)*2 + b)*cout + c is the tap that routes
    window pixel xp[i+u, j+v] to output out[2i+a, 2j+b, c].  Derivation:
    out[2i+a, 2j+b] = sum_{p,q} x[i+da, j+db] * flip(k)[p, q] over the taps
    of the equivalent lhs-dilated conv; for stride 2 the surviving taps per
    parity are flip(k)[2u - a + 1 ...] -- identical to the packed2x2 layout
    validated in scripts/profile_convt.py (exact vs conv2d_transpose).
    """
    kh, kw, cin, cout = kernel.shape
    assert kh == 3 and kw == 3, (kh, kw)
    flipped = jnp.flip(kernel, (0, 1))
    # k2[u, v, :, a, b, :]: tap xp[i+u, j+v] -> out[2i+a, 2j+b]
    k2 = jnp.zeros((2, 2, cin, 2, 2, cout), kernel.dtype)
    for u in (0, 1):
        for v in (0, 1):
            k2 = k2.at[u, v, :, 0, 0].set(flipped[2 * u, 2 * v])
    for u in (0, 1):
        k2 = k2.at[u, 1, :, 0, 1].set(flipped[2 * u, 1])
        k2 = k2.at[1, u, :, 1, 0].set(flipped[1, 2 * u])
    k2 = k2.at[1, 1, :, 1, 1].set(flipped[1, 1])
    # (u, v, cin, a, b, c) -> (u, cin, (v, a, b, c))
    return k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, cin, 8 * cout)


def _group_size(h: int, w8: int, cin: int, cout: int) -> int:
    """Largest power-of-two patch group whose peak VMEM fits the budget."""
    per_g = (
        (h + 1) * w8 * cin * 2  # xp block, bf16
        + h * w8 * 8 * cout * 4  # Y_u, f32 (one live at a time)
        + h * (w8 - 8) * 4 * cout * 4  # acc, f32
        + h * 2 * (w8 - 8) * 2 * cout * 2  # out block, bf16
    )
    g = 1
    while 2 * g * per_g + 2 * cin * 8 * cout * 2 <= _VMEM_BUDGET and 2 * g <= 32:
        g *= 2
    return g


def _kernel(xp_ref, w_ref, b_ref, out_ref, *, h: int, w: int, cout: int):
    g = xp_ref.shape[0]
    w8 = xp_ref.shape[2]
    cin = xp_ref.shape[3]

    acc = None
    for u in (0, 1):
        rows = xp_ref[:, u : u + h, :, :].reshape(g * h * w8, cin)
        y = jax.lax.dot_general(
            rows,
            w_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(g, h, w8, 8 * cout)
        # v=0 lanes read columns [0, w); v=1 lanes read columns [1, w+1)
        part = y[:, :, 0:w, 0 : 4 * cout] + y[:, :, 1 : w + 1, 4 * cout :]
        acc = part if acc is None else acc + part

    acc = jnp.maximum(acc + b_ref[0].astype(jnp.float32), 0.0)
    acc = acc.astype(out_ref.dtype)
    # lanes of acc are (a, b, c); out lanes are (b, c) with parity a an
    # untiled dim -- both slices land on >=128-lane boundaries
    out_ref[:, :, 0, :, :] = acc[:, :, :, 0 : 2 * cout]
    out_ref[:, :, 1, :, :] = acc[:, :, :, 2 * cout :]


@functools.partial(jax.jit, static_argnames=("relu",))
def conv2d_transpose_packed(x, kernel, bias=None, *, relu: bool = True):
    """relu(conv2d_transpose(x, kernel, bias, stride=2, 'SAME')) via the
    packed Pallas kernel.  ``x`` (N, h, w, cin), ``kernel`` HWIO
    (3, 3, cin, cout).  Output (N, 2h, 2w, cout), dtype of ``x``.

    Requires cout a multiple of 64 (lane alignment of the parity slices;
    at cout=64 the 2*cout=128 out lanes are exactly one lane tile) and
    w a multiple of 8.
    """
    n, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    assert kcin == cin and w % 8 == 0 and cout % 64 == 0, (x.shape, kernel.shape)
    if not relu:
        raise NotImplementedError("the decoder always applies ReLU")

    w8 = w + 8
    wp = pack_weights(kernel).astype(x.dtype)
    b = (
        jnp.tile(bias.astype(jnp.float32), 4)
        if bias is not None
        else jnp.zeros(4 * cout, jnp.float32)
    )[None, :]

    xp = jnp.pad(x, ((0, 0), (1, 0), (1, 7), (0, 0)))
    g = _group_size(h, w8, cin, cout)
    # pad the batch up to a multiple of the group size
    n_pad = (-n) % g
    if n_pad:
        xp = jnp.pad(xp, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    ng = xp.shape[0] // g

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, cout=cout),
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(
                (g, h + 1, w8, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2, cin, 8 * cout), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 4 * cout), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (g, h, 2, w, 2 * cout),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((ng * g, h, 2, w, 2 * cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 16 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(xp, wp, b)
    return out[:n].reshape(n, 2 * h, 2 * w, cout)
