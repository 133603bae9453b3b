"""Connected-component labeling as a single Pallas TPU kernel.

The XLA implementation (ecseg_tpu.ops.cc_tpu) expresses each propagation
sweep as pad + 8 shifted dynamic-slices, which XLA materializes in HBM --
roughly 1 GB of HBM traffic per 1024x1024 tile.  This kernel keeps the label
image resident in VMEM for the whole fixpoint iteration, so each sweep is
pure VPU work:

  * the label image lives in a VMEM scratch with a sentinel border (8 rows /
    128 cols of BIG), so neighbor shifts are plain circular rolls with no
    per-shift boundary masking -- wrapped lanes land in the border and are
    reset by the foreground mask at the end of every sweep;
  * phase A: separable 3x3 window-min sweeps (4 rolls + 4 mins each) --
    min(self, 8 neighbors) for connectivity=2 -- which fully label blob-like
    components in a handful of sweeps;
  * phase B (only if A did not converge): segmented Hillis-Steele min-scans
    along rows and columns (log-depth run propagation, resets at background)
    plus one 3x3 sweep per iteration, for snake/labyrinth masks;
  * fixpoint detection and the component count (#pixels whose label equals
    their own flat index) are computed in-kernel; the count is the only
    HBM write on the counting path.

Labels match ecseg_tpu.ops.cc_tpu.label_tpu exactly: every component pixel
carries the flat raster index (row*W + col) of the component's first pixel,
background is -1 -- the same canonical labeling skimage.measure.label
induces on component *counts* (reference src/image_tools.py:114-119 counts
via skimage label on host; this is the TPU-native replacement).

On non-TPU backends the kernel runs in Pallas interpret mode, so the same
code path is exercised by the CPU test suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_PAD = 8  # sentinel border rows (>= any single-step shift)
_COL_PAD = 128  # sentinel border cols (int32 lane tile)

# Phase A: cheap neighbor sweeps, checked every _CHUNK sweeps.
_CHUNK = 4
_A_CHUNKS = 6  # 24 plain sweeps before switching to scans
# Scan-sweep safety bound.  Fixpoint normally hits in a few iterations; the
# worst case (a maximal spiral on a 1024^2 image) needs ~one iteration per
# quarter-turn, i.e. up to ~2*H/4 -- keep the bound far above that so the
# loop always exits at the true fixpoint, never the cap.
_B_MAX = 8192
# Scan-step budget: Hillis-Steele doubling stops at distance 2^(_B_STEPS-1)
# (window 256).  Mosaic lowers large-distance rolls as full-array data
# movement whose cost grows with the shift -- a measured 11-step (d<=1024)
# scan iteration costs ~20 ms where the 8-step form is sub-ms -- and the
# outer fixpoint loop already iterates to convergence, so capping the
# window trades (rarely) one more cheap iteration for never paying the
# catastrophic rolls (scripts/profile_cc_variants.py).
_B_STEPS = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Empirical compile envelope of the VMEM-resident fixpoint kernels on this
# attachment.  _PALLAS_MAX_MAP_BYTES is the SINGLE-STRIP scan envelope (the
# 1032x1152-padded 1024^2-image variants compile and run with full-map scan
# temporaries); larger maps run the B-phase scans strip-blocked
# (:func:`_strip_slices`) so per-strip temporaries stay inside it --
# full-map scan temporaries at 2056x2176 (2048^2 images) overflow the
# 128 MB VMEM as register-allocator spill slots at compile time.
# _PALLAS_MAX_TOTAL_BYTES bounds the map size itself: state + input + sweep
# temporaries are full-map even when scans are blocked, and a 2048^2
# (2056x2176-padded) flood kernel measures 212 MB scoped VMEM at compile
# time after a 76-minute Mosaic register-allocation grind -- so the whole-
# map-in-VMEM form is gated at the 1024^2 class and larger maps fall back
# to the XLA formulations (ops/cc_tpu + scatter marks), which compile at
# any geometry.  (The strip-blocked scans alone are NOT sufficient for
# 2048^2: measured negative result, r3.)
_PALLAS_MAX_MAP_BYTES = 6 * 1024 * 1024
_PALLAS_MAX_TOTAL_BYTES = 6 * 1024 * 1024


def _fits_vmem(h: int, w: int, op: str = "") -> bool:
    if _interpret():
        return True  # interpret mode has no VMEM; keep one code path in CI
    hp, wp = _padded_dims(h, w)
    ok = hp * wp * 4 <= _PALLAS_MAX_TOTAL_BYTES
    if not ok and not _fits_banded(h, w):
        # gate hits are recorded at TRACE time (once per new geometry per
        # process, since the callers are jitted) -- the signal is "this
        # program compiled with the slow XLA formulation", see
        # runtime/fallbacks.  Maps the BANDED kernels cover are not
        # fallbacks: they stay on a Pallas path.  The key embeds op+geometry
        # so a fallback line in a bench tail identifies the culprit program
        # (VERDICT r3 item 5: a bare counter was unactionable).
        from ..runtime import fallbacks

        tag = f"[{op + ':' if op else ''}{h}x{w}]"
        fallbacks.record(fallbacks.PALLAS_VMEM + tag)
    return ok


def _fits_banded(h: int, w: int) -> bool:
    from .cc_pallas_banded import fits_banded

    return fits_banded(h, w)


def _padded_dims(h: int, w: int):
    hp = -(-(h + 1) // _ROW_PAD) * _ROW_PAD + _ROW_PAD
    wp = -(-(w + 1) // _COL_PAD) * _COL_PAD + _COL_PAD
    return hp, wp


def _sweep3x3(lab, big):
    """min over the 3x3 window (separable), masked to foreground.  The
    background set is recovered from ``lab`` itself (== big) so no separate
    mask array stays live in VMEM."""
    m1 = jnp.minimum(lab, jnp.roll(lab, 1, 1))
    m1 = jnp.minimum(m1, jnp.roll(lab, -1, 1))
    m2 = jnp.minimum(m1, jnp.roll(m1, 1, 0))
    m2 = jnp.minimum(m2, jnp.roll(m1, -1, 0))
    return jnp.where(lab == big, big, m2)


def _sweep_cross(lab, big):
    """min over the 4-neighborhood + self, masked to foreground."""
    n = jnp.minimum(lab, jnp.roll(lab, 1, 1))
    n = jnp.minimum(n, jnp.roll(lab, -1, 1))
    n = jnp.minimum(n, jnp.roll(lab, 1, 0))
    n = jnp.minimum(n, jnp.roll(lab, -1, 0))
    return jnp.where(lab == big, big, n)


def _strip_slices(lab, axis, n_strips):
    """Split ``lab`` into ``n_strips`` tile-aligned slices along the
    NON-scan axis (scan-axis geometry is untouched, so run semantics and
    the sentinel border behave exactly as unblocked).  Returns a list of
    (2D slice) values; the caller concatenates the processed strips back.
    Blocking exists purely to bound Mosaic's live VMEM: segscan
    temporaries shrink from full-map to strip-sized, which is what lets
    2048^2-class maps compile (full-map temporaries overflow the 128 MB
    VMEM as register-allocator spill slots)."""
    other = 1 - axis
    n = lab.shape[other]
    tile = _COL_PAD if other == 1 else _ROW_PAD
    per = -(-n // (n_strips * tile)) * tile
    out = []
    s = 0
    while s < n:
        e = min(s + per, n)
        out.append(lab[s:e, :] if other == 0 else lab[:, s:e])
        s = e
    return out


def _segscan_axis(lab, big, axis, size, border, n_strips: int = 1):
    """Segmented min-scan along ``axis`` in both directions: each foreground
    pixel ends with the min over the last ``2**_B_STEPS`` labels of its
    background-delimited run (the enclosing fixpoint loop extends this to
    the whole run; see the _B_STEPS note for why the window is capped).
    Hillis-Steele: log-depth, doubling shifts.  For shifts smaller than the
    sentinel border the wrap is self-masking (border is background); larger
    shifts are masked with the coordinate iota (generated per strip -- the
    scan-axis coordinate is strip-invariant).  The segment flag ``f`` is
    carried as int32 (Mosaic rejects i1 vector rolls/bitcasts).
    ``n_strips`` > 1 processes tile-aligned blocks of the non-scan axis
    sequentially to bound live VMEM (see :func:`_strip_slices`)."""
    nsteps = min(max(1, int(np.ceil(np.log2(size)))), _B_STEPS)

    def scan_strip(lab):
        idx_along = lax.broadcasted_iota(jnp.int32, lab.shape, axis)

        def one_dir(v, f, sgn):
            for s in range(nsteps):
                d = 1 << s
                vs = jnp.roll(v, sgn * d, axis)
                fs = jnp.roll(f, sgn * d, axis)
                if d > border:
                    # wrapped lanes carry real data; treat them as segment
                    # boundaries explicitly
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

    if n_strips <= 1:
        return scan_strip(lab)
    return jnp.concatenate(
        [scan_strip(s) for s in _strip_slices(lab, axis, n_strips)], 1 - axis
    )


def _cc_kernel_body(mask_ref, h, w, connectivity, want_labels):
    """Shared kernel body; returns (labels, count, px) values."""
    hp, wp = _padded_dims(h, w)
    mp = jnp.pad(mask_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w)))
    return _cc_fixpoint(mp, hp, wp, h, w, connectivity, want_labels)


def _n_strips(hp: int, wp: int) -> int:
    """Segscan strip count: 1 (unblocked) within the single-strip VMEM
    envelope, else enough tile-aligned strips to keep per-strip scan
    temporaries ~the 1024^2-class size that is known to compile."""
    return max(1, -(-(hp * wp * 4) // _PALLAS_MAX_MAP_BYTES))


def _flat_iota(hp, wp):
    rows = lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
    cols = lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
    return rows * wp + cols


def _cc_fixpoint(mp, hp, wp, h, w, connectivity, want_labels):
    """Label-propagation fixpoint over an already-padded (hp, wp) int32
    foreground map; returns (labels, count, px) values.  The flat-index
    iota is regenerated at each use instead of kept live across the loops,
    and B-phase scans are strip-blocked on large maps -- both purely VMEM
    liveness measures (2048^2-class maps otherwise spill past the 128 MB
    VMEM at compile time)."""
    big = jnp.int32(hp * wp)
    strips = _n_strips(hp, wp)

    lab0 = jnp.where(mp != 0, _flat_iota(hp, wp), big)

    sweep = _sweep3x3 if connectivity == 2 else _sweep_cross

    def delta(new, lab):
        return jnp.max(jnp.where(new != lab, 1, 0)) > 0

    def a_chunk(state):
        lab, _, it = state
        new = lab
        for _ in range(_CHUNK):
            new = sweep(new, big)
        return new, delta(new, lab), it + 1

    def a_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < _A_CHUNKS)

    lab, changed, _ = lax.while_loop(
        a_cond, a_chunk, (sweep(lab0, big), jnp.bool_(True), jnp.int32(0))
    )

    def b_step(state):
        lab, _, it = state
        new = _segscan_axis(lab, big, 1, wp, _COL_PAD, strips)
        new = _segscan_axis(new, big, 0, hp, _ROW_PAD, strips)
        if connectivity == 2:
            new = sweep(new, big)
        return new, delta(new, lab), it + 1

    def b_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < _B_MAX)

    lab, _, _ = lax.while_loop(b_cond, b_step, (lab, changed, jnp.int32(0)))

    # roots: lab == own index (background has lab == big > any idx)
    count = jnp.sum(jnp.where(lab == _flat_iota(hp, wp), 1, 0), dtype=jnp.int32)
    px = jnp.sum(jnp.where(lab != big, 1, 0), dtype=jnp.int32)
    labels = None
    if want_labels:
        # convert padded flat indices to unpadded raster indices
        r, c = lab // wp, lab % wp
        labels = jnp.where(lab == big, -1, r * w + c)[:h, :w].astype(jnp.int32)
    return labels, count, px


def _count_kernel(h, w, connectivity):
    def kernel(mask_ref, count_ref, px_ref):
        _, count, px = _cc_kernel_body(mask_ref, h, w, connectivity, False)
        count_ref[0, 0] = count
        px_ref[0, 0] = px

    return kernel


def _count_from_patches_kernel(copies, h, w, class_id, connectivity):
    """Kernel that performs the overlap-stitch copy plan IN VMEM (the XLA
    formulation issues ~150 small dynamic_update_slice kernels per tile,
    which is launch-overhead bound) and then runs the CC fixpoint on the
    assembled ``label == class_id`` mask."""
    hp, wp = _padded_dims(h, w)

    def kernel(patches_ref, count_ref, px_ref, mp_ref):
        # Mosaic has no value-level dynamic_update_slice; assemble the
        # canvas in a VMEM scratch with static slice stores instead.
        mp_ref[:] = jnp.zeros((hp, wp), jnp.int32)
        for (i, sy, sx, dy, dx, sh, sw) in copies:
            block = patches_ref[i, sy : sy + sh, sx : sx + sw]
            mp_ref[dy : dy + sh, dx : dx + sw] = jnp.where(
                block == class_id, 1, 0
            ).astype(jnp.int32)
        _, count, px = _cc_fixpoint(mp_ref[:], hp, wp, h, w, connectivity, False)
        count_ref[0, 0] = count
        px_ref[0, 0] = px

    return kernel


def _label_kernel(h, w, connectivity):
    def kernel(mask_ref, lab_ref):
        labels, _, _ = _cc_kernel_body(mask_ref, h, w, connectivity, True)
        lab_ref[0] = labels

    return kernel


@functools.partial(jax.jit, static_argnames=("connectivity",))
def count_cc_pallas(mask: jnp.ndarray, connectivity: int = 2):
    """On-device (num_components, total_foreground_pixels) for one (H, W)
    binary mask -- drop-in for cc_tpu.count_cc_tpu, ~10x faster on TPU."""
    h, w = mask.shape
    if not _fits_vmem(h, w, op="count_cc"):
        from .cc_pallas_banded import fits_banded, label_banded

        if fits_banded(h, w):
            lab = label_banded(mask, connectivity=connectivity)
            flat = lab.reshape(-1)
            idx = jnp.arange(h * w, dtype=jnp.int32)
            return (
                jnp.sum(flat == idx, dtype=jnp.int32),
                jnp.sum(flat >= 0, dtype=jnp.int32),
            )
        from .cc_tpu import count_cc_tpu

        return count_cc_tpu(mask, connectivity=connectivity)
    mask = mask.astype(jnp.int32)[None]
    count, px = pl.pallas_call(
        _count_kernel(h, w, connectivity),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(mask)
    return count[0, 0], px[0, 0]


@functools.partial(
    jax.jit, static_argnames=("positions", "class_id", "connectivity")
)
def count_cc_from_patches(
    label_patches: jnp.ndarray,
    positions,
    class_id: int = 3,
    connectivity: int = 2,
):
    """Fused overlap-stitch + connected-component count.

    ``label_patches``: (N, scw, scw) integer per-patch argmax label maps;
    ``positions``: the static patch-position tuple (ops.tiling).
    Semantically identical to
    ``count_cc_pallas(stitch == class_id)`` where ``stitch`` is the
    stitched label canvas -- the same copy plan runs inside the kernel, so
    the canvas never touches HBM and the ~150 per-tile XLA update-slice
    launches disappear.
    """
    from .tiling import OVERLAP, SCW, _stitch_plan_cached

    pos_key = tuple(map(tuple, positions))
    pos = np.asarray(pos_key)
    h_l = int(pos[:, 0].max())
    w_l = int(pos[:, 1].max())
    copies, H, W = _stitch_plan_cached(pos_key, OVERLAP, SCW, h_l, w_l)
    hp, wp = _padded_dims(H, W)
    n = label_patches.shape[0]
    if (
        not _fits_vmem(H, W, op="count_from_patches")
        or 4 * (n * SCW * SCW + hp * wp) > 45 * 1024 * 1024
    ):
        from .tiling import stitch_patches_jax

        canvas = stitch_patches_jax(
            label_patches.astype(jnp.int32)[..., None], positions
        )[..., 0]
        return count_cc_pallas(canvas == class_id, connectivity=connectivity)
    count, px = pl.pallas_call(
        _count_from_patches_kernel(tuple(copies), H, W, class_id, connectivity),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((hp, wp), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(label_patches.astype(jnp.int32))
    return count[0, 0], px[0, 0]


def _segscan_max_axis(r, mp, axis, size, border, n_strips: int = 1):
    """Segmented MAX-scan of ``r`` along ``axis`` in both directions over
    runs of traversable pixels (mp != 0); same Hillis-Steele structure,
    _B_STEPS window cap, and strip blocking as :func:`_segscan_axis`."""
    nsteps = min(max(1, int(np.ceil(np.log2(size)))), _B_STEPS)

    def scan_strip(r, mp):
        idx_along = lax.broadcasted_iota(jnp.int32, r.shape, axis)

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
                    vs = jnp.where(bad, 0, vs)
                v = jnp.where(f != 0, v, jnp.maximum(v, vs))
                f = jnp.maximum(f, fs)
            return v

        f0 = jnp.where(mp != 0, 0, 1).astype(jnp.int32)
        fwd = one_dir(r, f0, +1)
        bwd = one_dir(r, f0, -1)
        return jnp.where(mp != 0, jnp.maximum(fwd, bwd), 0)

    if n_strips <= 1:
        return scan_strip(r, mp)
    return jnp.concatenate(
        [
            scan_strip(rs, ms)
            for rs, ms in zip(
                _strip_slices(r, axis, n_strips),
                _strip_slices(mp, axis, n_strips),
            )
        ],
        1 - axis,
    )


def _sweep3x3_mc(lab, cls, big):
    """min over SAME-CLASS neighbors in the 3x3 window.  Non-separable:
    class equality gates each of the 8 neighbor contributions, so the
    separable window-min trick of :func:`_sweep3x3` does not apply.  The
    sentinel border carries cls == 0, which self-masks wrapped lanes."""
    lab_l, cls_l = jnp.roll(lab, 1, 1), jnp.roll(cls, 1, 1)
    lab_r, cls_r = jnp.roll(lab, -1, 1), jnp.roll(cls, -1, 1)
    m = lab
    for lv, cv in ((lab_l, cls_l), (lab_r, cls_r)):
        m = jnp.minimum(m, jnp.where(cv == cls, lv, big))
    for base_l, base_c in ((lab, cls), (lab_l, cls_l), (lab_r, cls_r)):
        for sgn in (1, -1):
            lv = jnp.roll(base_l, sgn, 0)
            cv = jnp.roll(base_c, sgn, 0)
            m = jnp.minimum(m, jnp.where(cv == cls, lv, big))
    return jnp.where(cls == 0, big, m)


def _segscan_axis_mc(lab, cls, big, axis, size, border, n_strips: int = 1):
    """Segmented min-scan along ``axis`` over SAME-CLASS runs.  Unlike the
    binary form (runs delimited by background pixels, symmetric flags), a
    class change between adjacent foreground pixels is a boundary with no
    gap pixel, so the run-start flag is direction-dependent: for direction
    ``sgn`` position i starts a run when its class differs from the class
    at i - sgn (background counts as its own 'class 0' run and keeps
    ``big``)."""
    nsteps = min(max(1, int(np.ceil(np.log2(size)))), _B_STEPS)

    def scan_strip(lab, cls):
        idx_along = lax.broadcasted_iota(jnp.int32, lab.shape, axis)

        def one_dir(v, sgn):
            prev_cls = jnp.roll(cls, sgn, axis)
            f = jnp.where(
                jnp.logical_or(cls == 0, prev_cls != cls), 1, 0
            ).astype(jnp.int32)
            for s in range(nsteps):
                d = 1 << s
                vs = jnp.roll(v, sgn * d, axis)
                fs = jnp.roll(f, sgn * d, axis)
                if d > border:
                    bad = (
                        idx_along < d if sgn > 0 else idx_along >= size - d
                    )
                    fs = jnp.where(bad, 1, fs)
                    vs = jnp.where(bad, big, vs)
                v = jnp.where(f != 0, v, jnp.minimum(v, vs))
                f = jnp.maximum(f, fs)
            return v

        fwd = one_dir(lab, +1)
        bwd = one_dir(lab, -1)
        return jnp.where(cls == 0, big, jnp.minimum(fwd, bwd))

    if n_strips <= 1:
        return scan_strip(lab, cls)
    return jnp.concatenate(
        [
            scan_strip(ls, cs)
            for ls, cs in zip(
                _strip_slices(lab, axis, n_strips),
                _strip_slices(cls, axis, n_strips),
            )
        ],
        1 - axis,
    )


def _mc_fixpoint(clsp, hp, wp, h, w):
    """Min-flat-index label fixpoint over an already-padded (hp, wp) int32
    CLASS map (0 = background): every pixel converges to the min flat index
    of its same-class 8-connected component.  Mirrors :func:`_cc_fixpoint`
    (A-phase neighbor sweeps, B-phase segmented scans, same strip
    blocking); one fixpoint labels every class at once -- the consumer
    (ops/meta_post_tpu._size_thresh and friends) previously ran one binary
    fixpoint per class."""
    big = jnp.int32(hp * wp)
    strips = _n_strips(hp, wp)

    lab0 = jnp.where(clsp != 0, _flat_iota(hp, wp), big)

    def delta(new, lab):
        return jnp.max(jnp.where(new != lab, 1, 0)) > 0

    def a_chunk(state):
        lab, _, it = state
        new = lab
        for _ in range(_CHUNK):
            new = _sweep3x3_mc(new, clsp, big)
        return new, delta(new, lab), it + 1

    def a_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < _A_CHUNKS)

    lab, changed, _ = lax.while_loop(
        a_cond,
        a_chunk,
        (_sweep3x3_mc(lab0, clsp, big), jnp.bool_(True), jnp.int32(0)),
    )

    def b_step(state):
        lab, _, it = state
        new = _segscan_axis_mc(lab, clsp, big, 1, wp, _COL_PAD, strips)
        new = _segscan_axis_mc(new, clsp, big, 0, hp, _ROW_PAD, strips)
        new = _sweep3x3_mc(new, clsp, big)
        return new, delta(new, lab), it + 1

    def b_cond(state):
        _, changed, it = state
        return jnp.logical_and(changed, it < _B_MAX)

    lab, _, _ = lax.while_loop(b_cond, b_step, (lab, changed, jnp.int32(0)))
    r, c = lab // wp, lab % wp
    return jnp.where(lab == big, -1, r * w + c)[:h, :w].astype(jnp.int32)


def _label_mc_kernel(h, w):
    hp, wp = _padded_dims(h, w)

    def kernel(cls_ref, lab_ref):
        clsp = jnp.pad(
            cls_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w))
        )
        lab_ref[0] = _mc_fixpoint(clsp, hp, wp, h, w)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_classes",))
def label_multiclass_pallas(
    cls_map: jnp.ndarray, num_classes: int = 3
) -> jnp.ndarray:
    """Per-pixel min-flat-index root of the pixel's SAME-CLASS 8-connected
    component; -1 where ``cls_map == 0``.  Identical to running
    :func:`label_pallas` per class and merging (the per-class components
    are the same sets), but ONE fixpoint covers them all.  Geometries
    outside the VMEM envelope fall back to exactly that per-class merge
    (banded/XLA labelers handle any size)."""
    h, w = cls_map.shape
    cls_map = cls_map.astype(jnp.int32)
    if not _fits_vmem(h, w, op="label_mc"):
        out = jnp.full((h, w), -1, jnp.int32)
        for c in range(1, num_classes + 1):
            lab_c = label_pallas(cls_map == c, connectivity=2)
            out = jnp.where(cls_map == c, lab_c, out)
        return out
    lab = pl.pallas_call(
        _label_mc_kernel(h, w),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024),
        interpret=_interpret(),
    )(cls_map[None])
    return lab[0]


def _sweep_flood_mc(r, cls):
    """max (reachability) over same-class neighbors in the 3x3 window."""
    r_l, cls_l = jnp.roll(r, 1, 1), jnp.roll(cls, 1, 1)
    r_r, cls_r = jnp.roll(r, -1, 1), jnp.roll(cls, -1, 1)
    m = r
    for rv, cv in ((r_l, cls_l), (r_r, cls_r)):
        m = jnp.maximum(m, jnp.where(cv == cls, rv, 0))
    for base_r, base_c in ((r, cls), (r_l, cls_l), (r_r, cls_r)):
        for sgn in (1, -1):
            rv = jnp.roll(base_r, sgn, 0)
            cv = jnp.roll(base_c, sgn, 0)
            m = jnp.maximum(m, jnp.where(cv == cls, rv, 0))
    return jnp.where(cls == 0, 0, m)


def _segscan_max_axis_mc(r, cls, axis, size, border, n_strips: int = 1):
    """Segmented MAX-scan over same-class runs (multiclass twin of
    :func:`_segscan_max_axis`, direction-dependent run-start flags)."""
    nsteps = min(max(1, int(np.ceil(np.log2(size)))), _B_STEPS)

    def scan_strip(r, cls):
        idx_along = lax.broadcasted_iota(jnp.int32, r.shape, axis)

        def one_dir(v, sgn):
            prev_cls = jnp.roll(cls, sgn, axis)
            f = jnp.where(
                jnp.logical_or(cls == 0, prev_cls != cls), 1, 0
            ).astype(jnp.int32)
            for s in range(nsteps):
                d = 1 << s
                vs = jnp.roll(v, sgn * d, axis)
                fs = jnp.roll(f, sgn * d, axis)
                if d > border:
                    bad = (
                        idx_along < d if sgn > 0 else idx_along >= size - d
                    )
                    fs = jnp.where(bad, 1, fs)
                    vs = jnp.where(bad, 0, vs)
                v = jnp.where(f != 0, v, jnp.maximum(v, vs))
                f = jnp.maximum(f, fs)
            return v

        fwd = one_dir(r, +1)
        bwd = one_dir(r, -1)
        return jnp.where(cls == 0, 0, jnp.maximum(fwd, bwd))

    if n_strips <= 1:
        return scan_strip(r, cls)
    return jnp.concatenate(
        [
            scan_strip(rs, cs)
            for rs, cs in zip(
                _strip_slices(r, axis, n_strips),
                _strip_slices(cls, axis, n_strips),
            )
        ],
        1 - axis,
    )


def _flood_mc_kernel(h, w):
    hp, wp = _padded_dims(h, w)
    strips = _n_strips(hp, wp)

    def kernel(cls_ref, seed_ref, out_ref):
        clsp = jnp.pad(
            cls_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w))
        )
        seeds = (
            jnp.pad(seed_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w)))
            != 0
        )
        r = jnp.where((clsp != 0) & seeds, 1, 0).astype(jnp.int32)

        def delta(new, old):
            return jnp.max(jnp.where(new != old, 1, 0)) > 0

        def a_chunk(state):
            r, _, it = state
            new = r
            for _ in range(_CHUNK):
                new = _sweep_flood_mc(new, clsp)
            return new, delta(new, r), it + 1

        def a_cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < _A_CHUNKS)

        r, changed, _ = lax.while_loop(
            a_cond,
            a_chunk,
            (_sweep_flood_mc(r, clsp), jnp.bool_(True), jnp.int32(0)),
        )

        def b_step(state):
            r, _, it = state
            new = _segscan_max_axis_mc(r, clsp, 1, wp, _COL_PAD, strips)
            new = _segscan_max_axis_mc(new, clsp, 0, hp, _ROW_PAD, strips)
            new = _sweep_flood_mc(new, clsp)
            return new, delta(new, r), it + 1

        def b_cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < _B_MAX)

        r, _, _ = lax.while_loop(b_cond, b_step, (r, changed, jnp.int32(0)))
        out_ref[0] = (r[:h, :w] != 0).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_classes",))
def flood_multiclass_pallas(
    cls_map: jnp.ndarray, seeds: jnp.ndarray, num_classes: int = 3
) -> jnp.ndarray:
    """Boolean (H, W): pixels 8-connected to any seed pixel through runs of
    their OWN class -- one fixpoint for all classes (the per-class floods
    cannot leak into each other because class equality gates every step).
    Falls back to per-class seeded floods outside the VMEM envelope."""
    h, w = cls_map.shape
    cls_map = cls_map.astype(jnp.int32)
    if not _fits_vmem(h, w, op="flood_mc"):
        out = jnp.zeros((h, w), bool)
        for c in range(1, num_classes + 1):
            m = cls_map == c
            out = jnp.logical_or(
                out,
                flood_from_seeds_pallas(
                    m, jnp.logical_and(seeds != 0, m), connectivity=2
                ),
            )
        return out
    out = pl.pallas_call(
        _flood_mc_kernel(h, w),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024),
        interpret=_interpret(),
    )(cls_map[None], seeds.astype(jnp.int32)[None])
    return out[0] != 0


def _label_flood_kernel(h, w, connectivity):
    """Fused min-index labeling + seeded reachability over ONE fixpoint:
    ops/meta_post_tpu._merge_comp needs both the component labels (for the
    skipped-last-label quirk) and the 'component contains a seed' flood of
    the SAME mask -- running them as one kernel shares the sweep loop and
    halves the launch/iteration overhead versus two fixpoints."""
    hp, wp = _padded_dims(h, w)
    strips = _n_strips(hp, wp)

    def kernel(mask_ref, seed_ref, lab_ref, fl_ref):
        mp = jnp.pad(mask_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w)))
        seeds = (
            jnp.pad(seed_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w)))
            != 0
        )
        big = jnp.int32(hp * wp)
        lab0 = jnp.where(mp != 0, _flat_iota(hp, wp), big)
        r0 = jnp.where((mp != 0) & seeds, 1, 0).astype(jnp.int32)

        sweep_l = _sweep3x3 if connectivity == 2 else _sweep_cross

        def sweep_r(r):
            n = jnp.maximum(r, jnp.roll(r, 1, 1))
            n = jnp.maximum(n, jnp.roll(r, -1, 1))
            if connectivity == 2:
                n = jnp.maximum(n, jnp.roll(n, 1, 0))
                n = jnp.maximum(n, jnp.roll(n, -1, 0))
            else:
                n = jnp.maximum(n, jnp.roll(r, 1, 0))
                n = jnp.maximum(n, jnp.roll(r, -1, 0))
            return jnp.where(mp != 0, n, 0)

        def delta(a, b):
            return jnp.max(jnp.where(a != b, 1, 0)) > 0

        def a_chunk(state):
            lab, r, _, it = state
            nl, nr = lab, r
            for _ in range(_CHUNK):
                nl = sweep_l(nl, big)
                nr = sweep_r(nr)
            return (
                nl,
                nr,
                jnp.logical_or(delta(nl, lab), delta(nr, r)),
                it + 1,
            )

        def a_cond(state):
            _, _, changed, it = state
            return jnp.logical_and(changed, it < _A_CHUNKS)

        lab, r, changed, _ = lax.while_loop(
            a_cond,
            a_chunk,
            (sweep_l(lab0, big), sweep_r(r0), jnp.bool_(True), jnp.int32(0)),
        )

        def b_step(state):
            lab, r, _, it = state
            nl = _segscan_axis(lab, big, 1, wp, _COL_PAD, strips)
            nl = _segscan_axis(nl, big, 0, hp, _ROW_PAD, strips)
            nr = _segscan_max_axis(r, mp, 1, wp, _COL_PAD, strips)
            nr = _segscan_max_axis(nr, mp, 0, hp, _ROW_PAD, strips)
            if connectivity == 2:
                nl = sweep_l(nl, big)
                nr = sweep_r(nr)
            return (
                nl,
                nr,
                jnp.logical_or(delta(nl, lab), delta(nr, r)),
                it + 1,
            )

        def b_cond(state):
            _, _, changed, it = state
            return jnp.logical_and(changed, it < _B_MAX)

        lab, r, _, _ = lax.while_loop(b_cond, b_step, (lab, r, changed, jnp.int32(0)))
        rr, cc = lab // wp, lab % wp
        lab_ref[0] = jnp.where(lab == big, -1, rr * w + cc)[:h, :w].astype(
            jnp.int32
        )
        fl_ref[0] = (r[:h, :w] != 0).astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_and_flood_pallas(
    mask: jnp.ndarray, seeds: jnp.ndarray, connectivity: int = 2
):
    """(labels, flooded) of one binary mask in ONE fused fixpoint kernel:
    ``labels`` identical to :func:`label_pallas`, ``flooded`` identical to
    :func:`flood_from_seeds_pallas` on the same mask/seeds.  Falls back to
    the two separate calls outside the VMEM envelope."""
    h, w = mask.shape
    if not _fits_vmem(h, w, op="label_flood"):
        return (
            label_pallas(mask, connectivity=connectivity),
            flood_from_seeds_pallas(mask, seeds, connectivity=connectivity),
        )
    lab, fl = pl.pallas_call(
        _label_flood_kernel(h, w, connectivity),
        out_shape=(
            jax.ShapeDtypeStruct((1, h, w), jnp.int32),
            jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024),
        interpret=_interpret(),
    )(mask.astype(jnp.int32)[None], seeds.astype(jnp.int32)[None])
    return lab[0], fl[0] != 0


def _flood_kernel(h, w, connectivity, seeded):
    """Reachability fixpoint through runs of a traversable mask, with no
    labeling and no scatter.  Seeds: the true-image border
    (``seeded=False``, hole filling) or an explicit seed mask
    (``seeded=True``, e.g. merge_comp's touches-class flood)."""
    hp, wp = _padded_dims(h, w)

    strips = _n_strips(hp, wp)

    def kernel(*refs):
        if seeded:
            mask_ref, seed_ref, out_ref = refs
        else:
            mask_ref, out_ref = refs
        mp = jnp.pad(mask_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w)))
        if seeded:
            seeds = jnp.pad(
                seed_ref[0].astype(jnp.int32), ((0, hp - h), (0, wp - w))
            ) != 0
        else:
            rows = lax.broadcasted_iota(jnp.int32, (hp, wp), 0)
            cols = lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
            seeds = (
                (rows == 0) | (rows == h - 1) | (cols == 0) | (cols == w - 1)
            )
        r = jnp.where((mp != 0) & seeds, 1, 0).astype(jnp.int32)

        def sweep(r):
            n = jnp.maximum(r, jnp.roll(r, 1, 1))
            n = jnp.maximum(n, jnp.roll(r, -1, 1))
            if connectivity == 2:
                n = jnp.maximum(n, jnp.roll(n, 1, 0))
                n = jnp.maximum(n, jnp.roll(n, -1, 0))
            else:
                n = jnp.maximum(n, jnp.roll(r, 1, 0))
                n = jnp.maximum(n, jnp.roll(r, -1, 0))
            return jnp.where(mp != 0, n, 0)

        def delta(new, old):
            return jnp.max(jnp.where(new != old, 1, 0)) > 0

        def a_chunk(state):
            r, _, it = state
            new = r
            for _ in range(_CHUNK):
                new = sweep(new)
            return new, delta(new, r), it + 1

        def a_cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < _A_CHUNKS)

        r, changed, _ = lax.while_loop(
            a_cond, a_chunk, (sweep(r), jnp.bool_(True), jnp.int32(0))
        )

        def b_step(state):
            r, _, it = state
            new = _segscan_max_axis(r, mp, 1, wp, _COL_PAD, strips)
            new = _segscan_max_axis(new, mp, 0, hp, _ROW_PAD, strips)
            new = sweep(new)
            return new, delta(new, r), it + 1

        def b_cond(state):
            _, changed, it = state
            return jnp.logical_and(changed, it < _B_MAX)

        r, _, _ = lax.while_loop(b_cond, b_step, (r, changed, jnp.int32(0)))
        out_ref[0] = (r[:h, :w] != 0).astype(jnp.int32)

    return kernel


def _flood_xla(traversable, seeds, connectivity):
    """XLA flood fallback for geometries beyond the Pallas VMEM envelope:
    label the traversable mask, mark seed components via one scatter."""
    from .cc_tpu import label_tpu

    h, w = traversable.shape
    lab = label_tpu(traversable, connectivity=connectivity)
    flat = jnp.where(lab < 0, h * w, lab).reshape(-1)
    marks = jnp.zeros(h * w + 1, bool).at[
        jnp.where(seeds.reshape(-1), flat, h * w)
    ].set(True)
    marks = marks.at[h * w].set(False)
    return marks[flat].reshape(h, w)


@jax.jit
def flood_from_border_pallas(traversable: jnp.ndarray) -> jnp.ndarray:
    """Boolean (H, W): pixels of ``traversable`` 4-connected to the image
    border through traversable runs.  ``binary_fill_holes(mask)`` ==
    ``mask | (~mask & ~flood_from_border(~mask))``."""
    h, w = traversable.shape
    if not _fits_vmem(h, w, op="flood_border"):
        border = jnp.zeros((h, w), bool)
        border = border.at[0, :].set(True).at[-1, :].set(True)
        border = border.at[:, 0].set(True).at[:, -1].set(True)
        trav = traversable != 0
        from .cc_pallas_banded import fits_banded, flood_banded

        if fits_banded(h, w):
            return flood_banded(trav, border, connectivity=1)
        return _flood_xla(trav, jnp.logical_and(trav, border), 1)
    m = traversable.astype(jnp.int32)[None]
    out = pl.pallas_call(
        _flood_kernel(h, w, 1, False),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(m)
    return out[0] != 0


@functools.partial(jax.jit, static_argnames=("connectivity",))
def flood_from_seeds_pallas(
    traversable: jnp.ndarray, seeds: jnp.ndarray, connectivity: int = 2
) -> jnp.ndarray:
    """Boolean (H, W): pixels of ``traversable`` connected (4- or 8-) to any
    seed pixel through traversable runs -- the scatter-free form of
    "which components contain a marked pixel"."""
    h, w = traversable.shape
    if not _fits_vmem(h, w, op="flood_seeds"):
        from .cc_pallas_banded import fits_banded, flood_banded

        if fits_banded(h, w):
            return flood_banded(
                traversable != 0, seeds != 0, connectivity=connectivity
            )
        return _flood_xla(traversable != 0, seeds != 0, connectivity)
    m = traversable.astype(jnp.int32)[None]
    s = seeds.astype(jnp.int32)[None]
    out = pl.pallas_call(
        _flood_kernel(h, w, connectivity, True),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(m, s)
    return out[0] != 0


def _stitch_labels_kernel(copies, H, W):
    def kernel(patches_ref, out_ref):
        out_ref[:] = jnp.zeros((H, W), jnp.int32)
        for (i, sy, sx, dy, dx, sh, sw) in copies:
            out_ref[dy : dy + sh, dx : dx + sw] = patches_ref[
                i, sy : sy + sh, sx : sx + sw
            ]

    return kernel


@functools.partial(jax.jit, static_argnames=("positions",))
def stitch_labels_pallas(label_patches: jnp.ndarray, positions) -> jnp.ndarray:
    """Overlap-stitch per-patch int label maps into the (H, W) canvas with
    the whole copy plan in ONE kernel (the XLA stitcher issues ~150 small
    dynamic-update-slice launches per tile).  Identical output to
    tiling.stitch_patches_jax on the argmaxed patches.  Falls back to the
    XLA stitcher when the patch stack + canvas would not fit VMEM."""
    from .tiling import OVERLAP, SCW, _stitch_plan_cached, stitch_patches_jax

    pos_key = tuple(map(tuple, positions))
    pos = np.asarray(pos_key)
    h_l = int(pos[:, 0].max())
    w_l = int(pos[:, 1].max())
    copies, H, W = _stitch_plan_cached(pos_key, OVERLAP, SCW, h_l, w_l)

    n = label_patches.shape[0]
    vmem_bytes = 4 * (n * SCW * SCW + 2 * H * W)
    if vmem_bytes > 45 * 1024 * 1024:
        return stitch_patches_jax(
            label_patches.astype(jnp.int32)[..., None], positions
        )[..., 0]

    return pl.pallas_call(
        _stitch_labels_kernel(tuple(copies), H, W),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(label_patches.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label_pallas(mask: jnp.ndarray, connectivity: int = 2) -> jnp.ndarray:
    """Canonical min-index labeling of one (H, W) binary mask; background is
    -1.  Identical output contract to cc_tpu.label_tpu."""
    h, w = mask.shape
    if not _fits_vmem(h, w, op="label"):
        from .cc_pallas_banded import fits_banded, label_banded

        if fits_banded(h, w):
            return label_banded(mask, connectivity=connectivity)
        from .cc_tpu import label_tpu

        return label_tpu(mask, connectivity=connectivity)
    mask = mask.astype(jnp.int32)[None]
    lab = pl.pallas_call(
        _label_kernel(h, w, connectivity),
        out_shape=jax.ShapeDtypeStruct((1, h, w), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(mask)
    return lab[0]
