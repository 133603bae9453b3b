"""meta_inference ON DEVICE: the metaseg post-processing chain as one jitted
TPU program.

The reference's ``meta_inference`` (reference src/image_tools.py:15-84) is a
sequential, data-dependent chain -- fill holes, mean-size thresholds, ecDNA
border smoothing, the metaphase-center heuristic, two merge passes, a final
dilation -- that round 1 ran on host (~1-1.4 s per 2048^2 image,
ops/meta_post.meta_inference).  Here the same chain runs on device from the
existing primitives: the Pallas component labeler (ops/cc_pallas) for every
labeling, one-sort run-difference segment sums for per-component
area/centroid reductions (:func:`_compact_roots_sizes`; scatter-adds and
1M gathers measure 4-10x more expensive on this chip, see
scripts/profile_meta_post.py), blocked one-hot matvecs for root-flag
broadcasts, and shift-stack morphology (ops/morphology_tpu).

Exactness contract: the host twin is the parity oracle, and every step is a
bit-exact reformulation -- including the metaphase-center heuristic's
centroid band tests, which are evaluated as EXACT integer comparisons.
A centroid is the rational Sx/N (coordinate sum over area); the band test
``c_x < n_x + v`` is equivalent to ``Sc*Nn < Sn*Nc + v*Nn*Nc``, whose terms
reach ~2^55 -- beyond int32 and f32, and jax x64 is unavailable here.  The
products are therefore computed in base-2^11 limb arithmetic on int32
lanes (exact), with coordinate sums accumulated overflow-free via a hi/lo
split.  The device tests are EXACT -- which means they can disagree with
the host oracle's float64-ROUNDED comparisons when a pair's rational gap
falls inside the oracle's rounding error; such near-ties clear the ``ok``
output flag (see _metaphase_removal), as do the static component-count
budgets (MAX_CHROM/MAX_NUC).  The caller redoes an image on the host
oracle whenever ``ok`` is False.

Quirks replicated from the reference (same list as ops/meta_post.py):
skipped-last-label in merge_comp (scipy's raster-encounter "last" label is
the component with the largest min-flat-index root, which is what the
Pallas labeler already computes), the stale pre-conversion ecDNA region
list in size_thresh, and NaN means (0/0 in f32) disabling thresholds when
a class is absent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .cc_pallas import label_pallas
from .morphology import diamond
from .morphology_tpu import (
    binary_dilation_tpu,
    binary_erosion_tpu,
    binary_fill_holes_tpu,
)

EC_SIZE_THRESHOLD = 15  # reference src/image_tools.py:13
MIN_CHROM_COUNT = 5  # reference src/image_tools.py:72
BAND_V = 70.0  # reference src/image_tools.py:72

# Component budgets for the compacted centroid stage; overflow lowers `ok`.
MAX_CHROM = 2048
MAX_NUC = 512

# ---- exact integer limb arithmetic (base 2^11 on int32 lanes) -----------
# Centroid band tests compare products like Sc*Nn (coordinate-sum times
# area) that reach 2^55; these helpers evaluate their signs exactly.
_LB = 11
_LMASK = (1 << _LB) - 1


def _canon_sign(cols):
    """Sign (+1/0/-1 int32) of sum(cols[k] * 2**(11*k)); columns may be
    negative and carry-propagation uses arithmetic shifts (floor)."""
    carry = jnp.zeros_like(cols[0])
    any_limb = jnp.zeros_like(cols[0], dtype=bool)
    for c in cols:
        c = c + carry
        any_limb = jnp.logical_or(any_limb, (c & _LMASK) != 0)
        carry = c >> _LB
    return jnp.where(
        carry < 0,
        -1,
        jnp.where(jnp.logical_or(carry > 0, any_limb), 1, 0),
    ).astype(jnp.int32)


def _limbs(x, n: int):
    """Non-negative int32 -> n base-2^11 limbs."""
    return [(x >> (_LB * k)) & _LMASK for k in range(n)]


def _sum_limbs(hi, lo):
    """Canonical 4 limbs of the coordinate sum 64*hi + lo
    (hi < 2^27, lo < 2^28, both non-negative)."""
    h = _limbs(hi, 3)
    cols = [lo + (h[0] << 6), h[1] << 6, h[2] << 6, jnp.zeros_like(hi)]
    out, carry = [], jnp.zeros_like(hi)
    for c in cols:
        c = c + carry
        out.append(c & _LMASK)
        carry = c >> _LB
    return out


def _prod_cols(a, b):
    """Column form (len(a)+len(b)-1 columns) of the product of two
    limb-decomposed non-negatives; each column < 2^23."""
    cols = [jnp.zeros(jnp.broadcast_shapes(a[0].shape, b[0].shape), jnp.int32)
            for _ in range(len(a) + len(b) - 1)]
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            cols[i + j] = cols[i + j] + ai * bj
    return cols


def _pad_cols(a, b):
    n = max(len(a), len(b))
    z = jnp.zeros(
        jnp.broadcast_shapes(a[0].shape, b[0].shape), a[0].dtype
    )
    return (
        list(a) + [z] * (n - len(a)),
        list(b) + [z] * (n - len(b)),
    )


def _sub_cols(a, b):
    a, b = _pad_cols(a, b)
    return [x - y for x, y in zip(a, b)]


def _add_cols(a, b):
    a, b = _pad_cols(a, b)
    return [x + y for x, y in zip(a, b)]


def _flat_roots(mask):
    """Per-pixel min-flat-index component root (8-connected), h*w for
    background; shape (h*w,)."""
    h, w = mask.shape
    lab = label_pallas(mask, connectivity=2).reshape(-1)
    return jnp.where(lab < 0, h * w, lab)


def _num_roots(flat, hw):
    idx = jnp.arange(hw, dtype=jnp.int32)
    return jnp.sum(jnp.logical_and(flat == idx, flat < hw), dtype=jnp.int32)


def count_roots_tpu(mask) -> jnp.ndarray:
    """#8-connected components of a binary mask (== skimage label count,
    reference src/image_tools.py:114-119 first element)."""
    h, w = mask.shape
    return _num_roots(_flat_roots(mask.astype(bool)), h * w)


def _shift_edge(x, dy: int, dx: int):
    """Shift by one with edge replication (scipy 'reflect' for the radius-1
    diamond footprint); |dy|, |dx| <= 1, axis-aligned only."""
    out = jnp.roll(x, (dy, dx), (0, 1))
    if dy == 1:
        out = out.at[0, :].set(x[0, :])
    elif dy == -1:
        out = out.at[-1, :].set(x[-1, :])
    if dx == 1:
        out = out.at[:, 0].set(x[:, 0])
    elif dx == -1:
        out = out.at[:, -1].set(x[:, -1])
    return out


def _gray_opening_d1(img):
    """Grey opening with diamond(1) (twin of ops/morphology.opening via
    scipy grey_erosion/grey_dilation, default reflect border)."""
    e = img
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        e = jnp.minimum(e, _shift_edge(img, dy, dx))
    d = e
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        d = jnp.maximum(d, _shift_edge(e, dy, dx))
    return d


def _fill_holes_class(img, class_id: int):
    """img[binary_fill_holes(img == class_id)] = class_id (reference
    src/image_tools.py:36-39,61; scipy default 4-connected background)."""
    filled = binary_fill_holes_tpu(img == class_id)
    return jnp.where(filled, class_id, img)


MAX_COMP = 4096  # per-class component budget for the size-threshold stage


def _use_mc() -> bool:
    """Multiclass-fixpoint toggle (ECSEG_MC_LABEL=0 disables): one Pallas
    fixpoint labels/floods ALL classes at once (cc_pallas.label_multiclass_
    pallas) instead of one binary fixpoint per class -- bit-identical
    per-class components, fewer kernel launches and fixpoint iterations.
    Read at TRACE time: flipping the env var after meta_inference_tpu has
    compiled in a process has no effect (clear the jit cache to re-trace).
    """
    import os

    return os.environ.get("ECSEG_MC_LABEL", "1").strip().lower() not in (
        "0",
        "false",
        "no",
        "off",
    )




def _flagged_components(mask, roots, flags, hw):
    """Boolean map of the pixels whose component root is flagged: scatter
    the <= max_n flags onto the root PIXELS (tiny scatter), then flood
    through the class mask -- the flood reaches exactly the flagged
    components.  ~5x cheaper than the 4096-column root-flag matvec at the
    size_thresh budgets (scripts/profile_meta_post.py); the matvec form
    (:func:`_per_pixel_root_flag`) stays in use where the root budget is
    small (metaphase removal, 512)."""
    from .cc_pallas import flood_from_seeds_pallas

    seeds = (
        jnp.zeros(hw + 1, jnp.int32)
        .at[jnp.where(flags, roots, hw)]
        .set(1)[:hw]
        .reshape(mask.shape)
    )
    return flood_from_seeds_pallas(mask, seeds != 0, connectivity=2)


def _size_thresh(img, hw):
    """Mean-size thresholds (reference src/image_tools.py:41-59): nuclei
    smaller than the mean chromosome -> background, chromosomes smaller
    than the mean ecDNA -> ecDNA, then the STALE pre-conversion ecDNA list
    below EC_SIZE_THRESHOLD -> background.  Returns (img, ok); ok False on
    per-class component-budget overflow (host oracle takes over).

    ONE sort chain serves all three classes: the per-class flat roots are
    offset into disjoint ranges (nuc +0, chrom +hw, ec +2hw -- classes are
    pixel-disjoint, so each pixel carries at most one), compacted together
    with budget 3*MAX_COMP, and each root's class recovered as
    ``root // hw``.  Budget-gate equivalence with the per-class form: when
    the total distinct count fits 3*MAX_COMP every root is present and the
    per-class counts are exact; when it does not, some class necessarily
    exceeds MAX_COMP (pigeonhole over equal budgets), so ``ok`` is False
    either way.  The three applications commute (their source pixel sets
    are disjoint), matching the reference's sequential order."""
    nuc = img == 1
    chrom = img == 2
    ec = img == 3

    if _use_mc():
        # ONE multiclass fixpoint labels all three classes; the per-class
        # offsets reproduce exactly the combined root space below
        from .cc_pallas import label_multiclass_pallas

        mlab = label_multiclass_pallas(img).reshape(-1)
        clsf = img.reshape(-1)
        comb = jnp.where(mlab < 0, 3 * hw, mlab + (clsf - 1) * hw)
    else:
        n_flat = _flat_roots(nuc)
        c_flat = _flat_roots(chrom)
        e_flat = _flat_roots(ec)
        # disjoint classes: at most one of the three is a foreground root id
        comb = jnp.where(
            n_flat < hw,
            n_flat,
            jnp.where(
                c_flat < hw,
                c_flat + hw,
                jnp.where(e_flat < hw, e_flat + 2 * hw, 3 * hw),
            ),
        )
    roots, counts, num = _compact_roots_sizes(comb, 3 * hw, 3 * MAX_COMP)
    valid = roots < 3 * hw
    rcls = jnp.where(valid, roots // hw, 3)  # 0=nuc, 1=chrom, 2=ec
    root_px = roots % hw

    num_n = jnp.sum(rcls == 0, dtype=jnp.int32)
    num_c = jnp.sum(rcls == 1, dtype=jnp.int32)
    num_e = jnp.sum(rcls == 2, dtype=jnp.int32)

    def mean(mask, n):
        total = jnp.sum(mask, dtype=jnp.int32).astype(jnp.float32)
        return total / n.astype(jnp.float32)  # 0/0 -> NaN (np.mean([]))

    avg_chrom = mean(chrom, num_c)
    avg_ec = mean(ec, num_e)
    cf = counts.astype(jnp.float32)
    small_nuc = (rcls == 0) & (cf < avg_chrom)  # NaN -> False
    conv_chrom = (rcls == 1) & (cf < avg_ec)
    # stale list quirk: ec sizes are from the PRE-conversion components,
    # which is exactly what this single labeling of the input provides
    small_ec = (rcls == 2) & (counts < EC_SIZE_THRESHOLD)

    if _use_mc():
        # ONE multiclass flood marks every flagged component (class
        # equality gates propagation, so per-class floods cannot leak);
        # the three applications read the ORIGINAL class masks and are
        # pixel-disjoint, exactly as the sequential form
        from .cc_pallas import flood_multiclass_pallas

        flags_any = small_nuc | conv_chrom | small_ec
        seeds = (
            jnp.zeros(hw + 1, jnp.int32)
            .at[jnp.where(flags_any, root_px, hw)]
            .set(1)[:hw]
            .reshape(img.shape)
        )
        flooded = flood_multiclass_pallas(img, seeds)
        img = jnp.where(
            flooded & nuc,
            0,
            jnp.where(flooded & chrom, 3, jnp.where(flooded & ec, 0, img)),
        )
    else:
        img = jnp.where(_flagged_components(nuc, root_px, small_nuc, hw), 0, img)
        img = jnp.where(
            _flagged_components(chrom, root_px, conv_chrom, hw), 3, img
        )
        img = jnp.where(_flagged_components(ec, root_px, small_ec, hw), 0, img)

    ok = (
        (num <= 3 * MAX_COMP)
        & (num_n <= MAX_COMP)
        & (num_c <= MAX_COMP)
        & (num_e <= MAX_COMP)
    )
    return img, ok


def _compact_roots(flat, hw, max_n: int):
    """Ascending distinct foreground root ids, padded with ``hw`` -- one
    sort + scans + a tiny searchsorted.  Replaces ``jnp.nonzero`` on the
    per-pixel is-root mask, which costs ~4x more on this TPU."""
    roots, _, _ = _compact_roots_sizes(flat, hw, max_n)
    return roots


def _compact_roots_sizes(flat, hw, max_n: int, payloads=()):
    """(roots, counts[, payload sums...]) from ONE sort: the sorted flat
    array groups each component into a contiguous run, so per-root pixel
    COUNTS are run-boundary differences and per-root payload SUMS are
    differences of inclusive int32 cumsums over the co-sorted payloads
    (``lax.sort`` with ``flat`` as the key) -- no one-hot matmul pass and
    no scatter.  Exactness: payload values are small non-negatives (hi/lo
    split coordinates < 2^6..2^5), so 1M-element int32 cumsums stay well
    below 2^31 and the run differences are exact.  Padded entries (rank >=
    max_n or the background run) report root ``hw`` and zero counts/sums."""
    if payloads:
        sorted_ops = lax.sort((flat,) + tuple(payloads), num_keys=1)
        v = sorted_ops[0]
    else:
        v = jnp.sort(flat)
    first = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (v[1:] != v[:-1]).astype(jnp.int32)]
    )
    ranks = jnp.cumsum(first) - 1  # nondecreasing rank per sorted position
    # true component count (any magnitude, for the budget-overflow gates):
    # distinct values minus the background run, which sorts last
    num = ranks[-1] + 1 - (v[-1] >= hw).astype(jnp.int32)
    # first sorted position of each rank; one extra entry so run k ends at
    # idx[k+1] (missing ranks and the end of the array both map to n)
    idx = jnp.searchsorted(ranks, jnp.arange(max_n + 1, dtype=jnp.int32))
    n = flat.shape[0]
    roots = v[jnp.clip(idx[:max_n], 0, n - 1)]
    # out-of-range ranks (idx == n) and the background-sentinel run both
    # map to the hw pad value
    roots = jnp.where(
        jnp.logical_or(idx[:max_n] >= n, roots >= hw), hw, roots
    )
    valid = roots < hw
    counts = jnp.where(valid, idx[1:] - idx[:max_n], 0)
    out = [roots, counts, num]
    lo = jnp.clip(idx[:max_n] - 1, 0, n - 1)
    hi = jnp.clip(idx[1:] - 1, 0, n - 1)
    for p in sorted_ops[1:] if payloads else ():
        csum = jnp.cumsum(p.astype(jnp.int32))
        s = csum[hi] - jnp.where(idx[:max_n] > 0, csum[lo], 0)
        out.append(jnp.where(valid, s, 0))
    return tuple(out)


_EQ_BLOCK = 8192


def _per_pixel_root_flag(flat, roots, flags):
    """Per-pixel boolean: flags[k] of the pixel's component (False on
    background / non-compacted roots), via the same blocked one-hot
    matmuls.  Callers must pass flags=False on invalid (padded) roots."""
    n = flat.shape[0]
    pad = (-n) % _EQ_BLOCK
    if pad:
        flat = jnp.concatenate([flat, jnp.full(pad, 2**30, jnp.int32)])
    nblk = flat.shape[0] // _EQ_BLOCK
    fblocks = flat.reshape(nblk, _EQ_BLOCK)
    fl = flags.astype(jnp.float32)

    def step(c, fb):
        eq = (fb[:, None] == roots[None, :]).astype(jnp.float32)
        return c, (eq @ fl) > 0.5

    _, out = lax.scan(step, 0, fblocks)
    return out.reshape(-1)[:n]


def _needs_hilo_split(hw: int, h: int, w: int) -> bool:
    """True when a whole-map int32 cumsum of raw coordinates could
    overflow, forcing the hi/lo accumulation split (geometries beyond
    ~1290^2)."""
    return hw * max(h - 1, w - 1) >= 2**31


def _component_sums(mask, hw, max_n: int):
    """Compacted per-component exact coordinate sums for up to ``max_n``
    8-connected components: returns dict with 4-limb Sy/Sx, 2-limb N, a
    validity mask, the true component count, the per-pixel flat roots, and
    the compacted root indices.

    Coordinate sums come from co-sorted int32 cumsum run differences
    (:func:`_compact_roots_sizes` -- one ``lax.sort`` keyed by the flat
    roots carries the payloads), then convert to exact base-2^11 limbs.
    When the grand total ``hw * max_coord`` fits int32 (any 1024^2-class
    map) the coordinates ride the sort directly (3-operand sort) and the
    downstream hi/lo pair is just the exact sum split afterwards -- only
    larger geometries need the overflow-free accumulation split
    (coord = 64*(coord>>6) + (coord&63), 5-operand sort).  All consumers
    read the pair solely as 64*hi + lo, so any split of the exact sum is
    equivalent.
    """
    h, w = mask.shape
    flat = _flat_roots(mask)
    rows = jnp.arange(hw, dtype=jnp.int32) // w
    cols = jnp.arange(hw, dtype=jnp.int32) % w

    if not _needs_hilo_split(hw, h, w):
        roots, n, num, sy, sx = _compact_roots_sizes(
            flat, hw, max_n, payloads=(rows, cols)
        )
        sy_hi, sy_lo = sy >> 6, sy & 63
        sx_hi, sx_lo = sx >> 6, sx & 63
    else:
        roots, n, num, sy_hi, sy_lo, sx_hi, sx_lo = _compact_roots_sizes(
            flat, hw, max_n,
            payloads=(rows >> 6, rows & 63, cols >> 6, cols & 63),
        )
    valid = roots < hw

    return dict(
        sy=_sum_limbs(sy_hi, sy_lo),
        sx=_sum_limbs(sx_hi, sx_lo),
        sy_hilo=(sy_hi, sy_lo),
        sx_hilo=(sx_hi, sx_lo),
        n=_limbs(n, 2),
        nraw=n,
        valid=valid,
        num=num,
        flat=flat,
        roots=roots,
    )


def _pack_sums(roots, n, sy_hi, sy_lo, sx_hi, sx_lo, valid, num, flat):
    z = lambda x: jnp.where(valid, x, 0)
    n, sy_hi, sy_lo, sx_hi, sx_lo = map(z, (n, sy_hi, sy_lo, sx_hi, sx_lo))
    return dict(
        sy=_sum_limbs(sy_hi, sy_lo),
        sx=_sum_limbs(sx_hi, sx_lo),
        sy_hilo=(sy_hi, sy_lo),
        sx_hilo=(sx_hi, sx_lo),
        n=_limbs(n, 2),
        nraw=n,
        valid=valid,
        num=num,
        flat=flat,
        roots=roots,
    )


def _component_sums_pair(img, hw):
    """Per-component exact coordinate sums for the chromosome (img == 2)
    and nucleus (img == 1) classes through ONE shared sort: the two flat
    root spaces are offset into disjoint ranges (chrom +0, nuc +hw) and
    compacted together with budget MAX_CHROM + MAX_NUC.  Chrom roots sort
    first (< hw), so the chrom slice is the leading MAX_CHROM entries and
    the nuc slice starts at the compacted chrom count (an XLA
    dynamic_slice); per-class validity falls out of the value ranges.

    Budget-gate equivalence (``ok_budget``): when the total distinct count
    fits MAX_CHROM + MAX_NUC every root is captured and the per-class
    counts are exact; when it does not, pigeonhole over the two budgets
    means chrom > MAX_CHROM or nuc > MAX_NUC, so the gate is False either
    way -- identical to the per-class form.

    Returns (chrom dict, nuc dict, ok_budget)."""
    h, w = img.shape
    if _use_mc():
        from .cc_pallas import label_multiclass_pallas

        cls12 = jnp.where((img == 1) | (img == 2), img, 0)
        mlab = label_multiclass_pallas(cls12).reshape(-1)
        clsf = cls12.reshape(-1)
        c_flat = jnp.where((clsf == 2) & (mlab >= 0), mlab, hw)
        n_flat = jnp.where((clsf == 1) & (mlab >= 0), mlab, hw)
    else:
        c_flat = _flat_roots(img == 2)
        n_flat = _flat_roots(img == 1)
    comb = jnp.where(
        c_flat < hw,
        c_flat,
        jnp.where(n_flat < hw, n_flat + hw, 2 * hw),
    )
    rows = jnp.arange(hw, dtype=jnp.int32) // w
    cols = jnp.arange(hw, dtype=jnp.int32) % w
    max_n = MAX_CHROM + MAX_NUC

    if not _needs_hilo_split(hw, h, w):
        roots, cnt, num, sy, sx = _compact_roots_sizes(
            comb, 2 * hw, max_n, payloads=(rows, cols)
        )
        vecs = (cnt, sy >> 6, sy & 63, sx >> 6, sx & 63)
    else:
        roots, cnt, num, sy_hi, sy_lo, sx_hi, sx_lo = _compact_roots_sizes(
            comb, 2 * hw, max_n,
            payloads=(rows >> 6, rows & 63, cols >> 6, cols & 63),
        )
        vecs = (cnt, sy_hi, sy_lo, sx_hi, sx_lo)

    num_chrom = jnp.sum(roots < hw, dtype=jnp.int32)
    num_nuc = jnp.sum(
        jnp.logical_and(roots >= hw, roots < 2 * hw), dtype=jnp.int32
    )
    ok_budget = (
        (num <= max_n) & (num_chrom <= MAX_CHROM) & (num_nuc <= MAX_NUC)
    )

    def split(vec, pad_val):
        vecp = jnp.concatenate(
            [vec, jnp.full(MAX_NUC, pad_val, vec.dtype)]
        )
        return vec[:MAX_CHROM], lax.dynamic_slice(
            vecp, (num_chrom,), (MAX_NUC,)
        )

    c_roots, n_roots_off = split(roots, 2 * hw)
    c_valid = c_roots < hw
    n_valid = jnp.logical_and(n_roots_off >= hw, n_roots_off < 2 * hw)
    c_roots = jnp.where(c_valid, c_roots, hw)
    n_roots = jnp.where(n_valid, n_roots_off - hw, hw)

    c_vecs, n_vecs = zip(*(split(v, 0) for v in vecs))
    c = _pack_sums(c_roots, *c_vecs, c_valid, num_chrom, c_flat)
    n = _pack_sums(n_roots, *n_vecs, n_valid, num_nuc, n_flat)
    return c, n, ok_budget


def _metaphase_removal(img, hw):
    """Remove 'nuclei' that sit inside a metaphase chromosome spread
    (reference src/image_tools.py:71-81): a nucleus goes to background when
    more than MIN_CHROM_COUNT chromosome centroids lie in EACH of the four
    BAND_V-px bands around its centroid (both reference clauses reduce to
    the conjunction of all four).  All band tests are exact integer
    comparisons (see module docstring).  Returns (img, ok); ok is False on
    component-budget overflow OR on a centroid near-tie: the host oracle
    compares float64-ROUNDED centroids, so when the exact rational gap
    |Sc/Nc - Sn/Nn (+-v)| falls within the oracle's rounding error the two
    programs could disagree -- such pairs clear ``ok`` and the caller
    recomputes on the host (the authority for parity).  The error bound:
    the oracle's values are < 4096 and pass through at most two divisions
    plus one addition (~3 ulps, < 2^-38 absolute), so a comparison can only
    flip when the exact numerator satisfies |x| <= 2^-38 * Nn * Nc --
    tested exactly as 2^38*|x| <= Nn*Nc in limb arithmetic.  Exact zeros
    are consistent for the direct centroid compare (both sides round the
    SAME rational), and for the +-v band edges whenever both centroids are
    DYADIC rationals -- odd_part(N) divides S, e.g. any integer or .5
    centroid -- because then every host float op (two divisions, one +70)
    is exact; only the remaining zero hits flag."""
    c, n, ok_budget = _component_sums_pair(img, hw)
    pair_ok = jnp.logical_and(c["valid"][None, :], n["valid"][:, None])
    v = int(BAND_V)

    def bc(x):  # broadcast a chrom limb list over the pair grid
        return [a[None, :] for a in x]

    def bn(x):  # broadcast a nucleus limb list
        return [a[:, None] for a in x]

    p_cols = _prod_cols(bn(n["n"]), bc(c["n"]))  # Nn * Nc, column form
    # v * Nn * Nc columns, shared by both axes
    q = [vv * v for vv in p_cols]

    def _dyadic(hilo, nraw):
        """Per-component: is S/N (S = 64*hi + lo) a dyadic rational, i.e.
        exactly representable in float64?  True iff odd_part(N) | S."""
        hi, lo = hilo
        m = jnp.where(nraw > 0, nraw // jnp.maximum(nraw & -nraw, 1), 1)
        r = ((hi % m) * 64 + lo % m) % m
        return jnp.logical_and(nraw > 0, r == 0)

    safe_zero_x = jnp.logical_and(
        _dyadic(n["sx_hilo"], n["nraw"])[:, None],
        _dyadic(c["sx_hilo"], c["nraw"])[None, :],
    )
    safe_zero_y = jnp.logical_and(
        _dyadic(n["sy_hilo"], n["nraw"])[:, None],
        _dyadic(c["sy_hilo"], c["nraw"])[None, :],
    )

    def _canon_limbs_nonneg(cols, n_out):
        """Carry-propagate mixed-sign columns of a NON-NEGATIVE total into
        canonical limbs (floor shifts keep intermediate carries exact)."""
        out, carry = [], jnp.zeros_like(cols[0])
        for cc in cols:
            cc = cc + carry
            out.append(cc & _LMASK)
            carry = cc >> _LB
        while len(out) < n_out:
            out.append(carry & _LMASK)
            carry = carry >> _LB
        return out

    def _risky(x_cols, sign, safe_zero):
        absx = _canon_limbs_nonneg([sign * cc for cc in x_cols], 6)
        # 2^38 * |x|: 3 zero limbs (2^33) then * 32
        shifted = [jnp.zeros_like(sign)] * 3 + [l * 32 for l in absx]
        small = _canon_sign(_sub_cols(shifted, p_cols)) <= 0
        r = jnp.logical_and(small, sign != 0)
        if safe_zero is not None:  # edge terms: exact zeros flag unless
            r = jnp.logical_or(    # both centroids are dyadic
                r, jnp.logical_and(sign == 0, jnp.logical_not(safe_zero))
            )
        return r

    def band_counts(s_c, s_n, safe_zero):
        # d0 = sign(Sc*Nn - Sn*Nc) = sign(centroid_c - centroid_n)
        p_cn = _prod_cols(bc(s_c), bn(n["n"]))
        p_nc = _prod_cols(bn(s_n), bc(c["n"]))
        d = _sub_cols(p_cn, p_nc)
        d0 = _canon_sign(d)
        dm_cols = _sub_cols(d, q)
        dp_cols = _add_cols(d, q)
        dm = _canon_sign(dm_cols)  # sign(delta - v)
        dp = _canon_sign(dp_cols)  # sign(delta + v)
        pos = jnp.sum(
            jnp.logical_and(pair_ok, jnp.logical_and(d0 > 0, dm < 0)),
            axis=1, dtype=jnp.int32,
        )
        neg = jnp.sum(
            jnp.logical_and(pair_ok, jnp.logical_and(d0 < 0, dp > 0)),
            axis=1, dtype=jnp.int32,
        )
        near = jnp.any(
            jnp.logical_and(
                pair_ok,
                _risky(d, d0, None)
                | _risky(dm_cols, dm, safe_zero)
                | _risky(dp_cols, dp, safe_zero),
            )
        )
        return pos, neg, near

    # c_x in (n_x, n_x+v) / (n_x-v, n_x); same for y
    left, right, near_x = band_counts(c["sx"], n["sx"], safe_zero_x)
    top, bottom, near_y = band_counts(c["sy"], n["sy"], safe_zero_y)

    remove = (
        (left > MIN_CHROM_COUNT)
        & (right > MIN_CHROM_COUNT)
        & (bottom > MIN_CHROM_COUNT)
        & (top > MIN_CHROM_COUNT)
        & n["valid"]
    )
    ok = jnp.logical_and(
        ok_budget, jnp.logical_not(jnp.logical_or(near_x, near_y))
    )

    # per-pixel removal map via the blocked root-flag matvec (MAX_NUC=512
    # columns, ~0.5 ms) -- the hw-LUT scatter + 1M gather this replaced
    # measures ~7 ms on this chip (scripts/profile_meta_post.py)
    img = jnp.where(
        _per_pixel_root_flag(n["flat"], n["roots"], remove).reshape(img.shape),
        0,
        img,
    )
    return img, ok


def _merge_comp(img, class_id: int, hw):
    """Components (8-connected, over the image with the sibling class
    hidden) touching ``class_id`` become ``class_id``, EXCEPT scipy's last
    label == the component with the largest root index (the reference's
    range(1, num_features) off-by-one, src/image_tools.py:18-33); then the
    grey-opening smoothing write and the sibling restore."""
    from .cc_pallas import flood_from_seeds_pallas

    mask_id = 1 if class_id == 2 else 2
    temp = img == mask_id
    img = jnp.where(temp, 0, img)

    fg = img != 0
    # "component contains a class_id pixel" as a seed flood (no scatter);
    # the labeling is still needed for the skipped-last-label quirk.
    # ECSEG_MC_MERGE=1 opts into the fused label+flood kernel
    # (cc_pallas.label_and_flood_pallas) -- one fixpoint for both -- but it
    # needs 125 MB scoped VMEM at the 1024^2 class (measured compile OOM at
    # 116 MB), so the two-kernel form stays the default
    import os as _os

    if _os.environ.get("ECSEG_MC_MERGE", "0").strip().lower() in ("1", "true"):
        from .cc_pallas import label_and_flood_pallas

        lab2d, touched = label_and_flood_pallas(
            fg, img == class_id, connectivity=2
        )
        flat = jnp.where(lab2d < 0, hw, lab2d).reshape(-1)
    else:
        touched = flood_from_seeds_pallas(fg, img == class_id, connectivity=2)
        flat = _flat_roots(fg)
    idx = jnp.arange(hw, dtype=jnp.int32)
    is_root = jnp.logical_and(flat == idx, flat < hw)
    max_root = jnp.max(jnp.where(is_root, idx, -1))

    merged = jnp.logical_and(
        touched, (flat != max_root).reshape(img.shape)
    )
    img = jnp.where(merged, class_id, img)

    img = jnp.where(_gray_opening_d1(img) == class_id, class_id, img)
    img = jnp.where(temp, mask_id, img)
    return img


_D1 = diamond(1)


@jax.jit
def meta_inference_tpu(img: jnp.ndarray):
    """Device twin of ops/meta_post.meta_inference
    (reference src/image_tools.py:15-84).

    ``img``: (H, W) integer 4-class label map.  Returns ``(out, ok)``:
    ``out`` is the post-processed int32 label map and ``ok`` a bool scalar;
    when ``ok`` is False (budget overflow / centroid near-tie, see module
    docstring) the caller must recompute on the host oracle.
    """
    img = img.astype(jnp.int32)
    h, w = img.shape
    hw = h * w

    img = _fill_holes_class(img, 1)
    img = _fill_holes_class(img, 2)
    img, ok_sizes = _size_thresh(img, hw)

    ec = img == 3
    ring = jnp.logical_xor(
        binary_dilation_tpu(ec, _D1), binary_erosion_tpu(ec, _D1)
    )
    img = jnp.where(ring, 0, img)

    img, ok = _metaphase_removal(img, hw)
    ok = jnp.logical_and(ok, ok_sizes)

    img = _merge_comp(img, 1, hw)
    img = _merge_comp(img, 2, hw)

    img = jnp.where(binary_dilation_tpu(img == 3, _D1), 3, img)
    return img, ok
