"""Fused device overlay statistics vs the host twins."""

import numpy as np

import jax
import jax.numpy as jnp

from ecseg_tpu.ops.cc import count_cc
from ecseg_tpu.ops.meta_post import count_HSR, count_colocalization
from ecseg_tpu.ops.overlay_tpu import (
    count_HSR_tpu,
    count_colocalization_tpu,
    overlay_stats_tpu,
)


def _masks(rng, shape=(96, 128)):
    red = rng.random(shape) < 0.15
    green = rng.random(shape) < 0.15
    seg = (rng.random(shape) * 4).astype(int)
    # carve blobs so classes have real components
    for lab in (1, 2, 3):
        for _ in range(12):
            y, x = rng.integers(0, shape[0] - 8), rng.integers(0, shape[1] - 8)
            r = int(rng.integers(2, 8))
            seg[y : y + r, x : x + r] = lab
    return red, green, seg == 1, seg == 2, seg == 3


def _host_stats(red, green, nuclei, chrom, ec, t=20):
    fish = green * ~nuclei
    fish2 = red * ~nuclei
    return {
        "num_ecDNA": count_cc(ec),
        "num_FISH": count_cc(fish * ~chrom),
        "num_ecDNA_FISH": count_colocalization(ec, fish),
        "num_HSR": count_HSR(chrom, fish, t),
        "num_FISH2": count_cc(fish2 * ~chrom),
        "num_FISH_FISH2": count_colocalization(fish * ~chrom, fish2 * ~chrom),
        "num_ecDNA_FISH2": count_colocalization(ec, fish2),
        "num_ecDNA_FISH_FISH2": count_colocalization(ec, fish2 * fish),
        "num_HSR2": count_HSR(chrom, fish2, t),
    }


def test_fused_overlay_stats_match_host(rng):
    for _ in range(3):
        red, green, nuclei, chrom, ec = _masks(rng)
        want = _host_stats(red, green, nuclei, chrom, ec)
        got = jax.tree.map(
            int,
            jax.device_get(
                overlay_stats_tpu(
                    jnp.asarray(red),
                    jnp.asarray(green),
                    jnp.asarray(nuclei),
                    jnp.asarray(chrom),
                    jnp.asarray(ec),
                    20,
                )
            ),
        )
        for key in want:
            w = want[key]
            g = got[key]
            w = tuple(w) if isinstance(w, tuple) else w
            g = tuple(g) if isinstance(g, tuple) else g
            assert g == w, (key, g, w)


def test_colocalization_tpu_edge_cases(rng):
    a = np.zeros((32, 48), bool)
    b = np.zeros((32, 48), bool)
    assert int(count_colocalization_tpu(jnp.asarray(a), jnp.asarray(b))) == 0
    a[4:8, 4:8] = True
    a[20:25, 30:36] = True
    assert int(count_colocalization_tpu(jnp.asarray(a), jnp.asarray(b))) == 0
    b[5, 5] = True  # touch the first component only
    assert int(count_colocalization_tpu(jnp.asarray(a), jnp.asarray(b))) == 1
    assert count_colocalization(a, b) == 1


def test_colocalization_all_foreground_quirk(rng):
    """The host's unique(labels)[1:] drops the single component of an
    all-foreground mask (no background label 0), returning 0; the device
    twin must replicate that (r2 review finding)."""
    a = np.ones((32, 48), bool)
    b = np.zeros((32, 48), bool)
    b[10, 10] = True
    assert count_colocalization(a, b) == 0  # the host quirk, pinned
    assert int(count_colocalization_tpu(jnp.asarray(a), jnp.asarray(b))) == 0
    # and through the fused program's HSR path (same [1:] in count_HSR)
    big = np.zeros((32, 48), bool)
    big[5:15, 5:15] = True
    assert count_HSR(a, big, 20) == 0
    assert int(count_HSR_tpu(jnp.asarray(a), jnp.asarray(big), 20)) == 0


def test_hsr_tpu_size_filter(rng):
    chrom = np.zeros((40, 40), bool)
    chrom[5:20, 5:20] = True
    fish = np.zeros((40, 40), bool)
    fish[6:8, 6:8] = True  # 4 px, below threshold 20 -> filtered out
    assert int(count_HSR_tpu(jnp.asarray(chrom), jnp.asarray(fish), 20)) == 0
    fish[10:16, 10:16] = True  # 36 px blob survives
    assert int(count_HSR_tpu(jnp.asarray(chrom), jnp.asarray(fish), 20)) == 1
    assert count_HSR(chrom, fish, 20) == 1
