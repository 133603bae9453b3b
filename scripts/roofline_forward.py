#!/usr/bin/env python3
"""Analytic roofline for the metaseg U-Net forward on one TPU chip
(VERDICT r4 item 6: why is the half-width flagship at ~168 t/s / 0.70 MFU
while xl reaches 0.96?).

Per layer: FLOPs = 2 * K * K * S * Cin * Cout; HBM traffic = activations
in + out (bf16) + weights (negligible) -- the XLA-fused lower bound, since
each conv must read its input once and write its output once.  Layer time
>= max(FLOPs / peak_flops, bytes / peak_bw).  Summing the per-layer maxima
gives the per-patch floor; 25 patches per 1024^2 tile gives the tiles/s
ceiling.  Compare with scripts/profile_layers.py (measured per-layer) and
the bench flagship line.

Usage: python scripts/roofline_forward.py  [--arch default|xl]
"""

import argparse
import sys

sys.path.insert(0, ".")

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 819e9  # v5e HBM


def layers(widths, bottleneck, num_classes=4, patch=256, in_ch=1):
    """Yield (name, flops, bytes) for every layer of the forward."""
    s = patch * patch
    c = in_ch
    out = []

    def conv(name, s, cin, cout, k=3, bytes_scale=2):
        f = 2 * k * k * s * cin * cout
        b = bytes_scale * s * (cin + cout)  # bf16 activations in + out
        out.append((name, f, b))

    for i, w in enumerate(widths, 1):
        conv(f"enc{i}_1", s, c, w)
        conv(f"enc{i}_2", s, w, w)
        out.append((f"pool{i}", 0, 2 * (s + s // 4) * w))
        c = w
        s //= 4
    conv("bott_1", s, c, bottleneck)
    conv("bott_2", s, bottleneck, bottleneck)
    c = bottleneck
    for i, w in zip(range(len(widths), 0, -1), reversed(widths)):
        s *= 4
        # transpose conv at output resolution, 4-parity strength reduction
        # (XLA executes ~9/4 MACs per output px; README layer profile)
        out.append((f"up{i}", 2 * 9 * s * c * w // 4, 2 * (s // 4 * c + s * w)))
        conv(f"dec{i}_1", s, 2 * w, w)
        conv(f"dec{i}_2", s, w, w)
        c = w
    conv("head", s, c, num_classes, k=1)
    # softmax f32 + exact-quantize + argmax epilogue reads/writes
    out.append(("epilogue", 0, s * num_classes * (4 + 4) + s * 4))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="default", choices=["default", "xl"])
    args = ap.parse_args()
    from ecseg_tpu.models import metaseg_unet as mu

    widths, bott = (
        (mu.ENC_WIDTHS_XL, mu.BOTTLENECK_XL)
        if args.arch == "xl"
        else (mu.ENC_WIDTHS, mu.BOTTLENECK)
    )
    rows = layers(widths, bott)
    tot_f = tot_t = tot_compute = tot_bw = 0.0
    print(f"{'layer':10s} {'GFLOP':>8s} {'MB':>8s} {'t_flop_us':>10s} "
          f"{'t_bw_us':>8s} {'bound':>6s}")
    for name, f, b in rows:
        tf_, tb = f / PEAK_FLOPS, b / PEAK_BW
        t = max(tf_, tb)
        tot_f += f
        tot_t += t
        tot_compute += tf_
        tot_bw += tb
        print(
            f"{name:10s} {f/1e9:8.2f} {b/1e6:8.2f} {tf_*1e6:10.1f} "
            f"{tb*1e6:8.1f} {'BW' if tb > tf_ else 'MXU':>6s}"
        )
    per_tile = tot_t * 25
    print(
        f"\ntotal {tot_f/1e9:.1f} GFLOP/patch; pure-compute floor "
        f"{tot_compute*25e3:.2f} ms/tile; roofline floor "
        f"{per_tile*1e3:.2f} ms/tile -> ceiling {1/per_tile:.1f} tiles/s/chip"
    )
    print(
        f"effective MFU at the roofline ceiling: "
        f"{tot_compute/tot_t:.3f} (bandwidth share "
        f"{sum(max(0,(b/PEAK_BW)-(f/PEAK_FLOPS)) for _,f,b in rows)/tot_t:.1%})"
    )


if __name__ == "__main__":
    main()
