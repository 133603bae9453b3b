"""Per-layer timing of the flagship U-Net's convolutions on the real chip.

Each layer runs alone inside one jitted ``lax.scan`` (REPS iterations per
dispatched call), so the ~35 ms relay dispatch and any host load amortize
away.  Hoisting is defeated by indexing one of two kernels per iteration
(the conv input stays device-resident and loop-invariant, which matches the
real forward's HBM traffic; a varying kernel blocks constant folding
without adding measurable work).

Prints per-layer ms (scaled to the bench's 800-patch chunk), the executed
TFLOP/s, and the fraction of the 197 TFLOP/s bf16 peak -- this is the map
of where the flagship forward's non-MXU time goes (bench forward measures
~80% of peak overall; the question is which layers own the slack).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from ecseg_tpu.models.layers import conv2d, conv2d_transpose, max_pool

N = 100  # patches per measured batch (bench chunk = 800; scale x8)
PEAK = 197e12

# (name, kind, h_in, cin, cout) for the flagship half-width net.
LAYERS = [
    ("enc1_1", "conv", 256, 1, 32),
    ("enc1_2", "conv", 256, 32, 32),
    ("pool1", "pool", 256, 32, 32),
    ("enc2_1", "conv", 128, 32, 64),
    ("enc2_2", "conv", 128, 64, 64),
    ("enc3_1", "conv", 64, 64, 128),
    ("enc3_2", "conv", 64, 128, 128),
    ("enc4_1", "conv", 32, 128, 256),
    ("enc4_2", "conv", 32, 256, 256),
    ("bott_1", "conv", 16, 256, 512),
    ("bott_2", "conv", 16, 512, 512),
    ("up4", "convt", 16, 512, 256),
    ("dec4_1", "conv", 32, 512, 256),
    ("dec4_2", "conv", 32, 256, 256),
    ("up3", "convt", 32, 256, 128),
    ("dec3_1", "conv", 64, 256, 128),
    ("dec3_2", "conv", 64, 128, 128),
    ("up2", "convt", 64, 128, 64),
    ("dec2_1", "conv", 128, 128, 64),
    ("dec2_2", "conv", 128, 64, 64),
    ("up1", "convt", 128, 64, 32),
    ("dec1_1", "conv", 256, 64, 32),
    ("dec1_2", "conv", 256, 32, 32),
    ("head", "conv1", 256, 32, 4),
]


def flops(kind, h, cin, cout):
    if kind == "pool":
        return 0
    s = h * h
    if kind == "conv":
        return 2 * 9 * s * cin * cout * N
    if kind == "conv1":
        return 2 * s * cin * cout * N
    if kind == "convt":  # output-res (executed lhs-dilated) accounting
        return 2 * 9 * (2 * h) * (2 * h) * cin * cout * N


def main():
    from ecseg_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    rng = np.random.default_rng(0)
    total_ms = 0.0
    rows = []
    for name, kind, h, cin, cout in LAYERS:
        x = jnp.asarray(
            rng.standard_normal((N, h, h, cin), np.float32)
        ).astype(jnp.bfloat16)
        kh = 1 if kind == "conv1" else 3
        ks = jnp.asarray(
            rng.standard_normal((2, kh, kh, cin, cout), np.float32)
        ).astype(jnp.bfloat16)

        fl = flops(kind, h, cin, cout)
        # aim for ~1.5 s of device work per timed call
        est_s = max(fl / PEAK, N * h * h * cin * 2 / 5e11)
        reps = int(min(600, max(20, 1.5 / est_s)))

        if kind == "pool":
            op = lambda x, k: max_pool(x)
        elif kind == "convt":
            op = conv2d_transpose
        else:
            op = conv2d

        @jax.jit
        def loop(x, ks):
            def step(acc, i):
                y = op(x, ks[i % 2])
                return acc + jnp.sum(y, dtype=jnp.float32), ()

            acc, _ = lax.scan(step, jnp.float32(0), jnp.arange(reps))
            return acc

        np.asarray(loop(x, ks))  # compile + sync
        t0 = time.perf_counter()
        np.asarray(loop(x, ks))
        dt = (time.perf_counter() - t0) / reps
        chunk_ms = dt * 1e3 * 8  # scale N=100 -> 800-patch chunk
        total_ms += chunk_ms
        tf = fl / dt / 1e12
        rows.append((name, kind, chunk_ms, tf))
        print(
            f"{name:8s} {kind:5s} {h:3d}² {cin:3d}->{cout:3d} "
            f"{chunk_ms:7.2f} ms/chunk  {tf:6.1f} TFLOP/s "
            f"({100 * tf / (PEAK / 1e12):5.1f}% peak)  reps={reps}",
            flush=True,
        )
    print(f"\nsum over layers: {total_ms:.1f} ms/chunk (800 patches, 32 tiles)")
    print("bench forward-only reference: ~166 ms/chunk at 168 t/s overall")


if __name__ == "__main__":
    main()
