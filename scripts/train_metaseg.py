#!/usr/bin/env python3
"""Train / fine-tune the metaseg U-Net on a metaseg-format folder.

    python scripts/train_metaseg.py --inpath example_ecSeg \
        --steps 200 --batch 32 --lr 1e-4 [--remat] [--bf16] \
        --out models/metaseg.npz

Data: ``<inpath>/*.tif`` + ``<inpath>/labels/*.npy`` (the metaseg output
contract), random 256^2 crops with flip/rot augmentation.  The step is
pjit-compiled over the full device mesh (data-parallel batch, tensor-
parallel wide kernels); checkpoints are step-tagged and atomic; the final
weights are exported as ``metaseg.npz``, which
ecseg_tpu.pipelines.metaseg.load_model picks up automatically.
"""

import argparse
import os
import sys

# runnable straight from a checkout: scripts/ -> repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inpath", default="example_ecSeg")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--ckpt-dir", default="checkpoints/metaseg")
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--out", default="models/metaseg.npz")
    ap.add_argument("--widths", type=int, nargs="+", default=None)
    ap.add_argument("--bottleneck", type=int, default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.models.keras_import import save_npz_pytree
    from ecseg_tpu.parallel.mesh import make_mesh, pad_to_multiple
    from ecseg_tpu.runtime import checkpoint as ckpt
    from ecseg_tpu.runtime.data import crop_batches, load_training_pairs
    from ecseg_tpu.runtime.train import jit_train_step_on_mesh

    pairs = load_training_pairs(args.inpath)
    if not pairs:
        print(f"no (image, labels/) training pairs under {args.inpath}")
        return 2
    print(f"{len(pairs)} training images")

    kw = {}
    if args.widths:
        kw["widths"] = tuple(args.widths)
    if args.bottleneck:
        kw["bottleneck"] = args.bottleneck
    params = metaseg_unet.init_params(jax.random.PRNGKey(args.seed), **kw)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    optimizer = optax.adam(args.lr)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    step_fn, p_shard, b_shard, optimizer = jit_train_step_on_mesh(
        mesh, optimizer, params_example=params, dtype=dtype, remat=args.remat
    )
    params = jax.device_put(params, p_shard)
    opt_state = optimizer.init(params)

    for step, (x, y) in enumerate(
        crop_batches(pairs, args.batch, args.steps, seed=args.seed)
    ):
        x, n = pad_to_multiple(x, n_dev)
        y, _ = pad_to_multiple(y, n_dev)
        # mask the all-zero pad samples out of the loss/gradients
        valid = np.arange(len(x)) < n
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(valid),
        )
        if step % 10 == 0 or step == args.steps - 1:
            print(f"step {step:5d}  loss {float(loss):.4f}")
        if args.ckpt_every and (step + 1) % args.ckpt_every == 0:
            path = ckpt.save_checkpoint(args.ckpt_dir, step + 1, params, opt_state)
            print("checkpoint:", path)

    save_npz_pytree(args.out, jax.tree.map(np.asarray, params))
    print("exported weights:", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
