"""metaseg: folder-batch 4-class DAPI segmentation.

Pipeline parity target: reference src/metaseg.py:12-57 + src/utils.py:109-120.
Per image: read -> meta_preprocess -> save inverted DAPI -> overlap-patchify
-> U-Net forward (whole patch stack in ONE device batch) -> stitch -> uint8
-> channel argmax -> meta_inference -> count ecDNA -> write
labels/<name>.png (palette PNG), labels/<name>.npy, and one
``ec_quantification.csv`` row (note the reference writes
"ec_quantification.csv", not the README's "ec_quantifications" --
metaseg.py:57).

TPU design: the patchify -> forward -> stitch -> argmax chain is a single
jitted function per image geometry; only the final int label map returns to
the host for the (sequential, data-dependent) meta_inference pass.  On a
multi-chip mesh the patch batch is sharded over the data axis (see
ecseg_tpu.parallel).
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..core import imgio
from ..core.config import Config, load_config
from ..models import metaseg_unet
from ..ops import tiling
from ..ops.cc import count_cc
from ..ops.meta_post import meta_inference, meta_preprocess
from ..runtime.progcache import cached_jit
from ..runtime.trace import stage

MODEL_NAME = "metaseg.h5"


def _default_forward(params, patches_u8, dtype):
    return metaseg_unet.forward(params, patches_u8, dtype=dtype)


def _segment_patches_impl(params, patches_u8, forward_fn, positions, dtype):
    """Patches (N,256,256,1) uint8 -> stitched argmax label map (H, W) int32,
    entirely on device.  The uint8 quantization happens before the argmax
    exactly as the reference does (src/utils.py:117-118); per-patch argmax
    then label stitching is bit-identical to stitching the float canvas
    first (the stitcher only copies) but 4x cheaper on HBM."""
    probs = forward_fn(params, patches_u8, dtype)
    return tiling.stitch_argmax_jax(probs, positions)


@cached_jit(static_argnames=("forward_fn", "positions", "dtype"))
def _segment_patches_jit(
    params, patches_u8, forward_fn, positions, dtype=jnp.float32
):
    return _segment_patches_impl(params, patches_u8, forward_fn, positions, dtype)


@cached_jit(static_argnames=("forward_fn", "positions", "dtype"))
def _segment_post_jit(
    params, patches_u8, forward_fn, positions, dtype=jnp.float32
):
    """The FULL per-image device program: forward -> argmax -> stitch ->
    meta_inference -> ecDNA component count, one dispatch.  The stitch runs
    as a single Pallas copy-plan kernel (cc_pallas.stitch_labels_pallas)
    instead of the XLA stitcher's ~150 update-slice launches.  Returns
    ``(raw_labels, blob)`` where ``blob`` is the packed uint8 result of
    :func:`_post_blob` -- decode with :func:`_decode_post_blob` into
    (ok, final_labels, num_ec); when ``ok`` is False (component budget
    overflow in the device meta_inference, see ops/meta_post_tpu) the caller
    redoes the post-processing on the host oracle from ``raw_labels``."""
    from ..ops.cc_pallas import stitch_labels_pallas

    label_patches = _patch_labels_fn(params, patches_u8, forward_fn, dtype)
    labels = stitch_labels_pallas(label_patches, positions)
    return labels, _post_blob(labels)


@cached_jit
def _post_blob_jit(labels):
    """Module-scope jitted twin of :func:`_post_blob` for callers that
    already hold the stitched label canvas (the sharded folder path).  Must
    NOT be constructed per call: each fresh ``jax.jit`` wrapper owns its own
    compile cache, and pipeline-sized programs compile in minutes on this
    attachment."""
    return _post_blob(labels)


def _post_blob(labels):
    """meta_inference + ec count + 2-bit packing, emitted as ONE uint8 blob
    (header row: ok flag + little-endian count; then the packed label rows).
    This attachment fetches device bytes at ~27 MB/s and each fetch pays a
    ~40 ms round trip, so the per-image result must be one small transfer
    (16x smaller than the int32 canvas; see ops/packing)."""
    from ..ops.meta_post_tpu import count_roots_tpu, meta_inference_tpu
    from ..ops.packing import pack_labels_2bit_jax

    out, ok = meta_inference_tpu(labels)
    num_ec = count_roots_tpu(out == 3)
    packed = pack_labels_2bit_jax(out)
    header = jnp.zeros((1, packed.shape[1]), jnp.uint8)
    header = header.at[0, 0].set(ok.astype(jnp.uint8))
    nb = num_ec.astype(jnp.uint32)
    for k in range(4):
        header = header.at[0, 1 + k].set(((nb >> (8 * k)) & 0xFF).astype(jnp.uint8))
    return jnp.concatenate([header, packed], axis=0)


def _decode_post_blob(blob: np.ndarray, w: int):
    """Host side of :func:`_post_blob`: (ok, final int64 labels, num_ec)."""
    from ..ops.packing import unpack_labels_2bit

    ok = bool(blob[0, 0])
    if not ok:
        from ..runtime import fallbacks

        fallbacks.record(fallbacks.META_POST_OK)
    num_ec = int(blob[0, 1]) | int(blob[0, 2]) << 8 | int(blob[0, 3]) << 16 | int(blob[0, 4]) << 24
    labels = unpack_labels_2bit(blob[1:], w).astype(np.int64)
    return ok, labels, num_ec


@cached_jit(static_argnames=("forward_fn", "positions", "dtype"))
def _segment_post_group_jit(
    params, patches_g, forward_fn, positions, dtype=jnp.float32
):
    """Grouped twin of :func:`_segment_post_jit`: (G, N, 256, 256, 1) uint8
    patch stacks of G same-geometry images -> (raw canvases (G, H, W) int32,
    packed blobs (G, 1+rows, cols) uint8) in ONE dispatch.

    Each dispatched call on this attachment costs a fixed ~35-45 ms relay
    round trip, and a single image's 25-patch forward under-fills the MXU --
    batching the forward over the whole group and scanning the (per-canvas)
    post chain amortizes both.  Per-image results are bit-identical to the
    ungrouped program: the conv batch axis is data-parallel and the post
    scan body is the same per-canvas program."""
    from ..ops.cc_pallas import stitch_labels_pallas

    g, n = patches_g.shape[:2]
    flat = patches_g.reshape((-1,) + patches_g.shape[2:])
    label_patches = _patch_labels_fn(params, flat, forward_fn, dtype)
    label_patches = label_patches.reshape((g, n) + label_patches.shape[1:])

    def post(lp):
        labels = stitch_labels_pallas(lp, positions)
        return labels, _post_blob(labels)

    if os.environ.get("ECSEG_GROUP_POST", "scan") == "vmap":
        # vmapping the post over the group batches the XLA stages but
        # measured 13% SLOWER than the scan at 1024^2 on chip (bandwidth-
        # bound stages don't amortize; the vmapped Pallas grid adds
        # overhead).  Kept because it compiles ~3x faster at 2048^2 --
        # bit-identical outputs either way.
        return jax.vmap(post)(label_patches)
    _, (raws, blobs) = jax.lax.scan(
        lambda c, lp: (c, post(lp)), 0, label_patches
    )
    return raws, blobs


def _group_size() -> int:
    """Images per grouped device dispatch on the single-chip path.
    ECSEG_METASEG_GROUP=<n> overrides; <=1 disables grouping (the per-image
    program)."""
    try:
        return int(os.environ.get("ECSEG_METASEG_GROUP", "8"))
    except ValueError:
        return 8


def _fast_start_enabled() -> bool:
    """Fast start (reference anchor: src/metaseg.py:33-42 starts segmenting
    seconds after launch): while the fused device-post program for a
    geometry is still compiling/loading, images flow through the small
    forward+stitch program plus the HOST meta_inference oracle -- byte-
    identical outputs (the e2e suite pins both branches equal) -- and the
    big program is built in a progcache background thread (compiles do not
    block dispatches on this attachment, measured).  ECSEG_FAST_START=1|0
    overrides; default on for real accelerator backends, off on CPU (test
    determinism -- CPU compiles are quick and the suite pins exact branch
    choices)."""
    v = os.environ.get("ECSEG_FAST_START", "").strip().lower()
    if v in ("0", "false", "no", "off"):
        return False
    if v in ("1", "true", "yes", "on"):
        return True
    return jax.default_backend() != "cpu"


def _prepare_image(image_path: str, save_dapi: bool = True):
    """Host stage: decode -> meta_preprocess -> save inverted DAPI ->
    patchify.  Runs on reader threads (runtime.batching.prefetch_map) so TIFF
    decode overlaps device compute."""
    I = imgio.imread_rgb(image_path)
    I = meta_preprocess(I)
    if save_dapi:
        path_split = os.path.split(image_path)
        imgio.save_gray_inverted(
            os.path.join(path_split[0], "dapi", path_split[1]), I
        )
    _, patches, pos = tiling.im2patches_overlap(I[..., None])
    return patches, tuple(map(tuple, pos))


def meta_segment(
    model, image_path: str, *, dtype=jnp.float32, save_dapi: bool = True
) -> np.ndarray:
    """Device forward + host meta_inference for one image
    (reference src/utils.py:109-120).  ``model`` is (params, forward_fn) from
    :func:`load_model` or a bare params dict for the default architecture."""
    if isinstance(model, tuple):
        params, forward_fn = model
    else:
        params, forward_fn = model, _default_forward
    patches, pos = _prepare_image(image_path, save_dapi)
    labels = _segment_patches_jit(
        params, jnp.asarray(patches), forward_fn, pos, dtype
    )
    labels = np.asarray(labels).astype(np.int64)
    return meta_inference(labels)


def _patch_labels_fn(params, patches_u8, forward_fn, dtype):
    """(N, 256, 256, 1) uint8 -> (N, 256, 256) uint8 per-patch label maps:
    forward + uint8 quantization + channel argmax (the stitch-commuting form,
    see stitch_argmax_jax).  uint8 keeps the sharded path's device->host
    label traffic 4x smaller."""
    probs = forward_fn(params, patches_u8, dtype)
    return jnp.argmax(tiling.quantize_u8_jax(probs), axis=-1).astype(jnp.uint8)


_SHARDED_JIT_CACHE = {}


def _sharded_patch_labels_jit(forward_fn, dtype, mesh, p_shard, x_shard):
    """Per-(forward_fn, dtype, mesh) cache of the sharded forward program.
    A fresh ``jax.jit(functools.partial(...))`` per segment_folder_sharded
    call is a fresh pjit cache key, re-paying the multi-minute U-Net compile
    on every invocation in the same process (same rule as _post_blob_jit)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    # the param sharding tree participates in the key: two models with the
    # same forward_fn but different widths must not share a program
    key = (
        forward_fn,
        dtype,
        mesh,
        jax.tree.structure(p_shard),
        tuple(jax.tree.leaves(p_shard)),
    )
    fn = _SHARDED_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            functools.partial(_patch_labels_fn, forward_fn=forward_fn, dtype=dtype),
            in_shardings=(p_shard, x_shard),
            out_shardings=NamedSharding(mesh, P("data", None, None)),
        )
        _SHARDED_JIT_CACHE[key] = fn
    return fn


def segment_folder_sharded(
    model,
    image_paths,
    mesh=None,
    *,
    batch_patches: int = 256,
    dtype=jnp.float32,
    save_dapi: bool = True,
):
    """Mesh-parallel folder segmentation (the TPU-native replacement for the
    reference's MirroredStrategy scope, reference src/metaseg.py:33-36 /
    SURVEY 2.6): patches from ALL images are packed into device-filling
    batches sharded over the mesh 'data' axis, so small images cannot
    under-fill the chips.  Per image, only the stitched int label map returns
    to the host (for the sequential meta_inference pass).

    Yields (image_path, label_map int64 (H, W)) in input order.
    """
    from ..parallel.mesh import make_mesh, pad_to_multiple, param_shardings
    from ..runtime.batching import prefetch_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if isinstance(model, tuple):
        params, forward_fn = model
    else:
        params, forward_fn = model, _default_forward
    if mesh is None:
        mesh = make_mesh()
    n_data = mesh.shape["data"]
    batch_patches = max(batch_patches, n_data)

    p_shard = param_shardings(params, mesh)
    x_shard = NamedSharding(mesh, P("data", None, None, None))
    jitted = _sharded_patch_labels_jit(forward_fn, dtype, mesh, p_shard, x_shard)
    params = jax.device_put(params, p_shard)

    # make the dispatched batch a single static shape so the whole folder
    # compiles exactly one program
    batch_patches = -(-batch_patches // n_data) * n_data

    pending = []  # (path, positions, n_patches) awaiting results
    buf = np.zeros((0, tiling.SCW, tiling.SCW, 1), np.uint8)
    out_patches = []  # label patch arrays, aligned with pending order

    def dispatch(stack, n_valid):
        with stage("metaseg.sharded_forward"):
            labels = np.asarray(jitted(params, jnp.asarray(stack)))[:n_valid]
        out_patches.append(labels)

    def drain():
        nonlocal buf
        if len(buf):
            padded, n = pad_to_multiple(buf, batch_patches)
            dispatch(padded, n)
            buf = buf[:0]
        flat = (
            np.concatenate(out_patches, axis=0)
            if out_patches
            else np.zeros((0, tiling.SCW, tiling.SCW), np.int32)
        )
        offset = 0
        for (path, pos, n) in pending:
            lab = tiling.stitch_labels_host(flat[offset : offset + n], pos)
            offset += n
            yield path, lab.astype(np.int64)
        pending.clear()
        out_patches.clear()

    prep = functools.partial(_prepare_image, save_dapi=save_dapi)
    for path, (patches, pos) in prefetch_map(prep, image_paths):
        pending.append((path, pos, len(patches)))
        buf = np.concatenate([buf, patches.reshape(-1, tiling.SCW, tiling.SCW, 1)])
        while len(buf) >= batch_patches:
            dispatch(buf[:batch_patches], batch_patches)
            buf = buf[batch_patches:]
        # bound host memory: emit completed images periodically
        if sum(n for (_, _, n) in pending) >= 8 * batch_patches:
            yield from drain()
    yield from drain()


def _group_post_fn(batch_local, params, forward_fn, positions, dtype):
    """shard_map body for the sharded DEVICE post path: the local shard is
    ONE image's patch stack (plus a leading length-1 image axis).  Runs the
    full per-image chain -- forward -> argmax -> Pallas stitch ->
    device meta_inference -> packed blob -- entirely on this device, so the
    posts of the images in a group execute in PARALLEL across the mesh
    instead of serially on the default device."""
    patches = batch_local[0]
    label_patches = _patch_labels_fn(params, patches, forward_fn, dtype)
    from ..ops.cc_pallas import stitch_labels_pallas

    labels = stitch_labels_pallas(label_patches, positions)
    return labels[None], _post_blob(labels)[None]


_GROUP_JIT_CACHE = {}


def _sharded_group_post_jit(forward_fn, dtype, flat_mesh, positions):
    """Per-(forward_fn, dtype, mesh, geometry) cache of the grouped
    device-post program (same no-fresh-jit rule as _post_blob_jit)."""
    from jax.sharding import PartitionSpec as P

    key = (forward_fn, dtype, flat_mesh, positions)
    fn = _GROUP_JIT_CACHE.get(key)
    if fn is None:
        mapped = jax.shard_map(
            functools.partial(
                _group_post_fn,
                forward_fn=forward_fn,
                positions=positions,
                dtype=dtype,
            ),
            mesh=flat_mesh,
            in_specs=(P("data", None, None, None, None), P()),
            out_specs=(P("data", None, None), P("data", None, None)),
            check_vma=False,
        )
        fn = jax.jit(mapped)
        _GROUP_JIT_CACHE[key] = fn
    return fn


def segment_folder_sharded_device(
    model,
    image_paths,
    mesh=None,
    *,
    dtype=jnp.float32,
    save_dapi: bool = True,
):
    """Mesh-parallel folder segmentation with the post chain ON DEVICE: each
    image's stitched canvas lives on its home device, ``_post_blob`` (device
    meta_inference + ec count) runs there, and only the ~16x-packed blobs
    are fetched.  Host work is decode + PNG/CSV only -- unlike
    :func:`segment_folder_sharded`, which fetches raw label patches and
    post-processes on host (kept as the host-branch parity twin).

    Images are grouped by geometry into groups of ``n_devices`` and
    dispatched over a FLAT data mesh (inference needs no tensor
    parallelism; every device runs a whole image, so a (data, model) mesh
    would leave the model axis doing duplicate work).  On a component-budget
    overflow (``ok`` False, ops/meta_post_tpu contract) only that image's
    raw canvas shard is fetched and redone on the host oracle -- counted by
    runtime/fallbacks.

    Yields (image_path, final int64 label map, num_ec) in input order.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..ops.cc import count_cc as _count_cc_host
    from ..parallel.mesh import make_mesh
    from ..runtime.batching import prefetch_map

    if isinstance(model, tuple):
        params, forward_fn = model
    else:
        params, forward_fn = model, _default_forward
    if mesh is None:
        mesh = make_mesh()
    devices = np.asarray(mesh.devices).reshape(-1)
    flat_mesh = Mesh(devices, ("data",))
    n_dev = len(devices)
    params = jax.device_put(params, NamedSharding(flat_mesh, P()))

    groups = {}  # positions -> [(idx, path, patches)]
    results = {}  # idx -> (path, labels, num_ec)
    cursor = 0

    def flush(pos_key, items):
        pad = n_dev - len(items)
        stacked = np.stack(
            [p for (_, _, p) in items]
            + [np.zeros_like(items[0][2])] * pad
        )
        fn = _sharded_group_post_jit(forward_fn, dtype, flat_mesh, pos_key)
        with stage("metaseg.sharded_forward+post"):
            labels_dev, blobs_dev = fn(stacked, params)
            blobs = np.asarray(blobs_dev)
        for k, (idx, path, _) in enumerate(items):
            ok, I, num = _decode_post_blob(blobs[k], labels_dev.shape[2])
            if not ok:
                # fetch only THIS image's canvas shard; host oracle redo
                raw = np.asarray(labels_dev[k]).astype(np.int64)
                I = meta_inference(raw)
                num = _count_cc_host(I == 3)[0]
            results[idx] = (path, I, num)

    def emit():
        nonlocal cursor
        while cursor in results:
            yield results.pop(cursor)
            cursor += 1

    prep = functools.partial(_prepare_image, save_dapi=save_dapi)
    for idx, (path, (patches, pos)) in enumerate(
        prefetch_map(prep, image_paths)
    ):
        lst = groups.setdefault(pos, [])
        lst.append((idx, path, patches))
        if len(lst) == n_dev:
            flush(pos, lst)
            groups[pos] = []
            yield from emit()
    for pos_key, lst in groups.items():
        if lst:
            flush(pos_key, lst)
    yield from emit()


def load_model(model_dir: str = "models", key: Optional[jax.Array] = None):
    """Resolve the metaseg model, in priority order:

    1. ``<model_dir>/metaseg.h5``  -- the reference's Keras blob, executed
       directly through the keras_import graph reconstructor (no TF needed);
    2. ``<model_dir>/metaseg.npz`` -- converted default-architecture weights;
    3. seeded random default architecture (development).

    Returns (params, forward_fn) for :func:`meta_segment`.
    """
    h5_path = os.path.join(model_dir, "metaseg.h5")
    if os.path.exists(h5_path):
        from ..models.keras_import import import_keras_h5

        km = import_keras_h5(h5_path)

        def keras_forward(params, patches_u8, dtype, _fwd=km._forward):
            # honor the requested compute dtype: layer kernels follow the
            # input dtype (models/layers.py casts kernels to x.dtype), so
            # casting here engages the bf16 throughput path for imported
            # graphs too -- silently always-f32 would make the dtype arg a
            # cache-fragmenting no-op
            return _fwd(params, patches_u8.astype(dtype))

        return km.params, keras_forward

    npz_path = os.path.join(model_dir, "metaseg.npz")
    if os.path.exists(npz_path):
        from ..models.keras_import import load_npz_pytree

        return load_npz_pytree(npz_path), _default_forward
    if key is None:
        key = jax.random.PRNGKey(0)
    return metaseg_unet.init_params(key), _default_forward


# back-compat alias
def load_params(model_dir: str = "models", key: Optional[jax.Array] = None):
    return load_model(model_dir, key)


def main(argv=None, config: Optional[Config] = None) -> int:
    from ..runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    if config is None:
        config = load_config()
    var = config.metaseg
    inpath = var.inpath

    if not os.path.isdir(inpath):
        print("Input folder does not exist. Exiting...")
        return 2

    os.makedirs(os.path.join(inpath, "dapi"), exist_ok=True)
    os.makedirs(os.path.join(inpath, "labels"), exist_ok=True)

    model = load_model()
    image_paths = imgio.get_imgs(inpath)

    if isinstance(model, tuple):
        params, forward_fn = model
    else:
        params, forward_fn = model, _default_forward

    from ..runtime.batching import prefetch_map
    from ..runtime.devicepath import use_device_path

    rows = []
    path_split = None
    print("Reading from: ", inpath)
    device_post = use_device_path()

    def _host_post(raw_labels_i64):
        I = meta_inference(raw_labels_i64)
        return I, count_cc(I == 3)[0]

    if len(jax.devices()) > 1:
        # multi-chip: cross-image packed batches sharded over the mesh
        # 'data' axis (SURVEY 2.6; replaces the reference's MirroredStrategy)
        if device_post:
            # stitch + meta_inference stay on each image's home device;
            # only packed blobs come back (host = decode + PNG/CSV)
            results = segment_folder_sharded_device(
                (params, forward_fn), image_paths
            )
        else:
            def _sharded():
                for i, lab in segment_folder_sharded(
                    (params, forward_fn), image_paths
                ):
                    with stage("metaseg.meta_inference"):
                        I, num = _host_post(lab)
                    yield i, I, num

            results = _sharded()
    elif device_post and _group_size() > 1:
        # single chip, grouped: G same-geometry images per dispatch -- ONE
        # batched forward (G*25-patch convs fill the MXU) + the per-canvas
        # post chain as an inner scan, G packed blobs in ONE fetch.  The
        # ~40 ms relay round trip and the forward's batch inefficiency both
        # amortize by G (the round-3 full-pipeline gap).  Partial groups at
        # end-of-folder are zero-padded so one program serves the folder.
        def _grouped():
            group = _group_size()
            buckets = {}  # positions -> [(idx, path, patches)]
            results = {}  # idx -> (path, labels, num_ec)
            cursor = 0

            def geo_group(pos_key) -> int:
                """Per-geometry group cap: the grouped forward runs ONE conv
                batch over group*len(positions) patches, and its HLO temps
                scale with that product -- at 2048^2 (121 patches/image) the
                8-image group needs 21 GB of HBM on a 15.75 GB chip
                (measured OOM, PROGCACHE_TPU run 1).  Cap the patch product
                instead of the image count so 1024^2-and-below folders keep
                the full group while big geometries clamp to what fits."""
                budget = int(
                    os.environ.get("ECSEG_METASEG_PATCH_BUDGET", "256")
                )
                return max(1, min(group, budget // max(1, len(pos_key))))

            fast_start = _fast_start_enabled()
            sig_seen = set()  # (pos_key, padded-group-size) sightings
            n_total = len(image_paths)
            n_done = 0
            # a cold COMPILE of the group program only pays off when enough
            # work remains to hide it (the no-orphan drain otherwise stalls
            # main at exit for the compile's tail: measured 281 s wall on a
            # 24-image folder, ~245 s of it drain).  A disk LOAD costs ~1 s
            # and is worth starting on any folder.
            build_min = int(
                os.environ.get("ECSEG_BUILD_MIN_REMAINING", "64")
            )

            def flush(pos_key, items):
                nonlocal n_done
                # pad partial groups to the next power of two (not the full
                # group): one program per occupied size bucket instead of
                # 8x overcompute on a 1-image folder; the executable cache
                # (runtime/progcache) absorbs the extra compiles across
                # processes
                g = geo_group(pos_key)
                padded = 1
                while padded < len(items):
                    padded *= 2
                padded = min(padded, g)
                pad = padded - len(items)
                stacked = np.stack(
                    [p for (_, _, p) in items]
                    + [np.zeros_like(items[0][2])] * pad
                )
                stacked_dev = jnp.asarray(stacked)
                if fast_start:
                    # fast-start protocol: the FIRST group of a signature
                    # never triggers a build (a 1-group folder must not pay
                    # -- or orphan -- a multi-minute compile); from the
                    # second sighting on, the build runs in a progcache
                    # background thread (drained before main returns) while
                    # groups keep flowing through the small forward program
                    # + host oracle -- and a cold compile is only started
                    # when a cached executable likely exists on disk OR
                    # enough images remain to hide the compile behind real
                    # work.  Bytes identical either way.
                    skey = (pos_key, padded)
                    # a disk LOAD is cheap but its background WARMUP call
                    # still pays this attachment's first-invocation lottery
                    # (10-200 s) and the no-orphan drain joins it -- so even
                    # loads need enough remaining work to pay off (half the
                    # cold-compile threshold)
                    remaining = n_total - n_done
                    may_build = skey in sig_seen and (
                        remaining >= build_min
                        or (
                            remaining >= max(16, build_min // 2)
                            and _segment_post_group_jit.likely_cached()
                        )
                    )
                    if may_build:
                        ready = _segment_post_group_jit.ready_or_build_async(
                            params, stacked_dev, forward_fn, pos_key,
                            jnp.float32,
                        )
                    else:
                        sig_seen.add(skey)
                        ready = _segment_post_group_jit.ready(
                            params, stacked_dev, forward_fn, pos_key,
                            jnp.float32,
                        )
                    n_done += len(items)
                    if not ready:
                        from ..runtime import fallbacks

                        for (idx, path, patches) in items:
                            with stage("metaseg.fast_start"):
                                labels = _segment_patches_jit(
                                    params, jnp.asarray(patches), forward_fn,
                                    pos_key, jnp.float32,
                                )
                                I, num = _host_post(
                                    np.asarray(labels).astype(np.int64)
                                )
                            fallbacks.record("metaseg_fast_start")
                            results[idx] = (path, I, num)
                        return
                with stage("metaseg.forward+post"):
                    raws, blobs = _segment_post_group_jit(
                        params, stacked_dev, forward_fn, pos_key,
                        jnp.float32,
                    )
                    blobs = np.asarray(blobs)
                for k, (idx, path, _) in enumerate(items):
                    ok, I, num = _decode_post_blob(blobs[k], int(raws.shape[2]))
                    if not ok:
                        I, num = _host_post(np.asarray(raws[k]).astype(np.int64))
                    results[idx] = (path, I, num)

            def emit():
                nonlocal cursor
                while cursor in results:
                    yield results.pop(cursor)
                    cursor += 1

            for idx, (i, (patches, pos)) in enumerate(
                prefetch_map(_prepare_image, image_paths)
            ):
                lst = buckets.setdefault(pos, [])
                lst.append((idx, i, patches))
                if len(lst) == geo_group(pos):
                    flush(pos, lst)
                    buckets[pos] = []
                    yield from emit()
            for pos_key, lst in buckets.items():
                if lst:
                    flush(pos_key, lst)
            yield from emit()

        results = _grouped()
    else:
        def _per_image():
            fast_start = _fast_start_enabled()
            sig_seen = set()
            n_total = len(image_paths)
            build_min = int(
                os.environ.get("ECSEG_BUILD_MIN_REMAINING", "64")
            )
            n_done = 0
            for i, (patches, pos) in prefetch_map(_prepare_image, image_paths):
                if device_post:
                    patches_dev = jnp.asarray(patches)
                    if fast_start:
                        # same protocol as the grouped path: first sighting
                        # of a geometry never builds; later sightings build
                        # in the background (cold compiles only when a disk
                        # entry likely exists or enough images remain to
                        # hide the compile) while images flow through the
                        # forward program + host oracle
                        remaining = n_total - n_done
                        may_build = pos in sig_seen and (
                            remaining >= build_min
                            or (
                                remaining >= max(16, build_min // 2)
                                and _segment_post_jit.likely_cached()
                            )
                        )
                        if may_build:
                            ready = _segment_post_jit.ready_or_build_async(
                                params, patches_dev, forward_fn, pos,
                                jnp.float32,
                            )
                        else:
                            sig_seen.add(pos)
                            ready = _segment_post_jit.ready(
                                params, patches_dev, forward_fn, pos,
                                jnp.float32,
                            )
                        n_done += 1
                        if not ready:
                            from ..runtime import fallbacks

                            with stage("metaseg.fast_start"):
                                labels = _segment_patches_jit(
                                    params, patches_dev, forward_fn, pos,
                                    jnp.float32,
                                )
                                I, num = _host_post(
                                    np.asarray(labels).astype(np.int64)
                                )
                            fallbacks.record("metaseg_fast_start")
                            yield i, I, num
                            continue
                    # ONE device program: forward -> stitch -> meta_inference
                    # -> ec count, fetched as ONE packed blob (host fallback
                    # only on budget overflow)
                    with stage("metaseg.forward+post"):
                        raw, blob = _segment_post_jit(
                            params, patches_dev, forward_fn, pos,
                            jnp.float32,
                        )
                        ok, I, num = _decode_post_blob(
                            np.asarray(blob), raw.shape[1]
                        )
                        if not ok:
                            I, num = _host_post(np.asarray(raw).astype(np.int64))
                    yield i, I, num
                else:
                    with stage("metaseg.forward+stitch"):
                        labels = _segment_patches_jit(
                            params, jnp.asarray(patches), forward_fn, pos,
                            jnp.float32,
                        )
                        labels = np.asarray(labels).astype(np.int64)
                    with stage("metaseg.meta_inference"):
                        I, num = _host_post(labels)
                    yield i, I, num

        results = _per_image()

    for i, I, num_ecDNA in results:
        print("Processing image: ", i)
        path_split = os.path.split(i)
        outpath = os.path.join(path_split[0], "labels", path_split[1][:-4])
        print("Saving labels: ", i, " to ", outpath)
        with stage("metaseg.write"):
            imgio.save_label_png(outpath + ".png", I.astype("uint8"))
            # always C-order: np.save records the memory layout in the npy
            # header, and on TPU a fetched canvas can arrive column-major
            # (XLA may pick a transposed host layout; astype's default
            # order='K' then keeps it Fortran through the whole host post
            # chain).  The reference writes C-ordered arrays (TF session
            # fetches, reference src/metaseg.py:49), and the device branch's
            # 2-bit blob decode is C-ordered -- found as a real host-vs-
            # device byte mismatch on TPU hardware (scripts/parity_tpu.py).
            np.save(outpath, np.ascontiguousarray(I))
        rows.append({"image name": path_split[1], "# of ec": num_ecDNA})

    df = pd.DataFrame(rows, columns=["image name", "# of ec"])
    # always written, to inpath -- the reference (metaseg.py:57) emits the
    # CSV unconditionally (empty folder -> header-only file), and consumers
    # poll for it as a completion marker
    out_csv = os.path.join(inpath, "ec_quantification.csv")
    print("Saving ec quantification to", out_csv)
    df.to_csv(out_csv, index=False)
    # never exit with a fast-start build in flight: an orphaned compile RPC
    # keeps compiling server-side and wedges the NEXT process (pending
    # builds are cancelled; in-flight compiles are joined)
    from ..runtime.progcache import drain_builds

    drain_builds()
    from ..runtime import fallbacks

    fallbacks.report()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
