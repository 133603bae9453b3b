"""Control-flow goldens: execute the REFERENCE's own python code.

scikit-image is not installable here, but every skimage primitive the
reference uses has an already-pinned twin in this framework (labeling,
regionprops, morphology, watershed -- each cross-checked against
scipy/cv2/analytic oracles elsewhere in the suite).  So we install a fake
``skimage`` package backed by those twins and IMPORT THE REFERENCE MODULES
THEMSELVES (/root/reference/src), then diff their outputs against ours on
random inputs.

What this pins that unit tests cannot: the reference's sequential,
data-dependent CONTROL FLOW -- meta_inference's ordered relabeling passes
(reference src/image_tools.py:15-84), the overlap stitcher's branchy rim
copies (:188-252), and marker_watershed's marker-placement protocol
(src/model_layers/marker_watershed.py:9-96) -- executed genuinely, against
our reimplementations, to bit-exact equality.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SRC), reason="reference checkout not present"
)


@pytest.fixture
def reference_modules():
    """Import reference modules with a fake skimage backed by our twins."""
    os.environ.setdefault("MPLBACKEND", "Agg")

    from ecseg_tpu.ops import cc as cc_ops
    from ecseg_tpu.ops import morphology as morph_ops
    from ecseg_tpu.ops import resize as resize_ops
    from ecseg_tpu.ops import watershed as ws_ops

    saved = {
        name: sys.modules.get(name)
        for name in list(sys.modules)
        if name == "skimage" or name.startswith("skimage.")
    }

    skimage = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    measure.label = cc_ops.label
    measure.regionprops = cc_ops.regionprops

    def _unused_stub(*a, **k):  # imported by the reference, never called
        raise NotImplementedError("stubbed skimage symbol was called")

    measure.find_contours = _unused_stub
    morphology = types.ModuleType("skimage.morphology")
    morphology.label = cc_ops.label  # old skimage alias the reference uses
    for sym in (
        "diamond",
        "disk",
        "opening",
        "dilation",
        "binary_dilation",
        "binary_erosion",
        "binary_opening",
        "remove_small_objects",
        "remove_small_holes",
    ):
        setattr(morphology, sym, getattr(morph_ops, sym))
    segmentation = types.ModuleType("skimage.segmentation")
    segmentation.watershed = ws_ops.watershed
    transform = types.ModuleType("skimage.transform")
    transform.resize = resize_ops.resize
    transform.rescale = resize_ops.rescale
    io_mod = types.ModuleType("skimage.io")
    color = types.ModuleType("skimage.color")
    filters = types.ModuleType("skimage.filters")
    rank = types.ModuleType("skimage.filters.rank")
    filters.rank = rank
    for mod in (measure, morphology, segmentation, transform, io_mod, color, filters):
        mod.__all__ = [n for n in vars(mod) if not n.startswith("_")]
    skimage.measure = measure
    skimage.morphology = morphology
    skimage.segmentation = segmentation
    skimage.transform = transform
    skimage.io = io_mod
    skimage.color = color
    skimage.filters = filters
    from ecseg_tpu.ops.tiling import img_as_ubyte_float

    skimage.img_as_ubyte = img_as_ubyte_float
    skimage.__all__ = ["measure", "morphology", "segmentation", "img_as_ubyte"]

    injected = {
        "skimage": skimage,
        "skimage.measure": measure,
        "skimage.morphology": morphology,
        "skimage.segmentation": segmentation,
        "skimage.transform": transform,
        "skimage.io": io_mod,
        "skimage.color": color,
        "skimage.filters": filters,
        "skimage.filters.rank": rank,
    }
    sys.modules.update(injected)
    sys.path.insert(0, REFERENCE_SRC)
    ref_cache = [
        n
        for n in list(sys.modules)
        if n in ("image_tools", "model_layers", "max_flow_binary_mask", "utils")
        or n.startswith(("model_layers.", "nuset_utils"))
    ]
    for n in ref_cache:
        del sys.modules[n]
    try:
        os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
        import image_tools as ref_image_tools
        from model_layers import marker_watershed as ref_marker_watershed
        import max_flow_binary_mask as ref_maxflow

        # stat_fish reads config.yaml + src/stat_fish_params.yaml from the
        # cwd AT IMPORT TIME (reference stat_fish.py:4-7); stage both in a
        # temp cwd for the import
        import shutil
        import tempfile

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        tmpd = tempfile.mkdtemp()
        os.makedirs(os.path.join(tmpd, "src"))
        shutil.copy(os.path.join(repo, "config.yaml"), tmpd)
        shutil.copy(
            os.path.join(repo, "ecseg_tpu", "stat_fish_params.yaml"),
            os.path.join(tmpd, "src", "stat_fish_params.yaml"),
        )
        cwd = os.getcwd()
        os.chdir(tmpd)
        try:
            import stat_fish as ref_stat_fish
            import interseg as ref_interseg
        finally:
            os.chdir(cwd)

        yield {
            "image_tools": ref_image_tools,
            "marker_watershed": ref_marker_watershed,
            "max_flow_binary_mask": ref_maxflow,
            "stat_fish": ref_stat_fish,
            "interseg": ref_interseg,
        }
    finally:
        sys.path.remove(REFERENCE_SRC)
        for n in list(sys.modules):
            if (
                n in injected
                or n in (
                    "image_tools",
                    "max_flow_binary_mask",
                    "utils",
                    "stat_fish",
                    "interseg",
                )
                or n.startswith(("model_layers", "nuset_utils"))
            ):
                del sys.modules[n]
        for name, mod in saved.items():
            if mod is not None:
                sys.modules[name] = mod


def _random_label_map(rng, shape=(180, 220)):
    img = np.zeros(shape, np.int64)
    for lab, n, rmax in [(1, 4, 28), (2, 14, 9), (3, 25, 4)]:
        for _ in range(n):
            y, x = rng.integers(0, shape[0] - 4), rng.integers(0, shape[1] - 4)
            r = int(rng.integers(2, rmax))
            img[y : y + r, x : x + r] = lab
    return img


def test_meta_inference_matches_reference_code(reference_modules, rng):
    ref_image_tools = reference_modules["image_tools"]
    from ecseg_tpu.ops.meta_post import meta_inference

    for _ in range(3):
        img = _random_label_map(rng)
        want = ref_image_tools.meta_inference(img.copy())
        got = meta_inference(img.copy())
        np.testing.assert_array_equal(got, want)


def test_counting_helpers_match_reference_code(reference_modules, rng):
    ref_image_tools = reference_modules["image_tools"]
    from ecseg_tpu.ops.cc import count_cc
    from ecseg_tpu.ops.meta_post import count_HSR, count_colocalization

    a = rng.random((120, 150)) < 0.2
    b = rng.random((120, 150)) < 0.2
    assert tuple(count_cc(a)) == tuple(ref_image_tools.count_cc(a))
    assert count_colocalization(a, b) == ref_image_tools.count_colocalization(a, b)
    assert count_HSR(a, b, 20) == ref_image_tools.count_HSR(a, b, 20)

    # degenerate masks: the reference's unique(labels)[1:] quirk makes
    # empty -> (0, 0.0) and all-foreground -> (1, 0.0), with FLOAT second
    # elements (np.sum([])); these land verbatim in CSV tuple cells
    for m in [
        np.zeros((40, 50), bool),
        np.ones((40, 50), bool),
        np.zeros((1, 1), bool),
        np.ones((1, 1), bool),
    ]:
        want = ref_image_tools.count_cc(m)
        got = count_cc(m)
        assert tuple(got) == tuple(want)
        # float-ness must match the reference (np.sum([]) is a float);
        # we return plain python scalars so str(tuple) reproduces the
        # reference's *shipped* numpy-1.x CSV formatting even though this
        # box runs numpy 2 (where np scalars repr as np.int64(...))
        assert type(got[0]) is int and type(got[1]) in (int, float)
        assert isinstance(got[1], float) == isinstance(want[1], (float, np.floating))
        num1x = lambda v: repr(v.item()) if isinstance(v, np.generic) else repr(v)
        assert str(tuple(got)) == f"({num1x(want[0])}, {num1x(want[1])})"


def test_overlap_tiling_matches_reference_code(reference_modules, rng):
    ref_image_tools = reference_modules["image_tools"]
    from ecseg_tpu.ops import tiling

    for h, w in [(462, 874), (512, 700), (306, 306)]:
        img = rng.random((h, w, 1))
        _, ref_patches, ref_pos = ref_image_tools.im2patches_overlap(
            img.copy(), 25, 256
        )
        _, got_patches, got_pos = tiling.im2patches_overlap(img.copy())
        assert [tuple(p) for p in ref_pos] == [tuple(p) for p in got_pos]
        np.testing.assert_array_equal(np.asarray(ref_patches), got_patches)

        preds = rng.random((len(got_pos), 256, 256, 4))
        want = ref_image_tools.patches2im_overlap([p for p in preds], ref_pos, 25, 256)
        got = tiling.patches2im_overlap(preds, got_pos)
        np.testing.assert_array_equal(np.asarray(want), got)


def test_marker_watershed_matches_reference_code(reference_modules, rng):
    """Pins the reference's marker-placement PROTOCOL (score ordering, edge
    band, fallback region markers, all-ones fallback) executed genuinely;
    both sides flood through our watershed primitive, whose own ordering
    semantics are covered in test_watershed/test_native."""
    ref_mw = reference_modules["marker_watershed"]
    from ecseg_tpu.ops.watershed import nuset_marker_watershed

    for trial in range(3):
        mask = np.zeros((140, 160), np.float32)
        boxes = []
        for _ in range(5):
            cy, cx = rng.integers(25, 115), rng.integers(25, 135)
            r = int(rng.integers(10, 18))
            yy, xx = np.ogrid[:140, :160]
            mask[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1.0
            boxes.append([cx - r, cy - r, cx + r, cy + r])
        proposals = np.asarray(boxes, np.float32)
        scores = rng.random(len(boxes)).astype(np.float32) * 0.06 + 0.93

        want = ref_mw._watershed(scores, proposals, mask.copy(), min_score=0.95)
        got = nuset_marker_watershed(scores, proposals, mask.copy(), min_score=0.95)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_min_cut_matches_reference_code(reference_modules, rng):
    """The full min-cut instance-splitting protocol executed from the
    reference's own max_flow_binary_mask.py (seeded center snapping,
    tf-conv local-max detection, recursive Edmonds-Karp split, min_size
    merge-back, blake2b visualization colors) vs ours, bit-exact."""
    ref_maxflow = reference_modules["max_flow_binary_mask"]
    from ecseg_tpu.ops import maxflow

    for trial in range(2):
        mask = np.zeros((110, 130), np.uint8)
        # touching blob pairs so the splitter actually engages
        for cy, cx, r in [(40, 40, 17), (40, 66, 15), (75, 95, 13), (88, 82, 12)]:
            yy, xx = np.ogrid[:110, :130]
            mask[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
        # one small lone nucleus (below the split threshold)
        mask[15:27, 100:112] = 255

        # the reference's driver wraps everything in a graph scope
        # (reference stat_fish.py:195); its eager-incompatible
        # tensor.eval(session=...) calls need the same context here
        import tensorflow.compat.v1 as tf1

        with tf1.Graph().as_default():
            want_lab, want_vis = ref_maxflow.binary_seg_to_instance_min_cut(
                mask.copy(), flow_limit=60, cell_size_threshold_coeff=1.25
            )
        got_lab, got_vis = maxflow.binary_seg_to_instance_min_cut(
            mask.copy(), 60, 1.25
        )
        np.testing.assert_array_equal(np.asarray(got_lab), np.asarray(want_lab))
        np.testing.assert_array_equal(np.asarray(got_vis), np.asarray(want_vis))


def test_stat_fish_helpers_match_reference_code(reference_modules, rng):
    """The LSQ detector helpers executed from the reference's own stat_fish
    module (kernel construction, tf-conv thresholding, boundaries, blob
    counting with in-place deletion, scale, channel merge) vs ours."""
    ref_sf = reference_modules["stat_fish"]
    from ecseg_tpu.ops import matched_filter as mf
    from ecseg_tpu.ops.cc import label as cc_label

    # kernel construction
    for shape, sigma in [((7, 7), 3.0), ((9, 5), 1.5), ((21, 21), 7.0)]:
        np.testing.assert_allclose(
            mf.scipy_sampled_gaussian_kernel(np.array(shape), sigma),
            ref_sf.scipy_sampled_gaussian_kernel(np.array(shape), sigma),
            rtol=1e-12,
        )
        want = np.asarray(ref_sf.get_gaussian_proj_kernel(np.array(shape), sigma))
        got = mf.get_gaussian_proj_kernel(np.array(shape), sigma)
        np.testing.assert_allclose(got, want.reshape(got.shape), rtol=1e-12)

    # full thresholding (the reference evaluates its conv through a
    # throwaway v1 session; needs the driver's graph scope)
    import tensorflow.compat.v1 as tf1

    I = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
    cells = ((rng.random((80, 96)) < 0.4) * 255).astype(np.uint8)
    with tf1.Graph().as_default():
        want = ref_sf.get_thresholded(I, cells, 1.5, 15.0, [70, 70], [7, 7])
    got = mf.get_thresholded(I, cells, 1.5, 15.0, [70, 70], [7, 7])
    np.testing.assert_array_equal(got, np.asarray(want))

    # boundaries
    seg = cc_label(rng.random((60, 70)) < 0.3)
    with tf1.Graph().as_default():
        want_b = ref_sf.get_boundaries(seg, line_thickness=2)
    np.testing.assert_array_equal(
        mf.get_boundaries(seg, line_thickness=2), np.asarray(want_b)
    )

    # count_blobs: count AND in-place deletion of sub-threshold blobs
    fish_w = (((rng.random((50, 60)) < 0.25)) * 255).astype(np.int64)
    fish_g = fish_w.copy()
    cell_seg = (rng.random((50, 60)) < 0.7).astype(int)
    want_n = ref_sf.count_blobs(fish_w, cell_seg, 4)
    got_n = mf.count_blobs(fish_g, cell_seg, 4)
    assert got_n == want_n
    np.testing.assert_array_equal(fish_g, fish_w)

    # get_scale
    lab = cc_label(rng.random((64, 64)) < 0.3)
    assert np.isclose(mf.get_scale(lab, 2500), ref_sf.get_scale(lab, 2500))

    # merge_channels is deliberately NOT diffed against the reference code
    # executed here: the reference multiplies a raw uint8 channel by an int
    # coefficient (stat_fish.py:114), which promoted to int64 under the
    # numpy 1.x it shipped with but WRAPS under this environment's numpy 2,
    # changing the reference's own output.  Ours reproduces the original
    # numpy-1.x behavior; pin that explicitly:
    img4 = (rng.random((32, 32, 4)) * 255).astype(np.uint8)
    aqua = img4[..., -1].astype(np.int64)
    expect = np.minimum(
        img4[..., :-1]
        + np.dstack([c * aqua / 255 for c in [233, 137, 54][::-1]]),
        255,
    ).astype(np.uint8)
    np.testing.assert_array_equal(
        mf.merge_channels(img4.copy(), [233, 137, 54]), expect
    )


def test_full_nuclei_segment_protocol_matches_reference(
    reference_modules, rng, tmp_path
):
    """The COMPLETE stat_fish segmentation protocol executed by the
    reference's own utils.load_nuset + nuclei_segment (two TF sessions over
    its graph with the anchor-size and marker-watershed py_funcs) vs our
    nuset_infer.nuclei_segment, with IDENTICAL weights shipped through
    scripts/convert_tf1_ckpt.py.  Pins the 0.3x rescale, /16 crop, both
    normalizations, session sequencing, watershed protocol, clean_image,
    rescale-back, binarization, and the size filter end-to-end."""
    import tensorflow.compat.v1 as tf1

    ref_utils = sys.modules["utils"]

    # --- stage checkpoints from the reference's own graph builders --------
    sys.path.insert(0, REFERENCE_SRC)
    try:
        from model_layers.models import UNET as REF_UNET
        from model_layers.model_RPN import RPN as REF_RPN
    finally:
        sys.path.pop(0)

    ckpt_dir = tmp_path / "models" / "nuset"
    ckpt_dir.mkdir(parents=True)
    graph = tf1.Graph()
    with graph.as_default():
        inp = tf1.placeholder(np.float32, [1, None, None, 1])
        with tf1.variable_scope("model_U-Net"):
            REF_UNET(2, inp)
        with tf1.variable_scope("model_RPN"):
            REF_RPN(
                tf1.placeholder(np.float32, [1, None, None, 512]), 21
            )
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, str(ckpt_dir / "whole_norm.ckpt"))
            saver.save(sess, str(ckpt_dir / "foreground.ckpt"))

    # --- reference protocol, in a cwd where ./models/nuset/* resolves -----
    image = (rng.random((400, 430)) * 50).astype(np.float64)
    for cy, cx, r in [(120, 110, 55), (250, 300, 62), (320, 120, 48)]:
        yy, xx = np.ogrid[:400, :430]
        image[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 220.0

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        with tf1.Graph().as_default():
            (
                sess1,
                sess2,
                pred_masks,
                train_initial,
                pred_masks_watershed,
                resize_scale,
            ) = ref_utils.load_nuset(0.95, 0.01, 0.3)
            want = ref_utils.nuclei_segment(
                image.copy(),
                resize_scale,
                sess1,
                sess2,
                pred_masks,
                train_initial,
                pred_masks_watershed,
                100,
            )
            sess1.close()
            sess2.close()
    finally:
        os.chdir(cwd)

    # --- ours: same weights through the converter --------------------------
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    try:
        from convert_tf1_ckpt import convert
    finally:
        sys.path.pop(0)
    npz = str(tmp_path / "nuset.npz")
    convert(str(ckpt_dir), npz)

    from ecseg_tpu.models import nuset_infer
    from ecseg_tpu.models.keras_import import load_npz_pytree

    tree = load_npz_pytree(npz)
    model = nuset_infer.NuSeTModel(
        unet_whole=tree["whole"],
        unet_fg=tree["fg"]["unet"],
        rpn_fg=tree["fg"]["rpn"],
        nms_threshold=0.01,
        bbox_min_score=0.95,
        resize_scale=0.3,
    )
    got = nuset_infer.nuclei_segment(image.copy(), model, 100)

    assert got.shape == np.asarray(want).shape
    agreement = (got == np.asarray(want)).mean()
    # fp32 conv epsilon between TF and XLA can flip individual argmax
    # pixels at decision boundaries; the protocol itself is pinned by
    # near-total agreement
    assert agreement >= 0.995, f"pixel agreement {agreement:.4f}"


def test_interseg_grid_tiler_matches_reference_code(reference_modules, rng):
    """interseg's LOCAL grid tiler (a different function from image_tools'
    overlap tiler despite the shared name, reference src/interseg.py:27-47)
    executed from the reference module vs ours."""
    ref_interseg = reference_modules["interseg"]
    from ecseg_tpu.pipelines.interseg import im2patches_grid

    for h, w in [(300, 520), (256, 256), (120, 600), (90, 130), (513, 257)]:
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        want = ref_interseg.im2patches_overlap(img.copy())
        got = im2patches_grid(img.copy())
        assert len(got) == len(want)
        for g, ww in zip(got, want):
            np.testing.assert_array_equal(g, np.asarray(ww))
