"""Fast-start protocol (VERDICT r4 item 1): while a geometry's fused
device-post program is still compiling/loading in the background, metaseg
serves images through the small forward program + HOST meta_inference
oracle -- outputs must be byte-identical to the plain device run, no build
may be orphaned at exit (drain_builds), and the progcache readiness
machinery must behave (ready / ready_or_build_async / __call__ interlock).

Runs on the CPU mesh with ECSEG_PROG_CACHE pointed at a tmpdir so the
CachedJit machinery engages (it is off on CPU by default); Pallas interpret
mode executes the exact device code path.
"""

import os

import cv2
import numpy as np
import pytest

from ecseg_tpu.core.config import Config


def _read(path):
    with open(path, "rb") as f:
        return f.read()


def _make_folder(root, rng, n_imgs=3):
    os.makedirs(root, exist_ok=True)
    state = rng.bit_generator.state
    for k in range(n_imgs):
        img = (rng.random((320, 384)) * 60).astype(np.uint8)
        img[40 + 10 * k : 120, 50 : 130 + 5 * k] = 200
        img[250:253, 300:303] = 230
        cv2.imwrite(os.path.join(root, f"s{k}.tif"), img)
    return state


def _run(folder, monkeypatch, tmp_path, fast_start, cache_on):
    import jax

    from ecseg_tpu.models import metaseg_unet
    from ecseg_tpu.pipelines import metaseg
    from ecseg_tpu.runtime import fallbacks

    tiny = metaseg_unet.init_params(
        jax.random.PRNGKey(0), widths=(8, 16), bottleneck=32
    )
    monkeypatch.setattr(
        metaseg, "load_model", lambda *a, **k: (tiny, metaseg._default_forward)
    )
    monkeypatch.setenv("ECSEG_DEVICE_PIPELINE", "1")
    monkeypatch.setenv("ECSEG_FAST_START", "1" if fast_start else "0")
    if cache_on:
        monkeypatch.setenv(
            "ECSEG_PROG_CACHE", str(tmp_path / "progs")
        )
    else:
        monkeypatch.setenv("ECSEG_PROG_CACHE", "0")
    fallbacks.reset()
    cfg = Config(raw={"metaseg": {"inpath": folder}})
    assert metaseg.main(config=cfg) == 0
    out = {
        f: _read(os.path.join(folder, "labels", f))
        for f in sorted(os.listdir(os.path.join(folder, "labels")))
        if f.endswith(".npy")
    }
    out["csv"] = _read(os.path.join(folder, "ec_quantification.csv"))
    out["fallbacks"] = dict(fallbacks.counts())
    return out


def test_fast_start_outputs_byte_identical(tmp_path, rng, monkeypatch):
    """The fast-start run (whatever mix of host-oracle and device groups it
    ends up using) produces byte-identical artifacts to the plain device
    run, and no background build survives main().  jax.devices is pinned to
    one device: on the suite's 8-device mesh metaseg takes the sharded
    branch, where the fast-start protocol never engages (and this test
    would compare two identical sharded runs)."""
    import jax

    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: one)

    a = str(tmp_path / "plain")
    state = _make_folder(a, rng)
    rng.bit_generator.state = state
    b = str(tmp_path / "fast")
    _make_folder(b, rng)

    # fast-start run FIRST: the plain run memoizes the device-post program
    # in-process, which would flip ready() True and bypass the protocol
    fast = _run(b, monkeypatch, tmp_path, fast_start=True, cache_on=True)
    plain = _run(a, monkeypatch, tmp_path, fast_start=False, cache_on=True)

    # 3 images < ECSEG_BUILD_MIN_REMAINING: every image must have served
    # through the fast-start host oracle, not the device-post program
    assert fast["fallbacks"].get("metaseg_fast_start") == 3

    for k in plain:
        if k == "fallbacks":
            continue
        assert plain[k] == fast[k], k

    from ecseg_tpu.runtime import progcache

    assert not any(t.is_alive() for t in progcache._BUILDS)


def test_ready_probe_and_async_build():
    """ready() never builds; ready_or_build_async builds exactly once and
    flips ready; a concurrent __call__ waits for the background build
    instead of double-compiling."""
    import jax.numpy as jnp

    from ecseg_tpu.runtime import progcache

    os.environ["ECSEG_PROG_CACHE"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "ecseg_test_progs_ready"
    )
    try:
        calls = []

        @progcache.cached_jit
        def f(x):
            calls.append(1)
            return x * 2 + 1

        x = jnp.arange(8.0)
        assert not f.ready(x)
        assert not f.ready(x), "ready() must not build"
        assert f.stats.compiles == 0

        ok = f.ready_or_build_async(x)
        # either already done (fast CPU build) or building; poll
        import time

        deadline = time.time() + 60
        while not f.ready(x):
            assert time.time() < deadline
            time.sleep(0.01)
        assert f.ready_or_build_async(x) is True
        np.testing.assert_allclose(np.asarray(f(x)), np.arange(8.0) * 2 + 1)
        assert f.stats.compiles + f.stats.loads >= 1
        progcache.drain_builds()
    finally:
        os.environ.pop("ECSEG_PROG_CACHE", None)


def test_drain_builds_idempotent():
    from ecseg_tpu.runtime import progcache

    progcache.drain_builds()
    progcache.drain_builds(cancel_pending=False)


@pytest.mark.parametrize("group", [2, 1], ids=["grouped", "per-image"])
def test_build_min_remaining_gates_builds(group, tmp_path, rng, monkeypatch):
    """ECSEG_BUILD_MIN_REMAINING gating on the single-chip paths (the
    PRODUCT_METASEG_r5 pathology: a short folder must NOT start a background
    device-post build whose no-orphan drain stalls exit).  The suite's
    8-device mesh routes metaseg through the sharded branch, so jax.devices
    is pinned to one device here to reach the fast-start protocol — grouped
    dispatch (group=2: 6 images -> 3 same-signature flushes) and the
    per-image path (group=1) gate with the same rule on different programs.

    With the threshold above the folder length every image is served by the
    fast-start host oracle and the device-post program is never built; with
    the threshold at 1 the second same-signature sighting launches the
    background build.  Artifacts are byte-identical in all three runs."""
    import jax

    from ecseg_tpu.pipelines import metaseg

    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a, **k: one)
    monkeypatch.setenv("ECSEG_METASEG_GROUP", str(group))

    grp = (
        metaseg._segment_post_group_jit
        if group > 1
        else metaseg._segment_post_jit
    )
    folders = {}
    state = None
    for name in ("gated", "built", "plain"):
        f = str(tmp_path / name)
        if state is None:
            state = _make_folder(f, rng, n_imgs=6)
        else:
            rng.bit_generator.state = state
            _make_folder(f, rng, n_imgs=6)
        folders[name] = f

    # count gating decisions, not completed compiles: on CPU the folder
    # tail can finish before the background build issues its compile, and
    # the no-orphan drain then legitimately CANCELS it (stats never move)
    launches = []
    orig_async = grp.ready_or_build_async
    monkeypatch.setattr(
        grp,
        "ready_or_build_async",
        lambda *a, **k: (launches.append(1), orig_async(*a, **k))[1],
    )

    def run(name, fast_start, build_min):
        monkeypatch.setenv("ECSEG_BUILD_MIN_REMAINING", str(build_min))
        before = len(launches)
        out = _run(
            folders[name], monkeypatch, tmp_path,
            fast_start=fast_start, cache_on=True,
        )
        return out, len(launches) - before

    # fast-start runs FIRST: the plain run memoizes the group program
    # in-process, which would make ready() True and mask the gating
    gated, gated_builds = run("gated", fast_start=True, build_min=1000)
    assert gated_builds == 0, "short folder must not build the group program"
    assert gated["fallbacks"].get("metaseg_fast_start") == 6

    built, built_builds = run("built", fast_start=True, build_min=1)
    assert built_builds >= 1, "second sighting must launch the build"
    # the first sighting never builds, the second launches the build and
    # still serves through the oracle; later dispatches may or may not
    # catch the finished build
    assert 2 * group <= built["fallbacks"].get("metaseg_fast_start", 0) <= 6

    plain, _ = run("plain", fast_start=False, build_min=64)
    for k in plain:
        if k == "fallbacks":
            continue
        assert plain[k] == gated[k], k
        assert plain[k] == built[k], k

    from ecseg_tpu.runtime import progcache

    assert not any(t.is_alive() for t in progcache._BUILDS)
