"""runtime.trace unit tests."""

import time

from ecseg_tpu.runtime.trace import Tracer


def test_disabled_tracer_is_noop():
    t = Tracer(enabled=False)
    with t.stage("x"):
        pass
    assert t.report() == ""


def test_stage_timing_and_report():
    t = Tracer(enabled=True)
    for _ in range(3):
        with t.stage("fast"):
            pass
    with t.stage("slow"):
        time.sleep(0.01)
    text = t.report()
    lines = text.splitlines()
    assert lines[1].startswith("slow")  # sorted by total time, slow first
    assert "fast" in text
    assert " 3 " in [l for l in lines if l.startswith("fast")][0]
    t.reset()
    assert t.report() == ""


def test_nested_stages_attributed_to_both():
    t = Tracer(enabled=True)
    with t.stage("outer"):
        with t.stage("inner"):
            time.sleep(0.005)
    text = t.report()
    assert "outer" in text and "inner" in text
