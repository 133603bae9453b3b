"""The driver parses the LAST JSON line of bench.py's merged stdout+stderr
tail, so the scored flagship line must be emitted after every auxiliary
line (xl, full-pipeline).  Rounds 2-3 recorded the 0.447x xl line instead
of the scored 1.3x flagship because the ordering was inverted; this pins
the fix without running any measurement."""

import json


def test_scored_line_emitted_last(monkeypatch, capsys):
    import bench

    def fake_measure(arch, full=False, fused_tail=False):
        # distinguishable rates: flagship 160, full-pipeline 40, xl 57
        if full:
            return 40.0
        return 57.0 if arch == "xl" else 160.0

    monkeypatch.setattr(bench, "measure", fake_measure)
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: None)
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])

    bench.main()

    cap = capsys.readouterr()
    # merged tail as the driver sees it: stderr lines flush before the final
    # stdout line (each print flushes; stdout's scored line is printed last)
    merged = [
        ln
        for ln in (cap.err + cap.out).strip().splitlines()
        if ln.startswith("{")
    ]
    assert len(merged) == 3, merged
    last = json.loads(merged[-1])
    assert last["value"] == 160.0, "scored flagship line must be last"
    assert "[arch=xl]" not in last["metric"]
    assert "full-pipeline" not in last["metric"]
    # and the auxiliary lines are still present
    metrics = " ".join(json.loads(ln)["metric"] for ln in merged[:-1])
    assert "[arch=xl]" in metrics and "full-pipeline" in metrics

    # the scored line is stdout's ONLY json line
    out_lines = [ln for ln in cap.out.strip().splitlines() if ln.startswith("{")]
    assert len(out_lines) == 1 and json.loads(out_lines[0])["value"] == 160.0
