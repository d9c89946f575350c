"""Unit tests for the bench tooling (no Spark session needed).

tools/bench_compare.py is the round-over-round adjudication path the
judge and the builder both read; round 11 added host-drift
normalization (divide every ratio by the fixed-CPU calibration ratio),
and arithmetic in a report tool deserves the same pinning as an
operator — a wrong normalization would mis-adjudicate every future
round at once.
"""

from __future__ import annotations

import io
import json
import sys


def _run_compare(tmp_path, a: dict, b: dict) -> str:
    sys.path.insert(0, "/root/repo")
    import importlib

    import tools.bench_compare as bc

    importlib.reload(bc)
    pa, pb = tmp_path / "a.json", tmp_path / "b.json"
    pa.write_text(json.dumps(a))
    pb.write_text(json.dumps(b))
    argv, out = sys.argv, io.StringIO()
    stdout = sys.stdout
    try:
        sys.argv = ["bench_compare.py", str(pa), str(pb)]
        sys.stdout = out
        bc.main()
    finally:
        sys.argv = argv
        sys.stdout = stdout
    return out.getvalue()


def test_drift_normalized_ratios(tmp_path):
    """A query whose raw ratio exactly equals the host drift must print
    1.00x normalized; totals line carries the drift-normalized number;
    the drift factor itself is stated."""
    a = {"queries": {"q1": 2.0, "q2": 4.0}, "calibration_s": 1.0}
    b = {"queries": {"q1": 3.0, "q2": 4.0}, "calibration_s": 1.5}
    out = _run_compare(tmp_path, a, b)
    assert "drift 1.50x" in out
    # q1: raw 1.50x, normalized 1.00x (pure host drift)
    q1 = next(line for line in out.splitlines() if line.startswith("q1"))
    assert "1.50x" in q1 and "1.00x" in q1
    # q2: raw 1.00x, normalized 0.67x (genuinely faster than drift)
    q2 = next(line for line in out.splitlines() if line.startswith("q2"))
    assert "1.00x" in q2 and "0.67x" in q2
    assert "drift-normalized 0.78x" in out  # (7/6) / 1.5


def test_no_calibration_falls_back_to_raw(tmp_path):
    """Artifacts without calibration_s (every round before r11) keep
    the raw-ratio report — no drift line, no norm column."""
    a = {"queries": {"q1": 2.0}}
    b = {"queries": {"q1": 3.0}}
    out = _run_compare(tmp_path, a, b)
    assert "drift" not in out
    assert "1.50x" in out
