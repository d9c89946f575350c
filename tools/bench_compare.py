"""Diff two bench JSON artifacts query by query.

Usage: python tools/bench_compare.py BENCH_r01.json BENCH_r03.json

Prints per-query old/new/ratio for the shared set, then totals over
shared queries (the honest round-over-round number — totals across
different query sets are not comparable) and lists queries unique to
either side.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either bench.py's raw one-line JSON or the driver's
    BENCH_r*.json wrapper (bench line embedded in its "tail" string)."""
    import re

    with open(path) as fh:
        text = fh.read()
    try:
        doc = json.loads(text)
        if "queries" in doc:
            return doc
        if isinstance(doc.get("parsed"), dict) and "queries" in doc["parsed"]:
            return doc["parsed"]
        tail = doc.get("tail", "")
        m = re.search(r'\{"metric".*?"queries".*?\}\}', tail)
        if m:
            return json.loads(m.group(0))
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"{path}: no bench JSON found")


def main() -> int:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    # host-drift normalization (round-11 verdict ask #5): when BOTH
    # artifacts carry the fixed-CPU-job calibration time, ratios are
    # additionally reported divided by the calibration ratio — a query
    # whose raw ratio equals the host drift prints 1.00x normalized.
    drift = None
    if a.get("calibration_s") and b.get("calibration_s"):
        drift = b["calibration_s"] / a["calibration_s"]
        print(
            f"host calibration: {a['calibration_s']:.3f}s -> "
            f"{b['calibration_s']:.3f}s (drift {drift:.2f}x; "
            "norm = ratio / drift)"
        )
    shared = sorted(set(qa) & set(qb), key=lambda n: qb[n] / max(qa[n], 1e-9))
    hdr = f"{'query':34s} {'old':>7s} {'new':>7s} {'ratio':>6s}"
    print(hdr + (f" {'norm':>6s}" if drift else ""))
    for n in shared:
        r = qb[n] / max(qa[n], 1e-9)
        line = f"{n:34s} {qa[n]:7.2f} {qb[n]:7.2f} {r:6.2f}x"
        if drift:
            line += f" {r / drift:6.2f}x"
        print(line)
    ta, tb = sum(qa[n] for n in shared), sum(qb[n] for n in shared)
    summary = f"\nshared {len(shared)} queries: {ta:.1f}s -> {tb:.1f}s ({tb / ta:.2f}x)"
    if drift:
        summary += f", drift-normalized {tb / ta / drift:.2f}x"
    print(summary)
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    if only_a:
        print(f"only in {sys.argv[1]}: {only_a}")
    if only_b:
        print(f"only in {sys.argv[2]}: {only_b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
