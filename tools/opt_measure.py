"""Per-query optimization measurement harness (round 13).

For each named registry query: dump `.explain("formatted")` to
``plans/<round>/<name>_<suffix>.txt`` ($SPARK_GRAFT_PLAN_ROUND, default r14), then time best-of-N through the noop
sink in a bench-identical warm session, and report seconds plus plan
summary counters (Exchange count, join strategies, Python eval nodes)
and the Spark job count per execution.

Usage:
  python tools/opt_measure.py [--sf DIR] [--reps N] [--suffix before]
                              [--no-plan] query [query ...]
  python tools/opt_measure.py --top K          # K most expensive from BENCH_DETAIL.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def plan_summary(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
        "python_eval": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--suffix", default=None, help="write plans/r13/<q>_<suffix>.txt")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from bench import PREBUILD
    from hpaste_spark import get_spark

    names = list(args.queries)
    if args.top:
        with open(os.path.join(HERE, "BENCH_DETAIL.json")) as fh:
            prev = json.load(fh)["queries"]
        names += sorted(prev, key=lambda n: -prev[n])[: args.top]

    spark = get_spark("opt-measure")
    qs = entry_mod.queries()
    missing = [n for n in names if n not in qs]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    sc = spark.sparkContext

    # bench-identical warmup at the tiny SFs
    if not args.no_warm:
        spark.range(1000).selectExpr("sum(id)").collect()
        for warm_dir in ("/root/testdata/sf0.001",) * 2 + ("/root/testdata/sf0.01",):
            for name in names:
                try:
                    qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
                except Exception:
                    pass
        spark.catalog.clearCache()

    # untimed artifact builds for stored/appended/compacted variants
    for name in names:
        if name in PREBUILD:
            try:
                qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    plan_dir = os.path.join(HERE, "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"))
    os.makedirs(plan_dir, exist_ok=True)

    results = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        if args.suffix:
            with open(os.path.join(plan_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(plan)
        best, times, jobs = float("inf"), [], 0
        for rep in range(args.reps):
            sc.setJobGroup(f"om-{name}-{rep}", name)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            times.append(round(dt, 3))
            if dt < best:
                best = dt
            tracker = sc.statusTracker()
            jobs = max(jobs, len(tracker.getJobIdsForGroup(f"om-{name}-{rep}")))
        results[name] = {
            "best_s": round(best, 3),
            "runs": times,
            "jobs": jobs,
            **plan_summary(plan),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print("== summary ==")
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
