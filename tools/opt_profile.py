"""Optimization-round profiler: per-query explain("formatted") dumps +
min-of-3 noop-sink timings + warm-run job counts + plan-shape counters
(Exchange / BatchEvalPython / join strategies), so before/after evidence
for OPTIMIZATION_r12.md comes from one command.

Usage:
    python tools/opt_profile.py [--plans-dir plans/r12] [--suffix before] \
        [name ...]

With no names, profiles every ALL_QUERIES entry (slow). Writes
``<plans-dir>/<name>_<suffix>.txt`` per query and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_counters(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "python": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow)", plan)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans-dir", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json-out", default="")
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra spark conf as key=value (repeatable) for A/B runs",
    )
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dbsink_spark import analytics
    from dbsink_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("opt-profile", extra_conf=extra)
    sc = spark.sparkContext
    names = args.names or sorted(analytics.ALL_QUERIES)
    os.makedirs(args.plans_dir, exist_ok=True)

    # JVM/footer warm-up (same as bench.py)
    analytics.ALL_QUERIES["q01_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    results = {}
    for name in names:
        fn = analytics.ALL_QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(
            os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
        ) as f:
            f.write(plan)
        runs = []
        for i in range(args.runs):
            sc.setJobGroup(f"{name}#p{i}", name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        jobs = len(sc.statusTracker().getJobIdsForGroup(f"{name}#p{args.runs - 1}"))
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        counters = plan_counters(plan)
        results[name] = {
            "min_sec": round(min(runs), 3),
            "median_sec": round(sorted(runs)[len(runs) // 2], 3),
            "jobs": jobs,
            **counters,
        }
        print(
            f"{name:34s} {min(runs):7.2f}s  jobs={jobs:3d} "
            f"xchg={counters['exchanges']:2d} smj={counters['smj']} "
            f"bhj={counters['bhj']} py={counters['python']}",
            flush=True,
        )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    total = sum(r["min_sec"] for r in results.values())
    print(f"TOTAL {total:.2f}s over {len(results)} queries")


if __name__ == "__main__":
    main()
