"""Driver-side plan-construction profiler (guide §7.3).

For each registry query, measures the cost of *building* the DataFrame
(``fn(spark, sf_dir)`` — pure driver work: py4j round trips, Catalyst
analysis, plus any in-construction actions the iterative operators
run) separately from *executing* it (one noop-sink write of the built
frame). Also counts py4j round trips per construct by patching the
py4j connection, so expression-churn hot spots rank by evidence.

Usage:
    python tools/construct_profile.py [--json-out f.json] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dbsink_spark import analytics
    from dbsink_spark.session import get_spark

    spark = get_spark("construct-profile")

    # count py4j round trips: every send_command is one driver<->JVM hop
    import py4j.clientserver as cs

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counting(self, command):
        counter["n"] += 1
        return orig(self, command)

    cs.ClientServerConnection.send_command = counting

    # warm-up (JIT + parquet footers), same as bench.py
    analytics.ALL_QUERIES["q01_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    names = args.names or sorted(analytics.ALL_QUERIES)
    results = {}
    for name in names:
        fn = analytics.ALL_QUERIES[name]
        c0 = counter["n"]
        t0 = time.time()
        df = fn(spark, sf_dir)
        construct = time.time() - t0
        calls = counter["n"] - c0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        exec_s = time.time() - t0
        spark.catalog.clearCache()
        results[name] = {
            "construct_sec": round(construct, 3),
            "exec_sec": round(exec_s, 3),
            "py4j_calls": calls,
        }
        print(
            f"{name:34s} construct={construct:6.2f}s exec={exec_s:6.2f}s "
            f"py4j={calls:6d}",
            flush=True,
        )
    tot_c = sum(r["construct_sec"] for r in results.values())
    tot_e = sum(r["exec_sec"] for r in results.values())
    tot_p = sum(r["py4j_calls"] for r in results.values())
    print(f"TOTAL construct={tot_c:.1f}s exec={tot_e:.1f}s py4j={tot_p}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
