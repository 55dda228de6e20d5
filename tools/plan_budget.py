"""Shuffle-budget golden generator: records the hash-exchange count of
every registered query's compiled physical plan into
``tests/plan_budget.json``.

``tests/test_plans.py::test_shuffle_budget_not_exceeded`` asserts each
query's CURRENT plan stays within its recorded budget — a silent extra
Exchange (dropped broadcast hint, lost partitioning reuse, a filter
that stopped pushing down past a join) is invisible at harness SF but
is exactly the regression that hurts at 100 TB.

Run after INTENTIONAL plan changes to re-baseline:

    python tools/plan_budget.py

Counts are taken from the pre-execution executedPlan (AQE not yet
finalized), so they are deterministic for a given Spark version and
independent of data size / partition count.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
_TESTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests")
OUT = os.path.join(_TESTS, "plan_budget.json")
WINDOW_OUT = os.path.join(_TESTS, "window_budget.json")
LOWCARD_OUT = os.path.join(_TESTS, "lowcard_window_budget.json")


def exchange_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def main() -> None:
    from dbsink_spark import analytics
    from dbsink_spark.analytics.introspect import plan_stats
    from dbsink_spark.session import get_spark

    spark = get_spark("plan-budget")
    budget: dict[str, int] = {}
    windows: dict[str, int] = {}
    lowcard: dict[str, list[str]] = {}
    from dbsink_spark.analytics.introspect import PLAN_BUDGET_EXEMPT

    for name in sorted(analytics.ALL_QUERIES):
        if name in PLAN_BUDGET_EXEMPT:
            # iterative driver loop during construction; per-round
            # plans are covered by their own tests (the exemption set
            # is defined ONCE in introspect.py and cross-checked by
            # tests/test_plans.py's completeness assert)
            continue
        df = analytics.ALL_QUERIES[name](spark, SF_DIR)
        stats = plan_stats(df)
        budget[name] = stats.hash_exchanges
        # second budget line (round-7 tripwire): unpartitioned Window
        # nodes — the q84/q86 straggler class an exchange count can't
        # see. tests/test_plans.py additionally requires a written
        # small-input rationale for EVERY query with a nonzero count.
        if stats.unpartitioned_windows:
            windows[name] = stats.unpartitioned_windows
        # third budget line (round-8 tripwire, VERDICT_r07 #4): Window
        # nodes partitioned ONLY by corpus-size-independent
        # low-cardinality keys — corpus/|key| rows per task, invisible
        # to BOTH the exchange budget and the unpartitioned counter
        # (the q68 class). test_plans requires a written bounded-input
        # rationale for every recorded signature.
        if stats.lowcard_window_keys:
            lowcard[name] = sorted(stats.lowcard_window_keys)
        spark.catalog.clearCache()
    with open(OUT, "w") as f:
        json.dump(budget, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(WINDOW_OUT, "w") as f:
        json.dump(windows, f, indent=1, sort_keys=True)
        f.write("\n")
    with open(LOWCARD_OUT, "w") as f:
        json.dump(lowcard, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(budget)} queries, "
          f"total exchanges {sum(budget.values())}")
    print(f"wrote {WINDOW_OUT}: {len(windows)} queries with "
          f"unpartitioned windows, total {sum(windows.values())}")
    print(f"wrote {LOWCARD_OUT}: {len(lowcard)} queries with "
          "low-cardinality-partition windows")


if __name__ == "__main__":
    main()
