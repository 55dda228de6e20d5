"""Physical-plan hygiene across the registry.

Correctness is the oracle's job; these tests pin the PLAN properties
the 100 TB design depends on: no non-broadcast cartesian joins
anywhere, filters/projections pushed into the parquet scan, dimension
joins actually broadcast. A regression here is invisible at harness SF
but fatal at scale.
"""

from __future__ import annotations

import pytest

from dbsink_spark import analytics

SF_DIR = "/root/testdata/sf0.001"

# d09 runs an iterative driver loop during construction (covered by its
# own tests); everything else builds its plan lazily.
PLAN_QUERIES = sorted(set(analytics.ALL_QUERIES) - {"d09_dup_clusters"})


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", PLAN_QUERIES)
def test_no_cartesian_product(spark, name):
    """Cross joins must always ride a broadcast (BroadcastNestedLoop),
    never a partition-cartesian CartesianProduct."""
    plan = _plan(analytics.ALL_QUERIES[name](spark, SF_DIR))
    assert "CartesianProduct" not in plan, name


def test_filter_and_projection_pushed_to_scan(spark):
    plan = _plan(analytics.ALL_QUERIES["q02_filter_project"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not an empty list
    assert "PushedFilters: []" not in plan.replace(" ", "")
    # projection pruning: the lineitem scan must NOT read all 16 columns
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_comment" not in scan


def test_dimension_join_broadcasts(spark):
    plan = _plan(analytics.ALL_QUERIES["q03_broadcast_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_similarity_corpus_never_shuffles_for_scoring(spark):
    """s01: the query set broadcasts; the only hash-partitioning
    exchange is the per-query top-k window (the final orderBy adds a
    range partitioning), never the corpus join. The window's top-k is
    pushed below the shuffle as a partial WindowGroupLimit."""
    df = analytics.ALL_QUERIES["s01_cosine_topk"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("WindowGroupLimit") == 2  # partial below + final above


def test_global_topk_uses_take_ordered(spark):
    plan = _plan(analytics.ALL_QUERIES["q16_topk_global"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
