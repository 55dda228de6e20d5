"""Tests for the q74 constraint audit and q75 MV-rewrite operators
(value correctness is oracle-gated in tools/check_oracle.py; these
assert the structural claims the docstrings make)."""

from conftest import SF_SMOKE

from dbsink_spark.analytics.quality import (
    build_rollup_mv,
    q74_constraint_audit,
    q75_mv_rewrite,
)

EXPECTED_CONSTRAINTS = {
    "orders.key_unique",
    "orders.status_domain",
    "orders.totalprice_positive",
    "orders.custkey_complete",
    "lineitem.pk_unique",
    "lineitem.discount_range",
    "customer.acctbal_nonneg",
    "orders.fk_customer",
    "lineitem.fk_orders",
    "documents.text_nonempty",
}


def test_q74_audit_shape_and_flags(spark):
    rows = q74_constraint_audit(spark, SF_SMOKE).collect()
    assert {r["constraint"] for r in rows} == EXPECTED_CONSTRAINTS
    for r in rows:
        # passed is literally "zero violations", and counts are sane
        assert r["passed"] == (r["n_violations"] == 0), r
        assert 0 <= r["n_violations"] <= r["n_rows"], r
    # the synthetic data ships known-dirty columns: the audit must
    # actually FLAG something, not rubber-stamp
    failed = {r["constraint"] for r in rows if not r["passed"]}
    assert "customer.acctbal_nonneg" in failed


def test_q75_rewrite_never_rescans_base(spark):
    df = q75_mv_rewrite(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the coarse rollup must be answered from the materialized MV (an
    # in-memory checkpointed RDD scan), never a second base-table scan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan, plan
    assert "lineitem" not in plan, plan


def test_q75_rewrite_equals_direct(spark):
    from pyspark.sql import functions as F

    from dbsink_spark.analytics.tables import Tables

    got = {
        (r["l_returnflag"], r["ship_year"]): (
            r["n_items"],
            r["sum_qty"],
            r["revenue_cents"],
        )
        for r in q75_mv_rewrite(spark, SF_SMOKE).collect()
    }
    li = Tables(spark, SF_SMOKE).lineitem
    direct = {
        (r["l_returnflag"], r["ship_year"]): (
            r["n_items"],
            r["sum_qty"],
            r["revenue_cents"],
        )
        for r in (
            li.groupBy(
                "l_returnflag", F.year("l_shipdate").cast("long").alias("ship_year")
            )
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                (F.sum(F.round(F.col("l_quantity") * 100).cast("long")) / 100)
                .cast("long")
                .alias("sum_qty"),
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                    "revenue_cents"
                ),
            )
            .collect()
        )
    }
    assert got == direct


def test_q75_mv_is_group_sized(spark):
    mv_rows = build_rollup_mv(spark, SF_SMOKE).count()
    base_rows = Tables_count(spark)
    assert mv_rows < base_rows / 10, (mv_rows, base_rows)


def Tables_count(spark):
    from dbsink_spark.analytics.tables import Tables

    return Tables(spark, SF_SMOKE).lineitem.count()


def test_t25_reference_source_is_most_familiar(spark):
    """Semantic sanity for the LM quality scorer: the reference
    corpus's own documents must score the highest mean familiarity —
    the LM was trained on them (CCNet's Wikipedia scores Wikipedia
    best)."""
    from dbsink_spark.analytics.text import T25_REF_SOURCE, t25_lm_familiarity

    rows = t25_lm_familiarity(spark, SF_SMOKE).collect()
    best = max(rows, key=lambda r: r["fam_ppm"])
    assert best["source"] == T25_REF_SOURCE
    # and every source's audit is internally consistent
    for r in rows:
        assert 0 <= r["n_low_quality"] <= r["n_docs"]
        assert r["fam_ppm"] == r["fam_sum"] // r["n_bigrams"]
