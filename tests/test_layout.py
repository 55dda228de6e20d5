"""Plan-level tests for the physical-layout utilities: bucketed joins
must be shuffle-free, salted aggregation must match direct results."""

import pytest

from pyspark.sql import functions as F

from dbsink_spark.analytics.layout import n_exchanges, salted_sum, write_bucketed
from dbsink_spark.analytics.tables import load

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_colocated(spark, tmp_path):
    # warehouse dir is a static conf, set at session creation (conftest)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")

    li = load(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(o, "o_b", "o_orderkey", 8)

    joined_bucketed = spark.table("li_b").join(
        spark.table("o_b"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    joined_plain = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))

    assert n_exchanges(joined_bucketed) == 0  # co-located: no shuffle
    assert n_exchanges(joined_plain) >= 1  # plain join shuffles both sides

    # same results either way
    assert joined_bucketed.count() == joined_plain.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_sum_matches_direct(spark):
    e = load(spark, SF, "events")
    direct = {
        r["event_type"]: r["total"]
        for r in e.groupBy("event_type")
        .agg(F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    salted = {
        r["event_type"]: round(r["total"], 4)
        for r in salted_sum(e, "event_type", "value", n_salts=8).collect()
    }
    assert set(direct) == set(salted)
    for k in direct:
        assert abs(direct[k] - salted[k]) < 1e-6


def test_zorder_lake_tight_on_both_dims(spark, tmp_path):
    """Z-order-clustered files must have per-file min/max envelopes
    that are tight on BOTH dimensions — the property that makes footer
    pruning work for predicates on either column. A single-column sort
    would leave the other dimension's envelope at ~100% of the global
    range per file."""
    import glob

    from dbsink_spark.lake import zorder_lake

    e = load(spark, SF, "events").select(
        "user_id", F.unix_timestamp("ts").cast("long").alias("s")
    )
    path = str(tmp_path / "zlake")
    zorder_lake(e, path, ("user_id", "s"), n_files=16)

    files = glob.glob(path + "/*.parquet")
    assert len(files) > 4

    import duckdb

    con = duckdb.connect()
    n, u_frac, s_frac = con.execute(
        f"""
        WITH per AS (
            SELECT filename,
                   min(user_id) a0, max(user_id) a1, min(s) b0, max(s) b1
            FROM read_parquet('{path}/*.parquet', filename=true) GROUP BY 1
        ), g AS (
            SELECT min(a0) ga0, max(a1) ga1, min(b0) gb0, max(b1) gb1 FROM per
        )
        SELECT count(*),
               avg((a1 - a0) / (ga1 - ga0 + 1.0)),
               avg((b1 - b0) / (gb1 - gb0 + 1.0))
        FROM per CROSS JOIN g
        """
    ).fetchone()
    # every file covers a bounded fraction of BOTH dims (empirically
    # ~0.3-0.4 at 16 files; 0.7 is a loose regression bound)
    assert u_frac < 0.7, u_frac
    assert s_frac < 0.7, s_frac

    # round-trip: no rows lost by the clustered rewrite
    assert spark.read.parquet(path).count() == e.count()


def test_salted_agg_bounds_hot_key_partitions(spark):
    """Skew-proofing (round-5): one key carrying 50% of all rows must
    shatter across salts so no single reduce group holds more than a
    small multiple of hot_rows/n_salts — the property that keeps
    max-partition bytes bounded at 100 TB. The direct groupBy would
    put all 50k hot rows in ONE group."""
    from dbsink_spark.analytics.layout import _salted_partials, salted_sum

    n_salts = 16
    hot = spark.range(50_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    cold = spark.range(50_000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.lit(1.0).alias("v"),
    )
    df = hot.unionAll(cold)

    parts = _salted_partials(df, "k", "v", n_salts).collect()
    hot_groups = [r["__rows"] for r in parts if r["k"] == "hot"]
    assert len(hot_groups) == n_salts  # every salt bucket materialized
    # bound: no group holds more than 2x the perfect 1/n_salts share
    assert max(hot_groups) <= 2 * (50_000 // n_salts), max(hot_groups)
    assert sum(hot_groups) == 50_000

    # and the salted total still equals the direct aggregate
    direct = {
        r["k"]: round(r["t"], 6)
        for r in df.groupBy("k").agg(F.round(F.sum("v"), 6).alias("t")).collect()
    }
    salted = {
        r["k"]: round(r["total"], 6)
        for r in salted_sum(df, "k", "v", n_salts=n_salts).collect()
    }
    assert direct == salted


def test_aqe_splits_skewed_fact_fact_join(spark):
    """AQE skew-join handling (round-5): a fact-fact sort-merge join
    whose probe side has one key at ~50% of rows must be re-planned at
    runtime with the skewed partition split (the executed adaptive
    plan marks the join skew=true). This is the runtime safety net for
    joins we cannot pre-salt."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # thresholds scaled down so harness-sized data exhibits the
        # 100 TB behavior: any post-shuffle partition over 64 KiB and
        # 2x the median is "skewed" and gets split
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        pad = "x" * 64
        fact_a = spark.range(40_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload_a"),
        )
        fact_b = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"),
            F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload_b"),
        )
        # bare join, driven through ITS OWN queryExecution: AQE only
        # splits skewed partitions when no parent operator requires the
        # join's output distribution (an agg on top suppresses the
        # rewrite), and a noop write would execute a separate plan.
        joined = fact_a.join(fact_b, "k")
        rows = joined.collect()
        assert len(rows) == 80_000  # hot key 7: 20k x 2 matches
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
