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
