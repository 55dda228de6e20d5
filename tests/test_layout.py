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
