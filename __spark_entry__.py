"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``dbsink_spark.analytics`` for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dbsink_spark import analytics


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001.

    Pulled from ALL_QUERIES: q01 demoted out of the 50-row driver gate
    in the round-10 rotation but stays the smoke-run flagship.
    """
    return analytics.ALL_QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(analytics.ORACLE)
