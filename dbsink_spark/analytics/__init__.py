"""Analytics operator library: registry of (query, oracle) pairs.

``QUERIES`` maps name -> (spark, sf_dir) -> DataFrame.
``ORACLE`` maps name -> equivalent DuckDB SQL (omitted for operators
whose semantics aren't SQL-expressible; the driver then records a
rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import advanced, dedup, multimodal, relational, similarity, stats, text

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _mod in (relational, advanced, stats, text, dedup, similarity, multimodal):
    QUERIES.update(_mod.QUERIES)
    ORACLE.update(_mod.ORACLE)



def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every harness table as a temp view — the engine's SQL
    front door (`analytics.sql`)."""
    from .tables import TABLE_NAMES, load

    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI SQL string against the registered tables (plans
    through the same Catalyst pipeline as the DataFrame API)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
