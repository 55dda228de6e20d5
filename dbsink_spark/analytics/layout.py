"""Physical-layout utilities: bucketed tables for co-located joins and
salted aggregation for skewed keys.

These are the two layout levers SCALE.md leans on:

* **Bucketing** — persisting both sides of a recurring fact-fact join
  bucketed by the join key turns every subsequent join into a
  co-located (zero-Exchange) sort-merge join. Verified by test: the
  bucketed join plan contains no shuffle.
* **Salting** — a hot group key (one chatty device, one dominant
  event type) concentrates a shuffle partition. Salted aggregation
  splits each key into N subkeys for the partial aggregate, then
  reduces the N partials — same result, bounded partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
) -> None:
    """Persist as a bucketed managed table (co-located join layout)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    out: str = "total",
) -> DataFrame:
    """Two-phase salted aggregation: groupBy (key, salt) partial sums,
    then groupBy key to reduce the partials. Identical result to a
    direct groupBy-sum; partition size bounded by 1/n_salts per key."""
    return (
        _salted_partials(df, key, value, n_salts)
        .groupBy(key)
        .agg(F.sum("__partial").alias(out))
    )


def _salted_partials(
    df: DataFrame, key: str, value: str, n_salts: int
) -> DataFrame:
    """Phase one of salted_sum, exposed for skew tests: (key, __salt)
    partial sums with a row count per partial — the group sizes here
    ARE the reduce-task loads the salt exists to bound."""
    salt = (F.rand(seed=7) * n_salts).cast("int")
    return (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value).alias("__partial"), F.count(F.lit(1)).alias("__rows"))
    )
