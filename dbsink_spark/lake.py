"""Data-lake sink: partitioned parquet landing for the 100 TB path.

The reference only ever sinks to Postgres. At 100 TB the raw/typed
stream lands in object storage first (parquet partitioned by event
date + source), and the database holds only serving-layer rollups.
This module is that landing writer — usable both as a batch write and
inside ``foreachBatch``.

Partitioning contract: date-partition on the mapping's time column
(daily folders → partition pruning for every time-ranged query) plus an
optional low-cardinality secondary key (source/topic). Writer uses
dynamic partition overwrite so replaying a day is idempotent at the
partition level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_partition_cols(df: DataFrame, ts_col: str = "time") -> DataFrame:
    return df.withColumn("ingest_date", F.col(ts_col).cast("date"))


def write_lake(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("ingest_date",),
    mode: str = "append",
    coalesce_files: int | None = None,
) -> None:
    """Write a typed batch to the lake.

    ``coalesce_files`` bounds files-per-partition (small-file control:
    a micro-batch writing 32 shuffle partitions × N date partitions
    would otherwise emit 32·N tiny files).
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if coalesce_files:
        df = df.coalesce(coalesce_files)
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def foreach_batch_lake(path: str, ts_col: str = "time", coalesce_files: int = 4):
    """foreachBatch adapter: stream → partitioned lake."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        write_lake(
            with_partition_cols(batch_df, ts_col),
            path,
            coalesce_files=coalesce_files,
        )

    return fn
