"""Test-table loader for the TPC-H-ish harness tables.

Tables (one parquet each): region nation customer supplier part orders
lineitem events documents embeddings. Loaded lazily; Catalyst handles
column pruning + predicate pushdown into the parquet scans, so loading
"the whole table" here costs nothing until an action runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # defensively pin UTC: the harness may hand us a session without it,
    # and every timestamp-rendering query (date_format/date_trunc)
    # assumes UTC to match the DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Harness generations have shipped events.ts as either
        # TIMESTAMP(NANOS) (which Spark's parquet reader rejects — read
        # nanos as long, truncate to micros) or plain TIMESTAMP(MICROS)
        # (read as-is, like every other table). Branch on the actual
        # file schema so both generations load.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integral div, not float /: nanos exceed double's 53-bit
            # exact integer range, so float division drifts the
            # microsecond value by ±1 — exact truncation matches
            # DuckDB's TIMESTAMP_NS cast
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # tz-naive micros generation: normalize to TIMESTAMP_LTZ
            # (session tz is pinned UTC above, so wall-clock values are
            # unchanged) — downstream queries cast ts to epoch seconds /
            # BIGINT, which Spark only allows on LTZ timestamps
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


class Tables:
    """Lazy namespace: ``Tables(spark, sf_dir).lineitem`` etc."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = load(self._spark, self._sf_dir, name)
        return self._cache[name]
