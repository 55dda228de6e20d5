"""Test-table loader for the TPC-H-ish harness tables.

Tables (one parquet each): region nation customer supplier part orders
lineitem events documents embeddings. Loaded lazily; Catalyst handles
column pruning + predicate pushdown into the parquet scans, so loading
"the whole table" here costs nothing until an action runs.
"""

from __future__ import annotations

import os

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

# (session id, path, mtime) -> parquet schema. Schema INFERENCE
# (footer read + merge) cost ~100 ms of driver time per `read.parquet`
# call on this host vs ~20-30 ms with an explicit schema — at ~3 table
# loads per timed query run that was tens of seconds per full bench
# pass spent re-deriving byte-identical schemas (r12, guide §6:
# metadata work is driver-side and repeated; a real lake solves this
# with catalog/manifest metadata, which this loader stands in for).
# ONLY the schema is cached: every load still creates a FRESH Dataset
# (self-joins of a table need distinct dataset ids — a shared
# DataFrame object made q78's planner flag an ambiguous self join)
# and every action lists, plans, and reads the parquet itself, so no
# result or data is ever reused across runs. Keyed on (session,
# mtime) so a new session or a rewritten dataset (fuzz harness temp
# dirs, regenerated testdata) re-infers.
_SCHEMA_CACHE: dict[tuple[int, str, float], object] = {}

# sessions whose UTC pin has been applied (py4j conf round trips are
# ~0.5 ms each; two per load added up across a bench pass)
_TZ_PINNED: set[int] = set()


def _read(spark: SparkSession, path: str) -> DataFrame:
    try:
        key = (id(spark), path, os.path.getmtime(path))
    except OSError:
        return spark.read.parquet(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # defensively pin UTC: the harness may hand us a session without it,
    # and every timestamp-rendering query (date_format/date_trunc)
    # assumes UTC to match the DuckDB oracle
    if id(spark) not in _TZ_PINNED:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _TZ_PINNED.add(id(spark))
    if name == "events":
        # Harness generations have shipped events.ts as either
        # TIMESTAMP(NANOS) (which Spark's parquet reader rejects — read
        # nanos as long, truncate to micros) or plain TIMESTAMP(MICROS)
        # (read as-is, like every other table). Branch on the actual
        # file schema so both generations load.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read(spark, f"{sf_dir}/{name}.parquet")
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
    return _read(spark, f"{sf_dir}/{name}.parquet")


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
