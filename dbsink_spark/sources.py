"""Message sources: bounded JSON-array replay and the Kafka stream.

The reference has two entry modes sharing one transform (reference
dbsink/listen.py:137-186): a Kafka consume loop and a ``--datafile``
JSON-array replay (listen.py:173-177). Here both produce the same
(key, value) DataFrame shape — ``replay_source`` a batch DataFrame,
``kafka_stream`` a streaming one — and both feed the identical
``Mapping.transform``; batch/stream symmetry is structural, not
duplicated code.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import get_codec

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
    ]
)


def replay_source(
    spark: SparkSession, datafile: str, packing: str = "json", **codec_kwargs
) -> DataFrame:
    """Bounded replay of a JSON-array file through the wire codec.

    Each element is round-tripped through the codec — pack to wire
    bytes, unpack back (simulating the wire exactly as the reference
    consume loop does: pack on produce, unpack on receive —
    listen.py:173-177, utils.py:42-49) — then carried as a canonical
    JSON string ``value`` column for the mapping transform. Binary
    packings (msgpack, avro) are therefore exercised losslessly rather
    than mangled into a unicode column. Small files load driver-side;
    at scale point ``spark.read.json`` at a directory of JSONL instead.
    """
    codec = get_codec(packing, **codec_kwargs)
    with open(datafile) as f:
        messages = json.load(f)
    rows = []
    for m in messages:
        unpacked = codec.unpack(codec.pack(m))
        rows.append((None, json.dumps(unpacked, default=_wire_default)))
    return spark.createDataFrame(rows, KV_SCHEMA)


def _wire_default(o):
    """JSON fallback for wire-only types (msgpack tuples arrive as
    tuples already handled by json; bytes become latin-1 strings)."""
    if isinstance(o, (bytes, bytearray)):
        return o.decode("latin-1")
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def jsonl_source(spark: SparkSession, path: str) -> DataFrame:
    """Scale-path bounded source: JSONL files, one message per line;
    the whole line becomes the value column (decode happens in the
    mapping transform)."""
    return spark.read.text(path).select(
        F.lit(None).cast("string").alias("key"), F.col("value")
    )


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    offset: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Structured Streaming Kafka source → (key, value) string columns.

    Replaces the reference consumer loop (dbsink/utils.py:17-51,
    listen.py:178-186): consumer-group offset tracking becomes the
    checkpoint location (set on the writer), ``earliest``/``latest``
    map to startingOffsets, and per-trigger admission control bounds
    micro-batch size at scale.
    """
    offset = {"earliest": "earliest", "largest": "latest", "latest": "latest"}.get(
        offset, offset
    )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", offset)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    df = reader.load()
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "partition",
        "offset",
    )


def file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based streaming source with the same (key, value) shape —
    used to exercise the full streaming pipeline without a broker."""
    return spark.readStream.schema(KV_SCHEMA).json(path)


def dbapi_table_source(
    spark: SparkSession,
    db_path: str,
    table: str,
    split_col: str,
    n_splits: int = 8,
    columns: list[str] | None = None,
    predicate: str | None = None,
) -> DataFrame:
    """Federated partitioned read of a DuckDB table — the JDBC-style
    ``partitionColumn/numPartitions`` source pattern for a DBAPI
    database the sink writes (round-trip: what this engine sinks it
    can also scan back distributed).

    Split planning is driver-side and tiny (one min/max query); each
    Spark task then opens its OWN read-only connection and pulls ONLY
    its ``split_col`` range via Arrow — so extraction parallelism is
    ``n_splits`` and no single process ever materializes the table.
    ``columns`` prunes projection and ``predicate`` pushes a WHERE
    clause INTO the database per split: filter + projection run where
    the data lives, the classic federation pushdown.

    Ranges use integer-floor boundaries (lo + i·width) with the last
    split unbounded above, so every row lands in exactly one split
    regardless of gaps/skew in the key. At 100 TB-lake scale the same
    shape fans out over table SHARDS; per-split DBAPI connections are
    the bottleneck a real warehouse replaces with its bulk-unload API.

    Security note: ``table`` / ``split_col`` / ``columns`` are
    interpolated identifiers and ``predicate`` is raw SQL — callers
    own them (library-internal contract, same as the sink's DDL).
    """
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        lo, hi = con.execute(
            f"SELECT min({split_col}), max({split_col}) FROM {table}"
            + (f" WHERE {predicate}" if predicate else "")
        ).fetchone()
        probe_cols = "*" if columns is None else ", ".join(columns)
        schema_df = con.execute(
            f"SELECT {probe_cols} FROM {table} LIMIT 0"
        ).arrow()
    finally:
        con.close()

    empty = lo is None
    arrow_schema = schema_df.schema
    spark_schema = ", ".join(
        f"{f.name} {_duck_to_spark_type(f.type)}" for f in arrow_schema
    )
    if empty:
        return spark.createDataFrame([], spark_schema)

    # Bounds stay INTEGRAL end to end (int64 columns, upper bound of
    # the last split is hi+1 — never a float, never NULL): shipping
    # bounds as doubles silently corrupts keys beyond 2^53, duplicating
    # or dropping boundary rows.
    lo, hi = int(lo), int(hi)
    width = max(1, (hi - lo) // n_splits + 1)
    bounds = [
        (lo + i * width, min(lo + (i + 1) * width, hi + 1))
        for i in range(n_splits)
        if lo + i * width <= hi
    ]

    def read_split(batches):
        import duckdb as _d

        for pdf in batches:
            for s_lo, s_hi in zip(pdf["s_lo"], pdf["s_hi"]):
                where = (
                    f"WHERE {split_col} >= {int(s_lo)}"
                    f" AND {split_col} < {int(s_hi)}"
                    + (f" AND ({predicate})" if predicate else "")
                )
                c = _d.connect(db_path, read_only=True)
                try:
                    yield c.execute(
                        f"SELECT {probe_cols} FROM {table} {where}"
                    ).df()
                finally:
                    c.close()

    splits = spark.createDataFrame(
        bounds, "s_lo long, s_hi long"
    ).repartition(max(1, len(bounds)))
    return splits.mapInPandas(read_split, spark_schema)


def _duck_to_spark_type(t) -> str:
    # mirror what duckdb's .df() hands the Arrow batch (DECIMAL →
    # float64, UBIGINT → uint64 → needs decimal(20,0) to not overflow
    # long); an unmapped type would crash Arrow serialization, so
    # anything unknown raises instead of silently claiming "string"
    import pyarrow as pa

    if pa.types.is_uint64(t):
        return "decimal(20,0)"
    if pa.types.is_int64(t) or pa.types.is_uint32(t):
        return "long"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t) or pa.types.is_floating(t):
        return "double"  # duckdb .df() renders DECIMAL as float64
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    raise TypeError(f"dbapi_table_source: unsupported column type {t}")
