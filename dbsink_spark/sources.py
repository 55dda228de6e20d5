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
