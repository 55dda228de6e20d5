"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) is modeled as a ``binary`` column plus a JSON
metadata column — the pattern a 100 TB training-data pipeline uses:
parquet carries the bytes, Spark moves them by reference, and all
decode / feature-extraction happens in Arrow-batched ``mapInPandas``
UDFs at the executors.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_image``/``decode_audio`` raise
``NotImplementedError``, and the tested path uses
``fake_decode_features`` — a deterministic byte-level featurizer whose
results the DuckDB oracle can verify (length, md5-derived content
hash, fixed-size frame count). The Spark-side plumbing — schema,
binary handling, Arrow batch shape, partition parallelism — is real.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import h64_sql
from .tables import Tables

FRAME_BYTES = 256  # fake "frame" granularity for frame-sampling stub


def decode_image(data: bytes):  # pragma: no cover - stub
    """Decode an image payload to HxWxC pixels. STUB: requires an image
    codec library not present in this environment."""
    raise NotImplementedError("image decoding requires an image codec library")


def decode_audio(data: bytes):  # pragma: no cover - stub
    """Decode an audio payload to PCM samples. STUB: see decode_image."""
    raise NotImplementedError("audio decoding requires an audio codec library")


def fake_decode_features(data: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a media featurizer: (n_bytes,
    content_hash, n_frames). Byte-level only, so it runs anywhere and
    is oracle-verifiable."""
    n_bytes = len(data)
    content_hash = int(hashlib.md5(data).hexdigest()[:15], 16)
    n_frames = math.ceil(n_bytes / FRAME_BYTES) if n_bytes else 0
    return n_bytes, content_hash, n_frames


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one Arrow batch in, one feature frame out."""
    for pdf in batches:
        feats = [fake_decode_features(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [f[0] for f in feats],
                "content_hash": [f[1] for f in feats],
                "n_frames": [f[2] for f in feats],
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table shape from documents: binary payload
    + JSON metadata column (what a real ingest would carry)."""
    d = Tables(spark, sf_dir).documents
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.to_json(F.struct("source", "lang", "n_chars")).alias("meta"),
    )


def m01_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column featurization via Arrow-batched mapInPandas.

    The stub featurizer is byte-deterministic, so the oracle verifies
    the full plumbing (binary encode → Arrow transfer → python decode →
    typed result) value-for-value.
    """
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "blob").mapInPandas(_featurize_batches, FEATURES_SCHEMA)


def m02_media_meta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join extracted features back to parsed metadata — the typed-
    metadata half of the multimodal model (JSON → typed columns)."""
    media = media_table(spark, sf_dir)
    feats = m01_media_features(spark, sf_dir)
    meta = media.select(
        "doc_id",
        F.get_json_object("meta", "$.source").alias("source"),
        F.get_json_object("meta", "$.n_chars").cast("long").alias("n_chars"),
    )
    return (
        feats.join(meta, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_frames").alias("total_frames"),
            F.sum((F.col("n_bytes") == F.col("n_chars")).cast("int")).alias("n_len_match"),
        )
        .orderBy("source")
    )


ORACLE: dict[str, str] = {
    "m01_media_features": f"""
        SELECT doc_id,
               octet_length(text::BLOB)                       AS n_bytes,
               {h64_sql('text')}                              AS content_hash,
               CASE WHEN octet_length(text::BLOB) = 0 THEN 0
                    ELSE ceil(octet_length(text::BLOB) / {FRAME_BYTES}.0)::BIGINT END AS n_frames
        FROM documents
    """,
    "m02_media_meta_join": f"""
        SELECT source,
               count(*)                 AS n_media,
               sum(octet_length(text::BLOB))  AS total_bytes,
               sum(CASE WHEN octet_length(text::BLOB) = 0 THEN 0
                        ELSE ceil(octet_length(text::BLOB) / {FRAME_BYTES}.0)::BIGINT END) AS total_frames,
               sum((octet_length(text::BLOB) = n_chars)::INT) AS n_len_match
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
}

QUERIES = {
    "m01_media_features": m01_media_features,
    "m02_media_meta_join": m02_media_meta_join,
}


FRAME_SAMPLE_EVERY = 2

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_hash", T.LongType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: chunk each blob into FRAME_BYTES frames and
    keep every FRAME_SAMPLE_EVERY-th one (video frame-sampling shape)."""
    rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_hash": []}
    for pdf in batches:
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            for i in range(0, (len(blob) + FRAME_BYTES - 1) // FRAME_BYTES, FRAME_SAMPLE_EVERY):
                chunk = blob[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i)
                rows["frame_len"].append(len(chunk))
                rows["frame_hash"].append(int(hashlib.md5(chunk).hexdigest()[:15], 16))
        yield pd.DataFrame(rows)
        rows = {k: [] for k in rows}


def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over binary media: every 2nd fixed-size frame per
    payload, with per-frame hash — the video-sampling plumbing (decode
    stubbed; chunking/batching/schema real and oracle-verified)."""
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "blob").mapInPandas(_frame_batches, FRAMES_SCHEMA)


ORACLE["m03_frame_sample"] = f"""
    WITH frames AS (
        SELECT doc_id, i.i AS frame_idx,
               substring(text, i.i * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS chunk
        FROM documents
        CROSS JOIN (SELECT unnest(generate_series(0, 4000)) AS i) i
        WHERE i.i * {FRAME_BYTES} < length(text)
          AND i.i % {FRAME_SAMPLE_EVERY} = 0
    )
    SELECT doc_id, frame_idx,
           length(chunk)::BIGINT AS frame_len,
           {h64_sql('chunk')}    AS frame_hash
    FROM frames
"""

QUERIES["m03_frame_sample"] = m03_frame_sample
