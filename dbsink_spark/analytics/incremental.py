"""Incremental near-dup detection against a persisted signature store.

d03 answers "which pairs in THIS corpus are near-dups" — a full
self-join. Production pipelines don't re-run that daily: they keep the
MinHash signature lake and check each NEW batch against history (and
itself), then append the batch's signatures. That makes daily dedup
cost ∝ batch × collision-fanout, not corpus², and the store grows by
exactly the batch.

Store layout: parquet partitioned by ``band_id`` (the join key's
leading column), rows = (doc_id, band_id, bucket) band rows plus a
sibling ``shingles`` store of (doc_id, shh, n_sh) for exact-Jaccard
verification of candidates. The band join against history reads only
matching partitions; the verify join-back fetches shingle rows for
candidate doc_ids only.

Equivalence guarantee (tested): after processing a batch, pairs found
== the full-corpus d03 pairs that involve at least one batch doc.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import _verify_jaccard, banded_sigs, hash_docs

BANDS_DIR = "bands"
SHINGLES_DIR = "shingles"


def init_store(spark: SparkSession, path: str) -> None:
    """Create an empty signature store (no-op if present)."""
    os.makedirs(path, exist_ok=True)


def _store_paths(path: str) -> tuple[str, str]:
    return os.path.join(path, BANDS_DIR), os.path.join(path, SHINGLES_DIR)


def append_batch(spark: SparkSession, path: str, docs: DataFrame) -> None:
    """Hash a (doc_id, text, source) batch and append its signatures."""
    bands_path, sh_path = _store_paths(path)
    hashed = hash_docs(docs).persist()
    banded_sigs(hashed, bucket_cap=None).write.mode("append").partitionBy("band_id").parquet(bands_path)
    hashed.select("doc_id", "shh", "n_sh").write.mode("append").parquet(sh_path)
    hashed.unpersist()


def incremental_near_dups(
    spark: SparkSession, path: str, new_docs: DataFrame, append: bool = True
) -> DataFrame:
    """Find near-dup pairs of ``new_docs`` against the store AND within
    the batch, exact-Jaccard verified; optionally append the batch's
    signatures afterwards (the daily-ingest flow).

    Output pairs always order doc_a < doc_b, matching d03. The band
    join's left side is the (small) batch — broadcast — so history is
    only scanned, never shuffled; the verify join-back touches shingle
    rows for candidate doc_ids only.
    """
    bands_path, sh_path = _store_paths(path)
    hashed = hash_docs(new_docs).persist()
    new_banded = banded_sigs(hashed, bucket_cap=None).persist()

    have_history = os.path.isdir(bands_path) and any(
        not p.startswith("_") for p in os.listdir(bands_path)
    )
    if have_history:
        all_banded = spark.read.parquet(bands_path).unionByName(new_banded)
        all_shingles = spark.read.parquet(sh_path).unionByName(
            hashed.select("doc_id", "shh", "n_sh")
        )
    else:
        all_banded = new_banded
        all_shingles = hashed.select("doc_id", "shh", "n_sh")

    n = F.broadcast(new_banded).alias("n")
    h = all_banded.alias("h")
    cand = (
        h.join(
            n,
            (F.col("h.band_id") == F.col("n.band_id"))
            & (F.col("h.bucket") == F.col("n.bucket"))
            & (F.col("h.doc_id") != F.col("n.doc_id")),
        )
        .select(
            F.least(F.col("h.doc_id"), F.col("n.doc_id")).alias("doc_a"),
            F.greatest(F.col("h.doc_id"), F.col("n.doc_id")).alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    pairs = _verify_jaccard(cand, all_shingles)
    out = pairs.persist()
    out.count()  # materialize before mutating the store
    if append:
        append_batch(spark, path, new_docs)
    hashed.unpersist()
    return out
