"""Persisted incremental-ingest dedup index — the end-to-end
"ingest day N+1" composition (VERDICT_r08 #8a): d20's per-batch
decision logic over a PERSISTED index lake, with an append path
mirroring ``ann_index``'s frozen-codebook append.

Layout under an index root (all parquet):

* ``hashes/``    — ``(h, keeper)``: one row per corpus content hash,
  keeper = smallest doc_id carrying it (d20's ``oldmin`` relation,
  persisted).
* ``bands/``     — ``(doc_id, band_id, bucket)`` partitioned by
  ``band_id``: the LSH band rows of every indexed doc (d20's
  ``bands_old``, persisted). The per-batch band join reads only the
  band partitions — at 100 TB this is the "persisted band index" the
  d20 docstring promises, so an arriving batch NEVER re-shingles or
  re-bands the corpus.
* ``shingles/``  — ``(doc_id, shh)``: hashed shingle arrays for the
  exact-Jaccard verify join-back (only candidate-matched index docs
  are ever read — the join prunes by doc_id).

Semantics are d20's EXACTLY (same cascade, same priorities, same
match_id rule); ``tests/test_ingest.py`` pins ``ingest_batch`` ==
``d20_incremental_dedup`` on the identical corpus/batch split, and the
two-batch sequencing law (keep/discard partition and match ids are
one-shot-equivalent; only the corpus/batch LABEL flips for matches
that cross a batch boundary — a doc indexed by an earlier batch IS
corpus to a later one).

Append policy: a processed batch's EXACT-STAGE SURVIVORS (hash unseen
AND batch-min for their hash) enter the index — including docs the
near stage then discards. That is deliberate: d20's one-shot semantics
band exact-survivors (``bands_new``), so appending the same set is
what makes sequential ingestion equal one-shot processing. A pipeline
wanting keeps-only indexing filters the append set; the sequencing
law above then weakens (near-dups of discarded docs resurface).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h64
from .dedup import (
    JACCARD_THRESHOLD,
    _verify_jaccard,
    banded_sigs,
    cap_band_rows,
    hash_docs,
)

HASHES_DIR = "hashes"
BANDS_DIR = "bands"
SHINGLES_DIR = "shingles"


def _hash_rows(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", h64(F.col("text")).alias("h"))


def build_dedup_index(spark: SparkSession, path: str, docs: DataFrame) -> None:
    """Index the day-N corpus: ``docs`` is any (doc_id, source, text)
    relation. One pass computes the hash-keeper relation; one pass
    shingles/bands (docs under 3 words hash but never band — d20's
    rule, inherited from ``hash_docs``)."""
    _hash_rows(docs).groupBy("h").agg(F.min("doc_id").alias("keeper")).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, HASHES_DIR))
    hd = hash_docs(docs).persist()
    # never cap an incremental band STORE (dedup._CAP_UNSET note):
    # occupancy counts would be per-build, not cumulative
    banded_sigs(hd, bucket_cap=None).write.mode("overwrite").partitionBy(
        "band_id"
    ).parquet(os.path.join(path, BANDS_DIR))
    hd.select("doc_id", "shh").write.mode("overwrite").parquet(
        os.path.join(path, SHINGLES_DIR)
    )
    hd.unpersist()


def ingest_batch(
    spark: SparkSession, path: str, batch: DataFrame, *, append: bool = True
) -> DataFrame:
    """Decide every batch doc against the index (and the batch itself)
    and — unless ``append=False`` — grow the index by the batch's
    exact-stage survivors. Returns (doc_id, decision, match_id) with
    d20's exact cascade.

    Cost shape per batch: the corpus is touched ONLY through (a) the
    hash relation (equi-join on h), (b) band partitions sharing a
    bucket with the batch (equi-join on band_id+bucket), and (c) the
    shingle arrays of candidate-matched docs (equi-join on doc_id) —
    batch-sided throughout, never corpus x corpus.
    """
    idx_hashes = spark.read.parquet(os.path.join(path, HASHES_DIR))
    hashed_new = _hash_rows(batch)
    newmin = hashed_new.groupBy("h").agg(F.min("doc_id").alias("batch_min"))
    # localCheckpoint (not persist) is load-bearing on every frame the
    # APPEND phase reuses: appending to hashes/ re-resolves that
    # parquet relation, so a cached-plan miss would silently recompute
    # survivors against the ALREADY-UPDATED index (observed: empty
    # band/shingle appends). Checkpointing truncates the lineage to
    # the index paths entirely.
    ex = (
        hashed_new.join(idx_hashes.withColumnRenamed("keeper", "corpus_match"), "h", "left")
        .join(newmin, "h")
        .select("doc_id", "corpus_match", "batch_min")
    ).localCheckpoint()

    survivors = ex.filter(
        F.col("corpus_match").isNull() & (F.col("batch_min") == F.col("doc_id"))
    ).select("doc_id")
    hd_new = hash_docs(batch).join(survivors, "doc_id", "semi").localCheckpoint()
    # the STORE stays uncapped (occupancy must be cumulative, never
    # per-batch); the QUERY side applies the module's LSH skew guard —
    # over the accumulated index relation and within the batch — so
    # ingest semantics track d20's under any LSH_BUCKET_CAP setting
    # (review finding)
    bands_new = banded_sigs(hd_new, bucket_cap=None).localCheckpoint()
    bands_new_q = cap_band_rows(bands_new)
    idx_bands = cap_band_rows(spark.read.parquet(os.path.join(path, BANDS_DIR)))

    bn, bo = bands_new_q.alias("bn"), idx_bands.alias("bo")
    cand_oc = (
        bn.join(
            bo,
            (F.col("bn.band_id") == F.col("bo.band_id"))
            & (F.col("bn.bucket") == F.col("bo.bucket")),
        )
        .select(F.col("bo.doc_id").alias("doc_a"), F.col("bn.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("src", F.lit("corpus"))
    )
    b1, b2 = bands_new_q.alias("b1"), bands_new_q.alias("b2")
    cand_nn = (
        b1.join(
            b2,
            (F.col("b1.band_id") == F.col("b2.band_id"))
            & (F.col("b1.bucket") == F.col("b2.bucket"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("b1.doc_id").alias("doc_a"), F.col("b2.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("src", F.lit("batch"))
    )
    cand = cand_oc.unionByName(cand_nn)
    idx_shingles = spark.read.parquet(os.path.join(path, SHINGLES_DIR))
    ver_docs = idx_shingles.unionByName(hd_new.select("doc_id", "shh"))
    ver = _verify_jaccard(cand.select("doc_a", "doc_b"), ver_docs).join(
        cand, ["doc_a", "doc_b"]
    )
    near = ver.groupBy("doc_b").agg(
        F.min(F.when(F.col("src") == "corpus", F.col("doc_a"))).alias("near_corpus"),
        F.min(F.when(F.col("src") == "batch", F.col("doc_a"))).alias("near_batch"),
    )

    full = ex.join(near, ex.doc_id == near.doc_b, "left").drop("doc_b")
    decision = (
        F.when(F.col("corpus_match").isNotNull(), F.lit("exact_dup_corpus"))
        .when(F.col("batch_min") < F.col("doc_id"), F.lit("exact_dup_batch"))
        .when(F.col("near_corpus").isNotNull(), F.lit("near_dup_corpus"))
        .when(F.col("near_batch").isNotNull(), F.lit("near_dup_batch"))
        .otherwise(F.lit("keep"))
    )
    match_id = (
        F.when(F.col("corpus_match").isNotNull(), F.col("corpus_match"))
        .when(F.col("batch_min") < F.col("doc_id"), F.col("batch_min"))
        .when(F.col("near_corpus").isNotNull(), F.col("near_corpus"))
        .when(F.col("near_batch").isNotNull(), F.col("near_batch"))
    )
    out = full.select(
        "doc_id", decision.alias("decision"), match_id.alias("match_id")
    ).orderBy("doc_id")
    # decisions must be FINAL before the index mutates (the append
    # below changes the very relations the plan reads)
    out = out.localCheckpoint()

    if append:
        surv_hashes = (
            hashed_new.join(survivors, "doc_id", "semi")
            .select(F.col("h"), F.col("doc_id").alias("keeper"))
        ).localCheckpoint()  # before the first append mutates hashes/
        surv_hashes.write.mode("append").parquet(os.path.join(path, HASHES_DIR))
        bands_new.write.mode("append").partitionBy("band_id").parquet(
            os.path.join(path, BANDS_DIR)
        )
        hd_new.select("doc_id", "shh").write.mode("append").parquet(
            os.path.join(path, SHINGLES_DIR)
        )
    return out


__all__ = [
    "BANDS_DIR",
    "HASHES_DIR",
    "SHINGLES_DIR",
    "JACCARD_THRESHOLD",
    "build_dedup_index",
    "ingest_batch",
]
