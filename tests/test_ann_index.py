"""Persisted IVF index: incremental-build equivalence, exact query
parity vs a python reference, and disk-level partition pruning."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from dbsink_spark.analytics import ann_index
from dbsink_spark.analytics.similarity import N_QUERIES, _vectors

SF_DIR = "/root/testdata/sf0.001"


def _corpus_and_queries(spark):
    v = _vectors(spark, SF_DIR)
    corpus = v.filter(F.col("vec_id") >= N_QUERIES).select("vec_id", "label", "v")
    queries = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return corpus, queries


def _py_reference(corpus_rows, centroid_rows, query_rows, topk, n_probe):
    """Sequential-fold python twin of the ivf_query plan."""

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    cells = {}
    for r in corpus_rows:
        best = min(centroid_rows, key=lambda c: (d2(r["v"], c["cv"]), c["cent_label"]))
        cells.setdefault(best["cent_label"], []).append(r)

    out = []
    for q in query_rows:
        probed = sorted(
            centroid_rows, key=lambda c: (d2(q["qv"], c["cv"]), c["cent_label"])
        )[:n_probe]
        cand = [r for c in probed for r in cells.get(c["cent_label"], [])]
        qn = math.sqrt(dot(q["qv"], q["qv"]))
        scored = [
            (r["vec_id"], dot(q["qv"], r["v"]) / (qn * math.sqrt(dot(r["v"], r["v"]))))
            for r in cand
        ]
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (cid, cos) in enumerate(scored[:topk], start=1):
            out.append((q["query_id"], cid, round(cos, 4), rank))
    return sorted(out)


def test_ivf_query_matches_python_reference(spark, tmp_path):
    corpus, queries = _corpus_and_queries(spark)
    path = str(tmp_path / "ivf")
    ann_index.build_index(spark, path, corpus)

    got = sorted(
        tuple(r) for r in ann_index.ivf_query(spark, path, queries).collect()
    )
    cent = spark.read.parquet(os.path.join(path, ann_index.CENTROIDS_DIR)).collect()
    expect = _py_reference(
        corpus.collect(), cent, queries.collect(), ann_index.TOPK, ann_index.N_PROBE
    )
    assert got == expect
    assert len({q for q, *_ in got}) == N_QUERIES


def test_incremental_append_equals_bulk_build(spark, tmp_path):
    corpus, queries = _corpus_and_queries(spark)
    bulk, inc = str(tmp_path / "bulk"), str(tmp_path / "inc")

    ann_index.build_index(spark, bulk, corpus)

    # incremental: train codebook on the FIRST batch, append the second
    # against the frozen codebook — then re-point the bulk index's
    # codebook so both stores quantize identically (retrain parity is
    # the codebook owner's job, not the store's)
    first = corpus.filter(F.col("vec_id") % 2 == 0)
    second = corpus.filter(F.col("vec_id") % 2 == 1)
    ann_index.build_index(spark, inc, first)
    # freeze: overwrite inc's codebook with bulk's (same training data
    # would normally guarantee this; here batches differ so we pin it)
    spark.read.parquet(os.path.join(bulk, ann_index.CENTROIDS_DIR)).write.mode(
        "overwrite"
    ).parquet(os.path.join(inc, ann_index.CENTROIDS_DIR))
    # re-land first batch under the pinned codebook, then append second
    cent = spark.read.parquet(os.path.join(inc, ann_index.CENTROIDS_DIR))
    ann_index.assign_cells(first, cent).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(inc, ann_index.VECTORS_DIR))
    ann_index.append_vectors(spark, inc, second)

    got_bulk = sorted(tuple(r) for r in ann_index.ivf_query(spark, bulk, queries).collect())
    got_inc = sorted(tuple(r) for r in ann_index.ivf_query(spark, inc, queries).collect())
    assert got_bulk == got_inc


def test_probe_reads_only_probed_partitions(spark, tmp_path):
    corpus, queries = _corpus_and_queries(spark)
    path = str(tmp_path / "ivf")
    ann_index.build_index(spark, path, corpus)

    one_query = queries.limit(1)
    df = ann_index.ivf_query(spark, path, one_query)
    df.collect()

    vec_root = os.path.join(path, ann_index.VECTORS_DIR)
    all_cells = {d for d in os.listdir(vec_root) if d.startswith("cell=")}
    assert len(all_cells) > ann_index.N_PROBE, "corpus must span more cells than probes"

    # disk-level pruning shows up as a PartitionFilters IN-list on the
    # index FileScan (inputFiles() reports the pre-pruning relation, so
    # the physical plan is the authoritative witness)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan, plan
    pf = plan[plan.index("PartitionFilters:") :].splitlines()[0]
    assert "cell#" in pf and ("IN" in pf or "in(" in pf.lower()), pf


def test_retrain_equals_bulk_rebuild(spark, tmp_path):
    """retrain-in-place == bulk rebuild from the current corpus with
    the same one-Lloyd-step codebook: identical centroids, identical
    per-cell membership, identical query answers."""
    corpus, queries = _corpus_and_queries(spark)
    half = corpus.filter(F.col("vec_id") % 2 == 0)
    rest = corpus.filter(F.col("vec_id") % 2 == 1)

    store = str(tmp_path / "store")
    ann_index.build_index(spark, store, half)
    ann_index.append_vectors(spark, store, rest)  # codebook now stale

    # bulk twin: fresh store sharing the retrain's codebook definition
    pre = spark.read.parquet(os.path.join(store, ann_index.VECTORS_DIR))
    twin_cent = ann_index._cell_centroids(pre)
    twin = str(tmp_path / "twin")
    twin_cent.write.parquet(os.path.join(twin, ann_index.CENTROIDS_DIR))
    ann_index.assign_cells(
        pre.select("vec_id", "v"),
        spark.read.parquet(os.path.join(twin, ann_index.CENTROIDS_DIR)),
    ).write.partitionBy("cell").parquet(os.path.join(twin, ann_index.VECTORS_DIR))

    ann_index.retrain_index(spark, store)

    for sub in (ann_index.CENTROIDS_DIR,):
        a = sorted(
            (r["cent_label"], tuple(r["cv"]))
            for r in spark.read.parquet(os.path.join(store, sub)).collect()
        )
        b = sorted(
            (r["cent_label"], tuple(r["cv"]))
            for r in spark.read.parquet(os.path.join(twin, sub)).collect()
        )
        assert a == b
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(os.path.join(store, ann_index.VECTORS_DIR)).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in spark.read.parquet(os.path.join(twin, ann_index.VECTORS_DIR)).collect()
    )
    assert a == b

    qa = ann_index.ivf_query(spark, store, queries).collect()
    qb = ann_index.ivf_query(spark, twin, queries).collect()
    assert [tuple(r) for r in qa] == [tuple(r) for r in qb]


def test_compact_reduces_files_and_preserves_answers(spark, tmp_path):
    """After N appends each cell dir holds N+ files; compaction brings
    every cell to one file and leaves query answers untouched."""
    corpus, queries = _corpus_and_queries(spark)
    store = str(tmp_path / "store")
    thirds = [corpus.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    ann_index.build_index(spark, store, thirds[0])
    for part in thirds[1:]:
        ann_index.append_vectors(spark, store, part)

    def files_per_cell():
        vdir = os.path.join(store, ann_index.VECTORS_DIR)
        out = {}
        for d in os.listdir(vdir):
            if d.startswith("cell="):
                out[d] = len(
                    [f for f in os.listdir(os.path.join(vdir, d)) if f.endswith(".parquet")]
                )
        return out

    before_answers = [tuple(r) for r in ann_index.ivf_query(spark, store, queries).collect()]
    assert any(n > 1 for n in files_per_cell().values())

    ann_index.compact_index(spark, store)
    after = files_per_cell()
    assert after and all(n == 1 for n in after.values()), after
    after_answers = [tuple(r) for r in ann_index.ivf_query(spark, store, queries).collect()]
    assert after_answers == before_answers


def _py_maxsim_reference(corpus_rows, centroid_rows, query_rows, topk, n_probe):
    """Sequential-fold python twin of maxsim_query (VERDICT_r07 #8):
    IVF probe (as in _py_reference) + the late-interaction MaxSim
    score with the exact left-association of _maxsim_score."""
    from dbsink_spark.analytics.similarity import S11_DSUB, S11_SUBS

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def subs(v):
        return [
            v[i * S11_DSUB : (i + 1) * S11_DSUB] for i in range(S11_SUBS)
        ]

    def maxsim(qv, cv):
        qs, cs = subs(qv), subs(cv)
        qn = [math.sqrt(dot(s, s)) for s in qs]
        cn = [math.sqrt(dot(s, s)) for s in cs]
        score = None
        for i in range(S11_SUBS):
            m = max(dot(qs[i], cs[j]) / (qn[i] * cn[j]) for j in range(S11_SUBS))
            score = m if score is None else score + m
        return score

    cells = {}
    for r in corpus_rows:
        best = min(
            centroid_rows, key=lambda c: (d2(r["v"], c["cv"]), c["cent_label"])
        )
        cells.setdefault(best["cent_label"], []).append(r)

    out = []
    for q in query_rows:
        probed = sorted(
            centroid_rows, key=lambda c: (d2(q["qv"], c["cv"]), c["cent_label"])
        )[:n_probe]
        scored = [
            (r["vec_id"], c["cent_label"], maxsim(q["qv"], r["v"]))
            for c in probed
            for r in cells.get(c["cent_label"], [])
        ]
        scored.sort(key=lambda t: (-t[2], t[0]))
        for rank, (cid, cell, s) in enumerate(scored[:topk], start=1):
            out.append((q["query_id"], cid, cell, round(s, 4), rank))
    return sorted(out)


def test_maxsim_query_matches_python_reference(spark, tmp_path):
    corpus, queries = _corpus_and_queries(spark)
    path = str(tmp_path / "ivf_ms")
    ann_index.build_index(spark, path, corpus)
    got = sorted(
        tuple(r) for r in ann_index.maxsim_query(spark, path, queries).collect()
    )
    cent = spark.read.parquet(os.path.join(path, ann_index.CENTROIDS_DIR)).collect()
    expect = _py_maxsim_reference(
        corpus.collect(), cent, queries.collect(), ann_index.TOPK, 2
    )
    assert got == expect
    assert len({q for q, *_ in got}) == N_QUERIES


def test_maxsim_query_incremental_append_equals_bulk(spark, tmp_path):
    """The lake-resident two-stage retrieval must answer identically
    from a bulk-built store and from a build+append store sharing the
    same frozen codebook — appends cannot move any MaxSim answer."""
    corpus, queries = _corpus_and_queries(spark)
    bulk, inc = str(tmp_path / "bulk_ms"), str(tmp_path / "inc_ms")

    ann_index.build_index(spark, bulk, corpus)
    first = corpus.filter(F.col("vec_id") % 2 == 0)
    second = corpus.filter(F.col("vec_id") % 2 == 1)
    ann_index.build_index(spark, inc, first)
    spark.read.parquet(os.path.join(bulk, ann_index.CENTROIDS_DIR)).write.mode(
        "overwrite"
    ).parquet(os.path.join(inc, ann_index.CENTROIDS_DIR))
    cent = spark.read.parquet(os.path.join(inc, ann_index.CENTROIDS_DIR))
    ann_index.assign_cells(first, cent).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(os.path.join(inc, ann_index.VECTORS_DIR))
    ann_index.append_vectors(spark, inc, second)

    got_bulk = sorted(
        tuple(r) for r in ann_index.maxsim_query(spark, bulk, queries).collect()
    )
    got_inc = sorted(
        tuple(r) for r in ann_index.maxsim_query(spark, inc, queries).collect()
    )
    assert got_bulk == got_inc and got_bulk
