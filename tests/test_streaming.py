"""Streaming tests: file-based stream through the full pipeline
(source → transform → foreachBatch → DuckDB upsert) and stateful
operator semantics — no Kafka broker needed."""

import json
import time

import duckdb

from conftest import fixture_path

from dbsink_spark.mappings import resolve
from dbsink_spark.sink import SinkWriter, duckdb_connect_factory
from dbsink_spark.sources import file_stream
from dbsink_spark.streaming import run_stream, streaming_dedup, tumbling_aggregate


def test_stream_end_to_end(spark, tmp_path):
    # stage the fixture as JSONL (key, value) stream input
    indir = tmp_path / "in"
    indir.mkdir()
    with open(fixture_path("replayer.json")) as f:
        messages = json.load(f)
    with open(indir / "batch0.json", "w") as f:
        for m in messages:
            f.write(json.dumps({"key": "k", "value": json.dumps(m)}) + "\n")

    mapping = resolve("GenericFloat", "stream-topic")
    db = str(tmp_path / "stream.duckdb")
    writer = SinkWriter(mapping, duckdb_connect_factory(db), dialect="duckdb")
    writer.ensure_table(drop=True)

    q = run_stream(
        file_stream(spark, str(indir)),
        mapping,
        writer,
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    con = duckdb.connect(db)
    n = con.execute(f'SELECT count(*) FROM "{mapping.table}"').fetchone()[0]
    con.close()
    assert n == 4

    # second stream over the same checkpoint: no reprocessing
    q2 = run_stream(
        file_stream(spark, str(indir)),
        mapping,
        writer,
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q2.awaitTermination(120)
    con = duckdb.connect(db)
    n2 = con.execute(f'SELECT count(*) FROM "{mapping.table}"').fetchone()[0]
    con.close()
    assert n2 == 4


def test_streaming_dedup_semantics(spark):
    # batch-mode check of the dedup operator's plan semantics
    from datetime import datetime

    df = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 1, 0, 0, 0), 1),
            ("u1", datetime(2024, 1, 1, 0, 1, 0), 2),
            ("u2", datetime(2024, 1, 1, 0, 2, 0), 3),
        ],
        ["uid", "time", "n"],
    )
    out = streaming_dedup(df, ["uid"], "time", "10 minutes").collect()
    assert len(out) == 2


def test_tumbling_aggregate_semantics(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 10)),
            ("a", datetime(2024, 1, 1, 0, 50)),
            ("a", datetime(2024, 1, 1, 1, 10)),
            ("b", datetime(2024, 1, 1, 0, 20)),
        ],
        ["event_type", "ts"],
    )
    out = tumbling_aggregate(df, "ts", "1 hour", ["event_type"]).collect()
    got = {(r.window_start.hour, r.event_type): r.n_events for r in out}
    assert got == {(0, "a"): 2, (1, "a"): 1, (0, "b"): 1}


def test_lake_sink_partitioned(spark, tmp_path):
    """Typed stream → date-partitioned parquet lake, with pruning."""
    import os

    from dbsink_spark.lake import foreach_batch_lake
    from dbsink_spark.mappings import resolve

    indir = tmp_path / "in2"
    indir.mkdir()
    with open(fixture_path("replayer.json")) as f:
        messages = json.load(f)
    with open(indir / "b0.json", "w") as f:
        for m in messages:
            f.write(json.dumps({"key": "k", "value": json.dumps(m)}) + "\n")

    lake = str(tmp_path / "lake")
    mapping = resolve("GenericFloat", "t")
    from dbsink_spark.streaming.pipeline import listen_transform

    q = listen_transform(
        file_stream(spark, str(indir)),
        mapping,
        foreach_batch_lake(lake),
        checkpoint=str(tmp_path / "ckpt2"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    parts = [p for p in os.listdir(lake) if p.startswith("ingest_date=")]
    assert parts == ["ingest_date=2019-05-07"]
    back = spark.read.parquet(lake)
    assert back.count() == 4
    # partition pruning: date filter reads only the matching folder
    pruned = back.filter(back.ingest_date == "2019-05-07")
    assert pruned.count() == 4
