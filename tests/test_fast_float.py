"""GenericFloatFast (all-JVM path) must agree with the exact Python
path on the canonical fixture, modulo the documented payload rendering
difference."""

import json

from conftest import fixture_path

from dbsink_spark.mappings import resolve
from dbsink_spark.sources import replay_source


def test_fast_matches_exact_on_replayer(spark):
    df = replay_source(spark, fixture_path("replayer.json"))
    exact = resolve("GenericFloat", "t").transform(df).collect()
    fast = resolve("GenericFloatFast", "t").transform(df).collect()
    assert len(exact) == len(fast) == 4

    key = lambda r: (r["lat"], r["lon"])
    for e, f in zip(sorted(exact, key=key), sorted(fast, key=key)):
        for col in ("uid", "gid", "time", "reftime", "lat", "lon", "z", "geom"):
            assert e[col] == f[col], col
        assert e["values"] == f["values"]
        assert json.loads(e["payload"]) == json.loads(f["payload"])


def test_fast_date_filter(spark):
    from datetime import datetime, timezone

    df = replay_source(spark, fixture_path("replayer.json"))
    m = resolve(
        "GenericFloatFast",
        "t",
        filters={"start_date": datetime(2030, 1, 1, tzinfo=timezone.utc)},
    )
    assert m.transform(df).count() == 0


def test_fast_poison_messages_drop(spark):
    m = resolve("GenericFloatFast", "t")
    df = spark.createDataFrame(
        [("k", "{not json"), ("k", '{"time": "x-invalid", "lat": 1.0, "lon": 2.0}'),
         ("k", '{"time": "2020-01-01T00:00:00", "lat": 1.5, "lon": 2.5}')],
        ["key", "value"],
    )
    rows = m.transform(df).collect()
    assert len(rows) == 1 and rows[0]["lat"] == 1.5


def test_listen_transform_library_api(spark, tmp_path):
    """The no-database library surface: user callback per micro-batch."""
    indir = tmp_path / "in"
    indir.mkdir()
    with open(fixture_path("replayer.json")) as f:
        messages = json.load(f)
    with open(indir / "b0.json", "w") as f:
        for msg in messages:
            f.write(json.dumps({"key": "k", "value": json.dumps(msg)}) + "\n")

    from dbsink_spark.sources import file_stream
    from dbsink_spark.streaming import listen_transform

    got = []

    def on_batch(bdf, bid):
        got.extend(bdf.collect())

    q = listen_transform(
        file_stream(spark, str(indir)),
        resolve("GenericFloat", "t"),
        on_batch,
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert len(got) == 4
    assert {r["uid"] for r in got} == {"1"}
