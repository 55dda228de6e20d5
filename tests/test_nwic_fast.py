"""NwicFloatReportsFast (all-JVM path) must agree with the exact
Python path row-for-row on the reference's 516-row health_and_status
golden fixture (reference tests/test_dbsink.py:79-119), modulo the
documented payload rendering difference."""

import json

import pytest
from conftest import fixture_path

from dbsink_spark.mappings import resolve
from dbsink_spark.sources import replay_source


def _rowkey(r):
    return (r["uid"], r["time"], r["lat"], r["lon"])


def test_fast_matches_exact_on_health_and_status(spark):
    df = replay_source(spark, fixture_path("health_and_status.json"))
    exact = resolve("NwicFloatReports", "t").transform(df).collect()
    fast = resolve("NwicFloatReportsFast", "t").transform(df).collect()
    assert len(exact) == len(fast) == 516

    for e, f in zip(sorted(exact, key=_rowkey), sorted(fast, key=_rowkey)):
        for col in ("uid", "gid", "time", "reftime", "lat", "lon", "z", "geom"):
            assert e[col] == f[col], col
        assert e["values"] == f["values"], (e["uid"], e["time"])
        assert json.loads(e["payload"]) == json.loads(f["payload"])


def test_fast_reproduces_reference_goldens(spark):
    """The reference's own golden assertions (test_dbsink.py:90-119)
    hold against the FAST path directly."""
    df = replay_source(spark, fixture_path("health_and_status.json"))
    rows = (
        resolve("NwicFloatReportsFast", "t")
        .transform(df)
        .orderBy("time", "uid")
        .collect()
    )
    m1 = next(r for r in rows if r["uid"] == "300434063547170" and r["lat"] == 32.704426)
    assert m1["lon"] == -117.23662
    assert m1["values"]["values_status_ts"] == "1559335190"
    assert m1["values"]["headers_iridium_ts"] == "1559335196"
    assert m1["values"]["headers_location_latitude_degrees"] == "32"
    assert m1["values"]["headers_location_longitude_degrees"] == "-117"
    assert m1["values"]["values_latitude"] == "32.704426"
    assert m1["values"]["values_longitude"] == "-117.23662"
    assert m1["values"]["values_misc_speed"] == "2.72"
    assert m1["values"]["values_misc_test_num"] == "T240"
    assert m1["values"]["mfr"] == "usna"

    m2 = next(r for r in rows if r["uid"] == "300434063946390" and r["lat"] == 39.01338)
    assert m2["lon"] == -75.47597
    assert "values_latitude" not in m2["values"]
    assert m2["values"]["values_longitude"] is None  # null vs absent
    assert m2["values"]["values_misc_speed"] == "0.01"


def test_fast_date_filter(spark):
    from datetime import datetime, timezone

    df = replay_source(spark, fixture_path("health_and_status.json"))
    m = resolve(
        "NwicFloatReportsFast",
        "t",
        filters={"start_date": datetime(2030, 1, 1, tzinfo=timezone.utc)},
    )
    assert m.transform(df).count() == 0


def test_fast_poison_messages_drop(spark):
    """Rows the exact path dead-letters (missing headers the convert
    indexes unconditionally) are filtered, not nulled through."""
    good = json.dumps(
        {
            "headers": {
                "imei": 1,
                "iridium_ts": 1559335196,
                "location": {
                    "latitude": {"degrees": 10, "minutes": 30.0},
                    "longitude": {"degrees": 20, "minutes": 30.0},
                },
            },
            "values": {"status_ts": 1559335190},
        }
    )
    missing_loc = json.dumps({"headers": {"imei": 2, "iridium_ts": 1559335196}})
    df = spark.createDataFrame(
        [("k", good), ("k", missing_loc), ("k", "{not json")], ["key", "value"]
    )
    rows = resolve("NwicFloatReportsFast", "t").transform(df).collect()
    assert len(rows) == 1 and rows[0]["uid"] == "1"
    assert rows[0]["lat"] == 10.5 and rows[0]["lon"] == 20.5


@pytest.mark.parametrize(
    "token,expect",
    [
        ("6.70", "6.7"),
        ("0.00", "0.0"),
        ("42", "42"),
        ("-0", "0"),
        ("T240", "T240"),
        ("true", "True"),
        ("false", "False"),
        ("NaN", "nan"),
        ("12345678.9", "12345678.9"),  # passthrough window (Java would E-notate)
    ],
)
def test_render_token_matches_python_str(spark, token, expect):
    from pyspark.sql import functions as F

    from dbsink_spark.mappings.nwic_fast import _render_token

    df = spark.createDataFrame([(token,)], ["s"])
    got = df.select(_render_token(F.col("s")).alias("r")).collect()[0]["r"]
    assert got == expect
