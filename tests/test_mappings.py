"""Mapping golden tests: reference fixtures through the Spark
transform (mapInPandas), asserted against the reference's golden
values (tests/test_dbsink.py:24-397,876-975).
"""

import json
from datetime import datetime, timezone

import pytest

from conftest import fixture_path

from dbsink_spark.mappings import resolve
from dbsink_spark.sources import replay_source


def run_mapping(spark, lookup, fixture, topic="topic", **kwargs):
    mapping = resolve(lookup, topic, **kwargs)
    df = replay_source(spark, fixture_path(fixture))
    rows = mapping.transform(df).collect()
    return mapping, rows


def by_id(rows):
    # transform output order is partition-dependent; reference goldens
    # are input-ordered, so tests sort by a stable content key
    return rows


def test_ncreplayer(spark):
    _, rows = run_mapping(spark, "GenericFloat", "replayer.json", "axds-netcdf-replayer-data")
    assert len(rows) == 4
    for r in rows:
        assert r["time"] == r["reftime"]  # reftime defaults to time


def test_mission_sensors(spark):
    _, rows = run_mapping(spark, "NwicFloatReports", "mission_sensors.json", "oot.reports.mission_sensors")
    assert len(rows) == 10


def test_environmental(spark):
    _, rows = run_mapping(spark, "NwicFloatReports", "environmental.json", "oot.reports.environmental")
    assert len(rows) == 10


def test_null_infinity_jsonmap(spark):
    _, rows = run_mapping(spark, "JsonMap", "null_infinity.json", "whatever")
    assert len(rows) == 2
    for r in rows:
        assert json.loads(r["payload"])["bus_voltage"] is None


def test_health_and_status_goldens(spark):
    _, rows = run_mapping(spark, "NwicFloatReports", "health_and_status.json", "foo")
    assert len(rows) == 516

    rows_sorted = sorted(rows, key=lambda r: (r["time"], r["uid"]))
    m1 = next(r for r in rows if r["uid"] == "300434063547170" and r["lat"] == 32.704426)
    assert m1["lon"] == -117.23662
    assert m1["time"] == datetime(2019, 5, 31, 20, 39, 50)
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
    assert m2["time"] == datetime(2019, 6, 6, 18, 19, 56)
    assert "status_ts" not in m2["values"]
    assert m2["values"]["headers_iridium_ts"] == "1559845196"
    assert m2["values"]["headers_location_latitude_degrees"] == "39"
    assert m2["values"]["headers_location_longitude_degrees"] == "-76"
    assert "latitude" not in m2["values"]
    assert m2["values"]["values_longitude"] is None
    assert m2["values"]["values_misc_speed"] == "0.01"
    assert m2["values"]["values_misc_test_num"] == "T76"
    assert m2["values"]["mfr"] == "usna"


def test_numurus_status(spark):
    _, rows = run_mapping(spark, "NumurusStatus", "numurus.status.json")
    assert len(rows) == 87
    # a 91 latitude trips the bad-location flag
    bad = [r for r in rows if r["lat"] == 91]
    assert bad and all(r["values"]["location_quality"] == "4" for r in bad)


def test_numurus_data_goldens(spark):
    _, rows = run_mapping(spark, "NumurusData", "numurus.data.json")
    assert len(rows) == 8
    m = next(r for r in rows if r["lat"] == 47.550865)
    assert m["lon"] == -122.377328
    assert m["values"]["data_segment_data_0"] == "33"
    assert m["values"]["data_segment_data"] == "[33, 1, 1, 1, 0, 0, 0, 0, 0]"


def test_numurus_data_filter_dates(spark):
    _, rows = run_mapping(
        spark,
        "NumurusData",
        "numurus.data.json",
        filters={
            "start_date": datetime(2019, 7, 18, 15, tzinfo=timezone.utc),
            "end_date": datetime(2019, 7, 18, 16, tzinfo=timezone.utc),
        },
    )
    assert len(rows) == 2


def test_arete_data_goldens(spark):
    _, rows = run_mapping(spark, "AreteData", "arete_data.json")
    assert len(rows) == 137
    lats = {r["lat"] for r in rows}
    for expect in (38.859378814697266, 32.70533, 532.6271, 32.627373, 32.62755):
        assert expect in lats
    bad = next(r for r in rows if r["lat"] == 532.6271)
    assert bad["lon"] == -117.89201
    assert bad["values"]["location_quality"] == "4"
    good = next(r for r in rows if r["lat"] == 32.70533)
    assert good["lon"] == -117.23613
    assert good["values"]["mfr"] == "arete"


def test_arete_data_filter_dates(spark):
    _, rows = run_mapping(
        spark,
        "AreteData",
        "arete_data.json",
        filters={"start_date": datetime(2019, 8, 9, 0, tzinfo=timezone.utc)},
    )
    assert len(rows) == 14


def test_just_json_payload_golden(spark):
    _, rows = run_mapping(spark, "JsonMap", "mission_sensors.json")
    assert len(rows) == 10
    payloads = [json.loads(r["payload"]) for r in rows]
    golden = {
        "cdr_reference": -5699810423388316158,
        "headers": {
            "imei": -1556323178,
            "iridium_ts": 1558640014,
            "sbd_session_status": "PROTOCOL_ANOMALY",
            "mo_msn": -725951606,
            "mt_msn": -419825455,
            "location": {
                "cep_radius": 158880407,
                "latitude": {"degrees": 34, "minutes": 0.803512},
                "longitude": {"degrees": -118, "minutes": 0.3486771},
            },
        },
        "values": {
            "mission_ts": 1194313350,
            "rf_ais_decoded_rssi": 1825254200,
            "misc": None,
        },
        "mfr": "Numerus",
    }
    assert golden in payloads


def test_geography_fixtures(spark):
    for fixture, expected in (
        ("driftworker-traj-ind.json", 10),
        ("driftworker-traj-multi.json", 1),
        ("driftworker-envelopes.json", 4),
        ("scuttle-watch-regions.json", 6),
    ):
        _, rows = run_mapping(spark, "GenericGeography", fixture)
        assert len(rows) == expected, fixture


def test_geography_scuttle_goldens(spark):
    _, rows = run_mapping(spark, "GenericGeography", "scuttle-watch-regions.json")
    uids = {r["uid"] for r in rows}
    assert {"Keepin Hi", "Keepin HiHi", "Keepin Med"} <= uids
    t = datetime(2019, 9, 6, 0, 0, 0)
    for uid in ("Keepin Hi", "Keepin HiHi", "Keepin Med"):
        r = next(x for x in rows if x["uid"] == uid)
        assert r["time"] == t
        assert r["gid"] is None  # omitted → DB default applies at sink
    med = next(x for x in rows if x["uid"] == "Keepin Med")
    assert med["values"] == {}


def test_sofar_goldens(spark):
    _, rows = run_mapping(spark, "NwicFloatReportsSofar", "sofar.json", "sofar.data")
    assert len(rows) == 146
    m = next(r for r in rows if r["uid"] == "0199" and r["lat"] == 2.66157)
    assert m["time"] == datetime(2019, 4, 1, 6, 33, 31)
    assert m["lon"] == -149.43383
    for k, v in {
        "significantWaveHeight": "2.19",
        "peakPeriod": "9.3",
        "meanPeriod": "7.76",
        "peakDirection": "85.2",
        "peakDirectionalSpread": "38.29",
        "meanDirection": "72.57",
        "meanDirectionalSpread": "58.01",
    }.items():
        assert m["values"][k] == v
    payload = json.loads(m["payload"])
    assert payload == {
        "significantWaveHeight": 2.19,
        "peakPeriod": 9.3,
        "meanPeriod": 7.76,
        "peakDirection": 85.2,
        "peakDirectionalSpread": 38.29,
        "meanDirection": 72.57,
        "meanDirectionalSpread": 58.01,
        "timestamp": "2019-04-01T06:33:31.000Z",
        "latitude": 2.66157,
        "longitude": -149.43383,
        "spotterId": "SPOT-0199",
    }


def test_string_json_expansion_goldens(spark):
    _, rows = run_mapping(spark, "NwicFloatReports", "h_a_s_with_gps_points.json", "foo")
    assert len(rows) == 50
    with_move = [
        r
        for r in rows
        if r["values"].get("values_misc_detection_results_correlated_movement")
    ]
    assert with_move
    r0 = with_move[0]
    assert r0["values"]["values_misc_detection_results_correlated_movement"] == "False"
    pts_rows = [r for r in rows if "values_misc_points" in r["values"]]
    assert pts_rows
    pts = [[1569230478.0 + 300 * i, 29.2534, -90.6609] for i in range(9)]
    r16 = pts_rows[0]
    assert r16["values"]["values_misc_points"] == str(pts)
    assert r16["values"]["values_misc_points_0"] == str(pts[0])
    assert r16["values"]["values_misc_points_0_0"] == str(1569230478.0)
    assert r16["values"]["values_misc_points_8_2"] == str(-90.6609)


def test_statistics_goldens(spark):
    _, rows = run_mapping(spark, "GenericFieldStatistic", "statistics.json")
    assert len(rows) == 4
    golden_values = {
        "Analysis_1": 10,
        "Analysis_2": 20,
        "Analysis_3": 30,
        "Analysis_4": 40,
        "Field_A": 50,
        "Field_B": 60,
        "Field_C": 70,
        "Field_D": 80,
    }
    monthly = next(r for r in rows if r["period"] == "monthly")
    assert monthly["source"] == "gom-02-combined"
    assert monthly["starting"] == datetime(2020, 1, 1)
    assert monthly["ending"] == datetime(2020, 2, 1)
    assert json.loads(monthly["values"]) == golden_values
    instant = next(r for r in rows if r["period"] == "instant")
    assert instant["starting"] == instant["ending"] == datetime(2020, 1, 1)


def test_base64_images_passthrough(spark):
    _, rows = run_mapping(spark, "JsonMap", "base64_images.json")
    assert len(rows) >= 1
    for r in rows:
        assert json.loads(r["payload"])  # decodes cleanly


def test_error_rows_dead_letter(spark):
    mapping = resolve("GenericFloat", "t")
    df = spark.createDataFrame(
        [
            ("k1", '{"no_time": 1}'),
            ("k2", '{"time": "2020-01-01T00:00:00Z", "lat": 1.5, "lon": 2.5, "values": {}}'),
        ],
        ["key", "value"],
    )
    kept = mapping.transform(df).collect()
    assert len(kept) == 1 and kept[0]["lat"] == 1.5
    with_errors = mapping.transform(df, errors="keep").collect()
    assert len(with_errors) == 2
    errs = [r for r in with_errors if r["_error"] is not None]
    assert len(errs) == 1 and "KeyError" in errs[0]["_error"]
