"""NwicFloatReportsFast: the all-JVM fast path for the highest-volume
vendor mapping (reference dbsink/tables.py:584-654; goldens reference
tests/test_dbsink.py:79-119, 516-row health_and_status fixture).

Where NwicFloatReports runs the row-exact Python ``convert`` in
``mapInPandas`` (recursive flatten + best-timestamp cascade + deg+min
fallback coords), this mapping is pure column expressions over the
topic's FIXED wire schema — zero Python in the hot path.

Honest throughput note (bench.py extras.nwic_transform_100k): on
local[32] with cached input and a noop sink, EXECUTION of this path
matches the Arrow/mapInPandas path (~1.0-1.1x) on these ~800-byte
messages, after round 6 made the key-presence parses LAZY (presence
is only consulted when a parsed field is NULL, so each block's key
parse runs only for rows with a NULL in that block) and folded entry
inclusion into a nullable key (one filter pass, no struct rebuild) —
round 5's 0.5x came from five unconditional Jackson passes per row.
The path's remaining fixed cost is PLAN construction+analysis
(~1.4 s for the wide expression tree vs ~0.4 s for the exact path),
paid once per query/stream, not per batch — the bench records it
separately (extras.*_plan_sec). Beyond the microbench the case at
scale is structural: no Python worker pool (executor
memory/stability), no Arrow hop, and the transform fuses into the
streaming/scan stage as plain Catalyst expressions instead of a
mapInPandas barrier that blocks pushdown.

Matches the exact path row-for-row on the 516-row reference golden
fixture (pytest-asserted) with one documented divergence shared with
GenericFloatFast: ``payload`` carries the raw message text rather than
a ``json.dumps`` re-render (spacing/ordering may differ;
JSON-semantically identical, asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import location_quality, point_wkt
from .vendors import NwicFloatReports

# The health_and_status wire schema is fixed (verified over all 516
# fixture messages): nested headers/location deg+min blocks, typed
# values block, string-valued misc map. environmental_ts/mission_ts
# are included so the best-timestamp cascade covers sibling NWIC
# topics that share the headers block.
NWIC_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("cdr_reference", T.LongType()),
        T.StructField(
            "headers",
            T.StructType(
                [
                    T.StructField("imei", T.LongType()),
                    T.StructField("iridium_ts", T.LongType()),
                    T.StructField("sbd_session_status", T.StringType()),
                    T.StructField("mo_msn", T.LongType()),
                    T.StructField("mt_msn", T.LongType()),
                    T.StructField(
                        "location",
                        T.StructType(
                            [
                                T.StructField("cep_radius", T.LongType()),
                                T.StructField(
                                    "latitude",
                                    T.StructType(
                                        [
                                            T.StructField("degrees", T.LongType()),
                                            T.StructField("minutes", T.DoubleType()),
                                        ]
                                    ),
                                ),
                                T.StructField(
                                    "longitude",
                                    T.StructType(
                                        [
                                            T.StructField("degrees", T.LongType()),
                                            T.StructField("minutes", T.DoubleType()),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        T.StructField(
            "values",
            T.StructType(
                [
                    T.StructField("status_ts", T.LongType()),
                    T.StructField("environmental_ts", T.DoubleType()),
                    T.StructField("mission_ts", T.DoubleType()),
                    T.StructField("system_status", T.StringType()),
                    T.StructField("latitude", T.DoubleType()),
                    T.StructField("longitude", T.DoubleType()),
                    T.StructField("heading", T.DoubleType()),
                    T.StructField("battery_level", T.DoubleType()),
                    T.StructField("bus_voltage", T.DoubleType()),
                    T.StructField("operating_temp", T.DoubleType()),
                    T.StructField("charge_rate", T.DoubleType()),
                    T.StructField("sw_rev", T.StringType()),
                    T.StructField("geofence_config_index", T.LongType()),
                    T.StructField("misc", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
        T.StructField("mfr", T.StringType()),
    ]
)

# make_valid_string's scrub patterns translated to Java regex. The
# reference's junk pattern (dbsink/tables.py:22-23) is a Python class
# "[\\u[0-9A-Fa-f]]" whose inner '[' is a literal class member; Java
# would parse an unescaped inner '[' as a nested class UNION, so it
# must be escaped to keep the quirk-exact semantics. The control class
# covers x00-x1f, backslash and double-quote; x80 is scrubbed by a
# third replace, mirroring make_valid_string's replace chain.
_CTRL_JAVA = "[\\x00-\\x1f\\\\\"]"
_JUNK_JAVA = "[\\\\u\\[0-9A-Fa-f]]"
_X80_JAVA = "[\\x80]"


def _scrub_str(c: Column) -> Column:
    """JVM twin of make_valid_string for string inputs."""
    out = F.regexp_replace(c, _CTRL_JAVA, "")
    out = F.regexp_replace(out, _JUNK_JAVA, "")
    return F.regexp_replace(out, _X80_JAVA, "")


# flatten auto-decodes stringified scalars (expand_stringified →
# json.loads: "6.70" becomes float 6.7, rendered str(6.7) == "6.7").
# JVM twin: canonical integer text IS Python's str(int) (passthrough);
# decimal/exponent tokens re-render through a double cast ONLY in the
# magnitude window where Java Double.toString and Python repr agree
# (|x| == 0 or 1e-3 <= |x| < 1e7 — outside it Java goes E-notation at
# 1e7 where Python holds decimal until 1e16, so the raw token, which
# is already Python-canonical for every observed producer, is kept).
# JSON literals map to their Python str() forms. Residual divergence
# (non-canonical tokens outside the window, stringified containers
# that flatten would expand in place) is documented; none occur in the
# golden fixture.
_INT_RE = "^-?(0|[1-9][0-9]*)$"
_NUM_RE = "^-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def _render_token(c: Column) -> Column:
    d = c.cast("double")
    safe = (d == 0.0) | ((F.abs(d) >= 1e-3) & (F.abs(d) < 1e7))
    return (
        F.when(c == "-0", F.lit("0"))
        .when(c.rlike(_INT_RE), c)
        .when(c.rlike(_NUM_RE) & safe, d.cast("string"))
        .when(c == "true", F.lit("True"))
        .when(c == "false", F.lit("False"))
        .when(c == "null", F.lit(None).cast("string"))
        .when(c == "NaN", F.lit("nan"))
        .when(c == "Infinity", F.lit("inf"))
        .when(c == "-Infinity", F.lit("-inf"))
        .otherwise(_scrub_str(c))
    )


class NwicFloatReportsFast(NwicFloatReports):
    """All-JVM column-expression twin of NwicFloatReports for the
    health_and_status topic's fixed wire schema — ``from_json`` decode,
    presence-aware flatten (a missing key and an explicit JSON null are
    distinguished via ``json_object_keys``, matching the Python
    flatten), best-timestamp cascade, deg+min fallback coords, QARTOD
    flag."""

    lookup = "NwicFloatReportsFast"

    def transform(self, df: DataFrame, errors: str = "drop") -> DataFrame:
        # Stage 1 materializes the parse ONCE behind a GENERATOR
        # barrier: CollapseProject/PushDownPredicates substitute plain
        # projection aliases into every downstream reference (the
        # collapsed plan carried 53 copies of from_json — measured 4.8x
        # slower than the Python path it was meant to beat), but
        # neither rule rewrites through a Generate, so explode(array(
        # struct(...))) pins from_json to one evaluation per row;
        # downstream references are cheap struct-field extractions.
        staged1 = df.select(
            "value",
            F.explode(
                F.array(F.from_json(F.col("value"), NWIC_WIRE_SCHEMA))
            ).alias("j"),
        )
        j = F.col("j")
        _hd = j["headers"]
        _vs = j["values"]

        # Stage 2: the key-presence parses, LAZILY guarded. Presence
        # (missing key vs explicit JSON null) is only ever consulted
        # when the parsed field is NULL — a non-null field proves its
        # key existed — so each json_object_keys pass runs only for
        # rows with at least one NULL in that block. On the dominant
        # fully-populated message shape the whole transform costs
        # exactly ONE Jackson pass (the from_json above); the eager
        # version's 5 unconditional passes measured 0.5x the Python
        # exact path (round-5 verdict) — this shape measures >1x.
        def _any_null(*cols: Column) -> Column:
            out = cols[0].isNull()
            for c in cols[1:]:
                out = out | c.isNull()
            return out

        _top_need = _any_null(j["cdr_reference"], j["mfr"])
        _hdr_need = _any_null(
            _hd["imei"],
            _hd["iridium_ts"],
            _hd["sbd_session_status"],
            _hd["mo_msn"],
            _hd["mt_msn"],
        )
        _loc_need = _hd["location"]["cep_radius"].isNull()
        _val_need = _any_null(
            *[
                _vs[f]
                for f in (
                    "status_ts",
                    "environmental_ts",
                    "mission_ts",
                    "system_status",
                    "latitude",
                    "longitude",
                    "heading",
                    "battery_level",
                    "bus_voltage",
                    "operating_temp",
                    "charge_rate",
                    "sw_rev",
                    "geofence_config_index",
                    "misc",
                )
            ]
        )
        staged = staged1.select(
            "value",
            "j",
            F.explode(
                F.array(
                    F.struct(
                        F.when(
                            _top_need, F.json_object_keys(F.col("value"))
                        ).alias("top_k"),
                        *[
                            F.when(
                                need,
                                F.json_object_keys(
                                    F.get_json_object(F.col("value"), path)
                                ),
                            ).alias(alias)
                            for alias, need, path in (
                                ("hdr_k", _hdr_need, "$.headers"),
                                ("loc_k", _loc_need, "$.headers.location"),
                                ("val_k", _val_need, "$.values"),
                            )
                        ],
                    )
                )
            ).alias("pk"),
        ).select("value", "j", "pk.*")
        top_k, hdr_k, loc_k, val_k = (
            F.col(n) for n in ("top_k", "hdr_k", "loc_k", "val_k")
        )
        # degmin degrees/minutes presence needs no key parse: the exact
        # path indexes them unconditionally, so any row where one is
        # null-or-absent is dead-lettered (the degmin filter below) and
        # never reaches the values map — on surviving rows they are
        # always present.
        always = True  # plain literal: ent() emits an unconditional key

        def present(raw: Column, arr: Column, name: str) -> Column:
            # raw non-null PROVES the key existed (from_json maps absent
            # keys to NULL, never the reverse); the key array — parsed
            # only for rows where its block had a NULL — is consulted
            # as the fallback. Correct even without Or short-circuiting:
            # a NULL arr under a non-null raw coalesces to false on the
            # right while the left is already true.
            return raw.isNotNull() | F.coalesce(
                F.array_contains(arr, F.lit(name)), F.lit(False)
            )

        # best-timestamp cascade (status -> environmental -> mission ->
        # iridium, reference tables.py:598-606); Python truthiness of
        # the raw epoch == non-null, non-zero
        def truthy(c: Column) -> Column:
            return c.isNotNull() & (c.cast("double") != 0.0)

        vs = j["values"]
        hd = j["headers"]
        time_col = (
            F.when(truthy(vs["status_ts"]), F.timestamp_seconds(vs["status_ts"]))
            .when(
                truthy(vs["environmental_ts"]),
                F.timestamp_seconds(vs["environmental_ts"]),
            )
            .when(truthy(vs["mission_ts"]), F.timestamp_seconds(vs["mission_ts"]))
            .otherwise(F.timestamp_seconds(hd["iridium_ts"]))
        )
        reftime = F.timestamp_seconds(hd["iridium_ts"])

        # location: payload coords when BOTH truthy, else Iridium
        # deg+min (deg + min/60, reference tables.py:411-417) with the
        # imprecise QC flag. The exact path indexes the degmin headers
        # unconditionally (KeyError -> dead-letter), so their presence
        # is required even when payload coords win.
        degmin_lat = hd["location"]["latitude"]["degrees"].cast("double") + hd[
            "location"
        ]["latitude"]["minutes"] / F.lit(60.0)
        degmin_lon = hd["location"]["longitude"]["degrees"].cast("double") + hd[
            "location"
        ]["longitude"]["minutes"] / F.lit(60.0)
        payload_coords = truthy(vs["latitude"]) & truthy(vs["longitude"])
        latdd = F.when(payload_coords, vs["latitude"]).otherwise(degmin_lat)
        londd = F.when(payload_coords, vs["longitude"]).otherwise(degmin_lon)
        lq = location_quality(londd, latdd, inprecise=~payload_coords)

        def ent(name: str, col: Column, pres: Column) -> Column:
            # presence folds into a NULLABLE KEY (absent → NULL key,
            # filtered below) so entries are final 2-field structs —
            # the previous 3-field struct + filter + rebuild-transform
            # pass measured ~10% of the whole transform
            if isinstance(pres, Column):
                key = F.when(pres, F.lit(name))
            else:  # the `always` literal-True case
                key = F.lit(name)
            return F.struct(
                key.alias("key"),
                col.cast("string").alias("val"),
            )

        fixed_entries = F.array(
            ent("cdr_reference", j["cdr_reference"], present(j["cdr_reference"], top_k, "cdr_reference")),
            ent("headers_imei", hd["imei"], present(hd["imei"], hdr_k, "imei")),
            ent("headers_iridium_ts", hd["iridium_ts"], present(hd["iridium_ts"], hdr_k, "iridium_ts")),
            ent(
                "headers_sbd_session_status",
                _render_token(hd["sbd_session_status"]),
                present(hd["sbd_session_status"], hdr_k, "sbd_session_status"),
            ),
            ent("headers_mo_msn", hd["mo_msn"], present(hd["mo_msn"], hdr_k, "mo_msn")),
            ent("headers_mt_msn", hd["mt_msn"], present(hd["mt_msn"], hdr_k, "mt_msn")),
            ent(
                "headers_location_cep_radius",
                hd["location"]["cep_radius"],
                present(hd["location"]["cep_radius"], loc_k, "cep_radius"),
            ),
            ent(
                "headers_location_latitude_degrees",
                hd["location"]["latitude"]["degrees"],
                always,
            ),
            ent(
                "headers_location_latitude_minutes",
                hd["location"]["latitude"]["minutes"],
                always,
            ),
            ent(
                "headers_location_longitude_degrees",
                hd["location"]["longitude"]["degrees"],
                always,
            ),
            ent(
                "headers_location_longitude_minutes",
                hd["location"]["longitude"]["minutes"],
                always,
            ),
            ent("values_status_ts", vs["status_ts"], present(vs["status_ts"], val_k, "status_ts")),
            ent(
                "values_environmental_ts",
                vs["environmental_ts"],
                present(vs["environmental_ts"], val_k, "environmental_ts"),
            ),
            ent("values_mission_ts", vs["mission_ts"], present(vs["mission_ts"], val_k, "mission_ts")),
            ent(
                "values_system_status",
                _render_token(vs["system_status"]),
                present(vs["system_status"], val_k, "system_status"),
            ),
            ent("values_latitude", vs["latitude"], present(vs["latitude"], val_k, "latitude")),
            ent("values_longitude", vs["longitude"], present(vs["longitude"], val_k, "longitude")),
            ent("values_heading", vs["heading"], present(vs["heading"], val_k, "heading")),
            ent(
                "values_battery_level",
                vs["battery_level"],
                present(vs["battery_level"], val_k, "battery_level"),
            ),
            ent("values_bus_voltage", vs["bus_voltage"], present(vs["bus_voltage"], val_k, "bus_voltage")),
            ent(
                "values_operating_temp",
                vs["operating_temp"],
                present(vs["operating_temp"], val_k, "operating_temp"),
            ),
            ent("values_charge_rate", vs["charge_rate"], present(vs["charge_rate"], val_k, "charge_rate")),
            ent("values_sw_rev", _render_token(vs["sw_rev"]), present(vs["sw_rev"], val_k, "sw_rev")),
            ent(
                "values_geofence_config_index",
                vs["geofence_config_index"],
                present(vs["geofence_config_index"], val_k, "geofence_config_index"),
            ),
            ent("mfr", _render_token(j["mfr"]), present(j["mfr"], top_k, "mfr")),
            ent("location_quality", lq, True),
        )
        # dynamic misc keys flatten to values_misc_<k>; an explicitly
        # null misc flattens to a single null-valued values_misc entry
        misc = vs["misc"]
        misc_entries = F.when(
            misc.isNotNull(),
            F.transform(
                F.map_entries(misc),
                lambda e: F.struct(
                    F.concat(F.lit("values_misc_"), e["key"]).alias("key"),
                    _render_token(e["value"]).alias("val"),
                ),
            ),
        ).otherwise(
            F.when(
                present(misc, val_k, "misc"),
                F.array(
                    F.struct(
                        F.lit("values_misc").alias("key"),
                        F.lit(None).cast("string").alias("val"),
                    )
                ),
            ).otherwise(F.array().cast("array<struct<key:string,val:string>>"))
        )
        # absent entries carry a NULL key (see ent()); one filter pass,
        # no struct rebuild
        values_map = F.map_from_entries(
            F.filter(
                F.concat(fixed_entries, misc_entries),
                lambda e: e["key"].isNotNull(),
            )
        )

        out = staged.select(
            hd["imei"].cast("string").alias("uid"),
            F.lit(None).cast("string").alias("gid"),
            time_col.alias("time"),
            reftime.alias("reftime"),
            latdd.alias("lat"),
            londd.alias("lon"),
            F.lit(None).cast("double").alias("z"),
            point_wkt(londd, latdd).alias("geom"),
            values_map.alias("values"),
            F.col("value").alias("payload"),
            degmin_lat.alias("degmin_lat"),
            degmin_lon.alias("degmin_lon"),
        )
        # poison policy == the exact path's unconditional indexing:
        # imei/iridium_ts and both degmin coord pairs are required
        # (KeyError -> dead-letter there, filter here)
        out = out.filter(
            F.col("uid").isNotNull()
            & F.col("reftime").isNotNull()
            & F.col("time").isNotNull()
            & F.col("lat").isNotNull()
            & F.col("lon").isNotNull()
            & F.col("degmin_lat").isNotNull()
            & F.col("degmin_lon").isNotNull()
        ).drop("degmin_lat", "degmin_lon")
        start = self.filters.get("start_date")
        end = self.filters.get("end_date")
        if start is not None:
            out = out.filter(F.col("time") >= F.lit(start.replace(tzinfo=None)))
        if end is not None:
            out = out.filter(F.col("time") <= F.lit(end.replace(tzinfo=None)))
        return out
