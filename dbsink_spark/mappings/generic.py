"""Generic mapping classes: JsonMap, StringMap, GenericFloat,
GenericGeography, GenericFieldStatistic.

Row-level semantics mirror the reference classes (cited per method);
the Spark-level execution is the shared Arrow-batched ``transform`` in
base.Mapping.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from dateutil.parser import parse as dtparse

from pyspark.sql import types as T

from ..functions.geo import (
    geojson_features,
    location_quality_py,
    union_features_wkt,
)
from ..functions.structural import make_valid_string, payload_parse
from .base import ColumnSpec, Mapping, serial_id_column, utcnow


def _utc(dt: datetime) -> datetime:
    return dt.replace(tzinfo=timezone.utc)


class JsonMap(Mapping):
    """Append-only raw-JSON sink table (reference dbsink/maps.py:84-119)."""

    lookup = "JsonMap"

    @property
    def columns(self) -> list[ColumnSpec]:
        return [
            serial_id_column(),
            ColumnSpec("sinked", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
            ColumnSpec("key", T.StringType(), "TEXT", "TEXT", index=True, default=""),
            ColumnSpec("payload", T.StringType(), "JSONB", "JSON", bind="jsonb"),
        ]

    def check_value(self, value) -> bool:
        payload_parse(value)  # raises on undecodable payloads
        return True

    def convert(self, key, value) -> dict:
        return {
            "sinked": utcnow(),
            "key": key,
            "payload": json.dumps(payload_parse(value)),
        }


class StringMap(JsonMap):
    """Append-only stringified-payload sink (reference dbsink/maps.py:122-154)."""

    lookup = "StringMap"

    @property
    def columns(self) -> list[ColumnSpec]:
        cols = super().columns
        cols[-1] = ColumnSpec("payload", T.StringType(), "TEXT", "TEXT")
        return cols

    def check_value(self, value) -> bool:
        return True

    def convert(self, key, value) -> dict:
        return {"sinked": utcnow(), "key": key, "payload": json.dumps(value)}


def float_columns() -> list[ColumnSpec]:
    """Telemetry-point schema shared by the float family (reference
    dbsink/tables.py:309-342)."""
    return [
        serial_id_column(),
        ColumnSpec("uid", T.StringType(), "TEXT", "TEXT", index=True),
        ColumnSpec("gid", T.StringType(), "TEXT", "TEXT", index=True, default=""),
        ColumnSpec("time", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
        ColumnSpec("reftime", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
        ColumnSpec("lat", T.DoubleType(), "DOUBLE PRECISION", "DOUBLE", index=True),
        ColumnSpec("lon", T.DoubleType(), "DOUBLE PRECISION", "DOUBLE", index=True),
        ColumnSpec("z", T.DoubleType(), "DOUBLE PRECISION", "DOUBLE", index=True),
        ColumnSpec("geom", T.StringType(), "geometry(POINT,4326)", "TEXT", bind="geometry"),
        ColumnSpec(
            "values",
            T.MapType(T.StringType(), T.StringType(), True),
            "HSTORE",
            "JSON",
            default={},
            bind="hstore",
        ),
        ColumnSpec("payload", T.StringType(), "JSONB", "JSON", default={}, bind="jsonb"),
    ]


class GenericFloat(Mapping):
    """Canonical float-telemetry mapping (reference dbsink/tables.py:307-376)."""

    lookup = "GenericFloat"

    @property
    def columns(self) -> list[ColumnSpec]:
        return float_columns()

    @property
    def upsert_keys(self) -> list[str]:
        return ["uid", "gid", "time", "lat", "lon", "z"]

    def convert(self, key, value) -> dict:
        payload = payload_parse(value)
        top_time = _utc(dtparse(value["time"]))
        self.apply_date_filter(top_time)

        lat = float(value["lat"])
        lon = float(value["lon"])

        vals = value["values"] or {}  # KeyError when absent == reference behavior
        vals = dict(vals)
        vals["location_quality"] = location_quality_py(lon, lat)
        # nb: GenericFloat stringifies None too ('None') — quirk kept
        # from reference tables.py:363
        values_map = {k: make_valid_string(v) for k, v in vals.items()}

        reftime = (
            _utc(dtparse(value["reftime"])) if "reftime" in value else top_time
        )

        out = self.match_columns(dict(value))
        out.update(
            {
                "uid": None if value.get("uid") is None else str(value["uid"]),
                "time": top_time,
                "reftime": reftime,
                "lat": lat,
                "lon": lon,
                "geom": f"POINT ({lon} {lat})",
                "values": values_map,
                "payload": json.dumps(payload),
            }
        )
        return {k: v for k, v in out.items() if v is not None}


class GenericGeography(Mapping):
    """GeoJSON track/region mapping (reference dbsink/tables.py:206-304)."""

    lookup = "GenericGeography"

    TOPS = ["id", "uid", "gid", "time", "reftime", "values", "payload", "geom", "geojson"]

    @property
    def columns(self) -> list[ColumnSpec]:
        return [
            serial_id_column(),
            ColumnSpec("uid", T.StringType(), "TEXT", "TEXT", index=True, default=""),
            ColumnSpec("gid", T.StringType(), "TEXT", "TEXT", index=True, default=""),
            ColumnSpec("time", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
            ColumnSpec("reftime", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
            ColumnSpec(
                "values",
                T.MapType(T.StringType(), T.StringType(), True),
                "HSTORE",
                "JSON",
                default={},
                bind="hstore",
            ),
            ColumnSpec("payload", T.StringType(), "JSONB", "JSON", default={}, bind="jsonb"),
            # geometry_union: the sink wraps the bind in ST_UnaryUnion so
            # crossing/overlapping features assembled by the no-shapely
            # union fallback are noded+dissolved at insert (GEOS, same
            # engine as the reference's shapely unary_union)
            ColumnSpec("geom", T.StringType(), "geometry(GEOMETRY,4326)", "TEXT", bind="geometry_union"),
        ]

    @property
    def upsert_keys(self) -> list[str]:
        return ["uid", "gid", "time"]

    def convert(self, key, value) -> dict:
        payload = payload_parse(value)
        top = dict(value)

        top_time = _utc(dtparse(top["time"]))
        self.apply_date_filter(top_time)

        features = geojson_features(top["geojson"])
        del top["geojson"]
        geom_wkt = union_features_wkt(features)

        # feature properties seed the values map, message 'values'
        # overrides, stray top-level keys get stringified in
        values: dict = {}
        for f in features:
            values.update(f.get("properties") or {})
        if "values" in value:
            values.update(value["values"])
        for k, v in value.items():
            if k not in self.TOPS:
                values[k] = make_valid_string(v)  # None → 'None', as reference
                del top[k]

        reftime = (
            _utc(dtparse(str(top["reftime"]))) if "reftime" in top else top_time
        )
        values = {
            k: make_valid_string(v) if v is not None else None for k, v in values.items()
        }

        top.update(
            {
                "time": top_time,
                "reftime": reftime,
                "values": values,
                "payload": json.dumps(payload),
                "geom": geom_wkt,
            }
        )
        top = self.match_columns(top)
        return {k: v for k, v in top.items() if v is not None}


class GenericFieldStatistic(Mapping):
    """Aggregated field statistics with interval-overlap filtering
    (reference dbsink/tables.py:150-203)."""

    lookup = "GenericFieldStatistic"

    @property
    def columns(self) -> list[ColumnSpec]:
        return [
            serial_id_column(),
            ColumnSpec("source", T.StringType(), "TEXT NOT NULL", "TEXT", index=True),
            ColumnSpec("period", T.StringType(), "TEXT", "TEXT", default=""),
            ColumnSpec("starting", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
            ColumnSpec("ending", T.TimestampType(), "TIMESTAMPTZ", "TIMESTAMPTZ", index=True),
            ColumnSpec("values", T.StringType(), "JSONB", "JSON", bind="jsonb"),
        ]

    @property
    def upsert_keys(self) -> list[str]:
        return ["source", "period", "starting", "ending"]

    def convert(self, key, value) -> dict:
        value = payload_parse(value)
        out = self.match_columns(value)
        out["starting"] = _utc(dtparse(str(out["starting"])))
        out["ending"] = _utc(dtparse(str(out["ending"])))

        # interval-overlap filter: keep rows whose [starting, ending]
        # overlaps the configured window (reference tables.py:187-200)
        self._overlap_filter(out["starting"], out["ending"])

        if isinstance(out.get("values"), (dict, list)):
            out["values"] = json.dumps(out["values"])
        return out

    def _overlap_filter(self, starting: datetime, ending: datetime) -> None:
        end = self.filters.get("end_date")
        start = self.filters.get("start_date")
        saved = self.filters
        try:
            self.filters = {"end_date": end}
            self.apply_date_filter(starting)
            self.filters = {"start_date": start}
            self.apply_date_filter(ending)
        finally:
            self.filters = saved
