"""Vendor-specific float mappings: Arete, Numurus, NWIC, Sofar.

Each reproduces a reference mapping's per-message semantics (cited per
class) on top of the shared float-telemetry schema. All of them ride
the flatten/stringify function library (functions/structural.py) whose
goldens pin the tricky behavior.
"""

from __future__ import annotations

import copy
import json
from datetime import datetime, timezone

from dateutil.parser import parse as dtparse

from ..functions.geo import degmin_to_decimal, location_quality_py
from ..functions.structural import flatten, make_valid_string, payload_parse
from .generic import GenericFloat, _utc


def _epoch_utc(ts) -> datetime:
    return datetime.fromtimestamp(ts, timezone.utc)


class AreteData(GenericFloat):
    """Arete Iridium payloads (reference dbsink/tables.py:379-463):
    scrub undecodable fields, flatten, best-effort time (status_ts →
    iridium_ts) and location (payload coords → Iridium deg+min) with a
    'suspect' QC flag on the imprecise fallback."""

    lookup = "AreteData"

    REMOVES = ("not_decoded", "Compressed_Data")

    def convert(self, key, value) -> dict:
        vc = copy.deepcopy(value)
        for r in self.REMOVES:
            if r in value["json"]:  # KeyError when no 'json' == reference
                del vc["json"][r]

        payload = payload_parse(vc)
        vals = flatten(vc)

        reftime = _epoch_utc(vals["headers_iridium_ts"])
        if vals.get("headers_status_ts"):
            timestamp = _epoch_utc(vals["headers_status_ts"])
        else:
            timestamp = reftime
        self.apply_date_filter(timestamp)

        inprecise = True
        latdd = degmin_to_decimal(
            vals["headers_location_latitude_degrees"],
            vals["headers_location_latitude_minutes"],
        )
        londd = degmin_to_decimal(
            vals["headers_location_longitude_degrees"],
            vals["headers_location_longitude_minutes"],
        )
        if isinstance(vals.get("json_Full_ll"), list):
            latdd, londd = vals["json_Full_ll"][0], vals["json_Full_ll"][1]
            inprecise = False
        elif "json_position_latitude" in vals and "json_position_longitude" in vals:
            latdd, londd = vals["json_position_latitude"], vals["json_position_longitude"]
            inprecise = False

        vals["location_quality"] = location_quality_py(londd, latdd, inprecise=inprecise)
        vals["mfr"] = "arete"
        values_map = {
            k: make_valid_string(v) if v is not None else None for k, v in vals.items()
        }

        out = {
            "uid": str(vals["headers_imei"]),
            "time": timestamp,
            "reftime": reftime,
            "lat": latdd,
            "lon": londd,
            "geom": f"POINT ({londd} {latdd})",
            "values": values_map,
            "payload": json.dumps(payload),
        }
        return {k: v for k, v in self.match_columns(out).items() if v is not None}


class NumurusData(GenericFloat):
    """Numurus data feed (reference dbsink/tables.py:466-526)."""

    lookup = "NumurusData"

    #: flatten keys excluded from the values map (exact-match only,
    #: reference tables.py:493-498)
    SKIPS = (
        "data_segment_data_product_pipeline",
        "data_segment_data_segment_data_product_pipeline",
    )
    DISALLOW_LON = [181]
    DISALLOW_LAT = [91]

    def convert(self, key, value) -> dict:
        payload = payload_parse(value)
        vals = flatten(value)

        top_time = _utc(dtparse(str(vals["timestamp"])))
        self.apply_date_filter(top_time)

        lat, lon = vals["latitude"], vals["longitude"]
        vals["location_quality"] = location_quality_py(
            lon, lat, disallow_lon=self.DISALLOW_LON, disallow_lat=self.DISALLOW_LAT
        )
        vals["mfr"] = "numurus"
        values_map = {
            k: make_valid_string(v) if v is not None else None
            for k, v in vals.items()
            if k not in self.SKIPS
        }

        out = {
            "uid": vals["imei"],
            "time": top_time,
            "reftime": _utc(dtparse(str(vals["navsat_fix_time"]))),
            "lat": lat,
            "lon": lon,
            "geom": f"POINT ({lon} {lat})",
            "values": values_map,
            "payload": json.dumps(payload),
        }
        out["uid"] = None if out["uid"] is None else str(out["uid"])
        return {k: v for k, v in self.match_columns(out).items() if v is not None}


class NumurusStatus(NumurusData):
    """Numurus status feed (reference dbsink/tables.py:529-581) — same
    shape as the data feed without the pipeline-key skips."""

    lookup = "NumurusStatus"

    SKIPS = ()


class NwicFloatReports(GenericFloat):
    """NWIC float reports (reference dbsink/tables.py:584-654):
    best-timestamp cascade (status → environmental → mission →
    iridium) and payload-coords-else-Iridium location fallback."""

    lookup = "NwicFloatReports"

    TS_CANDIDATES = ("values_status_ts", "values_environmental_ts", "values_mission_ts")

    def convert(self, key, value) -> dict:
        payload = payload_parse(value)
        vals = flatten(value)

        reftime = _epoch_utc(vals["headers_iridium_ts"])
        timestamp = reftime
        for k in self.TS_CANDIDATES:
            if vals.get(k):
                timestamp = _epoch_utc(vals[k])
                break
        self.apply_date_filter(timestamp)

        inprecise = True
        latdd = degmin_to_decimal(
            vals["headers_location_latitude_degrees"],
            vals["headers_location_latitude_minutes"],
        )
        londd = degmin_to_decimal(
            vals["headers_location_longitude_degrees"],
            vals["headers_location_longitude_minutes"],
        )
        if vals.get("values_longitude") and vals.get("values_latitude"):
            latdd, londd = vals["values_latitude"], vals["values_longitude"]
            inprecise = False

        vals["location_quality"] = location_quality_py(londd, latdd, inprecise=inprecise)
        values_map = {
            k: make_valid_string(v) if v is not None else None for k, v in vals.items()
        }

        out = {
            "uid": str(vals["headers_imei"]),
            "time": timestamp,
            "reftime": reftime,
            "lat": latdd,
            "lon": londd,
            "geom": f"POINT ({londd} {latdd})",
            "values": values_map,
            "payload": json.dumps(payload),
        }
        return {k: v for k, v in self.match_columns(out).items() if v is not None}


class NwicFloatReportsSofar(GenericFloat):
    """Sofar Spotter wave reports (reference dbsink/tables.py:657-708):
    payload drops the raw 'message', uid strips the 'SPOT-' prefix,
    reftime is ingest time."""

    lookup = "NwicFloatReportsSofar"

    def convert(self, key, value) -> dict:
        payload = payload_parse(value)
        payload.pop("message")  # KeyError when absent == reference

        vals = flatten(value)

        reftime = datetime.utcnow().replace(microsecond=0)  # ingest clock, as reference
        timestamp = _utc(dtparse(str(vals["timestamp"])))

        latdd = londd = None
        if vals.get("longitude") and vals.get("latitude"):
            latdd, londd = vals["latitude"], vals["longitude"]
        if latdd is None or londd is None:
            # reference builds Point(None, None) which raises → row error
            raise ValueError("missing coordinates")

        values_map = {
            k: make_valid_string(v) if v is not None else None for k, v in vals.items()
        }

        out = {
            "uid": str(vals["spotterId"])[5:],
            "time": timestamp,
            "reftime": reftime,
            "lat": latdd,
            "lon": londd,
            "geom": f"POINT ({londd} {latdd})",
            "values": values_map,
            "payload": json.dumps(payload),
        }
        return {k: v for k, v in self.match_columns(out).items() if v is not None}
