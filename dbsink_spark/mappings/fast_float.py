"""GenericFloatFast: the all-JVM fast path for canonical float
telemetry (the reference's Avro-declared message shape, schema.avsc).

Where GenericFloat runs the row-exact Python ``convert`` in
``mapInPandas``, this mapping is pure column expressions — ``from_json``
decode, ``to_timestamp``, the location-quality ``when`` chain, map
assembly — so the whole transform stays in Tungsten/WholeStageCodegen
with zero Python in the hot path. This is the mapping to use at 100 TB
when the wire format is the canonical one.

Known divergences from the exact path (documented, not bugs):
* map values keep their JSON source text (``"2.720"`` stays ``"2.720"``
  where Python ``str(float)`` would render ``"2.72"``); identical for
  the common integer/shortest-float cases;
* JSON booleans render ``true``/``false`` (Python renders
  ``True``/``False``);
* ``payload`` carries the raw message text (NaN/Infinity appear as
  ``null`` only if the producer scrubbed them; the exact path rewrites
  them itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import location_quality, point_wkt
from .generic import GenericFloat

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("gid", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("reftime", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("values", T.MapType(T.StringType(), T.StringType())),
    ]
)


class GenericFloatFast(GenericFloat):
    lookup = "GenericFloatFast"

    def transform(self, df: DataFrame, errors: str = "drop") -> DataFrame:
        j = F.from_json(F.col("value"), WIRE_SCHEMA)
        # try_to_timestamp: ANSI mode (Spark 4 default) makes
        # to_timestamp THROW on a malformed value — the try_ variant
        # yields null, which the poison filter below drops
        time = F.try_to_timestamp(j["time"])
        out = df.select(
            j["uid"].alias("uid"),
            j["gid"].alias("gid"),
            time.alias("time"),
            F.coalesce(F.try_to_timestamp(j["reftime"]), time).alias("reftime"),
            j["lat"].alias("lat"),
            j["lon"].alias("lon"),
            j["z"].alias("z"),
            point_wkt(j["lon"], j["lat"]).alias("geom"),
            F.map_concat(
                F.coalesce(j["values"], F.create_map().cast("map<string,string>")),
                F.create_map(
                    F.lit("location_quality"),
                    location_quality(j["lon"], j["lat"]).cast("string"),
                ),
            ).alias("values"),
            F.col("value").alias("payload"),
        )
        # poison-message policy: unparsable time/coords drop (the exact
        # path's per-row try/except, expressed as a filter)
        out = out.filter(
            F.col("time").isNotNull()
            & F.col("lat").isNotNull()
            & F.col("lon").isNotNull()
        )
        start = self.filters.get("start_date")
        end = self.filters.get("end_date")
        if start is not None:
            out = out.filter(F.col("time") >= F.lit(start.replace(tzinfo=None)))
        if end is not None:
            out = out.filter(F.col("time") <= F.lit(end.replace(tzinfo=None)))
        return out
