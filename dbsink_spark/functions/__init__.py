from .geo import (
    degmin_to_decimal,
    geojson_features,
    geometry_to_wkt,
    location_quality,
    location_quality_py,
    point_wkt,
    union_features_wkt,
)
from .hashing import affine, h64, h64_sql
from .structural import (
    expand_stringified,
    flatten,
    make_valid_string,
    payload_parse,
    scrub_special_floats,
)

__all__ = [
    "degmin_to_decimal",
    "geojson_features",
    "geometry_to_wkt",
    "location_quality",
    "location_quality_py",
    "point_wkt",
    "union_features_wkt",
    "affine",
    "h64",
    "h64_sql",
    "expand_stringified",
    "flatten",
    "make_valid_string",
    "payload_parse",
    "scrub_special_floats",
]
