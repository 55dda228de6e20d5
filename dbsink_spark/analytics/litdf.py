"""JVM-native literal DataFrames.

``spark.createDataFrame(<python list>, schema)`` plans as a scan over a
*Python* RDD: every action that evaluates it round-trips through pickled
rows and a Python worker pool. Measured on the bench host (r12): a noop
write of such a frame costs ~260 ms, vs ~35 ms for a JVM-native
``spark.range`` source — so every registry query that embeds a literal
table (grid offsets, pattern lists, drill ranges, k-means centroids)
paid ~0.25 s of Python-worker latency PER EVALUATION for rows that are
driver constants.

``local_df`` builds the same rows as a pure JVM plan instead: the rows
are serialized once on the driver into a single JSON string literal,
and the plan is ``range(1)`` → ``from_json`` → ``explode``. One literal
+ three expressions regardless of row count, so analysis/codegen stay
O(1) (a naive ``array(struct(lit...), ...)`` tree was measured at 4.6 s
for 441 rows — the expression-per-cell tree is the trap). ``from_json``
fields are nullable, matching ``createDataFrame``'s schema exactly.

Value fidelity: ``json.dumps`` round-trips Python ints, bools, strings
and None exactly; floats use repr (shortest round-trip, exact for
binary64). Non-finite floats are not representable in JSON — callers
with NaN/Inf literals (none in the registry) must keep
``createDataFrame``; ``local_df`` raises on them rather than corrupt.

Literal support matches what the registry embeds: ints, floats, strings,
bools, None, and flat lists thereof (float arrays for centroid rows).
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _parse(schema: str | T.StructType) -> T.StructType:
    if isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):
        raise ValueError(f"local_df needs a struct schema, got {parsed}")
    return parsed


def _check_finite(v) -> None:
    if isinstance(v, float) and not math.isfinite(v):
        raise ValueError("local_df cannot embed non-finite floats; use createDataFrame")
    if isinstance(v, (list, tuple)):
        for x in v:
            _check_finite(x)


def local_df(spark: SparkSession, rows: list, schema: str | T.StructType) -> DataFrame:
    """A literal table as a JVM-only plan (see module docstring).

    Drop-in for ``spark.createDataFrame(rows, schema)`` for lists of
    plain tuples/lists with an explicit schema.
    """
    st = _parse(schema)
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in st.fields]
        )
    names = [f.name for f in st.fields]
    payload = []
    for row in rows:
        _check_finite(list(row))
        payload.append(dict(zip(names, row)))
    doc = json.dumps(payload, ensure_ascii=False, allow_nan=False)
    return (
        spark.range(1)
        .select(
            F.explode(
                F.from_json(F.lit(doc), T.ArrayType(st))
            ).alias("_r")
        )
        .select("_r.*")
    )
