"""local_df (analytics.litdf) — the JVM-native literal-table helper.

The r12 optimization replaced hot-path ``spark.createDataFrame(list,
schema)`` literal tables (grid offsets, pattern lists, k-means
centroids, drill ranges, manifests) with ``local_df``, which plans the
same rows as range(1) → from_json(literal) → explode instead of a
Python-RDD scan (~0.25 s of Python-worker latency per evaluation).
These tests pin the drop-in contract: identical schema (names, types,
nullability) and identical row values — including bit-exact doubles,
which the driver's float-precision hash depends on."""

import math
import struct

import pytest

from dbsink_spark.analytics.litdf import local_df

CASES = [
    ([(1, "a"), (2, None)], "k bigint, s string"),
    ([(0.5, 1), (2.25, None)], "x double, n int"),
    ([(1, [1.0, 2.0]), (2, [3.5, 4.5])], "cid bigint, cv array<double>"),
    ([(True, -7)], "b boolean, v long"),
    ([], "q long, r int"),
    ([(1, None, 0.25), (2, None, None)], "step int, vec_id long, d double"),
    ([('a "b"\nünïcode\\', 3)], "s string, n int"),
    ([(-1, 0), (0, 9_223_372_036_854_775_807)], "lo long, hi long"),
]


@pytest.mark.parametrize("rows,schema", CASES, ids=[c[1] for c in CASES])
def test_matches_createdataframe(spark, rows, schema):
    a = spark.createDataFrame(rows, schema)
    b = local_df(spark, rows, schema)
    assert a.schema == b.schema
    assert a.collect() == b.collect()


def test_doubles_bit_exact(spark):
    vals = [0.1, 2.0 / 3.0, 123456.789012345, 6.02e23, 5e-324, -0.0]
    rows = [(v,) for v in vals]
    a = spark.createDataFrame(rows, "x double").collect()
    b = local_df(spark, rows, "x double").collect()
    for ra, rb in zip(a, b):
        assert struct.pack("<d", ra.x) == struct.pack("<d", rb.x)


def test_no_python_rdd_in_plan(spark):
    """The point of the helper: the physical plan must be JVM-only
    (no Scan ExistingRDD / Python evaluation nodes)."""
    df = local_df(spark, [(1, "x")], "k long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    assert "Python" not in plan


def test_struct_type_schema_accepted(spark):
    import pyspark.sql.types as T

    st = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    a = spark.createDataFrame([(7, "z")], st)
    b = local_df(spark, [(7, "z")], st)
    assert a.schema == b.schema
    assert a.collect() == b.collect()


def test_nonfinite_floats_rejected(spark):
    with pytest.raises(ValueError, match="non-finite"):
        local_df(spark, [(math.nan,)], "x double")
    with pytest.raises(ValueError, match="non-finite"):
        local_df(spark, [([1.0, math.inf],)], "v array<double>")
