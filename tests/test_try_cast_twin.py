"""Empirical pin of the cross-engine cast twins (functions/casts.py).

Round-10 advice: DuckDB TRY_CAST rounds decimal strings ('3.7'→4) and
parses scientific notation where Spark try_cast yields NULL, and
Spark's trimAll strips every char <= 0x20 where DuckDB/trim() strip
only whitespace. These tests run the SAME adversarial vectors through
Spark's native try_cast and the DuckDB twin SQL and require identical
outputs, so any engine-version drift in either accept-set fails loudly
here instead of as a one-row hash mismatch in a 100 TB gate query.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dbsink_spark.functions.casts import (
    guarded_double_sql,
    spark_try_int_sql,
    try_double_guarded,
)

# the divergence classes the round-9 fuzz campaign + round-10 advice
# surfaced, plus plain-valid controls
INT_VECTORS = [
    "42", "+5", "-5", " 42", "42 ", "\t42", "\n8", " +7 ",
    "\x0142",            # control-char flank: Spark trimAll strips it
    "\x1f7 ", "\x0b9",
    "3.7",               # DuckDB bare TRY_CAST rounds to 4; Spark NULL
    "3.25", "-0.5",
    "4e2",               # DuckDB parses scientific; Spark NULL
    "99999999999",       # > int32: NULL as INT on both, valid BIGINT
    "9" * 30,            # > int64: NULL on both
    "", "x7", "n/a", "1 2", "٤٢",  # arabic-indic digits: NULL on both
]

DOUBLE_VECTORS = INT_VECTORS + [
    "1.5", "-2.75e-3", ".5", "5.", "+0.125e2",
    "inf", "Infinity", "-Infinity", "NaN", "nan",  # outside the shared set
    "1.5f", "0x1p3",     # Java parseDouble quirks: rejected by the guard
    "1e400",             # overflow: Spark→Infinity, DuckDB→NULL — rejected
    "1" * 20,            # >15-digit mantissa: outside the shared set
]


def _spark_eval(spark, vectors, col_expr):
    df = spark.createDataFrame([(v,) for v in vectors], "s string")
    return [r.out for r in df.select(col_expr.alias("out")).collect()]


def _duck_eval(vectors, sql_expr):
    con = duckdb.connect()
    out = []
    for v in vectors:
        out.append(con.execute(f"SELECT {sql_expr} FROM (SELECT ? AS s)", [v]).fetchone()[0])
    return out


@pytest.mark.parametrize("sql_type,spark_type", [("BIGINT", "long"), ("INT", "int")])
def test_int_twin_matches_spark_try_cast(spark, sql_type, spark_type):
    got_spark = _spark_eval(spark, INT_VECTORS, F.col("s").try_cast(spark_type))
    got_duck = _duck_eval(INT_VECTORS, spark_try_int_sql("s", sql_type))
    assert got_spark == got_duck, list(zip(INT_VECTORS, got_spark, got_duck))


def test_int_twin_covers_the_advice_divergences(spark):
    """'3.7' and '4e2' must be NULL through the twin (bare DuckDB
    TRY_CAST yields 4 and 400), and '\\x0142' must be 42 (bare DuckDB
    TRY_CAST yields NULL)."""
    got = dict(zip(INT_VECTORS, _duck_eval(INT_VECTORS, spark_try_int_sql("s"))))
    assert got["3.7"] is None and got["4e2"] is None
    assert got["\x0142"] == 42
    bare = dict(zip(INT_VECTORS, _duck_eval(INT_VECTORS, "TRY_CAST(s AS BIGINT)")))
    assert bare["3.7"] == 4 and bare["4e2"] == 400 and bare["\x0142"] is None


def test_double_guard_matches_across_engines(spark):
    got_spark = _spark_eval(spark, DOUBLE_VECTORS, try_double_guarded(F.col("s")))
    got_duck = _duck_eval(DOUBLE_VECTORS, guarded_double_sql("s"))
    assert got_spark == got_duck, list(zip(DOUBLE_VECTORS, got_spark, got_duck))
    # the guard must still admit ordinary finite decimals
    admitted = dict(zip(DOUBLE_VECTORS, got_spark))
    assert admitted["1.5"] == 1.5 and admitted["-2.75e-3"] == -2.75e-3
    assert admitted[".5"] == 0.5 and admitted["3.25"] == 3.25
    # and reject every engine-divergent class
    for bad in ("inf", "Infinity", "NaN", "1.5f", "0x1p3", "1e400"):
        assert admitted[bad] is None, bad
