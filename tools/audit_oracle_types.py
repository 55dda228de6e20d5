"""Audit every oracle SQL (gated AND ungated) for DuckDB result-column
types that the grading driver's pandas canonicalizer will NOT round-trip
as exact integers.

The failure class (r02 q20/q49): DuckDB promotes ``sum(BIGINT)``,
``list_sum(...)`` and ``**`` to HUGEINT; the driver fetches the oracle
through pandas/Arrow, where HUGEINT becomes float64, so the value hash
compares ``"99111.0"`` against Spark's ``"99111"`` and fails even though
the values are identical.  Fix is always ``(...)::BIGINT`` at the point
of output.

Usage: ``python tools/audit_oracle_types.py``  — exit 1 on any hit.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
BAD = ("HUGEINT", "UHUGEINT")


def main() -> int:
    from dbsink_spark import analytics

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    hits = 0
    for name in sorted(analytics.ALL_ORACLE):
        sql = analytics.ALL_ORACLE[name]
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"ERR   {name}: DESCRIBE failed: {e}")
            hits += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if any(b in t.upper() for b in BAD)]
        if bad:
            hits += 1
            print(f"HIT   {name}: {bad}  — add ::BIGINT at output")
    n = len(analytics.ALL_ORACLE)
    print(f"\n{n - hits}/{n} oracles clean")
    return 1 if hits else 0


if __name__ == "__main__":
    raise SystemExit(main())
