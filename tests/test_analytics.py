"""Analytics regression tests: a representative operator subset
compared against DuckDB at sf0.001 (the full 49-query gate runs via
tools/check_oracle.py at sf0.01; this keeps the core pairs guarded by
plain pytest)."""

import math

import duckdb
import pytest

from dbsink_spark import analytics

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SUBSET = [
    "q01_pricing_summary",
    "q05_multi_join",
    "q13_window_topk_per_group",
    "q19_events_sessionize",
    "q22_asof_join",
    "q30_argmax",
    "t03_lang_id",
    "d01_dedup_exact",
    "d03_minhash_lsh",
    "s01_cosine_topk",
    "m01_media_features",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def norm(v):
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    return str(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = analytics.QUERIES[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(analytics.ORACLE[name])
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert rowset(srows, scols) == rowset(drows, dcols)


def test_registry_integrity():
    # every oracle refers to a registered query; no name collisions
    assert set(analytics.ORACLE) <= set(analytics.QUERIES)
    assert len(analytics.ALL_QUERIES) >= 53
    # every driver-gated query now carries a hash oracle (q29 emits
    # exact values + tolerance booleans; s04 emits rank-only output)
    assert set(analytics.QUERIES) == set(analytics.ORACLE)


def test_numpy_topk_matches_exact_path(spark):
    """s04 (vectorized numpy scale path) must produce the same rankings
    as s01 (exact sequential-fold path)."""
    exact = analytics.QUERIES["s01_cosine_topk"](spark, SF_DIR).collect()
    fast = analytics.QUERIES["s04_numpy_topk"](spark, SF_DIR).collect()
    assert len(exact) == len(fast)
    e = {(r["query_id"], r["rank"]): r["corpus_id"] for r in exact}
    f = {(r["query_id"], r["rank"]): r["corpus_id"] for r in fast}
    assert e == f


def test_sql_front_door(spark):
    """analytics.sql: ANSI SQL string over registered tables."""
    out = analytics.sql(
        spark,
        SF_DIR,
        """
        SELECT r_name, count(*) AS n_nations
        FROM region JOIN nation ON r_regionkey = n_regionkey
        GROUP BY r_name ORDER BY r_name
        """,
    ).collect()
    assert len(out) == 5
    assert sum(r.n_nations for r in out) == 25
