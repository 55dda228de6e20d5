"""Contract tests for tools/fuzz_oracle.py's dataset builder.

The fuzzer's value rests on three invariants: the derived dataset has
IDENTICAL schemas to the driver testdata (so every operator and oracle
runs unmodified), the derivation is deterministic per seed (so a
failure reproduces), and the tiny enum dims (region/nation) survive
whole so no join is fully degenerate — the TPC-H dimensions
customer/supplier/part ARE subsampled, deliberately leaving some fact
FKs dangling (both engines must drop them identically). These are
duckdb-only checks — no Spark — so they stay cheap.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.fuzz_oracle import SAMPLE_PCT, SRC_SF, TABLES, _pct, build_dataset

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SRC_SF), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def seeded_dir():
    return build_dataset(991)


def test_all_tables_present_with_identical_schema(seeded_dir):
    con = duckdb.connect()
    for t in TABLES:
        src = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC_SF}/{t}.parquet')"
        ).fetchall()
        dst = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{seeded_dir}/{t}.parquet')"
        ).fetchall()
        assert [(c, ty) for c, ty, *_ in src] == [(c, ty) for c, ty, *_ in dst], t


def test_dimensions_whole_facts_sampled(seeded_dir):
    con = duckdb.connect()
    for t in TABLES:
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{SRC_SF}/{t}.parquet')"
        ).fetchone()[0]
        n_dst = con.execute(
            f"SELECT count(*) FROM read_parquet('{seeded_dir}/{t}.parquet')"
        ).fetchone()[0]
        lo, hi = SAMPLE_PCT[t]
        if lo == hi == 100:
            assert n_dst == n_src, f"{t}: enum dim (region/nation) must stay whole"
        else:
            # seeded hash sampling: expect within +-12 points of target
            assert 0 < n_dst < n_src, f"{t}: fact table must shrink but not empty"
            frac = 100.0 * n_dst / n_src
            assert lo - 12 <= frac <= hi + 12, f"{t}: {frac:.0f}% outside band"


def test_rows_are_subset_and_order_shuffled(seeded_dir):
    con = duckdb.connect()
    src = [
        r[0]
        for r in con.execute(
            f"SELECT l_orderkey * 10 + l_linenumber FROM read_parquet('{SRC_SF}/lineitem.parquet')"
        ).fetchall()
    ]
    dst = [
        r[0]
        for r in con.execute(
            f"SELECT l_orderkey * 10 + l_linenumber FROM read_parquet('{seeded_dir}/lineitem.parquet')"
        ).fetchall()
    ]
    assert set(dst) <= set(src)
    # shuffle check: the surviving rows must NOT appear in source order
    src_pos = {k: i for i, k in enumerate(src)}
    positions = [src_pos[k] for k in dst]
    assert positions != sorted(positions), "row order must be perturbed"


def _ordered_fingerprint(con, d):
    """Order-SENSITIVE content hash over every table: a rebuild that
    shuffles differently or assigns different fresh ids must change it
    (the reproducibility the fuzzer promises is byte-level)."""
    fps = []
    for t in TABLES:
        fps.append(
            con.execute(
                f"""SELECT count(*), sum(hash(_rn * 1000003 + hash(s))) FROM (
                  SELECT t::VARCHAR AS s, row_number() OVER () AS _rn
                  FROM read_parquet('{d}/{t}.parquet') t)"""
            ).fetchone()
        )
    return fps


def test_deterministic_per_seed(seeded_dir):
    con = duckdb.connect()
    before = _ordered_fingerprint(con, seeded_dir)
    rebuilt = build_dataset(991, rebuild=True)
    assert _ordered_fingerprint(con, rebuilt) == before
    tie = build_dataset(977, mode="tie")
    fp = _ordered_fingerprint(con, tie)
    assert _ordered_fingerprint(con, build_dataset(977, mode="tie", rebuild=True)) == fp


def test_s20_s21_total_when_anchor_row_absent(spark, tmp_path):
    """Regression for the fuzzer's first catch (round 9): s20/s21
    anchored on a hardcoded ``vec_id = 0`` and crashed driver-side
    (``NoneType``/``IndexError``) whenever subsampling dropped that
    row. Both now anchor on the smallest PRESENT id, on both engines:
    run them against an embeddings subset with vec_id 0 and 1 removed
    and assert Spark still hash-matches the oracle and the anchor is
    the min surviving query id."""
    from dbsink_spark import analytics
    from dbsink_spark.analytics.similarity import N_QUERIES

    con = duckdb.connect()
    dst = tmp_path / "embeddings.parquet"
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SRC_SF}/embeddings.parquet')
          WHERE vec_id NOT IN (0, 1) AND hash(vec_id * 31) % 10 < 8
          ORDER BY hash(vec_id + 7)
        ) TO '{dst}' (FORMAT PARQUET)
        """
    )
    present = {
        r[0]
        for r in con.execute(f"SELECT vec_id FROM read_parquet('{dst}')").fetchall()
    }
    assert 0 not in present and len(present) > 20
    min_query = min(i for i in present if i < N_QUERIES)
    assert min_query >= 2

    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{dst}')")

    from tools.check_oracle import norm_cell

    def norm_key(row, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return [norm_cell(row[i]) for i in order]

    for name in ("s20_mmr_diversify", "s21_kcenter_select"):
        sdf = analytics.ALL_QUERIES[name](spark, str(tmp_path))
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(analytics.ALL_ORACLE[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        assert sorted(sdf.columns) == sorted(ocols), name
        assert sorted(norm_key(r, sdf.columns) for r in srows) == sorted(
            norm_key(r, ocols) for r in orows
        ), name
        assert srows, name
    # s21 seeds with the global min surviving id (a query-block id here)
    s21 = analytics.ALL_QUERIES["s21_kcenter_select"](spark, str(tmp_path))
    first = s21.orderBy("step").collect()[0]
    assert first.vec_id == min(present)


def test_tie_mode_duplicates_under_fresh_ids():
    """tie mode must (a) actually create exact value ties — duplicated
    embeddings/documents — while (b) keeping every re-keyed id column
    unique, so the only thing it stresses is ordering totality."""
    con = duckdb.connect()
    d = build_dataset(977, mode="tie")
    dup_vecs = con.execute(
        f"""SELECT count(*) FROM (SELECT embedding FROM
        read_parquet('{d}/embeddings.parquet')
        GROUP BY embedding HAVING count(*) > 1)"""
    ).fetchone()[0]
    assert dup_vecs > 0, "no duplicated vectors — tie stress is a no-op"
    dup_texts = con.execute(
        f"""SELECT count(*) FROM (SELECT text FROM
        read_parquet('{d}/documents.parquet')
        GROUP BY text HAVING count(*) > 1)"""
    ).fetchone()[0]
    assert dup_texts > 0
    for t, idc in (("embeddings", "vec_id"), ("documents", "doc_id"), ("orders", "o_orderkey")):
        n, nd = con.execute(
            f"SELECT count(*), count(DISTINCT {idc}) FROM read_parquet('{d}/{t}.parquet')"
        ).fetchone()
        assert n == nd, f"{t}: duplicated ids leaked"


def test_s07_clone_vectors_rank_id_ascending(spark):
    """Regression for the tie fuzzer's second catch (round 9): N-T
    dgemm gives last-ulp-DIFFERENT gram columns for bit-identical
    neighbor vectors, so duplicated embeddings (exact cosine ties on
    the DuckDB side, broken id-ascending) ranked in BLAS-noise order on
    Spark — s07/s19/s22 all hash-mismatched on tie-mode fuzz data. The
    kernel now collapses identical vectors to one gram column and
    expands by lookup; verify the full spark-vs-oracle compare on a
    tie-stressed dataset."""
    from dbsink_spark import analytics

    d = build_dataset(977, mode="tie")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')"
    )
    # the dataset must actually contain a clone pair (guarded by the
    # tie-mode invariant test above); now the ranking must match
    sdf = analytics.ALL_QUERIES["s07_knn_graph"](spark, d)
    srows = sorted(tuple(r) for r in sdf.collect())
    orows = sorted(
        tuple(r) for r in con.execute(analytics.ALL_ORACLE["s07_knn_graph"]).fetchall()
    )
    assert srows == orows


def test_skew_mode_replicates_hot_slice_under_fresh_ids():
    """skew mode: a small slice replicated SKEW_COPIES times under
    fresh unique ids — verify hot groups actually exist (some text
    duplicated > TIE_DUP-style pair counts) and id uniqueness holds."""
    from tools.fuzz_oracle import SKEW_COPIES

    con = duckdb.connect()
    d = build_dataset(967, mode="skew")
    hot = con.execute(
        f"""SELECT max(cnt) FROM (SELECT count(*) AS cnt FROM
        read_parquet('{d}/documents.parquet') GROUP BY text)"""
    ).fetchone()[0]
    assert hot >= SKEW_COPIES + 1, "no hot slice — skew stress is a no-op"
    for t, idc in (("documents", "doc_id"), ("events", "event_id"), ("embeddings", "vec_id")):
        n, nd = con.execute(
            f"SELECT count(*), count(DISTINCT {idc}) FROM read_parquet('{d}/{t}.parquet')"
        ).fetchone()
        assert n == nd, f"{t}: duplicated ids leaked"


def test_text_mode_injects_adversarial_docs_and_props():
    """text mode must land every adversarial document (fresh ids, the
    n_chars == length(text) generator law intact, lang/source from the
    existing domains) and every adversarial props payload on events."""
    from tools.fuzz_oracle import EVENTS_ADVERSARIAL_PROPS, TEXT_ADVERSARIAL

    con = duckdb.connect()
    d = build_dataset(955, mode="text")
    docs = con.execute(
        f"SELECT text, lang, source, n_chars FROM read_parquet('{d}/documents.parquet') "
        f"ORDER BY doc_id DESC LIMIT {len(TEXT_ADVERSARIAL)}"
    ).fetchall()
    injected = {r[0] for r in docs}
    assert injected == set(TEXT_ADVERSARIAL)
    src_langs = {
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT lang FROM read_parquet('{SRC_SF}/documents.parquet')"
        ).fetchall()
    }
    for text, lang, source, n_chars in docs:
        assert n_chars == len(text), "n_chars == length(text) law broken"
        assert lang in src_langs
    props = {
        r[0]
        for r in con.execute(
            f"SELECT props FROM read_parquet('{d}/events.parquet') "
            f"ORDER BY event_id DESC LIMIT {len(EVENTS_ADVERSARIAL_PROPS)}"
        ).fetchall()
    }
    assert props == set(EVENTS_ADVERSARIAL_PROPS)
    for t, idc in (("documents", "doc_id"), ("events", "event_id")):
        n, nd = con.execute(
            f"SELECT count(*), count(DISTINCT {idc}) FROM read_parquet('{d}/{t}.parquet')"
        ).fetchone()
        assert n == nd, f"{t}: duplicated ids leaked"


def test_null_mode_nulls_value_columns_only():
    """null mode: ~NULL_PCT% of each configured value column goes
    NULL; keys and unconfigured columns stay intact."""
    from tools.fuzz_oracle import NULL_COLS, NULL_PCT

    con = duckdb.connect()
    d = build_dataset(941, mode="null")
    for t, cols in NULL_COLS.items():
        for col in cols:
            n, nn = con.execute(
                f"SELECT count(*), count({col}) FROM read_parquet('{d}/{t}.parquet')"
            ).fetchone()
            frac = 100.0 * (n - nn) / n
            assert 1 <= frac <= NULL_PCT + 7, f"{t}.{col}: {frac:.1f}% nulls"
    for t, idc in (("customer", "c_custkey"), ("events", "event_id")):
        n, nk = con.execute(
            f"SELECT count(*), count({idc}) FROM read_parquet('{d}/{t}.parquet')"
        ).fetchone()
        assert n == nk, f"{t}: key column must stay non-null"


def test_pct_is_seed_and_table_dependent():
    vals = {(_pct("orders", s), _pct("lineitem", s)) for s in range(1, 30)}
    assert len(vals) > 5, "fractions must vary across seeds"
    for s in range(1, 30):
        for t in TABLES:
            lo, hi = SAMPLE_PCT[t]
            assert lo <= _pct(t, s) <= hi


def test_six_digit_seed_builds_without_int32_overflow():
    # The hour-folded FUZZ_FRESH scheme (Makefile, round 12) emits
    # 6-digit seed bases like 294945; the dataset builder's DuckDB-side
    # shuffle hashed `rowid + seed * 7919` with two INT32 literals,
    # which overflows INT32 multiplication at seed >= 271182 and
    # aborted the whole sweep. Pinned on the exact first-failing seed.
    d = build_dataset(294945, mode="degenerate", rebuild=True)
    con = duckdb.connect()
    for t in TABLES:
        assert (
            con.execute(
                f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')"
            ).fetchone()[0]
            >= 0
        )
