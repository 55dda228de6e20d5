"""Postgres-dialect SQL validation without a server (r02 VERDICT #7).

The generated postgres DDL/upsert strings were only ever string-built;
nothing postgres-shaped parsed them (the env has no psycopg2/sqlglot).
Two layers of defense:

1. STRUCTURAL invariants over every registry mapping × both dialects —
   balanced parens/quotes, placeholder count == bind column count, ON
   CONFLICT keys ⊆ declared unique-index keys, multi-VALUES form.
2. LIVE EXECUTION of the postgres statements on DuckDB after a
   documented, minimal pg→duck transform (each stripped construct
   listed below — drift inside those constructs is caught by the
   golden snapshot test, drift anywhere else fails the live run).

pg-only constructs transformed for the DuckDB run:
  CREATE EXTENSION …         → dropped (pg extension machinery)
  NULLS NOT DISTINCT         → dropped (pg15+ index clause)
  TRUNCATE … RESTART IDENTITY→ DELETE FROM …
  HSTORE / JSONB / geometry(…)→ TEXT (storage type only)
  ::hstore / ::jsonb casts   → removed
  ST_UnaryUnion(…)           → inner expression (PostGIS dissolve)
  ST_GeomFromText(%s, 4326)  → %s (PostGIS constructor)
  %s placeholders            → ?
"""

from __future__ import annotations

import re

import duckdb
import pytest

from dbsink_spark.ddl import create_statements
from dbsink_spark.mappings import registry
from dbsink_spark.mappings.registry import resolve
from dbsink_spark.sink import SinkWriter

ALL_LOOKUPS = sorted(registry.BUILTIN)


def _pg_to_duck(stmt: str) -> str | None:
    if stmt.startswith("CREATE EXTENSION"):
        return None
    s = stmt.replace(" NULLS NOT DISTINCT", "")
    s = re.sub(r"TRUNCATE TABLE (\S+) RESTART IDENTITY", r"DELETE FROM \1", s)
    s = re.sub(r"geometry\(\w+,\s*\d+\)", "TEXT", s)
    s = s.replace(" HSTORE", " TEXT").replace(" JSONB", " TEXT")
    s = re.sub(r"ST_GeomFromText\((%s|\?), *\d+\)", r"\1", s)
    s = re.sub(r"ST_UnaryUnion\((%s|\?)\)", r"\1", s)
    s = s.replace("::hstore", "").replace("::jsonb", "")
    s = s.replace("%s", "?")
    return s


def _balanced(s: str) -> bool:
    depth = 0
    in_squote = in_dquote = False
    for ch in s:
        if in_squote:
            in_squote = ch != "'"
        elif in_dquote:
            in_dquote = ch != '"'
        elif ch == "'":
            in_squote = True
        elif ch == '"':
            in_dquote = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and not in_squote and not in_dquote


@pytest.mark.parametrize("lookup", ALL_LOOKUPS)
@pytest.mark.parametrize("dialect", ["postgres", "duckdb"])
def test_generated_sql_structure(lookup, dialect):
    mapping = resolve(lookup, "some.topic")
    w = SinkWriter(mapping, lambda: None, dialect=dialect)
    stmts = create_statements(mapping, dialect, schema="s", drop=True)
    for s in stmts + [w.upsert_sql()]:
        assert _balanced(s), s
    sql = w.upsert_sql()
    n_cols = len([c for c in mapping.columns if c.bind != "serial"])
    ph = "%s" if dialect == "postgres" else "?"
    assert sql.count(ph) == n_cols, sql
    if mapping.upsert_keys:
        m = re.search(r"ON CONFLICT \(([^)]*)\)", sql)
        conflict_cols = {c.strip().strip('"') for c in m.group(1).split(",")}
        assert conflict_cols == set(mapping.upsert_keys)
        # excluded.-references only non-key columns
        for ref in re.findall(r'excluded\."([^"]+)"', sql):
            assert ref not in mapping.upsert_keys
    # multi-VALUES template form is consistent with the one-row form
    tmpl = w.row_template()
    assert f"VALUES {tmpl}" in sql
    assert tmpl.count(ph) == n_cols


@pytest.mark.parametrize("lookup", ALL_LOOKUPS)
@pytest.mark.parametrize("update_mode", ["overwrite", "preserve"])
def test_postgres_sql_executes_after_transform(lookup, update_mode):
    """The postgres statement stream (schema→DDL→extend→index→upsert→
    truncate→drop) EXECUTES end-to-end on DuckDB after the documented
    pg-only strips — a syntax-drift tripwire for everything else."""
    mapping = resolve(lookup, "pg.check.topic")
    w = SinkWriter(mapping, lambda: None, dialect="postgres", schema="s")
    w.update_mode = update_mode
    con = duckdb.connect()
    for stmt in create_statements(mapping, "postgres", schema="s"):
        d = _pg_to_duck(stmt)
        if d is not None:
            con.execute(d)
    # secondary indexes validated above; DuckDB (unlike Postgres)
    # refuses DO UPDATE SET on any indexed column, so drop them before
    # the upsert replay
    for stmt in create_statements(mapping, "postgres", schema="s"):
        m = re.match(r'CREATE INDEX IF NOT EXISTS ("([^"]+)")', stmt)
        if m:
            con.execute(f'DROP INDEX "s".{m.group(1)}')
    cols = [c for c in mapping.columns if c.bind != "serial"]
    row = []
    for c in cols:
        t = c.pg_type.upper()
        if "TIMESTAMP" in t:
            row.append("2020-01-01 00:00:00")
        elif any(k in t for k in ("DOUBLE", "REAL", "FLOAT", "NUMERIC")):
            row.append(1.5)
        elif any(k in t for k in ("INT", "BIGINT")):
            row.append(1)
        else:
            row.append("x")
    up = _pg_to_duck(w.upsert_sql())
    con.execute(up, row)
    con.execute(up, row)  # ON CONFLICT path must parse + fire
    tbl = f'"s"."{mapping.table}"'
    # keyless mappings are append-only: replay legitimately adds a row
    expected = 1 if mapping.upsert_keys else 2
    assert con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0] == expected
    for stmt in create_statements(mapping, "postgres", schema="s", truncate=True):
        d = _pg_to_duck(stmt)
        if d is not None:
            con.execute(d)
    assert con.execute(f"SELECT count(*) FROM {tbl}").fetchone()[0] == 0
    for stmt in create_statements(mapping, "postgres", schema="s", drop=True):
        d = _pg_to_duck(stmt)
        if d is not None:
            con.execute(d)


def test_postgres_golden_snapshot():
    """Pin the exact postgres statement strings for one representative
    mapping — any drift (including inside the pg-only constructs the
    DuckDB run strips) is a visible diff here."""
    mapping = resolve("GenericFloat", "axds-netcdf-replayer-data")
    stmts = create_statements(mapping, "postgres", schema="myschema", drop=True)
    joined = "\n".join(stmts)
    assert stmts[0] == 'CREATE SCHEMA IF NOT EXISTS "myschema"'
    assert stmts[1] == "CREATE EXTENSION IF NOT EXISTS hstore CASCADE"
    assert stmts[2] == 'DROP TABLE IF EXISTS "myschema"."axds-netcdf-replayer-data"'
    assert "NULLS NOT DISTINCT" in joined
    assert "geometry(POINT,4326)" in joined
    w = SinkWriter(mapping, lambda: None, dialect="postgres")
    sql = w.upsert_sql()
    assert "ST_GeomFromText(%s, 4326)" in sql
    assert "%s::hstore" in sql and "%s::jsonb" in sql
    assert sql.endswith(
        '"payload" = excluded."payload"'
    ) or "DO UPDATE SET" in sql


def test_geometry_union_bind_nodes_crossing_inputs():
    """G3 crossing-geometry handoff: the in-engine noder (round-5
    `dbsink_spark/functions/noding.py`) dissolves crossing polygons to
    the same result shapely's ``unary_union`` produces, and the sink's
    geometry_union bind STILL wraps the insert in ST_UnaryUnion as a
    belt-and-braces normalization — the same GEOS call the reference
    runs client-side (/root/reference/dbsink/tables.py:266-269)."""
    from dbsink_spark.functions import union_features_wkt

    crossing = [
        {"type": "Feature", "properties": {}, "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}},
        {"type": "Feature", "properties": {}, "geometry": {
            "type": "Polygon",
            "coordinates": [[[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]]]}},
    ]
    wkt = union_features_wkt(crossing)
    # in-engine noding dissolves the overlap into one polygon — the
    # exact shapely unary_union golden for these two squares
    assert wkt == "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"

    mapping = resolve("GenericGeography", "geo.topic")
    w = SinkWriter(mapping, lambda: None, dialect="postgres")
    sql = w.upsert_sql()
    assert "ST_UnaryUnion(ST_GeomFromText(%s, 4326))" in sql
    # duckdb dialect binds plain text — no PostGIS call
    wd = SinkWriter(mapping, lambda: None, dialect="duckdb")
    assert "ST_UnaryUnion" not in wd.upsert_sql()
