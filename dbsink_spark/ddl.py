"""DDL generation: mapping schema → CREATE TABLE / INDEX statements.

Replaces the reference's SQLAlchemy reflect-and-extend startup phase
(reference dbsink/listen.py:103-135) with explicit, dialect-aware SQL
executed once at the driver before a stream/batch write starts.

Dialects: ``postgres`` (production target — HSTORE/JSONB/PostGIS
types, sequence-backed serial id) and ``duckdb`` (test harness —
portable types, same upsert semantics through a unique index).
"""

from __future__ import annotations

from .mappings.base import ColumnSpec, Mapping

_DUCK_TYPE_MAP = {
    "JSONB": "TEXT",
    "JSON": "TEXT",
    "HSTORE": "TEXT",
    "TIMESTAMPTZ": "TIMESTAMPTZ",
    "DOUBLE PRECISION": "DOUBLE",
    "TEXT NOT NULL": "TEXT NOT NULL",
}


def _duck_type(col: ColumnSpec) -> str:
    if col.bind.startswith("geometry"):
        return "TEXT"
    return _DUCK_TYPE_MAP.get(col.pg_type, col.duck_type or col.pg_type)


def quoted(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _pg_type(col: ColumnSpec, postgis: bool) -> str:
    """Postgres column type; geometry degrades to WKT TEXT when the
    server lacks PostGIS (sink.SinkWriter.postgis — documented
    degraded mode, probed not assumed)."""
    if not postgis and col.bind.startswith("geometry"):
        return "TEXT"
    return col.pg_type


def create_statements(
    mapping: Mapping,
    dialect: str = "postgres",
    schema: str | None = None,
    drop: bool = False,
    truncate: bool = False,
    postgis: bool = True,
) -> list[str]:
    """Idempotent environment + table DDL, in execution order.

    Mirrors the reference's startup sequence: schema + extension
    (listen.py:103-106), optional drop/truncate (listen.py:108-119),
    create-or-extend table with unique index (listen.py:121-135).
    """
    table = quoted(mapping.table)
    if schema:
        table = f"{quoted(schema)}.{table}"
    stmts: list[str] = []

    if dialect == "postgres":
        if schema:
            stmts.append(f"CREATE SCHEMA IF NOT EXISTS {quoted(schema)}")
        stmts.append("CREATE EXTENSION IF NOT EXISTS hstore CASCADE")

    if drop:
        stmts.append(f"DROP TABLE IF EXISTS {table}")
    elif truncate:
        if dialect == "postgres":
            stmts.append(f"TRUNCATE TABLE {table} RESTART IDENTITY")
        else:
            stmts.append(f"DELETE FROM {table}")

    stmts.append(f"CREATE SEQUENCE IF NOT EXISTS {quoted(mapping.sequence_name)}")

    col_defs = []
    for c in mapping.columns:
        if c.bind == "serial":
            default = f"nextval('{mapping.sequence_name}')"
            col_defs.append(f"{quoted(c.name)} INTEGER PRIMARY KEY DEFAULT {default}")
            continue
        sql_type = _pg_type(c, postgis) if dialect == "postgres" else _duck_type(c)
        col_defs.append(f"{quoted(c.name)} {sql_type}")
    stmts.append(f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(col_defs)})")

    # create-or-EXTEND: an existing table gains any newly-declared
    # columns (the reference's reflect + extend_existing + create_all,
    # listen.py:121-135). ADD COLUMN IF NOT EXISTS is a no-op when the
    # column already exists in both dialects.
    for c in mapping.columns:
        if c.bind == "serial":
            continue
        sql_type = _pg_type(c, postgis) if dialect == "postgres" else _duck_type(c)
        stmts.append(
            f"ALTER TABLE {table} ADD COLUMN IF NOT EXISTS {quoted(c.name)} "
            f"{sql_type.replace(' NOT NULL', '')}"
        )

    if mapping.upsert_keys:
        keys = ", ".join(quoted(k) for k in mapping.upsert_keys)
        # Postgres 15+: NULLS NOT DISTINCT makes upsert idempotent even
        # when a key column (e.g. z) is NULL — the reference's index
        # silently duplicates rows on replay in that case (its unique
        # index has default NULLS DISTINCT, dbsink/tables.py:323-341).
        nnd = " NULLS NOT DISTINCT" if dialect == "postgres" else ""
        stmts.append(
            f"CREATE UNIQUE INDEX IF NOT EXISTS {quoted(mapping.unique_index_name)} "
            f"ON {table} ({keys}){nnd}"
        )
    if dialect == "postgres":
        for c in mapping.columns:
            if c.index and c.bind != "serial":
                idx = f"ix_{mapping.table}_{c.name}".replace("-", "_").lower()
                stmts.append(
                    f"CREATE INDEX IF NOT EXISTS {quoted(idx)} ON {table} ({quoted(c.name)})"
                )
    return stmts
