"""Incrementally-maintained count-min sketch — the streaming twin of
the batch sketch query (analytics.stats.q51_countmin).

Count-min's defining property is MERGEABILITY: grids over disjoint
data merge by cell-wise addition. That makes it the canonical
streaming summary — each micro-batch reduces to its own (row, bucket)
partial grid (a map-side-combinable aggregate over 8-byte pairs), and
the merge is an additive upsert touching only the cells present in
the batch, exactly the RollupMaintainer pattern. The maintained grid
is at all times the exact grid a batch build over everything streamed
so far would produce (asserted cell-for-cell in tests).

At 100 TB/day the grid stays D×W cells regardless of stream volume —
the whole point of a sketch — and estimates are served from the
target store without touching the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..ddl import quoted
from ..functions.hashing import MINHASH_COEFFS, affine, h64

CM_D = 4
CM_W = 1024

LEDGER_TABLE = "_applied_batches"


def apply_batch_once(connect, dialect: str, table: str, sql: str, rows,
                     batch_id: int | None) -> bool:
    """Execute an ADDITIVE upsert with replay protection: when
    ``batch_id`` is given, a ledger marker row commits in the SAME
    transaction as the merge, so foreachBatch's at-least-once replay
    of an already-committed batch is a clean no-op — there is no
    applied-but-unmarked window (unlike a file-marker scheme).
    Returns False when the batch was already applied.

    Idempotent maintainers (bitmap OR, HLL max) don't need this —
    their replay is naturally absorbing; the ADDITIVE family
    (count-min, histogram, rollup) doubles on replay without it.
    """
    led = quoted(LEDGER_TABLE)
    ddl = (
        f"CREATE TABLE IF NOT EXISTS {led} ("
        "sink_table VARCHAR, batch_id BIGINT, "
        "PRIMARY KEY (sink_table, batch_id))"
    )
    conn = connect()
    try:
        if dialect == "postgres":
            with conn.cursor() as cur:
                if batch_id is not None:
                    cur.execute(ddl)
                    cur.execute(
                        f"SELECT 1 FROM {led} WHERE sink_table = %s"
                        " AND batch_id = %s",
                        (table, batch_id),
                    )
                    if cur.fetchone():
                        conn.rollback()
                        return False
                    cur.execute(
                        f"INSERT INTO {led} VALUES (%s, %s)", (table, batch_id)
                    )
                if rows:
                    cur.executemany(sql, rows)
            conn.commit()
            return True
        # duckdb (driver-local DBAPI)
        conn.execute("BEGIN TRANSACTION")
        try:
            if batch_id is not None:
                conn.execute(ddl)
                hit = conn.execute(
                    f"SELECT 1 FROM {led} WHERE sink_table = ?"
                    " AND batch_id = ?",
                    [table, batch_id],
                ).fetchone()
                if hit:
                    conn.execute("ROLLBACK")
                    return False
                conn.execute(
                    f"INSERT INTO {led} VALUES (?, ?)", [table, batch_id]
                )
            if rows:
                conn.executemany(sql, rows)
            conn.execute("COMMIT")
            return True
        except Exception:
            try:
                conn.execute("ROLLBACK")
            except Exception:
                pass
            raise
    finally:
        conn.close()


def _exec_ddl(connect, dialect: str, sql: str) -> None:
    """Run one DDL statement on either DBAPI shape: duckdb connections
    execute directly; postgres (psycopg2/pg_lite) goes through a
    cursor + commit. ensure_table previously called conn.execute
    unconditionally, which raised AttributeError on the very postgres
    dialect the maintainers support (live-test finding)."""
    conn = connect()
    try:
        if dialect == "postgres":
            conn.cursor().execute(sql)
            conn.commit()
        else:
            conn.execute(sql)
    finally:
        conn.close()


def batch_grid(df: DataFrame, item_col: str) -> DataFrame:
    """(d, bucket, cnt) partial grid for one batch of items.

    NULL items are dropped, not counted: h64(NULL) is NULL, so a NULL
    row would land a NULL-bucket partial that violates the sink's
    (d, bucket) primary key — and under at-least-once replay the same
    poisoned batch fails forever (review finding). Count-min counts
    items; a NULL is the absence of one."""
    wh = df.select(h64(F.col(item_col)).alias("h")).filter(F.col("h").isNotNull())
    buckets = F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                (affine(F.col("h"), a, b) % CM_W).alias("bucket"),
            )
            for i, (a, b) in enumerate(MINHASH_COEFFS[:CM_D])
        ]
    )
    return (
        wh.select(F.explode(buckets).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


class CountMinMaintainer:
    """Maintains an additive count-min grid in a DBAPI target from a
    streaming source of items."""

    def __init__(self, connect, table: str = "countmin", dialect: str = "duckdb"):
        self.connect = connect
        self.table = table
        self.dialect = dialect

    def ensure_table(self) -> None:
        _exec_ddl(
            self.connect,
            self.dialect,
            f"CREATE TABLE IF NOT EXISTS {quoted(self.table)} ("
            "d INTEGER, bucket INTEGER, cnt BIGINT, PRIMARY KEY (d, bucket))",
        )

    def merge_batch(self, grid_df: DataFrame, batch_id: int | None = None) -> None:
        rows = [(r["d"], r["bucket"], r["cnt"]) for r in grid_df.collect()]
        if not rows and batch_id is None:
            return
        sql = (
            f"INSERT INTO {quoted(self.table)} (d, bucket, cnt) VALUES (?, ?, ?) "
            f"ON CONFLICT (d, bucket) DO UPDATE SET cnt = {quoted(self.table)}.cnt + excluded.cnt"
        )
        if self.dialect == "postgres":
            sql = sql.replace("?", "%s")
        apply_batch_once(self.connect, self.dialect, self.table, sql, rows, batch_id)

    def estimate_sql(self, item_hash: int) -> str:
        """SQL that serves the point estimate for one item (by its h64
        hash) straight from the maintained grid: min over the item's
        CM_D cells, where an ABSENT grid row counts as ZERO — a plain
        `min(cnt) WHERE (d,bucket) IN (...)` sees only rows that exist,
        so an item whose d=0 bucket collides with a hot item while its
        other cells are empty would serve the hot count, and a
        never-streamed item with no collisions at all would serve NULL
        (review finding). One COALESCEd scalar subquery per cell keeps
        the missing-row-is-zero semantics in both dialects."""
        from ..functions.hashing import AFFINE_MOD, REDUCE_MOD

        cells = ", ".join(
            "COALESCE((SELECT cnt FROM "
            f"{quoted(self.table)} WHERE d = {i} AND "
            f"bucket = {(item_hash % REDUCE_MOD * a + b) % AFFINE_MOD % CM_W}), 0)"
            for i, (a, b) in enumerate(MINHASH_COEFFS[:CM_D])
        )
        return f"SELECT least({cells})"

    def run(
        self,
        source: DataFrame,
        item_col: str,
        checkpoint: str,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        self.ensure_table()

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_batch(batch_grid(batch_df, item_col), batch_id)

        stream = (
            source.writeStream.outputMode("append")
            .foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
        )
        if trigger:
            stream = stream.trigger(**trigger)
        return stream.start()


# ---------------------------------------------------------------------------
# Incrementally-maintained distinct-count bitmaps (q56's streaming twin)
# ---------------------------------------------------------------------------


def batch_bitmap(df: DataFrame, group_col: str, id_col: str) -> DataFrame:
    """(grp, word_idx, bits) partial bitmap for one batch: each integer
    id sets bit (id & 63) of 64-bit word (id >> 6), OR-combined per
    (group, word) — the same map-side-combinable aggregate q56 runs.

    Id-domain contract: ids must be NON-NEGATIVE int64. For a negative
    id, ``shiftright`` sign-extends and the JVM masks shift amounts
    (``id % 64`` is negative), so distinct ids would silently collide
    into the same bit and the "EXACT" served count would undercount.
    Rather than mis-count, a negative id fails the batch loudly: the
    word-index expression raises inside the projection (embedded in the
    used column so the optimizer cannot prune the check away)."""
    def _word_idx(c: str):
        return F.when(F.col(c) >= 0, F.shiftright(F.col(c), 6)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "batch_bitmap: negative id violates the non-negative "
                        "id-domain contract: "
                    ),
                    F.col(c).cast("string"),
                )
            )
        )
    return (
        # NULL ids are dropped (not an id; a NULL word_idx would both
        # dodge the negative-id tripwire — NULL >= 0 is NULL — and
        # poison the sink PK under replay, the batch_grid rule).
        # The id is re-aliased to a FIXED internal name before the
        # F.expr shift (shiftleft's amount must be a literal in the
        # column API), so an id column whose name needs quoting can't
        # break or mis-resolve inside the interpolated SQL (review).
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(group_col).alias("grp"), F.col(id_col).alias("_id"))
        .select(
            "grp",
            _word_idx("_id").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_id % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("grp", "word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


class BitmapMaintainer:
    """Maintains exact distinct-count bitmaps in a DBAPI target from a
    streaming source — the streaming twin of q56's batch bitmap
    aggregate.

    Bitmap OR is mergeable like count-min's addition, but also
    IDEMPOTENT: re-merging a replayed micro-batch leaves the store
    unchanged, so the maintained state is correct under at-least-once
    delivery without any batch-id bookkeeping (asserted in tests; the
    additive maintainers need the checkpoint for exactly-once). State
    size is |groups| x |id_space|/64 words regardless of stream volume,
    and the served count is EXACT, not an estimate.

    Id-domain contract: ids must be non-negative int64 (see
    ``batch_bitmap`` — a negative id fails the micro-batch loudly
    instead of silently colliding bits and undercounting)."""

    def __init__(self, connect, table: str = "bitmaps", dialect: str = "duckdb"):
        self.connect = connect
        self.table = table
        self.dialect = dialect

    def ensure_table(self) -> None:
        _exec_ddl(
            self.connect,
            self.dialect,
            f"CREATE TABLE IF NOT EXISTS {quoted(self.table)} ("
            "grp VARCHAR, word_idx BIGINT, bits BIGINT, "
            "PRIMARY KEY (grp, word_idx))",
        )

    def merge_batch(self, bitmap_df: DataFrame, batch_id: int | None = None) -> None:
        rows = [(r["grp"], r["word_idx"], r["bits"]) for r in bitmap_df.collect()]
        if not rows:
            return
        sql = (
            f"INSERT INTO {quoted(self.table)} (grp, word_idx, bits) VALUES (?, ?, ?) "
            f"ON CONFLICT (grp, word_idx) DO UPDATE SET bits = {quoted(self.table)}.bits | excluded.bits"
        )
        if self.dialect == "postgres":
            sql = sql.replace("?", "%s")
        conn = self.connect()
        try:
            if self.dialect == "duckdb":
                conn.executemany(sql, rows)
            else:
                with conn.cursor() as cur:
                    cur.executemany(sql, rows)
                conn.commit()
        finally:
            conn.close()

    def distinct_sql(self) -> str:
        """SQL serving the exact per-group distinct count from the
        maintained bitmaps. Dialect-aware popcount: PostgreSQL defines
        bit_count only for bit/bytea (PG14+), not bigint — the plain
        form raised 'function bit_count(bigint) does not exist' on the
        very dialect merge_batch explicitly supports (review)."""
        pop = (
            "bit_count(bits::bit(64))"
            if self.dialect == "postgres"
            else "bit_count(bits)"
        )
        return (
            f"SELECT grp, sum({pop})::BIGINT AS n_distinct "
            f"FROM {quoted(self.table)} GROUP BY grp ORDER BY grp"
        )

    def run(
        self,
        source: DataFrame,
        group_col: str,
        id_col: str,
        checkpoint: str,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        self.ensure_table()

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_batch(batch_bitmap(batch_df, group_col, id_col), batch_id)

        stream = (
            source.writeStream.outputMode("append")
            .foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
        )
        if trigger:
            stream = stream.trigger(**trigger)
        return stream.start()


# ---------------------------------------------------------------------------
# Incrementally-maintained HyperLogLog registers (q62's streaming twin)
# ---------------------------------------------------------------------------


def batch_hll(df: DataFrame, item_col: str) -> DataFrame:
    """(bucket, m_j) partial HLL register table for one batch — the
    same bucket/rho algebra as the batch sketch
    (analytics.advanced.q62_hll_distinct), reduced per-batch by
    map-side-combinable ``max``. NULL items are dropped (the
    batch_grid rule — and SQL count-distinct semantics: a NULL is the
    absence of an item): h64(NULL) is NULL, so a NULL row would land
    a NULL-bucket register that violates the sink's PRIMARY KEY
    (bucket), and under at-least-once replay the same poisoned batch
    fails forever. Found by the degenerate dialect-matrix axis: every
    OTHER maintainer's batch builder already filtered NULLs; HLL was
    the one that crashed live on both dialects."""
    from ..analytics.advanced import Q62_M, Q62_SHIFT

    d = df.select(h64(F.col(item_col)).alias("h")).filter(
        F.col("h").isNotNull()
    ).select(
        (F.col("h") % Q62_M).alias("bucket"),
        F.expr(f"h DIV {Q62_M}").alias("w"),
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(Q62_SHIFT))
        .otherwise(F.lit(Q62_SHIFT) - F.length(F.bin(F.col("w"))))
        .cast("long")
    )
    return d.groupBy("bucket").agg(F.max(rho).alias("m_j"))


class HLLMaintainer:
    """Maintains HyperLogLog registers in a DBAPI target from a
    streaming source of items — the streaming twin of q62.

    Register-wise ``max`` is mergeable AND idempotent (like
    BitmapMaintainer's OR, unlike count-min's addition): replaying a
    micro-batch leaves the registers unchanged, so the maintained
    state is correct under at-least-once delivery with no batch-id
    bookkeeping. State is a fixed m-row table regardless of stream
    volume, and at all times equals what a batch q62 over everything
    streamed so far would build (asserted register-for-register in
    tests). Daily register tables union+max into monthly ones without
    rescanning — the sketch-rollup property exact distinct lacks."""

    def __init__(self, connect, table: str = "hll_registers", dialect: str = "duckdb"):
        self.connect = connect
        self.table = table
        self.dialect = dialect

    def ensure_table(self) -> None:
        _exec_ddl(
            self.connect,
            self.dialect,
            f"CREATE TABLE IF NOT EXISTS {quoted(self.table)} ("
            "bucket BIGINT, m_j BIGINT, PRIMARY KEY (bucket))",
        )

    def merge_batch(self, regs_df: DataFrame, batch_id: int | None = None) -> None:
        rows = [(r["bucket"], r["m_j"]) for r in regs_df.collect()]
        if not rows:
            return
        sql = (
            f"INSERT INTO {quoted(self.table)} (bucket, m_j) VALUES (?, ?) "
            f"ON CONFLICT (bucket) DO UPDATE SET m_j = greatest({quoted(self.table)}.m_j, excluded.m_j)"
        )
        if self.dialect == "postgres":
            sql = sql.replace("?", "%s")
        conn = self.connect()
        try:
            if self.dialect == "duckdb":
                conn.executemany(sql, rows)
            else:
                with conn.cursor() as cur:
                    cur.executemany(sql, rows)
                conn.commit()
        finally:
            conn.close()

    def estimate_sql(self) -> str:
        """SQL serving the HLL distinct estimate straight from the
        maintained registers — identical formula to q62 (raw estimate;
        same inlined numerator literal)."""
        from ..analytics.advanced import Q62_NUM, Q62_SHIFT

        # ::INT on the shift amount: Postgres defines bigint << integer
        # but NOT bigint << bigint (live-matrix finding, round 10);
        # DuckDB accepts both forms identically
        return (
            f"SELECT {Q62_NUM} / sum(1::BIGINT << ({Q62_SHIFT} - m_j)::INT) AS est_distinct "
            f"FROM {quoted(self.table)}"
        )

    def run(
        self,
        source: DataFrame,
        item_col: str,
        checkpoint: str,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        self.ensure_table()

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_batch(batch_hll(batch_df, item_col), batch_id)

        stream = (
            source.writeStream.outputMode("append")
            .foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
        )
        if trigger:
            stream = stream.trigger(**trigger)
        return stream.start()


# ---------------------------------------------------------------------------
# Incrementally-maintained fixed-bin histogram (q27's streaming twin)
# — additive like count-min, but also serves approx QUANTILES
# ---------------------------------------------------------------------------

HIST_BIN_WIDTH = 50.0


def batch_histogram(df: DataFrame, value_col: str,
                    bin_width: float = HIST_BIN_WIDTH) -> DataFrame:
    """(bin, cnt) partial histogram for one batch — the same
    floor(value/width) binning as analytics.advanced.q27_histogram,
    map-side combinable. NULL values are dropped (a NULL bin would
    violate the sink's PK and brick the stream under replay — the
    batch_grid rule)."""
    return (
        df.select(F.floor(F.col(value_col) / bin_width).cast("long").alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


class HistogramMaintainer:
    """Maintains an additive fixed-bin histogram in a DBAPI target —
    q27's streaming twin, and the distribution-statistics member of
    the maintainer family (Rollup=sums, CountMin=frequency,
    Bitmap/HLL=distinct, Histogram=quantiles).

    Bin counts merge by addition — NOT replay-idempotent, so
    merge_batch dedups via the transactional batch ledger
    (``apply_batch_once``), like CountMin and unlike the absorbing
    OR/max maintainers. State is |occupied bins| rows
    regardless of volume. ``quantile_sql`` serves an approximate
    quantile by walking the cumulative histogram — error bounded by
    one bin width, the classic NDV-free equi-width scheme; tighten by
    shrinking bin width, whose only cost is state rows."""

    def __init__(self, connect, table: str = "histogram",
                 dialect: str = "duckdb", bin_width: float = HIST_BIN_WIDTH):
        self.connect = connect
        self.table = table
        self.dialect = dialect
        self.bin_width = bin_width

    def ensure_table(self) -> None:
        _exec_ddl(
            self.connect,
            self.dialect,
            f"CREATE TABLE IF NOT EXISTS {quoted(self.table)} ("
            "bin BIGINT, cnt BIGINT, PRIMARY KEY (bin))",
        )

    def merge_batch(self, hist_df: DataFrame, batch_id: int | None = None) -> None:
        rows = [(r["bin"], r["cnt"]) for r in hist_df.collect()]
        if not rows and batch_id is None:
            return
        sql = (
            f"INSERT INTO {quoted(self.table)} (bin, cnt) VALUES (?, ?) "
            f"ON CONFLICT (bin) DO UPDATE SET cnt = {quoted(self.table)}.cnt + excluded.cnt"
        )
        if self.dialect == "postgres":
            sql = sql.replace("?", "%s")
        apply_batch_once(self.connect, self.dialect, self.table, sql, rows, batch_id)

    def quantile_sql(self, q: float) -> str:
        """SQL serving the approximate q-quantile from the maintained
        bins: the left edge of the first bin whose cumulative count
        reaches q · total (error ≤ one bin width)."""
        t = quoted(self.table)
        return (
            # DOUBLE PRECISION, not DOUBLE: Postgres has no bare DOUBLE type
            # (live-test finding); DuckDB accepts both spellings
            f"SELECT CAST(min(bin) * {self.bin_width} AS DOUBLE PRECISION) AS q_approx FROM ("
            f"  SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,"
            f"         (SELECT sum(cnt) FROM {t}) AS total"
            f"  FROM {t}) AS cumhist WHERE cum >= {q} * total"
        )

    def run(
        self,
        source: DataFrame,
        value_col: str,
        checkpoint: str,
        trigger: dict | None = None,
    ) -> StreamingQuery:
        self.ensure_table()

        def fn(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_batch(
                batch_histogram(batch_df, value_col, self.bin_width), batch_id
            )

        stream = (
            source.writeStream.outputMode("append")
            .foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
        )
        if trigger:
            stream = stream.trigger(**trigger)
        return stream.start()
