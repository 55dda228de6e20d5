"""Data-quality constraint audit and materialized-view rollup rewrite.

q74 is the Deequ/Great-Expectations capability class: a declarative
constraint suite (completeness, uniqueness, domain, range, referential
integrity) evaluated in one pass per table and emitted as an audit
table — the check-before-ship gate every ingestion pipeline (including
the reference's sink path) needs in front of a 100 TB lake write.

q75 is the classic OLAP aggregate-reuse class: materialize a fine
rollup once, then answer coarser questions from the rollup ALONE —
the algebraic rewrite behind every cube/summary-table serving layer
(and the batch twin of ``ivm.AggView``'s maintained aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import Tables

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def q74_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit: 9 constraints over 4 tables,
    one row per constraint with exact violation counts.

    Evaluation strategy (the part that matters at 100 TB):

    * ROW-LOCAL checks (null / domain / range) for a table are fused
      into ONE aggregation over that table — ``sum(case)`` columns,
      map-side combinable, no shuffle beyond the 1-row final combine.
      Key-uniqueness rides the SAME pass as a ``count(distinct key)``
      (Catalyst expands the scan; still a single table read).
    * REFERENTIAL checks are left-anti-join counts — the dimension side
      broadcasts when small (customer here), shuffle-hash otherwise;
      either way the fact table is read once per FK, never collected.
    * The audit output is constraint-cardinality-sized (9 rows): the
      union of 1-row aggregates is driver-negligible no matter the
      corpus.

    All violation counts are exact BIGINT — the audit is reproducible
    bit-for-bit across engines (oracle-verified), so it can gate a
    pipeline promotion without tolerance bands.
    """
    t = Tables(spark, sf_dir)

    def row(name: str, n, viol) -> DataFrame:
        # one audit row from a 1-row aggregate frame
        return n.select(
            F.lit(name).alias("constraint"),
            F.col("n").cast("long").alias("n_rows"),
            viol.cast("long").alias("n_violations"),
            (viol == 0).alias("passed"),
        )

    # orders: 3 row-local checks + key uniqueness in ONE scan
    o = t.orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("o_orderkey").alias("nd_key"),
        # when/otherwise, not bare cast: a NULL value makes the bare
        # predicate NULL and sum() of all-NULLs is NULL, while the
        # oracle's CASE..ELSE 0 counts a NULL as a NON-violation
        # (null-ness is the completeness check's job, not this one's)
        # — degenerate-mode fuzz catch, round 10 (all-NULL c_acctbal)
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0).cast("long")
        ).alias("bad_status"),
        F.sum(
            (F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).cast(
                "long"
            )
        ).alias("bad_price"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_cust"),
    ).localCheckpoint(eager=False)
    orders_checks = [
        row("orders.key_unique", o, F.col("n") - F.col("nd_key")),
        row("orders.status_domain", o, F.col("bad_status")),
        row("orders.totalprice_positive", o, F.col("bad_price")),
        row("orders.custkey_complete", o, F.col("null_cust")),
    ]

    # lineitem: range check + composite-key uniqueness, one scan
    li = t.lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        # struct-wrapped: bare count_distinct(a, b) drops rows where ANY
        # key column is NULL, while the oracle's count(DISTINCT (a, b))
        # counts ROW(NULL, x) as a distinct non-null struct — exactly the
        # divergence this uniqueness audit exists to catch. A struct is
        # never NULL even when its fields are, so both engines agree.
        F.count_distinct(F.struct("l_orderkey", "l_linenumber")).alias("nd_key"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1)
            .otherwise(0)
            .cast("long")
        ).alias("bad_disc"),
    ).localCheckpoint(eager=False)
    li_checks = [
        row("lineitem.pk_unique", li, F.col("n") - F.col("nd_key")),
        row("lineitem.discount_range", li, F.col("bad_disc")),
    ]

    # customer: business-rule range check (has real violations)
    cu = t.customer.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") < 0, 1).otherwise(0).cast("long")).alias(
            "neg_bal"
        ),
    )
    cu_checks = [row("customer.acctbal_nonneg", cu, F.col("neg_bal"))]

    # referential integrity: anti-join counts (dim side broadcastable).
    # A NULL FK is NOT an orphan here — null-ness is the completeness
    # check's job, and the SQL-standard NOT IN the oracle uses drops
    # NULLs too (divergent semantics would break the gate the moment a
    # null FK appears). Row totals reuse the o/li checkpointed
    # aggregates — no extra base-table scan just to recount.
    fk_cust = (
        t.orders.filter(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(t.customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("viol"))
        .crossJoin(o.select("n"))
    )
    fk_ord = (
        t.lineitem.filter(F.col("l_orderkey").isNotNull())
        .join(
            t.orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("viol"))
        .crossJoin(li.select("n"))
    )
    fk_checks = [
        row("orders.fk_customer", fk_cust, F.col("viol")),
        row("lineitem.fk_orders", fk_ord, F.col("viol")),
    ]

    # documents: completeness (non-empty text)
    dc = t.documents.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("text").isNull() | (F.length("text") == 0)).cast("long")
        ).alias("empty_text"),
    )
    dc_checks = [row("documents.text_nonempty", dc, F.col("empty_text"))]

    out = orders_checks + li_checks + cu_checks + fk_checks + dc_checks
    res = out[0]
    for d in out[1:]:
        res = res.unionByName(d)
    return res.orderBy("constraint")


ORACLE["q74_constraint_audit"] = """
WITH o AS (
  SELECT count(*) AS n,
         count(DISTINCT o_orderkey) AS nd_key,
         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)::BIGINT AS bad_status,
         sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT AS bad_price,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_cust
  FROM orders
), li AS (
  SELECT count(*) AS n,
         count(DISTINCT (l_orderkey, l_linenumber)) AS nd_key,
         sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)::BIGINT AS bad_disc
  FROM lineitem
), cu AS (
  SELECT count(*) AS n,
         sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)::BIGINT AS neg_bal
  FROM customer
), fkc AS (
  SELECT (SELECT count(*) FROM orders) AS n,
         (SELECT count(*) FROM orders
           WHERE o_custkey IS NOT NULL
             AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey IS NOT NULL)) AS viol
), fko AS (
  SELECT (SELECT count(*) FROM lineitem) AS n,
         (SELECT count(*) FROM lineitem
           WHERE l_orderkey IS NOT NULL
             AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                     WHERE o_orderkey IS NOT NULL)) AS viol
), dc AS (
  SELECT count(*) AS n,
         sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END)::BIGINT AS empty_text
  FROM documents
), audit AS (
  SELECT 'orders.key_unique' AS constraint, n::BIGINT AS n_rows,
         (n - nd_key)::BIGINT AS n_violations FROM o
  UNION ALL SELECT 'orders.status_domain', n::BIGINT, bad_status FROM o
  UNION ALL SELECT 'orders.totalprice_positive', n::BIGINT, bad_price FROM o
  UNION ALL SELECT 'orders.custkey_complete', n::BIGINT, null_cust FROM o
  UNION ALL SELECT 'lineitem.pk_unique', n::BIGINT, (n - nd_key)::BIGINT FROM li
  UNION ALL SELECT 'lineitem.discount_range', n::BIGINT, bad_disc FROM li
  UNION ALL SELECT 'customer.acctbal_nonneg', n::BIGINT, neg_bal FROM cu
  UNION ALL SELECT 'orders.fk_customer', n::BIGINT, viol::BIGINT FROM fkc
  UNION ALL SELECT 'lineitem.fk_orders', n::BIGINT, viol::BIGINT FROM fko
  UNION ALL SELECT 'documents.text_nonempty', n::BIGINT, empty_text FROM dc
)
SELECT "constraint", n_rows, n_violations, n_violations = 0 AS passed
FROM audit ORDER BY "constraint"
"""
QUERIES["q74_constraint_audit"] = q74_constraint_audit


def build_rollup_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fine materialized rollup behind q75: lineitem aggregated to
    (returnflag, linestatus, ship-month) with integer-exact sufficient
    statistics (count, quantity cents, extendedprice cents).

    The MV is group-cardinality-sized (|flags|·|statuses|·|months| ≈
    hundreds of rows regardless of corpus size), so materializing it is
    one map-side-combinable aggregation and every coarser question
    afterwards costs MV-rows, not base-rows.
    """
    li = Tables(spark, sf_dir).lineitem
    return (
        li.groupBy(
            "l_returnflag",
            "l_linestatus",
            F.date_trunc("month", "l_shipdate").alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "price_c"
            ),
        )
    )


def q75_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-reuse rewrite: answer a coarse rollup (per returnflag
    × ship-YEAR) from the fine materialized view ONLY — the base table
    is never rescanned (the MV is checkpoint-materialized; the final
    plan scans an in-memory RDD, plan-asserted in tests).

    Correct because the aggregation algebra is distributive over the
    (finer → coarser) grouping lattice: counts and integer-cent sums
    re-aggregate exactly, so coarse-from-MV equals direct-from-base
    bit-for-bit (the oracle computes the DIRECT form — the hash match
    IS the rewrite-correctness proof).

    Scale: this is the cube/summary-serving pattern — the 100 TB fact
    is touched once to build a KB-sized MV; every dashboard query after
    that is MV-sized. ``ivm.AggView`` keeps the same MV fresh under
    inserts/retractions without rescans.
    """
    mv = build_rollup_mv(spark, sf_dir).localCheckpoint(eager=False)
    return (
        mv.groupBy(
            "l_returnflag", F.year("ship_month").cast("long").alias("ship_year")
        )
        .agg(
            F.sum("cnt").alias("n_items"),
            # integer floor-div, NOT float /: a double quotient's
            # rounding breaks the bit-for-bit oracle match once sums
            # pass ~2^53 cents
            F.expr("sum(qty_c) div 100").alias("sum_qty"),
            F.sum("price_c").alias("revenue_cents"),
        )
        .orderBy("l_returnflag", "ship_year")
    )


ORACLE["q75_mv_rewrite"] = """
SELECT l_returnflag,
       year(l_shipdate)::BIGINT AS ship_year,
       count(*)::BIGINT AS n_items,
       (sum(round(l_quantity * 100)::BIGINT) // 100)::BIGINT AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT)::BIGINT AS revenue_cents
FROM lineitem
GROUP BY l_returnflag, ship_year
ORDER BY l_returnflag, ship_year
"""
QUERIES["q75_mv_rewrite"] = q75_mv_rewrite
