"""Windows over corpus-sized input WITHOUT corpus-sized window groups.

``sum(v) OVER (PARTITION BY g ORDER BY o)`` plans ONE task per group —
with a catalog-sized group key (4 document sources, 3 return flags)
that is a quarter of the corpus sorting in a single task: the q68/t11
straggler class the round-8 low-cardinality-window tripwire
(``introspect._lowcard_window_keys``) exists to catch.

``grouped_running_sum`` assembles the same exact cumulative sum
scale-out, generalizing d19's global-rank machinery
(``dedup.d19_sorted_neighborhood``) from one global group to many:

  1. ``repartitionByRange(g, *order)`` — every partition holds a
     contiguous (g, order) interval, so for any group all its rows in
     earlier partitions sort strictly before its rows here;
  2. local cum-before per ``(partition id, g)`` window — each window
     group is at most one range partition, ~n/P rows, regardless of
     group cardinality;
  3. per-(pid, g) totals → per-group offset of partition p = sum of
     earlier partitions' totals for g. The offset window partitions by
     g over the totals table — ≤ shuffle-partition-count rows per
     group (cluster-config-bounded, NOT corpus-bounded), the same
     provably-small input as d19's offset table;
  4. broadcast the offsets back: offset + local cum IS the group
     cumulative sum.

Correctness needs BOTH consumers of the ranged DataFrame (totals,
local cumsum) to observe the SAME spark_partition_id assignment. The
function does not leave that to plan luck (an AQE variation or a Spark
upgrade could compile the range exchange twice with independently
sampled boundaries — advisor finding): the ranged frame is MATERIALIZED
with ``localCheckpoint`` before either consumer derives from it, so the
pids are frozen in storage and re-sampling is impossible by
construction. The checkpoint write is the same single materialization
the shuffle would have performed; consumers read it twice either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_running_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str,
) -> DataFrame:
    """Exact per-group EXCLUSIVE running sum (``rows between unbounded
    preceding and 1 preceding``, 0 for each group's first row) of
    ``value_col`` in ``order_cols`` order — scale-out even when
    ``group_col`` has tiny cardinality.

    ``order_cols`` must be unique per row within a group (use a key
    column as the last tiebreak) — the cumulative sum is otherwise
    partition-order-dependent. ``value_col`` must be integral
    (cast upstream); sums are BIGINT.
    """
    part = (
        df.repartitionByRange(group_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    totals = part.groupBy("_pid", group_col).agg(
        F.sum(value_col).cast("long").alias("_c")
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0).cast("long")).alias("_off"),
    )
    w_loc = (
        Window.partitionBy("_pid", group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.withColumn(
            "_lc",
            F.coalesce(
                F.sum(value_col).over(w_loc).cast("long"), F.lit(0).cast("long")
            ),
        )
        .join(F.broadcast(offsets), ["_pid", group_col])
        .withColumn(out_col, (F.col("_off") + F.col("_lc")).cast("long"))
        .drop("_pid", "_lc", "_off")
    )
