"""Radix drill-down selection: exact order statistics WITHOUT sorting.

The distributed-selection primitive behind q84's exact-quantile audit
and q68's weighted median (round-7): find, per group, the smallest
integer value whose cumulative weight (rows ordered by value) reaches
a target — using ≤ ceil(digits/2) rounds of fully-parallel counting
jobs instead of a global (or per-group) sort.

Why this matters at 100 TB: `sum(w) OVER (PARTITION BY g ORDER BY v)`
plans ONE task per group — with a 3-value group key that is a third of
the corpus sorting in a single task. The drill's rounds are map-side-
combinable conditional aggregations over shrinking ranges: every
executor participates in every round, and the per-round result the
driver sees is ≤ 100·|groups| rows.

Algorithm (per group, all groups drilled in the same jobs):
    state = half-open candidate range [lo, hi) + residual target r
    round: split [lo, hi) into ≤100 equal integer sub-ranges, sum the
    weights per sub-range, descend into the first sub-range whose
    cumulative weight reaches r (subtracting the skipped mass from r).
    Invariant: the range always holds ≥ r weight, so at hi-lo == 1
    every row in range has value lo — the exact answer — and the
    weight strictly below lo is (target − r).

Exactness: values and weights are BIGINT; per-sub-range sums are
order-independent; both engines (and any partitioning) produce the
identical result, so oracles need no drill-specific form — a plain
windowed-cumsum SQL oracle matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FANOUT = 1000  # sub-ranges per round; 8-digit ranges pin in ~3 rounds


def weighted_value_at(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    targets: dict,
    raw_col: str | None = None,
    raw_scale: int = 1,
) -> dict:
    """For each group g (a key of ``targets``), return
    ``g -> (value, below)`` where ``value`` is the smallest v such
    that ``sum(w | value <= v)`` reaches ``targets[g]`` and ``below``
    is the weight strictly below v. Requires BIGINT-representable
    non-negative values, positive integer weights, and
    ``0 < targets[g] <= total group weight`` (the caller computes
    targets from the same totals, so this holds by construction).

    ``raw_col``/``raw_scale``: when the value column is DERIVED from a
    raw numeric column by ``v = round(raw · raw_scale)``, pass the raw
    column so each round also applies the conservative raw-range twin
    of the integer filter — a predicate the parquet scan can evaluate
    against row-group min/max stats (the derived column's filter never
    reaches the scan).

    Driver state is |groups| tuples; each round is one job whose
    shuffle carries ≤ FANOUT·|groups| rows.
    """
    spark = df.sparkSession
    cols = [
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(weight_col).alias("w"),
    ]
    if raw_col is not None:
        cols.append(F.col(raw_col).alias("raw"))
    base = df.select(*cols)
    bounds = (
        base.groupBy("g")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    state: dict = {}
    for row in bounds:
        if row["g"] in targets:
            state[row["g"]] = (row["mn"], row["mx"] + 1, targets[row["g"]])
    while any(hi - lo > 1 for lo, hi, _ in state.values()):
        active = [(g, lo, hi) for g, (lo, hi, _) in state.items() if hi - lo > 1]
        ranges = spark.createDataFrame(
            [(g, lo, hi, (hi - lo + FANOUT - 1) // FANOUT) for g, lo, hi in active],
            f"g {dict(base.dtypes)['g']}, lo long, hi long, step long",
        )
        scan = base
        if raw_col is not None:
            gmin = min(lo for _, lo, _hi in active)
            gmax = max(hi for _, _lo, hi in active)
            scan = base.filter(
                (F.col("raw") >= (gmin - 1) / raw_scale)
                & (F.col("raw") <= (gmax + 1) / raw_scale)
            )
        rows = (
            scan.join(F.broadcast(ranges), "g")
            .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
            .groupBy("g", F.expr("(v - lo) DIV step").alias("b"))
            .agg(F.sum("w").alias("ww"))
            .collect()
        )
        per_g: dict = {}
        for row in rows:
            per_g.setdefault(row["g"], []).append((row["b"], row["ww"]))
        for g, lo, hi in active:
            r = state[g][2]
            step, acc = (hi - lo + FANOUT - 1) // FANOUT, 0
            for b, ww in sorted(per_g[g]):
                if acc + ww >= r:
                    state[g] = (lo + b * step, min(hi, lo + (b + 1) * step), r - acc)
                    break
                acc += ww
    return {g: (lo, targets[g] - r) for g, (lo, _hi, r) in state.items()}
