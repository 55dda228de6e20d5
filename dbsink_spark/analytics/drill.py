"""Radix drill-down selection: exact order statistics WITHOUT sorting.

The distributed-selection primitive behind q84's exact-quantile audit
and q68's weighted median (round-7): find, per (group, target), the
smallest integer value whose cumulative weight (rows ordered by value)
reaches the target — using ~⌈digits/3⌉ rounds of fully-parallel
counting jobs instead of a global (or per-group) sort.

Why this matters at 100 TB: `sum(w) OVER (PARTITION BY g ORDER BY v)`
plans ONE task per group — with a 3-value group key that is a third of
the corpus sorting in a single task. The drill's rounds are map-side-
combinable conditional aggregations over shrinking ranges: every
executor participates in every round, and the per-round result the
driver sees is ≤ FANOUT·|targets| rows.

Algorithm (per target, all targets drilled in the same jobs):
    state = half-open candidate range [lo, hi) + residual target r
    round: split [lo, hi) into ≤FANOUT equal integer sub-ranges, sum
    the weights per sub-range, descend into the first sub-range whose
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

from .litdf import local_df

FANOUT = 1000  # sub-ranges per round; 8-digit ranges pin in ~3 rounds

# The ONE windowed-vs-drill gate threshold (q68 median, q55 ntile):
# below this many rows the low-cardinality-partition window path runs
# (a corpus-fraction of a SMALL input sorting in one task beats paying
# ~0.5 s/round of drill job latency); above it the radix drill keeps
# every task bounded. Both paths are exact and row-identical (forced-
# path tests), so the constant moves COST only, never results — one
# documented knob instead of one per operator (VERDICT_r07 "watch").
SINGLE_TASK_SORT_MAX_ROWS = 20_000_000


def weighted_value_at(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    targets: dict,
    raw_col: str | None = None,
    raw_scale: int = 1,
    brackets: dict | None = None,
) -> dict:
    """Exact weighted selection. ``targets`` is either

    * flat — ``{g: T}`` (one target per group; returns
      ``{g: (value, below)}``), or
    * nested — ``{g: {label: T}}`` (several targets per group, e.g.
      three quantiles of one distribution; returns
      ``{(g, label): (value, below)}``),

    where ``value`` is the smallest v such that ``sum(w | value <= v)``
    within group g reaches T and ``below`` is the weight strictly below
    v. Requires BIGINT-representable non-negative values, positive
    integer weights, and ``0 < T <= total group weight`` (callers
    compute targets from the same totals, so this holds by
    construction).

    ``raw_col``/``raw_scale``: when the value column is DERIVED from a
    raw numeric column by ``v = round(raw · raw_scale)``, pass the raw
    column so each round also applies the conservative raw-range twins
    of the integer filters (an OR of per-bracket ranges) — predicates
    the parquet scan can evaluate against row-group min/max stats (the
    derived column's filter never reaches the scan).

    ``brackets``: optional ``{(g, label): (lo, hi, below_mass)}``
    initial state — e.g. from a pre-computed histogram — where
    ``below_mass`` is the weight strictly below ``lo``. For FLAT
    targets the label is the literal ``"_"`` (the internal
    normalization), i.e. pass ``{(g, "_"): (lo, hi, 0)}``. Targets not
    bracketed start at the group's [min, max+1) with below_mass 0
    (computed by one extra min/max job only if needed).

    Driver state is |targets| tuples; each round is one job whose
    shuffle carries ≤ FANOUT·|targets| rows.
    """
    spark = df.sparkSession
    nested = targets and isinstance(next(iter(targets.values())), dict)
    flat: dict = {}
    for g, t in targets.items():
        if nested:
            for lbl, tt in t.items():
                flat[(g, lbl)] = tt
        else:
            flat[(g, "_")] = t

    cols = [
        F.col(group_col).alias("g"),
        F.col(value_col).alias("v"),
        F.col(weight_col).alias("w"),
    ]
    if raw_col is not None:
        cols.append(F.col(raw_col).alias("raw"))
    base = df.select(*cols)

    brackets = brackets or {}
    state: dict = {}
    need_bounds = [k for k in flat if k not in brackets]
    if need_bounds:
        bounds = {
            row["g"]: (row["mn"], row["mx"])
            for row in base.groupBy("g")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
            .collect()
        }
        for k in need_bounds:
            if k[0] not in bounds:
                # group has no rows: the requested order statistic
                # doesn't exist — omit the key instead of raising, and
                # let the caller decide (degenerate-input discipline)
                continue
            mn, mx = bounds[k[0]]
            state[k] = (mn, mx + 1, flat[k])
    for k, (lo, hi, below_mass) in brackets.items():
        state[k] = (lo, hi, flat[k] - below_mass)

    while any(hi - lo > 1 for lo, hi, _ in state.values()):
        active = [
            (g, lbl, lo, hi)
            for (g, lbl), (lo, hi, _) in state.items()
            if hi - lo > 1
        ]
        ranges = local_df(
            spark,
            [
                (g, str(lbl), lo, hi, (hi - lo + FANOUT - 1) // FANOUT)
                for g, lbl, lo, hi in active
            ],
            f"g {dict(base.dtypes)['g']}, lbl string, lo long, hi long, step long",
        )
        scan = base
        if raw_col is not None:
            pred = None
            for _g, _lbl, lo, hi in active:
                c = (F.col("raw") >= (lo - 1) / raw_scale) & (
                    F.col("raw") <= (hi + 1) / raw_scale
                )
                pred = c if pred is None else (pred | c)
            scan = base.filter(pred)
        rows = (
            scan.join(F.broadcast(ranges), "g")
            .filter((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
            .groupBy("g", "lbl", F.expr("(v - lo) DIV step").alias("b"))
            .agg(F.sum("w").alias("ww"))
            .collect()
        )
        per_key: dict = {}
        for row in rows:
            per_key.setdefault((row["g"], row["lbl"]), []).append(
                (row["b"], row["ww"])
            )
        for g, lbl, lo, hi in active:
            r = state[(g, lbl)][2]
            step, acc = (hi - lo + FANOUT - 1) // FANOUT, 0
            for b, ww in sorted(per_key[(g, str(lbl))]):
                if acc + ww >= r:
                    state[(g, lbl)] = (
                        lo + b * step,
                        min(hi, lo + (b + 1) * step),
                        r - acc,
                    )
                    break
                acc += ww
    out = {k: (lo, flat[k] - r) for k, (lo, _hi, r) in state.items()}
    if nested:
        return out
    return {g: vr for (g, _lbl), vr in out.items()}
