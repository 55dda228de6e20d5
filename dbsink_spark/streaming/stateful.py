"""Stateful streaming operators: watermarked dedup and windowed
aggregation.

The reference's only stateful behavior is upsert-as-dedup in Postgres
(reference dbsink/listen.py:160-166). In-engine streaming equivalents:

* ``streaming_dedup`` — drop duplicate keys inside the engine with a
  watermark bounding state (at 100 TB, state size = keys per watermark
  horizon, not keys-ever-seen);
* ``tumbling_aggregate`` / ``session_aggregate`` — event-time windowed
  rollups with late-data handling, the streaming twins of the batch
  q18/q19 queries (same grouping semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "time",
    delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked exact dedup on the mapping's upsert keys.

    Rows whose key was already seen within the watermark horizon are
    dropped; state older than ``delay`` is reclaimed. Downstream the
    sink's ON CONFLICT still guarantees terminal idempotency — this
    operator exists to cut redundant sink traffic at scale.
    """
    return df.withWatermark(ts_col, delay).dropDuplicates(keys)


def tumbling_aggregate(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    keys: list[str] | None = None,
    delay: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts/sums with late-data watermark."""
    group = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
        )
    )


def session_aggregate(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    keys: list[str] | None = None,
    delay: str = "30 minutes",
) -> DataFrame:
    """Session-window aggregation (gap-based), the streaming twin of the
    batch sessionizer (analytics.relational.q19)."""
    group = [F.session_window(F.col(ts_col), gap).alias("win")] + [
        F.col(k) for k in (keys or [])
    ]
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(*group)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *[F.col(k) for k in (keys or [])],
            "n_events",
        )
    )
