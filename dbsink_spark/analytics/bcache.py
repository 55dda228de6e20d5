"""Bounded per-site caches for registry query functions.

ADVICE_r11 found (and r12 fixed, for ``minhash_lsh_pairs`` only) the
untracked-caller leak class: a registry query that ``persist()``s an
internal relation with no release path leaks one cached frame PER
INVOCATION for the session's lifetime — harness sweeps (the oracle
replica, fuzz, bench min-of-3) invoke every query repeatedly, so the
executor slowly fills with dead cache blocks whose eviction churn
taxes later queries.

``bounded_persist(df, slot)`` is the r13 generalization (VERDICT_r12
#5): persist with ONE resident frame per call site. The next call on
the same slot unpersists the previous occupant first, so residency is
bounded by the number of distinct sites, never by invocation count.
Unpersisting an earlier invocation's frame is always safe — a consumer
that still references it simply recomputes (persist is a hint, not a
correctness device).

Callers with a real lifecycle (curation's ``cleanup`` list, the
incremental store's materialize-then-unpersist) keep their explicit
management; this helper is for the fire-and-forget query paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# slot -> the single resident frame for that call site
_SLOTS: dict[str, DataFrame] = {}


def bounded_persist(df: DataFrame, slot: str) -> DataFrame:
    """``df.persist()`` with one-frame-per-site residency (see module
    docstring). ``slot`` names the call site (convention:
    ``"<module>.<function>.<relation>"``)."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        prev.unpersist()
    _SLOTS[slot] = df
    return df.persist()


def register_bounded(df: DataFrame, slot: str) -> DataFrame:
    """Slot an ALREADY-persisted frame (loops that manage their own
    intermediate releases but whose final frame backs the returned
    plan): releases the slot's previous occupant, does NOT persist."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        prev.unpersist()
    _SLOTS[slot] = df
    return df


def resident_slots() -> dict[str, DataFrame]:
    """The current slot table (read-only use: tests / diagnostics)."""
    return dict(_SLOTS)
