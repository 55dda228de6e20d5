"""Plan introspection: structured physical-plan statistics as data.

The scale discipline this engine enforces in tests (shuffle budgets,
no cartesians, pushed filters, broadcast dims) is exposed here as a
library API so PIPELINES can enforce it too — a pre-flight check
before an expensive run, a CI gate on a user's own queries, or an
audit table of plan shapes over time. ``plan_stats`` parses the
compiled physical plan; ``assert_scale_safe`` raises with a readable
reason when a plan violates the chosen budget.

This is plain string analysis of ``executedPlan`` (the same source
``tools/plan_budget.py`` and tests/test_plans.py read) — stable
across Spark 3.5/4.x formats for the operators named here, and
deliberately dependency-free.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame

# The ONLY registry rows exempt from the shuffle-budget tripwire, named
# once here for both the generator (tools/plan_budget.py) and the
# completeness assert (tests/test_plans.py). Both run an iterative
# driver loop DURING plan construction, so a single compiled plan does
# not exist; their per-round plans are covered by their own tests.
# VERDICT_r11 #3: every other registry row MUST have a plan_budget.json
# entry — a row absent from the json was silently never checked (how
# s22/c01 escaped the tripwire until round 11's manual regeneration).
PLAN_BUDGET_EXEMPT = frozenset({"d09_dup_clusters", "q119_kcore"})


@dataclass
class PlanStats:
    hash_exchanges: int = 0
    range_exchanges: int = 0
    single_partition_exchanges: int = 0
    broadcast_exchanges: int = 0
    broadcast_hash_joins: int = 0
    sort_merge_joins: int = 0
    broadcast_nested_loop_joins: int = 0
    cartesian_products: int = 0
    parquet_scans: int = 0
    scans_with_pushed_filters: int = 0
    wholestage_codegen_spans: int = 0
    python_evals: int = 0           # row-at-a-time Python UDFs (BatchEvalPython)
    arrow_evals: int = 0            # vectorized (ArrowEvalPython / mapInPandas)
    unpartitioned_windows: int = 0  # Window nodes with no PARTITION BY
    # Window nodes partitioned ONLY by known corpus-size-independent
    # low-cardinality keys (one "col_a,col_b" signature per node)
    lowcard_window_keys: list[str] = field(default_factory=list)
    notes: list[str] = field(default_factory=list)

    def as_dict(self) -> dict:
        return asdict(self)


def _iter_window_nodes(plan: str):
    """Yield ``(groups, exempt)`` for every Window node in the plan.

    A ``Window`` plan line renders its clauses as top-level bracket
    groups after the node name (verified against Spark 4.x
    executedPlan output for all four spec shapes):

        Window [funcs], [part], [order]   partitioned + ordered
        Window [funcs], [part]            partitioned, no order
        Window [funcs], [order]           UNPARTITIONED + ordered
        Window [funcs]                    UNPARTITIONED global frame

    The 2-group shapes disambiguate by content: an order spec always
    renders a sort direction (`` ASC``/`` DESC``); a partition spec
    never does. ``WindowGroupLimit`` nodes never match (different node
    name). ``exempt`` is True when the Window is fed DIRECTLY by
    ``TakeOrderedAndProject`` or ``WindowGroupLimit`` (the
    LimitPushDownThroughWindow / InferWindowGroupLimit rewrites of
    ``row_number ... WHERE rank <= k``): its input is provably ≤ the
    pushed limit.
    """
    lines = plan.splitlines()
    for ln, line in enumerate(lines):
        idx = line.find("Window [")
        if idx == -1:
            continue
        child = lines[ln + 1] if ln + 1 < len(lines) else ""
        exempt = "TakeOrderedAndProject" in child or "WindowGroupLimit" in child
        groups, depth = [], 0
        start = idx + len("Window ")
        for i, ch in enumerate(line[start:], start):
            if ch == "[":
                if depth == 0:
                    groups.append(i)
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups[-1] = line[groups[-1] : i + 1]
        yield groups, exempt


def _count_unpartitioned_windows(plan: str) -> int:
    """Count Window nodes whose spec has NO partition clause.

    Unpartitioned windows sort their ENTIRE input into one partition
    (WindowExec's own runtime warning) — the straggler class the
    shuffle-exchange budget cannot see, so it gets its own counter.
    Exempt nodes (see ``_iter_window_nodes``) are NOT counted.
    """
    n = 0
    for groups, exempt in _iter_window_nodes(plan):
        if exempt:
            continue
        if len(groups) == 1:
            n += 1
        elif len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1]):
            n += 1
    return n


# Harness-table columns whose cardinality is SMALL AND INDEPENDENT of
# corpus size (TPC-H categoricals, the synthetic documents/events
# enums, the md5-derived spatial zones), plus the aliases registry
# queries project them through. A Window partitioned ONLY by these
# keys divides corpus-sized input into a constant number of tasks —
# corpus/|key| rows per task, the q68 straggler class that is
# invisible to both the exchange budget and the unpartitioned-window
# counter (round-8 tripwire, VERDICT_r07 #4).
LOW_CARD_COLUMNS = frozenset(
    {
        # lineitem categoricals (+ common aliases)
        "l_returnflag", "returnflag", "flag",
        "l_linestatus", "linestatus",
        # orders
        "o_orderstatus", "status",
        "o_orderpriority", "priority",
        # customer / supplier / nation / region
        "c_mktsegment", "mktsegment", "segment",
        "c_nationkey", "s_nationkey", "n_nationkey", "nationkey",
        "n_name", "nation", "nation_name",
        "r_regionkey", "regionkey", "r_name", "region", "region_name",
        # part
        "p_brand", "brand", "p_mfgr", "mfgr",
        # documents / events enums
        "lang", "language", "source", "src", "event_type", "etype",
        # spatial zones (N_ZONES = 12)
        "zone", "zone_id",
    }
)


def _lowcard_window_keys(plan: str) -> list[str]:
    """Partition-key signatures of Window nodes partitioned ONLY by
    known corpus-size-independent low-cardinality columns.

    Returns one ``"col_a,col_b"`` signature (sorted, base names with
    the ``#id`` suffix stripped) per offending Window node. A key
    that mixes in ANY unknown/high-cardinality column is at least as
    fine-grained as that column and is not flagged. Exempt nodes (see
    ``_iter_window_nodes``) are skipped, as are unpartitioned ones
    (the other counter's job).
    """
    import re

    out = []
    for groups, exempt in _iter_window_nodes(plan):
        if exempt:
            continue
        if len(groups) == 3:
            part = groups[1]
        elif len(groups) == 2 and not (
            " ASC" in groups[1] or " DESC" in groups[1]
        ):
            part = groups[1]
        else:
            continue
        cols = {
            m.group(1).lower()
            for m in re.finditer(r"([A-Za-z_][A-Za-z0-9_]*)#\d+", part)
        }
        if cols and cols <= LOW_CARD_COLUMNS:
            out.append(",".join(sorted(cols)))
    return out


def plan_stats(df: DataFrame) -> PlanStats:
    """Parse the compiled physical plan of ``df`` into counters."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    s = PlanStats()
    s.hash_exchanges = plan.count("Exchange hashpartitioning")
    s.range_exchanges = plan.count("Exchange rangepartitioning")
    s.single_partition_exchanges = plan.count("Exchange SinglePartition")
    s.broadcast_exchanges = plan.count("BroadcastExchange")
    s.broadcast_hash_joins = plan.count("BroadcastHashJoin")
    s.sort_merge_joins = plan.count("SortMergeJoin")
    s.broadcast_nested_loop_joins = plan.count("BroadcastNestedLoopJoin")
    s.cartesian_products = plan.count("CartesianProduct")
    s.parquet_scans = plan.count("FileScan parquet")
    # a scan with at least one pushed predicate renders a non-empty
    # PushedFilters list
    s.scans_with_pushed_filters = plan.count("PushedFilters: [") - plan.count(
        "PushedFilters: []"
    )
    s.wholestage_codegen_spans = plan.count("WholeStageCodegen")
    s.python_evals = plan.count("BatchEvalPython")
    # every Arrow-batched Python execution shape: scalar pandas UDFs,
    # mapInPandas/mapInArrow, applyInPandas (FlatMapGroupsInPandas —
    # whose WithState variant, FlatMapGroupsInPandasWithState, is
    # counted by prefix), and applyInArrow. Substrings verified
    # non-overlapping ("MapInPandas" is not inside
    # "FlatMapGroupsInPandas": Map is followed by Groups there).
    s.arrow_evals = (
        plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("MapInArrow")
        + plan.count("FlatMapGroupsInPandas")
        + plan.count("FlatMapGroupsInArrow")
        + plan.count("FlatMapCoGroupsInPandas")
        + plan.count("FlatMapCoGroupsInArrow")
    )
    s.unpartitioned_windows = _count_unpartitioned_windows(plan)
    s.lowcard_window_keys = _lowcard_window_keys(plan)
    if s.cartesian_products:
        s.notes.append("cartesian product present — unbounded pairwise work")
    if s.python_evals:
        s.notes.append("row-at-a-time Python UDF in plan — use Arrow/pandas path")
    if s.unpartitioned_windows:
        s.notes.append(
            "unpartitioned Window in plan — entire input sorts into ONE "
            "partition; acceptable only over provably small (grid-bounded) "
            "inputs"
        )
    if s.lowcard_window_keys:
        s.notes.append(
            "Window partitioned only by low-cardinality key(s) "
            f"{sorted(set(s.lowcard_window_keys))} — corpus-sized input "
            "divides into a constant task count (corpus/|key| rows per "
            "task); acceptable only over pre-aggregated or "
            "cardinality-gated inputs"
        )
    return s


def assert_scale_safe(
    df: DataFrame,
    max_hash_exchanges: int | None = None,
    allow_single_partition: bool = True,
    allow_python_udf: bool = False,
) -> PlanStats:
    """Raise ``ValueError`` (with the offending counters) when the
    plan breaks a scale budget; return the stats otherwise."""
    s = plan_stats(df)
    problems = []
    if s.cartesian_products:
        problems.append(f"{s.cartesian_products} CartesianProduct node(s)")
    if not allow_python_udf and s.python_evals:
        problems.append(f"{s.python_evals} row-at-a-time Python UDF node(s)")
    if max_hash_exchanges is not None and s.hash_exchanges > max_hash_exchanges:
        problems.append(
            f"{s.hash_exchanges} hash exchanges > budget {max_hash_exchanges}"
        )
    if not allow_single_partition and s.single_partition_exchanges:
        problems.append(
            f"{s.single_partition_exchanges} SinglePartition exchange(s)"
        )
    if problems:
        raise ValueError("plan not scale-safe: " + "; ".join(problems))
    return s
