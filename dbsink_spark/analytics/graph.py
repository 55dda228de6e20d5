"""Reusable distributed graph primitives (DataFrame-native).

The query-registry entries (q61 PageRank, q63 triangles, d09 connected
components) are thin wrappers over these: the cores take a plain edge
DataFrame so they compose with ANY graph a pipeline derives — and so
property tests can drive them with random graphs against brute-force
references (tests/test_graph_properties.py), independent of the
harness tables.

Design rules shared by all primitives:
* fixed-point BIGINT arithmetic where iteration accumulates (PageRank)
  — summation-order-independent, so results are reproducible across
  engines, retries, and partitionings;
* loop-invariant state localCheckpointed ONCE (blocks reclaimed by the
  ContextCleaner when the frames go out of scope);
* every stage an equi-join / hash aggregate on node ids — AQE-skew-
  splittable, no cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_UNIT = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_BASE = PR_UNIT * (PR_DAMP_DEN - PR_DAMP_NUM) // PR_DAMP_DEN

TRI_ORD_BASE = 1_000_000_000

# pagerank lineage-truncation cadence (see pagerank_ranks loop)
PR_CHECKPOINT_EVERY = 5


def pagerank_ranks(edges: DataFrame, iters: int) -> DataFrame:
    """Fixed-point PageRank over a DIRECTED edge list ``(src, dst)``.

    Returns (node, pr) with pr in micro-ranks (1.0 == 1e6):
    ``pr = 0.15 + 0.85 · Σ_in pr(u) DIV outdeg(u)`` per iteration, all
    BIGINT. Nodes are the union of src values (every node must appear
    as a source at least once — guaranteed for symmetrized undirected
    graphs; dangling-node mass redistribution is out of scope and
    documented at the call sites).
    """
    # materialize the INPUT edge list once before fanning out (r12,
    # guide §2.4/§5): deg, edges_deg and nodes all replay the caller's
    # edge-derivation subtree otherwise (their downstream exchanges
    # differ, so AQE exchange reuse cannot dedup them). Same-session
    # A/B via q61 at sf0.1: 3.63 → 2.71 s, 21 → 17 jobs, rows equal.
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # loop-invariant: checkpoint once; eager=False so materialization
    # rides the first consuming action instead of paying two extra
    # up-front jobs (r12 job-fusion pass — the s22 discipline; values
    # are identical either way, the checkpoint only cuts lineage)
    edges_deg = edges.join(deg, "src").localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=False)
    )
    ranks = nodes.select("node", F.lit(PR_UNIT).cast("long").alias("pr"))
    for it in range(iters):
        # lineage truncation: each round nests a join+agg over the
        # previous ranks plan, so plan depth grows linearly and
        # Catalyst re-analysis goes quadratic — fine at K=3, minutes of
        # driver time at K=20+. Checkpoint every PR_CHECKPOINT_EVERY
        # rounds to reset lineage (eager, so the cut is real); values
        # are bit-identical either way (BIGINT fixed-point).
        if it > 0 and it % PR_CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), F.expr("pr DIV outdeg").alias("share"))
            .groupBy("node")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(PR_BASE)
                + F.expr(f"{PR_DAMP_NUM} * coalesce(contrib, 0L) DIV {PR_DAMP_DEN}")
            )
            .cast("long")
            .alias("pr"),
        )
    return ranks


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle count + wedge stats of an UNDIRECTED simple graph given
    as its canonical edge list ``(u, v)`` with ``u < v``, distinct.

    Degree-ordered compact-forward (Latapy 2008): orient every edge
    from its (degree, id)-smaller endpoint; each triangle is counted
    exactly once from its minimum vertex, and wedge fan-out is bounded
    by oriented out-degree ≤ O(√m). Returns ONE row:
    (n_nodes, n_edges, n_paths2, n_triangles, clustering_bp) — the
    coefficient is integer basis points (3·T·10⁴ DIV paths₂).
    """
    edges = edges.localCheckpoint(eager=False)
    und = edges.unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # ordk = deg·BASE + id is injective ONLY for ids in [0, TRI_ORD_BASE);
    # outside that domain ordk collisions break orientation injectivity
    # and triangles are silently miscounted, so the contract is enforced
    # in-plan (distributed, no extra pass) instead of assumed. Graphs
    # with larger ids should remap to dense ids first (zipWithIndex /
    # dense_rank), which a 100 TB pipeline needs anyway for ordk to stay
    # in 64 bits.
    ordv = deg.select(
        F.col("u").alias("node"),
        F.expr(
            f"CASE WHEN u < 0 OR u >= {TRI_ORD_BASE} THEN"
            f" raise_error('triangle_stats: node id out of [0, {TRI_ORD_BASE})"
            " — remap to dense ids first (ordk encoding contract)')"
            f" ELSE deg * {TRI_ORD_BASE}L + u END"
        ).alias("ordk"),
    )
    ej = (
        edges.join(ordv.select(F.col("node").alias("u"), F.col("ordk").alias("ord_u")), "u")
        .join(ordv.select(F.col("node").alias("v"), F.col("ordk").alias("ord_v")), "v")
        .select(
            F.when(F.col("ord_u") < F.col("ord_v"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ord_u") < F.col("ord_v"), F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.least("ord_u", "ord_v").alias("ord_src"),
            F.greatest("ord_u", "ord_v").alias("ord_dst"),
        )
        .localCheckpoint(eager=False)
    )
    e1, e2 = ej.alias("e1"), ej.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.ord_dst") < F.col("e2.ord_dst")),
    ).select(F.col("e1.dst").alias("wv"), F.col("e2.dst").alias("ww"))
    tri = wedges.join(
        ej.select(F.col("src").alias("wv"), F.col("dst").alias("ww")), ["wv", "ww"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    nn = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("deg * (deg - 1) DIV 2")).alias("n_paths2"),
    )
    return (
        nn.crossJoin(counts)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_paths2",
            "n_triangles",
            F.expr(
                "CASE WHEN n_paths2 = 0 THEN 0L"
                " ELSE 3 * n_triangles * 10000 DIV n_paths2 END"
            ).alias("clustering_bp"),
        )
    )


def sssp_bounded(
    edges: DataFrame, seeds: DataFrame, rounds: int, early_exit: bool = True
) -> DataFrame:
    """Multi-source weighted shortest path over a DIRECTED edge list
    ``(src, dst, w)`` with non-negative BIGINT weights: returns
    (node, dist) — the MINIMUM total weight from any seed over paths
    of at most ``rounds`` edges (seeds at 0). Unreached nodes are
    absent.

    Bellman-Ford with frontier pruning (the Pregel SSSP shape as
    DataFrame joins — q83's BFS generalized to weights): each round
    relaxes ONLY edges out of nodes improved last round, takes the
    min candidate per dst (hash agg), and keeps strict improvements
    via a join against the settled distances. A node not improved in
    round i-1 can contribute nothing new in round i, so pruning is
    exact; after K rounds the table equals full Bellman-Ford's K-round
    state — the min over ≤K-edge paths, a well-defined result even
    when the graph's diameter exceeds K. Early exit when no node
    improves (full convergence).

    Scale: round cost is O(|improved frontier| · avg-degree) edge hits
    shuffled on dst — never the whole distance table; distances are
    BIGINT so min() is reduction-order independent and an unrolled
    relaxation oracle matches exactly. Frontiers checkpoint per round
    (BFS rule); ``dist`` re-checkpoints every PR_CHECKPOINT_EVERY
    rounds only, since unlike BFS's append-only settled set it is
    REBUILT (min-merged) each round and its lineage would otherwise
    deepen per round.
    """
    # A fully static (checkpoint-free) unroll was tried for the
    # early_exit=False path (r13): the dist rebuild references dist
    # AND improved references dist, so the unrolled plan grows ~3x per
    # round — 2294 exchanges / 39 s at rounds=4 vs 6.4 s with
    # checkpoints. The per-round `improved` checkpoint STAYS; the jobs
    # are cut structurally instead: the dist rebuild is ONE
    # min-aggregate over dist ∪ improved — row-identical to the
    # previous anti-join + union (improved holds strictly smaller
    # distances, so min picks improved where present and the old row
    # elsewhere; BIGINT min is order-independent), for one exchange
    # instead of an anti-join's two. Same-JVM interleaved A/B via q92
    # at sf0.1: warm jobs 53 → 34 (−36%), wall 6.4 → 4.6 s; a
    # repartition("src") on the edges leaf was also tried and cut
    # nothing (jobs 53, and it regressed q61/q83's broadcast-shaped
    # loops), so edges stays un-shuffled.
    edges = edges.localCheckpoint(eager=False)
    dist = seeds.select("node", F.lit(0).cast("long").alias("dist")).localCheckpoint(
        eager=False
    )
    frontier = dist
    for i in range(1, rounds + 1):
        cand = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        improved = (
            cand.join(dist, "node", "left")
            .filter(F.col("dist").isNull() | (F.col("d") < F.col("dist")))
            .select("node", F.col("d").alias("dist"))
            # eager=False + count(): ONE job materializes the round's
            # frontier AND answers the convergence test (isEmpty on an
            # eager checkpoint cost a checkpoint job + a take(1) job)
            .localCheckpoint(eager=False)
        )
        # early_exit=False (r12): callers whose round BOUND is the
        # semantics (q92: distances over <=4-hop paths) skip the
        # per-round driver sync entirely — the whole loop then compiles
        # into ONE action. Results are identical by induction: once no
        # node improves, every later round's improved set is empty and
        # dist is row-identical; AQE's empty-relation propagation
        # prunes the overrun rounds' joins at runtime, so the overrun
        # costs stage metadata, not an edge-list shuffle, at any scale.
        if early_exit and improved.count() == 0:
            break
        dist = (
            dist.unionAll(improved)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if i % PR_CHECKPOINT_EVERY == 0:
            dist = dist.localCheckpoint(eager=False)
        frontier = improved
    return dist


def bfs_hops(
    edges: DataFrame, seeds: DataFrame, max_hops: int, early_exit: bool = True
) -> DataFrame:
    """Multi-source BFS over a DIRECTED edge list ``(src, dst)``:
    returns (node, hops) — the MINIMUM hop count from any seed node,
    for every node within ``max_hops`` (seeds at 0). Nodes not reached
    within the budget are absent.

    Frontier-based expansion (the Pregel/GraphX BFS shape expressed as
    DataFrame joins): each round joins only the JUST-SETTLED frontier
    against the edge list and anti-joins already-settled nodes away, so
    round i shuffles O(|frontier_i| · avg-degree) edge hits — never the
    full distance table — and the loop ends early when a frontier
    empties. Frontiers are eagerly localCheckpointed: the settled set
    is consumed by every later round (anti-join), so lineage is cut per
    round (the q61 truncation rule, applied every iteration because
    BFS state is frontier-sized, not graph-sized).

    Exactness: hop counts are integers; min-hop is reduction-order
    independent, so a recursive-CTE oracle matches exactly.
    """
    # loop-invariant: materialize once (module rule) — every round's
    # frontier join would otherwise replay the full edge-derivation
    # plan. NOT pre-shuffled by src (r13, measured): BFS's per-round
    # frontier joins plan as broadcasts (zero exchanges), so the
    # up-front repartition that wins in sssp_bounded is pure cost here
    # (q83 A/B: 2.15 → 2.79 s with it).
    edges = edges.localCheckpoint(eager=False)
    settled = seeds.select("node", F.lit(0).cast("long").alias("hops")).localCheckpoint(
        eager=False
    )
    frontier = settled
    for i in range(1, max_hops + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = reached.join(settled.select("node"), "node", "left_anti").select(
            "node", F.lit(i).cast("long").alias("hops")
        )
        # eager=False + count(): one job per round for materialize +
        # convergence test; early_exit=False collapses the bounded loop
        # into one action (see sssp_bounded — same empty-round
        # induction + AQE empty-relation argument)
        new = new.localCheckpoint(eager=False)
        if early_exit and new.count() == 0:
            break
        # NO checkpoint on settled: it is a union of frames that are
        # ALL already checkpointed, so its lineage stays K-shallow —
        # checkpointing it too re-materialized the whole distance table
        # every round (measured ~25% of q83's wall at sf0.1)
        settled = settled.unionAll(new)
        frontier = new
    return settled


CC_ALT_MAX_ROUNDS = 30  # safety cap; alternating converges in O(log n) rounds


def cc_alternating(
    edges: DataFrame, max_rounds: int = CC_ALT_MAX_ROUNDS, stats: dict | None = None
) -> DataFrame:
    """Connected components in O(log n) rounds: alternating large-star /
    small-star edge rewiring (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14). Input: an undirected pair list
    (first two columns, long node ids); output ``(doc_id, label)`` with
    label = the component's minimum node id.

    Why it exists next to d09's min-label propagation: propagation
    needs O(component diameter) rounds — fine for blob-shaped near-dup
    clusters, quadratic-feeling on chain/path components (a 10k-link
    chain needs 10k rounds). The star operations contract every path
    to its minimum in logarithmically many rounds regardless of
    diameter (property-tested on shuffled chains:
    tests/test_graph_properties.py), so this is the safe default when
    the component shape is unknown.

    Per round: each star op is one symmetric-closure union, one
    min hash-agg keyed by node, one equi-join back to the edge list,
    one distinct — all on the EDGE list (duplicate-pair-sized, never
    corpus-sized), AQE-skew-splittable, no cartesian. The edge list
    localCheckpoints per round (it is rebuilt, not appended — the
    sssp dist-table rule) and convergence is detected by a (count,
    XOR-of-edge-hash) digest equality — the q95 digest trick, one
    tiny agg job instead of a full set-compare join.

    Fixpoints of the round map are exactly star forests whose centers
    are component minima (per the paper), so at digest convergence
    ``E`` IS the doc->label mapping; isolated nodes label themselves.
    """
    cols = edges.columns
    E = (
        edges.select(
            F.col(cols[0]).cast("long").alias("u"),
            F.col(cols[1]).cast("long").alias("v"),
        )
        .filter("u <> v")
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        E.select(F.explode(F.array("u", "v")).alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    prev = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # large-star: attach every strictly-larger neighbor of u to
        # m = min(Γ(u) ∪ {u}). No ``distinct`` on the symmetric
        # closure (r12, guide §2.4): both consumers are dup-safe — the
        # min aggregate ignores duplicates and the round's edge set is
        # distinct-ed once at the end — so the two extra exchanges the
        # intermediate dedups cost bought nothing.
        s = E.unionAll(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            s.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        )
        E = (
            s.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter("u <> v")
            .distinct()
        )
        # small-star: orient edges larger->smaller; attach u and its
        # not-larger neighbors to m = min(Γ⁻(u) ∪ {u}) (= min neighbor,
        # since every Γ⁻ member is < u). Same dup-safety argument: no
        # intermediate distinct.
        s2 = E.unionAll(
            E.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).filter(F.col("v") < F.col("u"))
        m2 = s2.groupBy("u").agg(F.min("v").alias("mn"))
        leaves = (
            s2.join(m2, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .filter("u <> v")
        )
        centers = m2.select("u", F.col("mn").alias("v"))
        # eager=False: the digest agg below is the materializing action
        # (one job per round instead of checkpoint + digest)
        E = leaves.unionAll(centers).distinct().localCheckpoint(eager=False)
        d = E.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).first()
        digest = (d["n"], d["h"])
        if digest == prev:
            break
        prev = digest
    else:
        # module fail-loud policy (matches kcore_members): a silent
        # partial contraction would return WRONG component labels.
        # Practically unreachable — alternating star contraction
        # converges in O(log n) rounds (Kiveris et al., SoCC'14), so
        # 30 rounds cover any n < 2^30-component graph.
        raise RuntimeError(
            f"cc_alternating: no fixed point after {max_rounds} rounds "
            "(digest still moving) — raise max_rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds
    lbl = E.select(F.col("u").alias("doc_id"), F.col("v").alias("lbl"))
    return nodes.join(lbl, "doc_id", "left").select(
        "doc_id", F.coalesce("lbl", "doc_id").alias("label")
    )


LP_CHECKPOINT_EVERY = 2  # label tables are narrow; cheap to cut often

# Bounded-round loops up to this depth compile STATICALLY — no per-round
# or fan-out checkpoints, the whole loop is ONE plan/action (r13,
# VERDICT_r12 #1): every localCheckpoint(eager=False) is a separate RDD
# materialization with its own AQE stage jobs, and it BLINDS AQE's
# runtime exchange reuse across rounds (the edge list's shuffle subtree
# is identical every round, but reuse only dedups within one executed
# plan). At this depth Catalyst analysis of the unrolled plan stays in
# the low milliseconds; past it, lineage truncation wins again.
LP_STATIC_MAX_ROUNDS = 8


def label_propagation(edges: DataFrame, rounds: int) -> DataFrame:
    """Synchronous label propagation over a SYMMETRIZED edge list
    ``(src, dst)`` — the classic near-linear community detector
    (Raghavan et al. 2007), made fully deterministic: every node's new
    label is the most frequent label among its neighbours, ties broken
    by SMALLEST label. Labels init to the node id; exactly ``rounds``
    synchronous updates run (bounded-round semantics, like
    ``sssp_bounded`` — convergence detection is the caller's knob).

    Returns (node, label).

    Determinism is total: integer counts + a lexicographic (−count,
    label) argmin mean any engine, partitioning, or retry produces the
    same labels — which is what lets a SQL oracle verify communities
    value-for-value (the textbook async LPA with random visit order
    cannot be oracle-checked).

    Scale shape: each round is one equi-join (labels onto edge
    sources) + one hash aggregate per (dst, label) + one ``min_by``
    hash aggregate per dst — no windows, no sorts; shuffles carry the
    (node, label) pairs, bounded by edge count. Per-round
    localCheckpoint keeps the iterative plan flat (pagerank_ranks
    discipline).
    """
    # checkpoint edges FIRST and derive nodes from the checkpointed
    # frame (r12, guide §2.4/§5): the previous order materialized two
    # separate checkpoints that EACH replayed the caller's edge
    # derivation. Same-session A/B via q105 at sf0.1: 4.60 → 3.51 s,
    # 32 → 28 jobs, rows equal. The checkpoint STAYS in static mode:
    # the edge list is referenced once per round, and inlining its
    # derivation subtree per reference exploded the compiled plan
    # 20 → 90 exchanges (measured r13) — a LogicalRDD leaf is free.
    edges = edges.localCheckpoint(eager=False)
    # STATIC mode for bounded small round counts (r13, VERDICT_r12 #1):
    # labels/nodes are a single-consumer chain, so skipping their
    # checkpoints has zero subtree duplication and compiles the whole
    # loop into ONE plan — the per-round (node,label) RDD
    # materializations and their AQE stage jobs disappear. Values are
    # identical by construction (the checkpoints only ever cut lineage).
    static = rounds <= LP_STATIC_MAX_ROUNDS
    nodes = edges.select(F.col("src").alias("node")).distinct()
    if not static:
        nodes = nodes.localCheckpoint(eager=False)
    labels = nodes.select("node", F.col("node").alias("label"))
    for it in range(rounds):
        if not static and it > 0 and it % LP_CHECKPOINT_EVERY == 0:
            # eager=False: the final action materializes every cut —
            # the logical plan is truncated either way (r12 job fusion)
            labels = labels.localCheckpoint(eager=False)
        counts = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = counts.groupBy("node").agg(
            F.expr("min_by(label, struct(-cnt, label))").alias("label")
        )
    return labels


def kcore_members(
    edges: DataFrame, k: int, max_rounds: int, stats: dict | None = None
) -> DataFrame:
    """k-core of an UNDIRECTED graph given as a SYMMETRIC distinct
    edge list (src, dst): iteratively delete all nodes with degree
    < k until fixpoint; returns the surviving (node) set. The
    degeneracy peel — "which part of the graph is structurally dense,
    not just high-degree" (a hub with k pendant neighbors dies with
    them; a cycle of degree-2 nodes survives k=2 forever).

    Loop discipline (the module's standard): the edge set is
    localCheckpointed every round AND shrinks monotonically — round i
    re-derives degrees from the INDUCED subgraph of round i-1's
    survivors, so per-round cost tracks the shrinking graph, not the
    input. Early exit on the first round that deletes nothing.
    Supports peel depths up to max_rounds INCLUSIVE: the fixpoint
    check costs one extra no-deletion iteration, budgeted here, so
    callers can set max_rounds equal to their oracle's unroll depth
    without an off-by-one. Raises if the peel hasn't converged within
    that — a silent partial peel must never masquerade as the core.
    """
    # eager=False + count(): each round's materialization rides its
    # convergence-test job (r12 job-fusion pass; values unchanged)
    und = edges.localCheckpoint(eager=False)
    n_edges = und.count()
    rounds = 0
    for _ in range(max_rounds + 1):
        # filter by ANTI-joining the DEAD set (deg < k) instead of
        # inner-joining the alive set (r13, guide §3.1): every src in
        # und has a degree row, so the two are row-identical — but dead
        # shrinks to near-empty as the peel converges, so AQE broadcasts
        # the two filters at runtime (zero exchanges) where the
        # alive-side inner joins planned as SMJs. Falls back to a
        # shuffle join automatically on a corpus whose first-round dead
        # set is too big to broadcast.
        dead = (
            und.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") < k)
            .select(F.col("src").alias("node"))
        )
        und = (
            und.join(dead.select(F.col("node").alias("src")), "src", "left_anti")
            .join(dead.select(F.col("node").alias("dst")), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n = und.count()
        if n == n_edges:
            if stats is not None:
                stats["rounds"] = rounds
            return und.select(F.col("src").alias("node")).distinct()
        n_edges = n
        rounds += 1
    raise RuntimeError(
        f"k-core peel did not converge within {max_rounds} rounds "
        "(raise max_rounds together with the oracle's unroll depth)"
    )
