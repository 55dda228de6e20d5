"""Spatial analytics: grid-blocked spatial joins with EXACT integer
geometry — no spatial extension, no UDFs, every predicate a plain
column expression both engines evaluate identically.

The two operators here are the two canonical spatial-join shapes:

* q102 point-in-polygon — assign points to covering zones;
* q103 radius join — all point pairs within a distance.

Both use the same 100 TB technique: a COARSE GRID turns the spatial
predicate into an equi-join on an integer cell id (the blocking step:
candidates are bounded by cell occupancy, never |points| x |zones| or
|points|^2), and an EXACT integer test (half-plane cross products /
squared distance) filters candidates — so the grid affects cost only,
never results. This is the standard production layout for spatial
data lakes (geohash / S2 / H3 bucketing) expressed on a flat integer
grid so the DuckDB oracle can verify it value-for-value.

Coordinates are synthesized deterministically from keys via the
portable ``h64`` (the testdata carries no geo columns); at 100 TB the
same plans run over real point columns unchanged.

Reference parity: the reference's geometry surface is sink-side WKT /
GeoJSON normalization (dbsink/tables.py geometry paths, covered by
functions/geo.py); it has no spatial JOIN surface — extension
machinery, same policy as graph.py (SURVEY §2.6 gap table).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h64, h64_sql
from .tables import Tables
from .litdf import local_df

QUERIES: dict = {}
ORACLE: dict = {}

WORLD = 10_000          # coordinate range [0, WORLD) on both axes
CELL = 1_000            # grid cell edge -> (WORLD // CELL)^2 cells
N_ZONES = 12
RADIUS = 700            # q103 pair radius; RADIUS <= CELL so the
                        # 3x3 neighbourhood is a complete candidate set


def _h(s: str) -> int:
    """Python twin of functions.hashing.h64 (md5 first 15 hex digits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _zones() -> list[tuple[int, list[tuple[int, int]]]]:
    """Deterministic CCW triangles (zone_id, [(x, y)] * 3): centers and
    radii from md5 so every engine/test re-derives the identical set.
    Vertices start in ascending construction-angle order; ascending
    angle alone does NOT guarantee CCW (all three angles can land
    within a <180° arc, e.g. 119°/121°/241°, putting the center
    outside the triangle), so the signed area is checked and the
    winding flipped if needed — the downstream all->=0 half-plane test
    is unsatisfiable for a CW triangle and would yield a silently
    empty zone MIRRORED into the oracle."""
    out = []
    for z in range(N_ZONES):
        cx = 1_500 + _h(f"z{z}cx") % (WORLD - 3_000)
        cy = 1_500 + _h(f"z{z}cy") % (WORLD - 3_000)
        # three angles in distinct 120-degree sectors -> non-degenerate
        verts = []
        for k in range(3):
            # integer "angle" workaround: pick the sector corner offsets
            # from a small deterministic table; radius in [400, 1400)
            r = 400 + _h(f"z{z}r{k}") % 1_000
            frac = (_h(f"z{z}a{k}") % 1_000) / 1_000.0  # within-sector
            ang = (k + frac) * 2.0943951023931953  # 2*pi/3
            verts.append(
                (cx + int(r * math.cos(ang)), cy + int(r * math.sin(ang)))
            )
        (ax, ay), (bx, by), (qx, qy) = verts
        cross = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        if cross < 0:  # CW — swap two vertices to restore CCW
            verts = [verts[0], verts[2], verts[1]]
            cross = -cross
        assert cross > 0, f"degenerate zone {z}: collinear vertices"
        out.append((z, verts))
    return out


ZONES = _zones()


def _zone_cells() -> list[tuple[int, int]]:
    """(zone_id, cell_id) for every grid cell intersecting the zone's
    bounding box — conservative blocking; the exact half-plane test
    filters the overhang."""
    pairs = []
    ncell = WORLD // CELL
    for z, verts in ZONES:
        xs = [x for x, _ in verts]
        ys = [y for _, y in verts]
        for gx in range(max(0, min(xs) // CELL), min(ncell - 1, max(xs) // CELL) + 1):
            for gy in range(max(0, min(ys) // CELL), min(ncell - 1, max(ys) // CELL) + 1):
                pairs.append((z, gx * ncell + gy))
    return pairs


def _points(spark: SparkSession, sf_dir: str, table: str, key: str) -> DataFrame:
    """Deterministic synthetic points for a keyed table: coordinates
    are h64 residues of the key — a pure row function, identical in
    both engines and under any partitioning/retry."""
    t = getattr(Tables(spark, sf_dir), table)
    kx = F.concat_ws("", F.col(key).cast("string"), F.lit("x"))
    ky = F.concat_ws("", F.col(key).cast("string"), F.lit("y"))
    return t.select(
        F.col(key).alias("pid"),
        (h64(kx) % WORLD).alias("x"),
        (h64(ky) % WORLD).alias("y"),
    )


def _points_sql(table: str, key: str) -> str:
    hx = h64_sql(f"{key}::VARCHAR || 'x'")
    hy = h64_sql(f"{key}::VARCHAR || 'y'")
    return (
        f"SELECT {key} AS pid, ({hx}) % {WORLD} AS x, ({hy}) % {WORLD} AS y"
        f" FROM {table}"
    )


def q102_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon spatial join: customers (as deterministic
    synthetic points) assigned to the convex zones containing them,
    reported as per-zone membership counts plus account-balance mass.

    Shape: points project + compute their integer cell ONCE (one
    narrow scan, no shuffle until the count); the (zone, cell) cover
    table is tiny and broadcast, so candidate generation is a
    broadcast equi-join on cell id — candidates are bounded by cell
    occupancy x zones-overlapping-that-cell, never |points| x |zones|.
    The containment test is three integer cross products (CCW
    half-plane checks) — exact, whole-stage-codegen'd, and verified
    literally by the oracle. Zones with no member still report (left
    join from the 12-row zone table). Money floor-scaled to cents
    (q01's float rule).
    """
    pts = _points(spark, sf_dir, "customer", "c_custkey").join(
        Tables(spark, sf_dir).customer.select(
            F.col("c_custkey").alias("pid"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        ),
        "pid",
    )
    ncell = WORLD // CELL
    pts = pts.withColumn(
        "cell", (F.col("x") / CELL).cast("long") * ncell + (F.col("y") / CELL).cast("long")
    )
    zc = local_df(spark, _zone_cells(), "zone_id int, cell long")
    zv = local_df(
        spark,
        [
            (z, v[0][0], v[0][1], v[1][0], v[1][1], v[2][0], v[2][1])
            for z, v in ZONES
        ],
        "zone_id int, x1 long, y1 long, x2 long, y2 long, x3 long, y3 long",
    )

    def _cross(x1, y1, x2, y2):
        return (F.col(x2) - F.col(x1)) * (F.col("y") - F.col(y1)) - (
            F.col(y2) - F.col(y1)
        ) * (F.col("x") - F.col(x1))

    inside = (
        (_cross("x1", "y1", "x2", "y2") >= 0)
        & (_cross("x2", "y2", "x3", "y3") >= 0)
        & (_cross("x3", "y3", "x1", "y1") >= 0)
    )
    hits = (
        pts.join(F.broadcast(zc), "cell")
        .join(F.broadcast(zv), "zone_id")
        .filter(inside)
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("acctbal_cents"),
        )
    )
    return (
        zv.select("zone_id")
        .join(hits, "zone_id", "left")
        .select(
            "zone_id",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("acctbal_cents", F.lit(0)).alias("acctbal_cents"),
        )
        .orderBy("zone_id")
    )


def _q102_oracle() -> str:
    zc_vals = ", ".join(f"({z}, {c})" for z, c in _zone_cells())
    zv_vals = ", ".join(
        f"({z}, {v[0][0]}, {v[0][1]}, {v[1][0]}, {v[1][1]}, {v[2][0]}, {v[2][1]})"
        for z, v in ZONES
    )
    cross = (
        "((x{b} - x{a}) * (y - y{a}) - (y{b} - y{a}) * (x - x{a})) >= 0"
    )
    inside = " AND ".join(
        cross.format(a=a, b=b) for a, b in ((1, 2), (2, 3), (3, 1))
    )
    return f"""
    WITH pts0 AS ({_points_sql('customer', 'c_custkey')}),
    pts AS (
        SELECT p.pid, p.x, p.y,
               floor(c.c_acctbal * 100 + 0.5)::BIGINT AS cents,
               (p.x // {CELL}) * {WORLD // CELL} + (p.y // {CELL}) AS cell
        FROM pts0 p JOIN customer c ON c.c_custkey = p.pid
    ),
    zc (zone_id, cell) AS (VALUES {zc_vals}),
    zv (zone_id, x1, y1, x2, y2, x3, y3) AS (VALUES {zv_vals}),
    hits AS (
        SELECT zv.zone_id,
               count(*)::BIGINT AS n_customers,
               sum(cents)::BIGINT AS acctbal_cents
        FROM pts JOIN zc ON zc.cell = pts.cell
        JOIN zv ON zv.zone_id = zc.zone_id
        WHERE {inside}
        GROUP BY 1
    )
    SELECT zv.zone_id,
           coalesce(n_customers, 0)::BIGINT AS n_customers,
           coalesce(acctbal_cents, 0)::BIGINT AS acctbal_cents
    FROM zv LEFT JOIN hits ON hits.zone_id = zv.zone_id
    ORDER BY zv.zone_id
    """


ORACLE["q102_point_in_polygon"] = _q102_oracle()
QUERIES["q102_point_in_polygon"] = q102_point_in_polygon


def q103_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance (radius) join: every (customer, supplier) point pair
    within RADIUS, reported per supplier nation — the proximity join
    behind geo-enrichment ("stores near a depot", "users near an
    event").

    The grid is the candidate bound: with cell edge >= radius, every
    qualifying pair lies in the supplier's 3x3 cell neighbourhood, so
    suppliers are expanded x9 onto neighbour cells (the SMALL side —
    supplier is 1/15 of customer in TPC-H and dimension-sized in
    practice — broadcast after expansion) and candidates come from an
    equi-join on the customer's single cell. The exact test is integer
    squared distance (no sqrt, no floats). Cost scales with cell
    co-occupancy — the spatial skew knob is CELL, and the plan never
    forms |customer| x |supplier|.
    """
    ncell = WORLD // CELL
    cust = _points(spark, sf_dir, "customer", "c_custkey").withColumn(
        "cell",
        (F.col("x") / CELL).cast("long") * ncell + (F.col("y") / CELL).cast("long"),
    )
    supp = _points(spark, sf_dir, "supplier", "s_suppkey").join(
        Tables(spark, sf_dir).supplier.select(
            F.col("s_suppkey").alias("pid"), F.col("s_nationkey")
        ),
        "pid",
    )
    offsets = local_df(
        spark, [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    sgrid = (
        supp.crossJoin(F.broadcast(offsets))
        .withColumn("gx", (F.col("x") / CELL).cast("long") + F.col("dx"))
        .withColumn("gy", (F.col("y") / CELL).cast("long") + F.col("dy"))
        .filter(
            (F.col("gx") >= 0)
            & (F.col("gx") < ncell)
            & (F.col("gy") >= 0)
            & (F.col("gy") < ncell)
        )
        .select(
            F.col("pid").alias("spid"),
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            "s_nationkey",
            (F.col("gx") * ncell + F.col("gy")).alias("cell"),
        )
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    pairs = cust.join(F.broadcast(sgrid), "cell").filter(d2 <= RADIUS * RADIUS)
    nation = Tables(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name")
    )
    return (
        pairs.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("spid").alias("n_suppliers"),
            F.countDistinct("pid").alias("n_customers"),
        )
        .join(F.broadcast(nation), "s_nationkey")
        .select("n_name", "n_pairs", "n_suppliers", "n_customers")
        .orderBy("n_name")
    )


def _q103_oracle() -> str:
    ncell = WORLD // CELL
    return f"""
    WITH cust AS (
        SELECT pid, x, y, (x // {CELL}) * {ncell} + (y // {CELL}) AS cell
        FROM ({_points_sql('customer', 'c_custkey')})
    ),
    supp AS (
        SELECT p.pid, p.x, p.y, s.s_nationkey
        FROM ({_points_sql('supplier', 's_suppkey')}) p
        JOIN supplier s ON s.s_suppkey = p.pid
    ),
    offs (dx, dy) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)),
    sgrid AS (
        SELECT pid AS spid, x AS sx, y AS sy, s_nationkey,
               ((x // {CELL}) + dx) * {ncell} + ((y // {CELL}) + dy) AS cell
        FROM supp CROSS JOIN offs
        WHERE (x // {CELL}) + dx BETWEEN 0 AND {ncell - 1}
          AND (y // {CELL}) + dy BETWEEN 0 AND {ncell - 1}
    ),
    pairs AS (
        SELECT c.pid, g.spid, g.s_nationkey
        FROM cust c JOIN sgrid g ON g.cell = c.cell
        WHERE (c.x - g.sx) * (c.x - g.sx) + (c.y - g.sy) * (c.y - g.sy)
              <= {RADIUS * RADIUS}
    )
    SELECT n.n_name,
           count(*)::BIGINT AS n_pairs,
           count(DISTINCT spid)::BIGINT AS n_suppliers,
           count(DISTINCT pid)::BIGINT AS n_customers
    FROM pairs JOIN nation n ON n.n_nationkey = pairs.s_nationkey
    GROUP BY 1 ORDER BY 1
    """


ORACLE["q103_radius_join"] = _q103_oracle()
QUERIES["q103_radius_join"] = q103_radius_join


def q104_nn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT nearest-neighbor spatial join: each customer matched to its
    single nearest supplier (ties broken by supplier key — fully
    deterministic), rolled up per supplier nation with exact integer
    squared-distance stats — the "assign every user to the closest
    depot" shape.

    Expanding-ring search, the third canonical spatial-join strategy
    after q102's containment blocking and q103's fixed radius: round r
    probes the (2r+1)^2 cell block around each UNRESOLVED point
    (schedule r=1 then r=ncell). Exactness invariant: any point outside
    the block is > r*CELL away from anywhere in the center cell, so a
    candidate at d <= r*CELL is provably the global nearest; at
    r >= ncell the block is the whole grid and the minimum is global
    by construction. Nearly all points resolve at r=1 (expected cell
    occupancy >= 1), so later rounds touch a vanishing remainder —
    cost is ~one candidate pass, never |customer| x |supplier|.

    Plan: suppliers (dimension-sized) broadcast; a customer's probe
    rows stay in its partition, so the per-customer min's partial
    aggregate reduces map-side to one row per customer and the only
    full-width exchange carries |unresolved| rows per round. Per-round
    localCheckpoint truncates the iterative lineage (graph.py
    discipline). The min is F.min over a (d2, spid) struct —
    lexicographic, integer-exact, tie-stable in both engines.
    """
    ncell = WORLD // CELL
    cust = _points(spark, sf_dir, "customer", "c_custkey").select(
        "pid",
        "x",
        "y",
        (F.col("x") / CELL).cast("long").alias("gx"),
        (F.col("y") / CELL).cast("long").alias("gy"),
    )
    supp = (
        _points(spark, sf_dir, "supplier", "s_suppkey")
        .join(
            Tables(spark, sf_dir).supplier.select(
                F.col("s_suppkey").alias("pid"), F.col("s_nationkey")
            ),
            "pid",
        )
        .select(
            F.col("pid").alias("spid"),
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            "s_nationkey",
            ((F.col("x") / CELL).cast("long") * ncell
             + (F.col("y") / CELL).cast("long")).alias("cell"),
        )
    )
    d2 = (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")) + (
        F.col("y") - F.col("sy")
    ) * (F.col("y") - F.col("sy"))
    remaining = cust
    resolved = []
    # Ring schedule (r12, guide §2.4): r=1 then straight to the global
    # round. Expected cell occupancy ≥ 1 resolves nearly every point at
    # r=1, so the old intermediate r=2/r=4 rounds each paid a full
    # join+agg+anti-join round (~10 AQE stage jobs) to resolve a
    # near-empty remainder. Per-customer results are schedule-
    # independent: any candidate within r·CELL of a point's cell is
    # provably its global nearest (ring invariant), and the final
    # r ≥ ncell round is exact by construction — the brute-force
    # oracle pins this.
    for r in (1, ncell):
        offs = local_df(
            spark,
            [(dx, dy) for dx in range(-r, r + 1) for dy in range(-r, r + 1)],
            "dx long, dy long",
        )
        probes = (
            remaining.crossJoin(F.broadcast(offs))
            .withColumn("pgx", F.col("gx") + F.col("dx"))
            .withColumn("pgy", F.col("gy") + F.col("dy"))
            .filter(
                (F.col("pgx") >= 0)
                & (F.col("pgx") < ncell)
                & (F.col("pgy") >= 0)
                & (F.col("pgy") < ncell)
            )
            .select(
                "pid", "x", "y", "gx", "gy",
                (F.col("pgx") * ncell + F.col("pgy")).alias("cell"),
            )
        )
        best = (
            probes.join(F.broadcast(supp), "cell")
            .groupBy("pid", "gx", "gy")
            .agg(F.min(F.struct(d2.alias("d2"), "spid", "s_nationkey")).alias("b"))
        )
        if r >= ncell:  # block == whole grid: min is global by construction
            resolved.append(best.select("pid", "b.d2", "b.spid", "b.s_nationkey"))
            break
        # materialize the round's resolved set ONCE (r12 batch 6, the
        # q119 fan-out rule): `hit` feeds the checkpointed `remaining`
        # anti-join AND the final union, and the checkpoint consumer
        # cannot share the expensive probe-join-agg subtree via AQE
        # exchange reuse — without the cut the round-1 candidate pass
        # executed twice. Same-session A/B at sf0.1: 2.81 → 1.89 s,
        # 17 → 16 jobs, rows identical.
        hit = best.filter(
            F.col("b.d2") <= (r * CELL) * (r * CELL)
        ).localCheckpoint(eager=False)
        resolved.append(hit.select("pid", "b.d2", "b.spid", "b.s_nationkey"))
        remaining = remaining.join(
            hit.select("pid"), "pid", "left_anti"
        ).localCheckpoint(eager=False)
    nearest = resolved[0]
    for part in resolved[1:]:
        nearest = nearest.unionByName(part)
    nation = Tables(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name")
    )
    return (
        nearest.join(F.broadcast(nation), "s_nationkey")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("d2").alias("sum_d2"),
            F.min("d2").alias("min_d2"),
            F.max("d2").alias("max_d2"),
        )
        .orderBy("n_name")
    )


def _q104_oracle() -> str:
    # Brute-force truth: the oracle ranks ALL pairs per customer — the
    # deliberate quadratic that PROVES the ring search exact (any
    # blocking mistake shows as a value mismatch, not just a row drift).
    return f"""
    WITH cust AS ({_points_sql('customer', 'c_custkey')}),
    supp AS (
        SELECT p.pid AS spid, p.x AS sx, p.y AS sy, s.s_nationkey
        FROM ({_points_sql('supplier', 's_suppkey')}) p
        JOIN supplier s ON s.s_suppkey = p.pid
    ),
    ranked AS (
        SELECT c.pid,
               (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy) AS d2,
               s.spid, s.s_nationkey,
               row_number() OVER (
                   PARTITION BY c.pid
                   ORDER BY (c.x - s.sx) * (c.x - s.sx)
                            + (c.y - s.sy) * (c.y - s.sy), s.spid
               ) AS rn
        FROM cust c CROSS JOIN supp s
    )
    SELECT n.n_name,
           count(*)::BIGINT AS n_customers,
           sum(d2)::BIGINT AS sum_d2,
           min(d2)::BIGINT AS min_d2,
           max(d2)::BIGINT AS max_d2
    FROM ranked JOIN nation n ON n.n_nationkey = ranked.s_nationkey
    WHERE rn = 1
    GROUP BY 1 ORDER BY 1
    """


ORACLE["q104_nn_join"] = _q104_oracle()
QUERIES["q104_nn_join"] = q104_nn_join
