"""Pure-python geometry noding + dissolve for the in-engine union
fallback (G3 completion, reference dbsink/tables.py:266-269).

The reference dissolves member geometries with shapely's
``unary_union``; this environment has no shapely, so crossing inputs
previously fell through to an assembled-but-unmerged MULTI* that the
sink's ``ST_UnaryUnion`` bind fixed up at the database boundary. This
module closes the in-engine gap for the two crossing shapes that occur
in telemetry dissolves:

* **Line noding** (``node_linestrings``): every segment is split at
  its intersection points with every other segment (proper crossings
  and T-touches), duplicates removed — the piece set GEOS produces for
  a unary_union of crossing lines. O(S^2) pairwise intersection over
  the member segments: member geometries per row are feature-sized
  (device trajectories), never corpus-sized, so the quadratic term is
  bounded per row and rows parallelize across the cluster.
* **Convex-polygon overlap dissolve** (``union_convex_polygons``): the
  union boundary of two overlapping convex rings via the classic
  boundary walk (walk one ring, switch rings at each boundary
  intersection); containment and disjoint cases handled explicitly.

Exact arithmetic: intersections are computed in ``fractions.Fraction``
and rendered through float, so goldens are reproducible bit-for-bit;
collinear-overlap inputs (degenerate for the walk) raise ValueError
and the caller falls back to the assembled MULTI* + DB-side dissolve
path. Goldens in tests/test_functions.py are analytically derived (no
shapely in this environment); each records its derivation.
"""

from __future__ import annotations

from fractions import Fraction


def _f(x) -> Fraction:
    return x if isinstance(x, Fraction) else Fraction(x).limit_denominator(10**12)


def _seg_intersection(p1, p2, p3, p4):
    """Intersection point of segments p1p2 and p3p4, or None.

    Returns interior/endpoint intersection points (proper crossings
    and T-touches). Collinear overlapping segments raise ValueError —
    the caller falls back to the DB-side dissolve."""
    (x1, y1), (x2, y2), (x3, y3), (x4, y4) = (
        (_f(p[0]), _f(p[1])) for p in (p1, p2, p3, p4)
    )
    dx1, dy1 = x2 - x1, y2 - y1
    dx2, dy2 = x4 - x3, y4 - y3
    denom = dx1 * dy2 - dy1 * dx2
    if denom == 0:
        # parallel: collinear overlap is degenerate for noding
        cross = (x3 - x1) * dy1 - (y3 - y1) * dx1
        if cross == 0:
            # collinear — overlapping ranges are unsupported
            def within(a, b, c):
                return min(a, b) <= c <= max(a, b)

            overlap = (
                within(x1, x2, x3)
                and within(y1, y2, y3)
                or within(x1, x2, x4)
                and within(y1, y2, y4)
                or within(x3, x4, x1)
                and within(y3, y4, y1)
            )
            if overlap and (x1, y1, x2, y2) != (x3, y3, x4, y4):
                raise ValueError("collinear overlapping segments")
        return None
    t = ((x3 - x1) * dy2 - (y3 - y1) * dx2) / denom
    u = ((x3 - x1) * dy1 - (y3 - y1) * dx1) / denom
    if 0 <= t <= 1 and 0 <= u <= 1:
        return (x1 + t * dx1, y1 + t * dy1)
    return None


def _segments(lines):
    segs = []
    for line in lines:
        pts = [(_f(x), _f(y)) for x, y in line]
        for a, b in zip(pts, pts[1:]):
            if a != b:
                segs.append((a, b))
    return segs


def node_linestrings(lines: list[list[tuple]]) -> list[list[tuple]]:
    """Split every segment of ``lines`` at its intersections with all
    other segments; return deduplicated two-point pieces as float
    coordinate lists, deterministically ordered."""
    segs = _segments(lines)
    cuts: list[list] = [[] for _ in segs]
    for i in range(len(segs)):
        for k in range(i + 1, len(segs)):
            pt = _seg_intersection(*segs[i], *segs[k])
            if pt is not None:
                cuts[i].append(pt)
                cuts[k].append(pt)
    pieces = set()
    for (a, b), pts in zip(segs, cuts):
        dx, dy = b[0] - a[0], b[1] - a[1]

        def along(p):
            return (p[0] - a[0]) * dx + (p[1] - a[1]) * dy

        chain = sorted({a, b, *pts}, key=along)
        for u, v in zip(chain, chain[1:]):
            if u != v:
                pieces.add((u, v) if (u, v) <= (v, u) else (v, u))
    out = sorted(pieces)
    return [[(float(u[0]), float(u[1])), (float(v[0]), float(v[1]))] for u, v in out]


def _ring_ccw(ring):
    """Ring as CCW-oriented Fraction vertex list, closing point
    dropped."""
    pts = [(_f(x), _f(y)) for x, y in ring]
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    area2 = sum(
        pts[i][0] * pts[(i + 1) % len(pts)][1] - pts[(i + 1) % len(pts)][0] * pts[i][1]
        for i in range(len(pts))
    )
    if area2 == 0:
        raise ValueError("degenerate ring")
    return pts if area2 > 0 else pts[::-1]


def _point_in_convex(pt, ring):
    """-1 outside, 0 on boundary, 1 strictly inside (ring CCW)."""
    on_edge = False
    for i in range(len(ring)):
        a, b = ring[i], ring[(i + 1) % len(ring)]
        cross = (b[0] - a[0]) * (pt[1] - a[1]) - (b[1] - a[1]) * (pt[0] - a[0])
        if cross < 0:
            return -1
        if cross == 0:
            if min(a[0], b[0]) <= pt[0] <= max(a[0], b[0]) and min(
                a[1], b[1]
            ) <= pt[1] <= max(a[1], b[1]):
                on_edge = True
    return 0 if on_edge else 1


def union_convex_polygons(ring_a: list[tuple], ring_b: list[tuple]):
    """Union of two convex rings.

    Returns ("polygon", ring) for overlapping/contained inputs (ring
    closed, CCW, float coords, lexicographically-smallest start) or
    ("multipolygon", [ring_a, ring_b]) when disjoint."""
    A, B = _ring_ccw(ring_a), _ring_ccw(ring_b)

    # containment / disjoint short-circuits
    if all(_point_in_convex(p, A) >= 0 for p in B):
        return "polygon", _close(A)
    if all(_point_in_convex(p, B) >= 0 for p in A):
        return "polygon", _close(B)

    # insert each ring's boundary intersections into the other's edges
    def with_nodes(ring, other):
        out = []
        n = len(ring)
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            hits = []
            m = len(other)
            for k in range(m):
                c, d = other[k], other[(k + 1) % m]
                pt = _seg_intersection(a, b, c, d)
                if pt is not None:
                    hits.append(pt)
            dx, dy = b[0] - a[0], b[1] - a[1]
            hits = sorted(
                set(hits), key=lambda p: (p[0] - a[0]) * dx + (p[1] - a[1]) * dy
            )
            out.append(a)
            out.extend(h for h in hits if h != a and h != b)
        return out

    An, Bn = with_nodes(A, B), with_nodes(B, A)
    if An == A and Bn == B:  # no boundary intersections at all
        return "multipolygon", [_close(A), _close(B)]

    rings = {0: An, 1: Bn}
    others = {0: B, 1: A}

    # start at a vertex strictly outside the other polygon
    start = None
    for which in (0, 1):
        for idx, p in enumerate(rings[which]):
            if _point_in_convex(p, others[which]) < 0:
                start = (which, idx)
                break
        if start:
            break
    if start is None:
        raise ValueError("no exterior start vertex (degenerate overlap)")

    out = []
    which, idx = start
    guard = 4 * (len(An) + len(Bn)) + 8
    while guard:
        guard -= 1
        ring = rings[which]
        p = ring[idx % len(ring)]
        if out and p == out[0]:
            break
        if not out or p != out[-1]:
            out.append(p)
        # if p lies on the other ring's boundary, switch rings there
        # (union walk: always leave along the boundary that stays
        # outside the other polygon)
        other_ring = rings[1 - which]
        if p in other_ring and _point_in_convex(p, others[which]) == 0:
            nxt_other = other_ring[(other_ring.index(p) + 1) % len(other_ring)]
            if _point_in_convex(nxt_other, others[1 - which]) <= 0:
                which = 1 - which
                idx = other_ring.index(p) + 1
                continue
        idx = (idx % len(ring)) + 1
    if not guard:
        raise ValueError("union walk failed to close")
    return "polygon", _close(out)


def _close(ring):
    pts = [(float(x), float(y)) for x, y in ring]
    # canonical start: lexicographically smallest vertex
    j = min(range(len(pts)), key=lambda i: pts[i])
    pts = pts[j:] + pts[:j]
    return pts + [pts[0]]
