"""Scaling-curve probe: compare two BENCH_LOCAL-style captures taken at
different scale factors and estimate each query's data-growth exponent.

Usage:
    python tools/scaling_curve.py SMALL.json BIG.json [--factor 10]

Method. Raw warm timings at toy SFs are dominated by the fixed per-job
scheduler latency (a 40-job iterative query pays ~12 s of pure latency
at ~300 ms/job regardless of data size), so raw ratios say nothing
about data scaling. Each capture records its own per-action latency
calibration (``cal_job_ms``) and per-query warm job counts
(``extras.job_counts``); the probe first subtracts the latency floor

    c = max(raw_min - jobs * cal_job_ms_min / 1000, eps)

then reports R = c_big / c_small per query. With a data-size factor F
between the captures (default 10: sf0.01 -> sf0.1), a linear operator
shows R <= ~F (usually well under — per-row work below the scan floor
is amortized), an n log n operator a shade over F, and a quadratic one
~F^2. The report flags:

  SUPER  R > 3*F  and c_big >= 0.5 s  — super-linear suspect, read the
                                        plan before believing it
  WATCH  F*1.5 < R <= 3*F, c_big >= 0.5 s — worth a look, usually a
                                        phase change (e.g. a broadcast
                                        side crossing a threshold or a
                                        partial agg falling behind)
  tiny   c_big < 0.5 s                 — below the measurement floor at
                                        either SF; ratio meaningless

The subtraction is the same lower-bound correction BENCH_NOTES round 12
documents for queries_norm2: intra-query jobs overlap, so c
UNDER-estimates heavy many-job queries and the true exponent is LOWER
than reported there — flags are conservative in the right direction
(false-positive, never false-negative).
"""

from __future__ import annotations

import argparse
import json


def corrected(cap: dict, eps: float = 0.02) -> dict[str, float]:
    jobs = cap.get("extras", {}).get("job_counts", {})
    job_ms = cap.get("calibration", {}).get("job_ms_min", 0.0)
    out = {}
    for name, raw in cap.get("queries", {}).items():
        out[name] = max(raw - jobs.get(name, 0) * job_ms / 1000.0, eps)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="min corrected big-SF seconds for a ratio to count")
    args = ap.parse_args()

    small = json.load(open(args.small))
    big = json.load(open(args.big))
    cs, cb = corrected(small), corrected(big)
    shared = sorted(set(cs) & set(cb))

    rows = []
    for name in shared:
        r = cb[name] / cs[name]
        if cb[name] < args.floor:
            klass = "tiny"
        elif r > 3 * args.factor:
            klass = "SUPER"
        elif r > 1.5 * args.factor:
            klass = "WATCH"
        else:
            klass = "ok"
        rows.append((name, cs[name], cb[name], r, klass))

    rows.sort(key=lambda t: -t[3])
    print(f"{'query':32} {'c_small':>8} {'c_big':>8} {'ratio':>7}  class")
    for name, a, b, r, klass in rows:
        if klass != "ok" or r > args.factor:
            print(f"{name:32} {a:8.2f} {b:8.2f} {r:7.1f}  {klass}")
    counts = {}
    for *_x, klass in rows:
        counts[klass] = counts.get(klass, 0) + 1
    total_small = sum(cs[n] for n in shared)
    total_big = sum(cb[n] for n in shared)
    print(json.dumps({
        "factor": args.factor,
        "n_queries": len(shared),
        "classes": counts,
        "corrected_total_ratio": round(total_big / total_small, 2),
        "super": sorted(n for n, _a, _b, _r, k in rows if k == "SUPER"),
        "watch": sorted(n for n, _a, _b, _r, k in rows if k == "WATCH"),
    }, sort_keys=True))


if __name__ == "__main__":
    main()
