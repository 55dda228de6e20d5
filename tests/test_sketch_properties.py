"""Property tests for the hand-rolled sketch algebra: random inputs,
python references, published error bounds.

The registry queries (q62 HLL, q54/q65/d14 KMV-theta) are
oracle-verified on the harness corpus; these tests drive the same
algebra on adversarial random inputs and check the ESTIMATOR
guarantees — the part an equality oracle cannot see (an oracle proves
both engines compute the same number, not that the number is a good
estimate).
"""

from __future__ import annotations

import hashlib
import random

from dbsink_spark.analytics.advanced import Q62_M, Q62_NUM, Q62_SHIFT
from dbsink_spark.streaming.sketches import batch_hll


def _h64_py(s: str) -> int:
    """Python twin of functions.hashing.h64 (first 15 md5 hex digits)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _hll_reference(items: list[str]) -> dict[int, int]:
    regs: dict[int, int] = {}
    for it in items:
        h = _h64_py(it)
        bucket, w = h % Q62_M, h // Q62_M
        rho = Q62_SHIFT if w == 0 else Q62_SHIFT - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_batch_hll_matches_python_reference(spark):
    rng = random.Random(3)
    items = [str(rng.randrange(10**9)) for _ in range(3000)]
    df = spark.createDataFrame([(i,) for i in items], ["item"])
    got = {r["bucket"]: r["m_j"] for r in batch_hll(df, "item").collect()}
    assert got == _hll_reference(items)


def test_hll_estimate_within_published_error(spark):
    """Raw HLL standard error is ~1.04/sqrt(m) ≈ 13% at m=64; assert
    the estimate lands within 4 sigma on random cardinalities."""
    rng = random.Random(9)
    for n in (500, 2000, 8000):
        items = list({str(rng.randrange(10**12)) for _ in range(n)})
        regs = _hll_reference(items)
        s = sum(1 << (Q62_SHIFT - mj) for mj in regs.values())
        est = float(Q62_NUM) / s
        rel = abs(est - len(items)) / len(items)
        assert rel < 4 * 1.04 / (Q62_M ** 0.5), (n, est, rel)


def test_theta_intersection_estimator_on_known_overlap():
    """d14's theta estimator on synthetic sets with EXACT known
    overlap: estimate within 5x standard error (K=64)."""
    from dbsink_spark.analytics.stats import D14_K, D14_U

    rng = random.Random(4)
    universe = [str(i) for i in range(20000)]
    a_items = set(rng.sample(universe, 6000))
    b_items = set(rng.sample(universe, 6000))
    true_inter = len(a_items & b_items)

    ha = sorted(_h64_py(x) for x in a_items)
    hb = sorted(_h64_py(x) for x in b_items)
    sk_a, tk_a = set(ha[:D14_K]), ha[D14_K - 1]
    sk_b, tk_b = set(hb[:D14_K]), hb[D14_K - 1]
    theta = min(tk_a, tk_b)
    common = sum(1 for h in sk_a & sk_b if h < theta)
    est = common * D14_U / theta
    se = true_inter / (D14_K ** 0.5)  # rough KMV-scale error
    assert abs(est - true_inter) < 5 * max(se, 200), (est, true_inter)


def test_kmv_union_inclusion_exclusion_consistency():
    """est_union from inclusion-exclusion must be within estimator
    noise of the direct union-sketch estimate."""
    rng = random.Random(5)
    a_items = {str(rng.randrange(10**12)) for _ in range(4000)}
    b_items = {str(rng.randrange(10**12)) for _ in range(4000)}
    from dbsink_spark.analytics.stats import D14_K, D14_U

    def kmv_est(items):
        hs = sorted(_h64_py(x) for x in items)
        return (D14_K - 1) * D14_U / hs[D14_K - 1]

    ha = sorted(_h64_py(x) for x in a_items)
    hb = sorted(_h64_py(x) for x in b_items)
    sk_a, tk_a = set(ha[:D14_K]), ha[D14_K - 1]
    sk_b, tk_b = set(hb[:D14_K]), hb[D14_K - 1]
    theta = min(tk_a, tk_b)
    common = sum(1 for h in sk_a & sk_b if h < theta)
    est_inter = common * D14_U / theta
    est_union_ie = kmv_est(a_items) + kmv_est(b_items) - est_inter
    direct = kmv_est(a_items | b_items)
    assert abs(est_union_ie - direct) / direct < 0.5, (est_union_ie, direct)
