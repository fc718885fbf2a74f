"""Semantic property tests for the round-9 batch-4 additions
(q_kendall_tau, q_wilcoxon_signed_rank) — DuckDB parity lives in
tests/test_oracle_parity.py, physical types in tests/test_oracle_dtypes.py;
these pin the docstrings' claims against brute-force references."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_spark.registry import load_all
from fraud_detection_spark.sources import events_with_time


def _run(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir).collect()


def test_kendall_tau_matches_bruteforce_pairs(spark, sf_dir):
    """nc/nd recomputed by literal O(n²) pair enumeration over the raw
    (amount, hour) pairs match exactly; tau_b matches the textbook
    tie-corrected formula to 1e-6 (6-dp engine rounding); |tau_b| <= 1; gamma sign = tau sign."""
    rows = (
        events_with_time(spark, sf_dir)
        .select(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint").alias("vx"),
            (F.expr("ts_sec div 3600") % 24).alias("vy"),
        )
        .collect()
    )
    pts = [(r.vx, r.vy) for r in rows]
    n = len(pts)
    nc = nd = tx = ty = 0
    for i in range(n):
        xi, yi = pts[i]
        for j in range(i + 1, n):
            xj, yj = pts[j]
            sx = (xi > xj) - (xi < xj)
            sy = (yi > yj) - (yi < yj)
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
            if sx * sy > 0:
                nc += 1
            elif sx * sy < 0:
                nd += 1
    n0 = n * (n - 1) // 2
    # tie-PAIR counts from the brute force (pairs tied on x include
    # those also tied on y — exactly the marginal Σt(t-1)/2 definition)
    tau_ref = (nc - nd) / math.sqrt((n0 - tx) * (n0 - ty))

    (r,) = _run("q_kendall_tau", spark, sf_dir)
    assert r.n == n
    assert r.nc == nc, (r.nc, nc)
    assert r.nd == nd, (r.nd, nd)
    assert abs(r.tau_b) <= 1.0
    assert abs(r.tau_b - tau_ref) < 1e-6, (r.tau_b, tau_ref)
    assert r.gamma * (nc - nd) >= 0
    assert r.z * (nc - nd) >= 0


def test_wilcoxon_signed_rank_matches_python_reference(spark, sf_dir):
    """W+/W- recomputed from raw per-user early/late integer sums with
    textbook average ranks agree exactly (doubled ranks are integral);
    W+ + W- = n(n+1)/2; z matches the tie-corrected formula to 1e-6 (6-dp engine rounding)."""
    rows = (
        events_with_time(spark, sf_dir)
        .select(
            "user_id",
            "ts_sec",
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint").alias("v"),
        )
        .collect()
    )
    secs = [r.ts_sec for r in rows]
    mid = (min(secs) + max(secs)) // 2
    per_user: dict[int, int] = {}
    for r in rows:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + (
            r.v if r.ts_sec > mid else -r.v
        )
    ds = [d for d in per_user.values() if d != 0]
    n = len(ds)
    from collections import Counter

    cnt = Counter(abs(d) for d in ds)
    ranks, below = {}, 0
    for a in sorted(cnt):
        ranks[a] = below + (cnt[a] + 1) / 2
        below += cnt[a]
    wp_ref = sum(ranks[abs(d)] for d in ds if d > 0)
    wm_ref = sum(ranks[abs(d)] for d in ds if d < 0)
    ties = sum(t**3 - t for t in cnt.values())
    sigma = math.sqrt(n * (n + 1) * (2 * n + 1) / 24 - ties / 48)
    z_ref = (wp_ref - n * (n + 1) / 4) / sigma

    (r,) = _run("q_wilcoxon_signed_rank", spark, sf_dir)
    assert r.n == n
    assert abs(r.w_plus - wp_ref) < 1e-9, (r.w_plus, wp_ref)
    assert abs(r.w_minus - wm_ref) < 1e-9, (r.w_minus, wm_ref)
    assert abs(r.w_plus + r.w_minus - n * (n + 1) / 2) < 1e-9
    assert abs(r.z - z_ref) < 1e-6, (r.z, z_ref)
    assert abs(r.r_rb - (wp_ref - wm_ref) / (wp_ref + wm_ref)) < 1e-6


def test_stump_matches_bruteforce_split_search(spark, sf_dir):
    """The emitted split matches a literal python scan over every
    candidate threshold (same double key, (key, score) tiebreak);
    leaf counts are exact; gain >= 0 is NOT asserted (a stump's best
    split can be arbitrarily weak) but gini_base >= gini_split is."""
    from collections import defaultdict

    from fraud_detection_spark.operators.ml_metrics import scored

    rows = scored(spark, sf_dir).select("score", "label").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        agg[r.score][0] += 1
        agg[r.score][1] += r.label
    n_tot = sum(v[0] for v in agg.values())
    p_tot = sum(v[1] for v in agg.values())
    cum_n = cum_p = 0
    best = None
    for s in sorted(agg):
        cum_n += agg[s][0]
        cum_p += agg[s][1]
        if cum_n >= n_tot:
            break
        nl, pl = float(cum_n), float(cum_p)
        nr, pr = float(n_tot - cum_n), float(p_tot - cum_p)
        key = (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
            nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
        )
        if best is None or (key, s) < best[:2]:
            best = (key, s, cum_n, cum_p)
    key, s, cn, cp = best
    base = 1 - (p_tot / n_tot) ** 2 - ((n_tot - p_tot) / n_tot) ** 2

    (r,) = _run("q_stump", spark, sf_dir)
    assert r.threshold == s, (r.threshold, s)
    assert (r.n_left, r.pos_left) == (cn, cp)
    assert (r.n_right, r.pos_right) == (n_tot - cn, p_tot - cp)
    assert abs(r.gini_split - key / n_tot) < 1e-6
    assert abs(r.gini_base - base) < 1e-6
    assert r.gini_base >= r.gini_split - 1e-9
    assert abs(r.gain - (base - key / n_tot)) < 1e-6
