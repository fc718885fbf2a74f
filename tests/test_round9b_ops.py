"""Semantic property tests for the round-9 batch-3 additions
(q_spearman, q_reciprocal_flows, q_containment, q_hits) — DuckDB
parity lives in tests/test_oracle_parity.py, physical types in
tests/test_oracle_dtypes.py; these pin the docstrings' claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_spark.registry import load_all
from fraud_detection_spark.sources import events_with_time, load_table


def _run(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir).collect()


def test_spearman_matches_python_reference(spark, sf_dir):
    """rho recomputed from raw (amount, hour) pairs with textbook
    average ranks + Pearson agrees to 1e-6; |rho| <= 1; t sign = rho
    sign."""
    rows = (
        events_with_time(spark, sf_dir)
        .select(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint").alias("vx"),
            (F.expr("ts_sec div 3600") % 24).alias("vy"),
        )
        .collect()
    )
    xs = [r.vx for r in rows]
    ys = [r.vy for r in rows]
    from collections import Counter

    def avg_ranks(vals):
        cnt = Counter(vals)
        ranks, below = {}, 0
        for v in sorted(cnt):
            ranks[v] = below + (cnt[v] + 1) / 2
            below += cnt[v]
        return [ranks[v] for v in vals]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx_ = sum((a - mx) ** 2 for a in rx)
    vy_ = sum((b - my) ** 2 for b in ry)
    rho_ref = cov / math.sqrt(vx_ * vy_)

    (r,) = _run("q_spearman", spark, sf_dir)
    assert r.n == n
    assert abs(r.rho) <= 1.0
    assert abs(r.rho - rho_ref) < 1e-6, (r.rho, rho_ref)
    assert r.t_stat * r.rho >= 0


def test_reciprocal_flows_recomputation(spark, sf_dir):
    """Every emitted pair's two directed flows match an independent
    integer-cents recomputation; reciprocity = min/max in [ratio, 1];
    gross = flow_ab + flow_ba; domestic flows excluded."""
    from fraud_detection_spark.operators.aml import _RECIP_MIN_RATIO

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    raw = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "c_nationkey",
            "s_nationkey",
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).cast("bigint").alias("cents"),
        )
        .collect()
    )
    flows: dict[tuple[int, int], int] = {}
    for r in raw:
        if r.c_nationkey != r.s_nationkey:
            key = (r.c_nationkey, r.s_nationkey)
            flows[key] = flows.get(key, 0) + r.cents

    out = _run("q_reciprocal_flows", spark, sf_dir)
    assert 0 < len(out) <= 15
    inv_n = {v: k for k, v in n.items()}
    for row in out:
        ka, kb = inv_n[row.nation_a], inv_n[row.nation_b]
        assert ka < kb  # canonical pair order
        u_ab, u_ba = flows.get((ka, kb), 0), flows.get((kb, ka), 0)
        assert row.flow_ab == u_ab / 100 and row.flow_ba == u_ba / 100
        assert row.gross == (u_ab + u_ba) / 100
        assert _RECIP_MIN_RATIO <= row.reciprocity <= 1.0


def test_containment_bounds_and_jaccard_consistency(spark, sf_dir):
    """c_ab, c_ba in (0, 1]; every emitted pair clears the threshold;
    the Jaccard implied by (c_ab, c_ba) — J = 1/(1/c_ab + 1/c_ba − 1)
    — matches q_dedup_jaccard on pairs present in both outputs, and
    containment >= jaccard always."""
    from fraud_detection_spark.operators.dedup import _CONTAIN_THRESHOLD

    out = _run("q_containment", spark, sf_dir)
    assert out, "expected non-empty containment pairs"
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in _run("q_dedup_jaccard", spark, sf_dir)
    }
    for r in out:
        assert 0 < r.c_ab <= 1.0 and 0 < r.c_ba <= 1.0
        assert max(r.c_ab, r.c_ba) >= _CONTAIN_THRESHOLD
        j = 1.0 / (1.0 / r.c_ab + 1.0 / r.c_ba - 1.0)
        assert j <= max(r.c_ab, r.c_ba) + 1e-9
        if (r.doc_a, r.doc_b) in jac:
            assert abs(j - jac[(r.doc_a, r.doc_b)]) < 1e-4


def test_hits_matches_exact_integer_reimplementation(spark, sf_dir):
    """The full fixed-point HITS recomputed in pure-python integers
    (exact, no float sums) reproduces every emitted (side, key,
    score) row bit-for-bit — the determinism claim is testable
    because the algorithm IS integer."""
    from fraud_detection_spark.operators.graph import (
        _HITS_FP,
        _HITS_ITERS,
        _HITS_TOPK,
        edges,
    )

    e = [
        (r.custkey, r.suppkey, r.n)
        for r in edges(spark, sf_dir).collect()
    ]
    custs = sorted({c for c, _, _ in e})
    h = {c: int(float(_HITS_FP) / len(custs) + 0.5) for c in custs}

    def half(vec, src_idx, dst_idx):
        raw: dict[int, int] = {}
        for row in e:
            if row[src_idx] in vec:
                raw[row[dst_idx]] = raw.get(row[dst_idx], 0) + vec[row[src_idx]] * row[2]
        t = sum(raw.values())
        # engine twin: CAST(r AS DOUBLE) / CAST(t AS DOUBLE) — convert
        # each exact integer to double FIRST (python's int/int would
        # round the exact rational instead, a 1-ulp divergence source)
        return {
            k: int(math.floor(float(r) / float(t) * float(_HITS_FP) + 0.5))
            for k, r in raw.items()
        }

    a = None
    for _ in range(_HITS_ITERS):
        a = half(h, 0, 1)
        h = half(a, 1, 0)

    def top(vec, side):
        order = sorted(vec.items(), key=lambda kv: (-kv[1], kv[0]))[:_HITS_TOPK]
        return [(side, k, u / float(_HITS_FP)) for k, u in order]

    expected = sorted(
        top(a, "authority") + top(h, "hub"), key=lambda r: (r[0], -r[2], r[1])
    )
    got = [(r.side, r.key, r.score) for r in _run("q_hits", spark, sf_dir)]
    assert got == expected


def test_hits_sides_are_disjoint_key_spaces(spark, sf_dir):
    """Authorities are suppliers, hubs are customers — every emitted
    key exists on its side of the bipartite edge list, and per-side
    scores are L1-bounded (each full side sums to ~1, so any top-k
    subset must too)."""
    from fraud_detection_spark.operators.graph import edges

    e = edges(spark, sf_dir).collect()
    custs = {r.custkey for r in e}
    supps = {r.suppkey for r in e}
    rows = _run("q_hits", spark, sf_dir)
    for side in ("authority", "hub"):
        keys = [r.key for r in rows if r.side == side]
        assert len(keys) == len(set(keys))
        pool = supps if side == "authority" else custs
        assert set(keys) <= pool
        ssum = sum(r.score for r in rows if r.side == side)
        assert 0 < ssum <= 1.0 + 1e-9
