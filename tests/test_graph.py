"""Semantic tests for the transaction-graph operators
(operators/graph.py) beyond DuckDB hash parity:

- q_mad_outlier is cross-checked against an independent pure-python
  median/MAD computation using PERCENTILE_DISC semantics (smallest
  element with cume_dist >= fraction — NOT numpy's interpolating
  median);
- q_pagerank's properties: ranks sum to 1 (stochastic-matrix
  invariant), the iteration contracts, the result is bit-identical
  under a different shuffle-partition layout (the per-iteration 12-dp
  fixed-point rounding is what makes this hold), and the broadcast /
  no-cartesian plan shape holds for the degree features.
"""

from __future__ import annotations

import numpy as np

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


def _disc_median(values: np.ndarray) -> float:
    """PERCENTILE_DISC(0.5): smallest element whose cume_dist >= 0.5."""
    v = np.sort(values)
    k = int(np.ceil(len(v) * 0.5))  # 1-based index
    return float(v[k - 1])


def test_mad_outlier_matches_python_disc_median(spark, sf_dir):
    from fraud_detection_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .toPandas()
    )
    flagged = set()
    for _, g in ev.groupby("user_id"):
        med = _disc_median(g.value.values)
        adev = np.abs(g.value.values - med)
        mad = _disc_median(adev)
        if mad > 0:
            for eid, a in zip(g.event_id.values, adev):
                if a > 10 * mad:
                    flagged.add(int(eid))
    got = {
        int(r.event_id)
        for r in REGISTRY["q_mad_outlier"].fn(spark, sf_dir).collect()
    }
    assert got == flagged
    assert len(got) > 0  # the log-normal-shaped values do have tails


def test_graph_degree_invariants(spark, sf_dir):
    pdf = REGISTRY["q_graph_degree"].fn(spark, sf_dir).toPandas()
    assert (pdf.n_counterparties <= pdf.n_txn).all()
    assert ((pdf.concentration > 0) & (pdf.concentration <= 1)).all()
    # a customer with one counterparty has concentration exactly 1
    solo = pdf[pdf.n_counterparties == 1]
    if len(solo):
        assert (solo.concentration == 1.0).all()


def test_pagerank_sums_to_one_and_contracts(spark, sf_dir):
    from fraud_detection_spark.operators.graph import pagerank_ranks

    r8 = pagerank_ranks(spark, sf_dir, iters=8).toPandas().set_index("node")
    assert abs(r8["rank"].sum() - 1.0) < 1e-6
    r1 = pagerank_ranks(spark, sf_dir, iters=1).toPandas().set_index("node")
    r2 = pagerank_ranks(spark, sf_dir, iters=2).toPandas().set_index("node")
    r9 = pagerank_ranks(spark, sf_dir, iters=9).toPandas().set_index("node")
    early = float((r2["rank"] - r1["rank"]).abs().sum())
    late = float((r9["rank"] - r8["rank"]).abs().sum())
    assert late < early  # damped iteration is a contraction
    assert late < 1e-3  # ~converged by 8 rounds on this graph


def test_pagerank_layout_deterministic(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(
            (r.side, r.key, r.rank)
            for r in REGISTRY["q_pagerank"].fn(spark, sf_dir).collect()
        )
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(
            (r.side, r.key, r.rank)
            for r in REGISTRY["q_pagerank"].fn(spark, sf_dir).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b  # 12-dp per-iteration rounding wipes partial-sum order


def test_mad_outlier_approx_twin_agrees(spark, sf_dir):
    """The approx_percentile twin must flag (nearly) the same events
    as the exact PERCENTILE_DISC form — at the default accuracy the
    sketch is exact for per-user group sizes far below 1/error."""
    from fraud_detection_spark.operators.graph import mad_outlier_approx

    exact = {
        int(r.event_id)
        for r in REGISTRY["q_mad_outlier"].fn(spark, sf_dir).collect()
    }
    approx = {
        int(r.event_id) for r in mad_outlier_approx(spark, sf_dir).collect()
    }
    # symmetric difference bounded: sketches may move the median by a
    # rank or two at the margin, never wholesale
    assert len(exact) > 0
    assert len(exact ^ approx) <= max(2, len(exact) // 10), (
        len(exact), len(approx), len(exact ^ approx)
    )


def test_triangle_orientation_kills_star_hub(spark):
    """VERDICT r7 #4: a degree-1000 hub with leaf neighbors must
    produce ZERO wedge candidates under degree-ordered orientation
    (raw-key ordering would enumerate C(1000,2) ≈ 500k) — the skew
    bound that makes the plan survive a hub-heavy collusion graph."""
    from fraud_detection_spark.operators.graph import oriented_wedges

    hub = 0
    star = spark.createDataFrame(
        [(min(hub, i), max(hub, i)) for i in range(1, 1001)], "ca long, cb long"
    )
    assert oriented_wedges(star).count() == 0


def test_triangle_counts_clique_and_star(spark):
    """K4 has 4 triangles, every vertex in exactly 3; K4 plus a
    pendant hub fan changes nothing (stars are triangle-free)."""
    from fraud_detection_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    fan = [(3, i) for i in range(100, 160)]  # vertex 3 becomes the hub
    pe = spark.createDataFrame(k4 + fan, "ca long, cb long")
    rows = {r.custkey: r.n_triangles for r in triangle_counts(pe).collect()}
    assert rows == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_wedges_subquadratic_on_skewed_graph(spark):
    """Candidate-wedge volume on a hub-skewed graph stays near the
    true-triangle floor: hub fan-out is bounded by orientation, so
    wedges come only from the sparse clique part, not the hub."""
    from fraud_detection_spark.operators.graph import oriented_wedges

    # 5 disjoint K3s (15 edges, 15 triangles->15 wedges min) + a
    # 500-leaf hub attached to one clique vertex
    edges = []
    for g in range(5):
        v = [100 * g, 100 * g + 1, 100 * g + 2]
        edges += [(a, b) for a in v for b in v if a < b]
    edges += [(0, i) for i in range(1000, 1500)]
    pe = spark.createDataFrame(edges, "ca long, cb long")
    n = oriented_wedges(pe).count()
    # raw-key orientation would give C(501,2)+... ≈ 125k wedges at
    # vertex 0; degree orientation keeps it within a small constant
    # of the 5*3=15 closed wedges
    assert n <= 30, n
