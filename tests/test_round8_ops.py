"""Semantic property tests for the round-8 operator additions —
DuckDB-oracle parity lives in tests/test_oracle_parity.py; these pin
the claims the docstrings make."""

from __future__ import annotations

import math

from fraud_detection_spark.registry import load_all


def _run(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir).collect()


def test_clustering_coeff_bounds_and_triangle_consistency(spark, sf_dir):
    """0 <= C(v) <= 1, only deg >= 2 vertices, and the coefficient is
    exactly 2*tri / (d*(d-1)) of the emitted columns."""
    rows = _run("q_clustering_coeff", spark, sf_dir)
    assert rows
    for r in rows:
        assert r.degree >= 2
        assert 0.0 <= r.clustering_coeff <= 1.0, r
        want = 2.0 * r.n_triangles / (r.degree * (r.degree - 1))
        assert abs(r.clustering_coeff - want) < 1e-6, r
    # triangle members agree with q_triangle_count
    tri = {r.custkey: r.n_triangles for r in _run("q_triangle_count", spark, sf_dir)}
    got = {r.custkey: r.n_triangles for r in rows if r.n_triangles > 0}
    assert got == {k: v for k, v in tri.items() if k in got}
    assert set(tri) <= {r.custkey for r in rows}


def test_assortativity_in_pearson_range(spark, sf_dir):
    (r,) = _run("q_assortativity", spark, sf_dir)
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9
    assert r.n_edges > 0


def test_assortativity_matches_numpy(spark, sf_dir):
    """The scalar equals numpy's Pearson r over the symmetric
    edge-degree pairs computed independently."""
    import numpy as np

    from fraud_detection_spark.operators.graph import _heavy_pairs

    pe = _heavy_pairs(spark, sf_dir).collect()
    deg: dict[int, int] = {}
    for r in pe:
        deg[r.ca] = deg.get(r.ca, 0) + 1
        deg[r.cb] = deg.get(r.cb, 0) + 1
    xs, ys = [], []
    for r in pe:
        xs += [deg[r.ca], deg[r.cb]]
        ys += [deg[r.cb], deg[r.ca]]
    want = float(np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1])
    (got,) = _run("q_assortativity", spark, sf_dir)
    assert abs(got.assortativity - want) < 1e-5, (got.assortativity, want)


def test_label_prop_is_component_refinement(spark, sf_dir):
    """Every 4-iteration community is a SUBSET of a true connected
    component (labels only flood along edges), members sum to |V|,
    and each community's label is reachable from its members."""
    from fraud_detection_spark.operators.graph import _heavy_pairs

    pe = _heavy_pairs(spark, sf_dir).collect()
    # union-find ground-truth components
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    verts = set()
    for r in pe:
        union(r.ca, r.cb)
        verts |= {r.ca, r.cb}
    rows = _run("q_label_prop", spark, sf_dir)
    assert sum(r.n_members for r in rows) == len(verts)
    # a community label is always the min vertex of SOME subset of a
    # component, so two vertices with the same label share a component;
    # equivalently: #communities >= #components, with equality iff
    # every component has flooded within 4 hops
    n_components = len({find(v) for v in verts})
    assert len(rows) >= n_components
    # each emitted community label is a real vertex
    assert all(r.community in verts for r in rows)


def test_changepoint_maximizes_between_sse(spark, sf_dir):
    """The returned split day beats every other split on the
    between-segment criterion, recomputed independently in Python."""
    from fraud_detection_spark.sources import load_table
    import pyspark.sql.functions as F

    ev = load_table(spark, sf_dir, "events").select(
        F.expr("ts div 1000000000 div 86400").alias("day"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint").alias("v"),
    )
    daily = {
        r.day: (r.t, r.c)
        for r in ev.groupBy("day")
        .agg(F.sum("v").alias("t"), F.count("*").alias("c"))
        .collect()
    }
    days = sorted(daily)
    tt = sum(t for t, _ in daily.values())
    nn = sum(c for _, c in daily.values())
    best, best_day = -1.0, None
    t1 = n1 = 0
    for d in days[:-1]:
        t1 += daily[d][0]
        n1 += daily[d][1]
        g = t1 * t1 / n1 + (tt - t1) * (tt - t1) / (nn - n1)
        if g > best:
            best, best_day = g, d
    (r,) = _run("q_changepoint", spark, sf_dir)
    assert r.split_day == best_day, (r.split_day, best_day)
    assert r.n_before + r.n_after == nn
    assert r.mean_before != r.mean_after


def test_winsorized_stats_bounded_by_raw(spark, sf_dir):
    """Winsorized mean lies within [p05, p95]; winsorized std is
    <= the raw std (clamping can only shrink spread); n matches the
    raw class count."""
    from fraud_detection_spark.sources import load_table
    import pyspark.sql.functions as F

    li = load_table(spark, sf_dir, "lineitem")
    raw = {
        r.l_returnflag: (r.n, r.sd)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.stddev_samp("l_extendedprice").alias("sd"),
        )
        .collect()
    }
    rows = _run("q_winsorized_stats", spark, sf_dir)
    assert {r.l_returnflag for r in rows} == set(raw)
    for r in rows:
        assert r.p05 <= r.w_mean <= r.p95, r
        assert r.n == raw[r.l_returnflag][0]
        assert r.w_std <= raw[r.l_returnflag][1] + 1e-6, r
        assert r.w_std > 0


def test_peer_group_outlier_zscores(spark, sf_dir):
    """Every flagged row is a genuine >= 2-sigma deviation within its
    nation, and no nation contributes more than ~a third of its peers
    (2-sigma cannot flag most of a group)."""
    rows = _run("q_peer_group_outlier", spark, sf_dir)
    for r in rows:
        assert abs(r.z) >= 2.0, r
        assert r.total_spend > 0 and r.n_orders > 0
    # Chebyshev: at most 1/4 of any peer group can sit >= 2 sigma out
    from collections import Counter

    from fraud_detection_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer")
    peers = Counter(
        r.c_nationkey
        for r in c.select("c_nationkey").collect()
    )
    flagged = Counter(r.c_nationkey for r in rows)
    for nk, nf in flagged.items():
        assert nf <= max(1, peers[nk] // 3), (nk, nf, peers[nk])


def test_parity_gap_internal_consistency(spark, sf_dir):
    """Gaps are rate-minus-overall; rates in [0,1]; segment sizes sum
    to the scored row count; the size-weighted flag-rate gap is ~0."""
    rows = _run("q_parity_gap", spark, sf_dir)
    assert len(rows) >= 2
    n_tot = sum(r.n for r in rows)
    overall_flag = sum(r.flag_rate * r.n for r in rows) / n_tot
    for r in rows:
        assert 0 <= r.flag_rate <= 1 and 0 <= r.tpr <= 1 and 0 <= r.fpr <= 1
        assert abs((r.flag_rate - overall_flag) - r.flag_rate_gap) < 1e-4, r
    w_gap = sum(r.flag_rate_gap * r.n for r in rows) / n_tot
    assert abs(w_gap) < 1e-4


def test_ndcg_bounds_and_ideal(spark, sf_dir):
    (r,) = _run("q_ndcg", spark, sf_dir)
    assert 0 <= r.ndcg <= 1 + 1e-9
    assert r.dcg <= r.idcg + 1e-9
    assert r.n_rel > 0
    # ideal DCG for k relevant docs is the harmonic-log partial sum
    k = min(10, r.n_rel)
    want = sum(1.0 / math.log2(i + 1) for i in range(1, k + 1))
    assert abs(r.idcg - want) < 1e-5


def test_rrf_fuses_both_rankings(spark, sf_dir):
    """RRF top-20: scores decay with ranks, every fused score is the
    exact two-term reciprocal sum, and the top result beats any doc
    ranked worse on BOTH lists."""
    rows = _run("q_rrf", spark, sf_dir)
    assert len(rows) == 20
    for r in rows:
        want = 1.0 / (60 + r.lex_rank) + 1.0 / (60 + r.sem_rank)
        assert abs(r.rrf - want) < 1e-6, r
    top = rows[0]
    for r in rows[1:]:
        # nobody dominated on both lists can outrank the top row
        assert not (r.lex_rank < top.lex_rank and r.sem_rank < top.sem_rank)


def test_anova_matches_scipy_style_reference(spark, sf_dir):
    """F recomputed from raw group moments in python (float) must
    agree to ~1e-4 relative; eta_sq in [0,1]."""
    from fraud_detection_spark.sources import events_with_time

    ev = events_with_time(spark, sf_dir).select("ts_sec", "value").collect()
    groups: dict[int, list[float]] = {}
    for r in ev:
        groups.setdefault((r.ts_sec // 86400) % 7, []).append(r.value)
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    grand = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in groups.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in groups.values()
    )
    want_f = (ssb / (k - 1)) / (ssw / (n - k))
    (r,) = _run("q_anova", spark, sf_dir)
    assert r.k == k and r.n == n
    assert abs(r.f_stat - want_f) / max(want_f, 1e-9) < 1e-3, (r.f_stat, want_f)
    assert 0 <= r.eta_sq <= 1


def test_abtest_consistency(spark, sf_dir):
    """CI straddles the lift, z sign matches lift sign, counts
    partition the event table."""
    (r,) = _run("q_abtest", spark, sf_dir)
    assert r.ci_lo <= r.lift <= r.ci_hi
    assert (r.z >= 0) == (r.lift >= 0)
    assert abs(r.lift - (r.p_treat - r.p_control)) < 1e-5
    from fraud_detection_spark.sources import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert r.n_control + r.n_treat == n_events
    assert 0 < r.p_control < 1 and 0 < r.p_treat < 1


def test_token_budget_monotone_and_concave(spark, sf_dir):
    """Cumulative docs/tokens strictly increase; decile 10 covers the
    whole corpus (share = 1); quality-ordered yield is (weakly) above
    the uniform diagonal is NOT guaranteed, but shares are in (0,1]."""
    rows = sorted(_run("q_token_budget", spark, sf_dir), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    assert rows[-1].token_share == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.n_docs > a.n_docs and b.cum_tokens > a.cum_tokens
    from fraud_detection_spark.sources import load_table

    assert rows[-1].n_docs == load_table(spark, sf_dir, "documents").count()


def test_embedding_isotropy_matches_numpy(spark, sf_dir):
    """Mean pairwise cosine via the sum-vector identity must equal the
    brute-force O(n^2) numpy mean."""
    import numpy as np

    from fraud_detection_spark.sources import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    u = m / np.linalg.norm(m, axis=1, keepdims=True)
    g = u @ u.T
    n = len(rows)
    want = (g.sum() - np.trace(g)) / (n * (n - 1))
    (r,) = _run("q_embedding_isotropy", spark, sf_dir)
    assert r.n == n
    assert abs(r.mean_cosine - want) < 1e-5, (r.mean_cosine, want)
    assert abs(r.mean_norm - np.linalg.norm(m, axis=1).mean()) < 1e-5


def test_graph_2core_is_subgraph_with_min_degree(spark, sf_dir):
    """After the peel every surviving vertex has residual degree >= 2
    (3 rounds reach the fixpoint on this graph — verified against an
    exhaustive python peel), and survivors are a subset of the
    original vertex set."""
    from fraud_detection_spark.operators.graph import _heavy_pairs

    pe = [(r.ca, r.cb) for r in _heavy_pairs(spark, sf_dir).collect()]
    # python peel to fixpoint
    edges = set(pe)
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 2}
        nxt = {(a, b) for a, b in edges if a in keep and b in keep}
        if nxt == edges:
            break
        edges = nxt
    want = {}
    for a, b in edges:
        want[a] = want.get(a, 0) + 1
        want[b] = want.get(b, 0) + 1
    got = {r.custkey: r.core_degree for r in _run("q_graph_2core", spark, sf_dir)}
    assert got == want, (len(got), len(want))
    assert all(d >= 2 for d in got.values())


def test_dedup_stats_reconciles_with_dedup_exact(spark, sf_dir):
    """Total removals across sources equal total docs minus distinct
    texts; rates in [0,1); every source accounted for."""
    rows = _run("q_dedup_stats", spark, sf_dir)
    groups = _run("q_dedup_exact", spark, sf_dir)
    total_removed = sum(r.n_removed for r in rows)
    assert total_removed == sum(g.n_copies - 1 for g in groups)
    n_docs = sum(r.n_docs for r in rows)
    assert n_docs == sum(g.n_copies for g in groups)
    for r in rows:
        assert 0 <= r.removal_rate < 1
        assert r.n_removed <= r.n_in_dup_groups <= r.n_docs


def test_cell_balance_consistency(spark, sf_dir):
    """Sizes account for every vector; imbalance >= 1; CV >= 0; cells
    bounded by the 16-cell quantizer."""
    from fraud_detection_spark.sources import load_table

    (r,) = _run("q_cell_balance", spark, sf_dir)
    assert r.n_vectors == load_table(spark, sf_dir, "embeddings").count()
    assert 1 <= r.n_cells <= 16
    assert r.min_size <= r.max_size
    assert r.imbalance >= 1.0 - 1e-9
    assert r.size_cv >= 0


def test_ndcg_no_relevant_docs_matches_oracle_null(spark, tmp_path):
    """n_rel = 0 degenerate corpus (ADVICE r8): Spark's sequence(1, 0)
    auto-steps to [1, 0] whose i = 0 term divides by log2(1) = 0 —
    unguarded, idcg saturates where the oracle's empty SUM is NULL.
    Both engines must return NULL idcg/ndcg on a corpus where the
    query label matches nothing."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                [1.0, 0.0, 0.0],
                [0.9, 0.1, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
        }
    )
    pdf["embedding"] = pdf["embedding"].map(
        lambda v: __import__("numpy").asarray(v, dtype="float32")
    )
    pdf["label"] = pd.array([7, 1, 2, 3], dtype="int32")  # query label 7 unmatched
    pdf.to_parquet(tmp_path / "embeddings.parquet", index=False)

    q = load_all()["q_ndcg"]
    (r,) = q.fn(spark, str(tmp_path)).collect()
    assert r.n_rel == 0 and r.dcg == 0.0
    assert r.idcg is None and r.ndcg is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    (orow,) = con.execute(q.oracle).fetchall()
    con.close()
    assert (r.n_rel, r.dcg, r.idcg, r.ndcg) == orow
