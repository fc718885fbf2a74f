"""Property tests for the round-10 additions (VERDICT r9 #5):
q_xcorr_leadlag, q_bh_fdr, q_boosted_stumps, q_ktruss. Each is
oracle-checked by tests/test_oracle_parity.py; these assert the
SEMANTIC claims the oracle can't express (reference-implementation
cross-checks, fixpoint/monotonicity invariants)."""

from __future__ import annotations

import math

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_xcorr_leadlag


def test_xcorr_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    got = (
        REGISTRY["q_xcorr_leadlag"].fn(spark, sf_dir).toPandas().set_index("lag")
    )
    from fraud_detection_spark.sources import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.expr("ts div 1000000000 div 86400").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
        )
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert set(got.index) == set(range(-7, 8))
    # align by DAY KEY, not array position (ADVICE r10 #4): the
    # operator and oracle pair x(day) with y(day+lag) by day value,
    # so a dataset with a zero-event calendar day must not shift the
    # reference alignment the way positional slicing would.
    by_day = d.set_index("day")
    days = by_day.index
    for lag in range(-7, 8):
        paired = days[(days + lag).isin(days)]
        a = by_day.x.loc[paired].values.astype(float)
        b = by_day.y.loc[paired + lag].values.astype(float)
        assert got.loc[lag, "n_pairs"] == len(a)
        if len(a) >= 2 and a.std() > 0 and b.std() > 0:
            want = float(np.corrcoef(a, b)[0, 1])
            have = got.loc[lag, "xcorr"]
            assert abs(have - want) < 1e-6, (lag, have, want)
            assert abs(have) <= 1 + 1e-9


# ---------------------------------------------------------------------------
# q_bh_fdr


def test_bh_fdr_matches_numpy_reference(spark, sf_dir):
    got = REGISTRY["q_bh_fdr"].fn(spark, sf_dir).toPandas().sort_values("k")
    m = len(got)
    assert sorted(got.k) == list(range(1, m + 1))
    # p is non-decreasing in k (k is the p-rank)
    assert (got.p_value.diff().dropna() >= -1e-12).all()
    # BH step-up recomputed independently from the emitted p-values
    flags = got.p_value.values <= got.k.values * 0.05 / m
    kstar = int(got.k.values[flags].max()) if flags.any() else 0
    want_rej = (got.k.values <= kstar).astype(int)
    assert (got.rejected.values == want_rej).all()
    # rejected set is a prefix of the p-sorted order
    rej = got.rejected.values
    assert all(rej[i] >= rej[i + 1] for i in range(m - 1))
    # chi2 recomputed from raw counts
    import duckdb

    con = duckdb.connect()
    cells = con.execute(
        "SELECT c.c_nationkey AS nk, "
        "CASE WHEN o_totalprice < 100000 THEN 1 "
        "WHEN o_totalprice < 250000 THEN 2 ELSE 3 END AS b, COUNT(*) AS o "
        f"FROM read_parquet('{sf_dir}/orders.parquet') o "
        f"JOIN read_parquet('{sf_dir}/customer.parquet') c "
        "ON o.o_custkey = c.c_custkey GROUP BY nk, b"
    ).df()
    piv = cells.pivot_table(index="nk", columns="b", values="o", fill_value=0)
    piv = piv.reindex(columns=[1, 2, 3], fill_value=0)
    tot = piv.sum(axis=0)
    nn = tot.sum()
    for _, row in got.iterrows():
        o = piv.loc[row.nationkey].values.astype(float)
        e = o.sum() * tot.values / nn
        chi2 = ((o - e) ** 2 / e).sum()
        assert abs(chi2 - row.chi2) < 1e-4, (row.nationkey, chi2, row.chi2)
        assert abs(math.exp(-chi2 / 2) - row.p_value) < 1e-6


# ---------------------------------------------------------------------------
# q_boosted_stumps


def _adaboost_reference(rows):
    """Exact-integer AdaBoost reference on the distinct-score table:
    rows = [(score, cnt, pos)], returns per-round
    (threshold, polarity, e_num, d_num) in python ints."""
    rows = sorted(rows)
    smax = rows[-1][0]
    wp = {s: p for s, c, p in rows}
    wn = {s: c - p for s, c, p in rows}
    out = []
    for _ in range(3):
        wpt = sum(wp.values())
        wnt = sum(wn.values())
        d = wpt + wnt
        best = None
        cwp = cwn = 0
        for s, c, p in rows:
            cwp += wp[s]
            cwn += wn[s]
            if s >= smax:
                continue
            u = cwp + (wnt - cwn)
            pol = 1 if u <= d - u else -1
            e = min(u, d - u)
            k = (e, s)
            if best is None or k < best[0]:
                best = (k, s, pol, e, d)
        _, t, pol, e, d = best
        out.append((t, pol, e, d))
        for s, c, p in rows:
            mis_p = (pol == 1) == (s <= t)
            mis_n = (pol == 1) == (s > t)
            wp[s] *= (d - e) if mis_p else e
            wn[s] *= (d - e) if mis_n else e
    return out


def test_boosted_stumps_matches_integer_reference(spark, sf_dir):
    from fraud_detection_spark.operators.ml_metrics import scored
    from pyspark.sql import functions as F

    per = (
        scored(spark, sf_dir)
        .groupBy("score")
        .agg(F.count("*").alias("cnt"), F.sum("label").alias("pos"))
        .collect()
    )
    rows = [(r.score, r.cnt, r.pos) for r in per]
    want = _adaboost_reference(rows)
    got = (
        REGISTRY["q_boosted_stumps"].fn(spark, sf_dir).toPandas().sort_values("round")
    )
    for (t, pol, e, d), (_, row) in zip(want, got.iterrows()):
        assert abs(row.threshold - t) < 1e-12
        assert row.polarity == pol
        assert abs(row.w_err - round(e / d, 6)) < 2e-6
        want_alpha = 0.5 * math.log((d - e) / e)
        assert abs(row.alpha - want_alpha) < 2e-6
    # weighted error can never exceed 1/2 (polarity flip), and round 1's
    # ensemble accuracy is exactly 1 - its error when alpha > 0
    assert (got.w_err <= 0.5 + 1e-12).all()
    if got.alpha.iloc[0] > 0:
        assert abs(got.acc.iloc[0] - (1 - got.w_err.iloc[0])) < 2e-6
    assert ((got.acc >= 0) & (got.acc <= 1)).all()


# ---------------------------------------------------------------------------
# q_ktruss


def test_ktruss_fixpoint_and_support(spark, sf_dir):
    from collections import defaultdict

    got = REGISTRY["q_ktruss"].fn(spark, sf_dir).toPandas()
    assert (got.support >= 1).all()
    assert (got.ca < got.cb).all()
    edges = {(r.ca, r.cb) for r in got.itertuples()}
    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    # fixpoint: the reported support equals the common-neighbor count
    # INSIDE the emitted edge set (the peel converged at this scale),
    # and every edge still closes a triangle
    for r in got.itertuples():
        s = len(nbr[r.ca] & nbr[r.cb])
        assert s == r.support, ((r.ca, r.cb), s, r.support)
        assert s >= 1
    # the truss is a subgraph of the heavy-pair projection
    from fraud_detection_spark.operators.graph import _heavy_pairs

    pe = {(r.ca, r.cb) for r in _heavy_pairs(spark, sf_dir).collect()}
    assert edges <= pe
    # edge-level strictness: the truss never keeps MORE than the
    # 2-core keeps vertices (every truss endpoint has >= 2 alive ties
    # through its triangle)
    deg = {v: len(nbr[v]) for v in nbr}
    assert all(d >= 2 for d in deg.values())


# ---------------------------------------------------------------------------
# q_holm


def test_holm_stepdown_and_dominance(spark, sf_dir):
    got = REGISTRY["q_holm"].fn(spark, sf_dir).toPandas().sort_values("k")
    bh = REGISTRY["q_bh_fdr"].fn(spark, sf_dir).toPandas().sort_values("k")
    m = len(got)
    assert sorted(got.k) == list(range(1, m + 1))
    # step-down recomputed from the emitted p-values
    rej = []
    stopped = False
    for _, row in got.iterrows():
        if not stopped and row.p_value <= 0.05 / (m - row.k + 1):
            rej.append(1)
        else:
            stopped = True
            rej.append(0)
    assert (got.rejected.values == rej).all()
    # the battery is shared bit-for-bit with q_bh_fdr
    merged = got.merge(bh, on="nationkey", suffixes=("_h", "_b"))
    assert (merged.chi2_h == merged.chi2_b).all()
    assert (merged.p_value_h == merged.p_value_b).all()
    assert (merged.k_h == merged.k_b).all()
    # Holm (FWER) never rejects outside BH's (FDR) rejection set:
    # q/(m-k+1) <= k*q/m for every k, and Holm additionally stops early
    assert (merged.rejected_h <= merged.rejected_b).all()


# ---------------------------------------------------------------------------
# q_gini_index


def test_gini_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    got = REGISTRY["q_gini_index"].fn(spark, sf_dir).toPandas().iloc[0]
    import duckdb

    con = duckdb.connect()
    x = (
        con.execute(
            "SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
            f"AS BIGINT) AS x FROM read_parquet('{sf_dir}/orders.parquet') "
            "GROUP BY o_custkey"
        )
        .df()
        .x.values
    )
    xs = np.sort(x)
    n = len(xs)
    i = np.arange(1, n + 1, dtype=np.float64)
    want = (2 * (i * xs).sum() - (n + 1) * xs.sum()) / (n * xs.sum())
    assert got.n_customers == n
    assert abs(got.total_spend - round(xs.sum() / 100, 2)) < 1e-6
    assert abs(got.gini - want) < 1e-6
    assert 0 <= got.gini < 1


# ---------------------------------------------------------------------------
# q_mrr


def test_mrr_matches_numpy_reference(spark, sf_dir):
    import numpy as np
    import duckdb

    got = REGISTRY["q_mrr"].fn(spark, sf_dir).toPandas().iloc[0]
    con = duckdb.connect()
    e = con.execute(
        f"SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).df()
    vecs = np.stack(e.emb.values)
    norms = np.linalg.norm(vecs, axis=1)
    rrs = []
    n_with = 0
    for qid in range(10):
        q = vecs[e.vec_id == qid][0]
        ql = e.label[e.vec_id == qid].iloc[0]
        mask = e.vec_id.values != qid
        cos = vecs[mask] @ q / (norms[mask] * np.linalg.norm(q))
        cos = np.floor(cos * 1e6 + 0.5) / 1e6  # the 6-dp pround contract
        order = sorted(
            zip(-cos, e.vec_id.values[mask], e.label.values[mask] == ql)
        )
        frank = next(
            (i + 1 for i, (_, _, rel) in enumerate(order) if rel), None
        )
        if frank is not None:
            n_with += 1
            rrs.append(np.floor(1e9 / frank + 0.5) / 1e9)
        else:
            rrs.append(0.0)
    assert got.n_queries == 10
    assert got.n_with_rel == n_with
    assert abs(got.mrr - sum(rrs) / 10) < 1e-6
    assert 0 <= got.mrr <= 1


# ---------------------------------------------------------------------------
# q_ridge


def test_ridge_matches_numpy_reference(spark, sf_dir):
    import duckdb
    import numpy as np

    got = REGISTRY["q_ridge"].fn(spark, sf_dir).toPandas().iloc[0]
    con = duckdb.connect()
    df = con.execute(
        "SELECT FLOOR(l_quantity * 10000 + 0.5) / 10000 AS x1, "
        "FLOOR(l_discount * 10000 + 0.5) / 10000 AS x2, "
        "FLOOR(l_extendedprice * 100 + 0.5) / 100 / 100000 AS y, "
        "l_quantity AS rq, l_discount AS rd, "
        "l_extendedprice / 100000.0 AS ry "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).df()
    X = np.column_stack([np.ones(len(df)), df.x1.values, df.x2.values])
    A = X.T @ X + np.diag([0.0, 1.0, 1.0])
    b = X.T @ df.y.values
    w = np.linalg.solve(A, b)
    assert got.n == len(df)
    assert abs(got.w0 - w[0]) < 1e-4
    assert abs(got.w_qty - w[1]) < 1e-4
    assert abs(got.w_disc - w[2]) < 1e-2  # discount has tiny leverage
    # RMSE on the RAW columns with the exact emitted weights
    r = df.ry.values - (got.w0 + got.w_qty * df.rq.values + got.w_disc * df.rd.values)
    assert abs(got.rmse - np.sqrt((r**2).mean())) < 1e-3
    # the fit should beat the intercept-only model on its own data
    assert got.rmse < df.ry.std() + 1e-9


def test_boosted_stumps_closed_form_on_adversarial_orderings(spark):
    """The closed-form round-3 weighted cums use inclusion-exclusion
    over the (s<=t1, s<=t2) quadrants with CASE branches on the
    ORDERING of t1 vs t2 — the shipped data only exercises t1<t2, so
    this drives crafted distributions through the Spark operator and
    checks every emitted value against the exact-integer python
    reference: seeds cover t1>t2 (0, 2, 5), t1<t2 (1), a repeated
    threshold t3==t1 (3), and mixed polarities."""
    import random

    from fraud_detection_spark.operators import ml_metrics as mm

    for seed in (0, 1, 2, 3, 5):
        rng = random.Random(seed)
        n = rng.randint(4, 12)
        scores = sorted(rng.sample([i / 10 for i in range(1, 21)], n))
        rows = []
        for s in scores:
            c = rng.randint(1, 6)
            p = rng.randint(0, c)
            rows.append((s, c, p))
        want = _adaboost_reference(rows)
        if len(want) < 3 or any(e == 0 for _, _, e, _ in want):
            continue
        level = [
            (s, 1 if i < p else 0)
            for s, c, p in rows
            for i in range(c)
        ]
        sdf = spark.createDataFrame(level, "score double, label int")
        orig = mm.scored
        mm.scored = lambda *_: sdf
        try:
            got = (
                mm.q_boosted_stumps(spark, "unused")
                .toPandas()
                .sort_values("round")
                .reset_index(drop=True)
            )
        finally:
            mm.scored = orig
        # reference accs from the reference stumps
        alphas = [0.5 * math.log((d - e) / e) for _, _, e, d in want]
        nn = sum(c for _, c, _ in rows)
        for r in range(3):
            t, pol, e, d = want[r]
            row = got.iloc[r]
            assert row.threshold == t, (seed, r)
            assert row.polarity == pol, (seed, r)
            assert abs(row.w_err - e / d) < 2e-6, (seed, r)
            assert abs(row.alpha - alphas[r]) < 2e-6, (seed, r)
            corr = 0
            for s, c, p in rows:
                margin = sum(
                    alphas[j]
                    * (want[j][1] if s > want[j][0] else -want[j][1])
                    for j in range(r + 1)
                )
                corr += p if margin > 0 else c - p
            assert abs(row.acc - corr / nn) < 2e-6, (seed, r)
