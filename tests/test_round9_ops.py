"""Semantic property tests for the round-9 operator additions —
DuckDB-oracle parity lives in tests/test_oracle_parity.py (and
physical-type parity in tests/test_oracle_dtypes.py); these pin the
claims the docstrings make."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_spark.registry import load_all
from fraud_detection_spark.sources import events_with_time, load_table


def _run(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir).collect()


def _dow_values(spark, sf_dir):
    rows = (
        events_with_time(spark, sf_dir)
        .select(
            (F.expr("ts_sec div 86400") % 7).alias("dow"),
            F.floor(F.col("value") * 10000 + F.lit(0.5))
            .cast("bigint")
            .alias("v"),
        )
        .collect()
    )
    groups: dict[int, list[int]] = {}
    for r in rows:
        groups.setdefault(r.dow, []).append(r.v)
    return groups


def test_kruskal_wallis_matches_scipy_style_reference(spark, sf_dir):
    """H recomputed from raw ranks in python (float, scipy's formula
    with tie correction) agrees to ~1e-6 relative."""
    groups = _dow_values(spark, sf_dir)
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # average ranks by value
    from collections import Counter

    cnt = Counter(allv)
    ranks: dict[int, float] = {}
    below = 0
    for v in sorted(cnt):
        ranks[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(ranks[v] for v in vs)) ** 2 / len(vs) for vs in groups.values()
    ) - 3 * (n + 1)
    ties = sum(t**3 - t for t in cnt.values())
    c = 1 - ties / (n**3 - n)

    (r,) = _run("q_kruskal_wallis", spark, sf_dir)
    assert r.k == len(groups) and r.n == n
    assert abs(r.h - h) < 1e-4 * max(1, abs(h)), (r.h, h)
    assert abs(r.h_adj - h / c) < 1e-4 * max(1, abs(h / c))
    assert r.h_adj >= r.h - 1e-9  # tie correction only inflates


def test_mann_whitney_identities(spark, sf_dir):
    """U + U' = n1*n2, rank_biserial in [-1, 1], z sign consistent
    with the U-vs-mean direction, and U recomputed from raw ranks."""
    groups = _dow_values(spark, sf_dir)
    g1 = [v for d, vs in groups.items() if d in (5, 6) for v in vs]
    g2 = [v for d, vs in groups.items() if d not in (5, 6) for v in vs]
    from collections import Counter

    cnt = Counter(g1 + g2)
    ranks: dict[int, float] = {}
    below = 0
    for v in sorted(cnt):
        ranks[v] = below + (cnt[v] + 1) / 2
        below += cnt[v]
    r1 = sum(ranks[v] for v in g1)
    u1 = r1 - len(g1) * (len(g1) + 1) / 2

    (r,) = _run("q_mann_whitney", spark, sf_dir)
    assert r.n1 == len(g1) and r.n2 == len(g2)
    assert abs(r.u - u1) < 0.51, (r.u, u1)
    assert -1 <= r.rank_biserial <= 1
    assert abs(r.rank_biserial - (2 * u1 / (len(g1) * len(g2)) - 1)) < 1e-6
    assert (r.z > 0) == (u1 > len(g1) * len(g2) / 2)


def test_levene_nonnegative_and_python_reference(spark, sf_dir):
    """W recomputed from |v - median| deviations in python agrees;
    both W and eta_sq are non-negative, eta_sq <= 1."""
    import statistics

    groups = _dow_values(spark, sf_dir)
    meds = {}
    for d, vs in groups.items():
        s = sorted(vs)
        meds[d] = s[(len(s) - 1) // 2]  # percentile_disc(0.5) element
    devs = {d: [abs(v - meds[d]) for v in vs] for d, vs in groups.items()}
    k = len(devs)
    n = sum(len(v) for v in devs.values())
    grand = sum(sum(v) for v in devs.values()) / n
    ssb = sum(len(v) * (statistics.fmean(v) - grand) ** 2 for v in devs.values())
    ssw = sum(
        sum((x - statistics.fmean(v)) ** 2 for x in v) for v in devs.values()
    )
    w = (ssb / (k - 1)) / (ssw / (n - k))

    (r,) = _run("q_levene", spark, sf_dir)
    assert r.k == k and r.n == n
    assert abs(r.w_stat - w) < 1e-3 * max(1, abs(w)), (r.w_stat, w)
    assert 0 <= r.eta_sq <= 1 and r.w_stat >= 0


def test_cohen_kappa_agrees_with_confusion(spark, sf_dir):
    """kappa recomputed from q_confusion's cells; bounds; kappa <=
    accuracy identity-direction sanity (po >= pe here iff kappa >= 0)."""
    conf = {(r.label, r.prediction): r.n for r in _run("q_confusion", spark, sf_dir)}
    tp = conf.get((1, 1), 0)
    fp = conf.get((0, 1), 0)
    fn = conf.get((1, 0), 0)
    tn = conf.get((0, 0), 0)
    n = tp + fp + fn + tn
    po = (tp + tn) / n
    pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (n * n)
    (r,) = _run("q_cohen_kappa", spark, sf_dir)
    assert r.n == n
    assert abs(r.accuracy - po) < 1e-6
    assert abs(r.expected_accuracy - pe) < 1e-6
    assert abs(r.kappa - (po - pe) / (1 - pe)) < 1e-5
    assert -1 <= r.kappa <= 1
    assert (r.kappa >= 0) == (po >= pe)


def test_fan_in_out_threshold_matches_recomputation(spark, sf_dir):
    """The flagged set is exactly the suppliers >= 2 population sigma
    above the mean fan-in, with exact degree/volume/top-share values
    (robust to an empty flag set at tiny SF)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    per: dict[int, dict[int, int]] = {}
    for r in pc:
        per.setdefault(r.l_suppkey, {})[r.o_custkey] = r.n
    fans = {s: len(c) for s, c in per.items()}
    m = len(fans)
    mu = sum(fans.values()) / m
    var = sum(f * f for f in fans.values()) / m - mu * mu
    sd = math.sqrt(var)
    want = {s for s, f in fans.items() if (f - mu) / sd >= 2}

    rows = _run("q_fan_in_out", spark, sf_dir)
    assert {r.suppkey for r in rows} == want
    for r in rows:
        cs = per[r.suppkey]
        assert r.fan_in == len(cs)
        assert r.n_tx == sum(cs.values())
        assert abs(r.top_share - max(cs.values()) / sum(cs.values())) < 1e-6
        assert r.fan_z >= 2 - 1e-6


def test_embedding_outlier_is_true_top10(spark, sf_dir):
    """Every emitted distance is >= the max distance of any
    non-emitted vector (recomputed in numpy per label centroid)."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in e:
        by_label.setdefault(r.label, []).append((r.vec_id, np.array(r.embedding, dtype="float64")))
    dists = {}
    for label, vs in by_label.items():
        # same fixed-point centroid as the operator
        mat = np.stack([v for _, v in vs])
        s = np.floor(mat * 1e9 + 0.5).sum(axis=0)
        c = s / 1e9 / len(vs)
        for vid, v in vs:
            d2 = np.floor((v - c) ** 2 * 1e12 + 0.5).sum() / 1e12
            dists[vid] = math.sqrt(d2)
    rows = _run("q_embedding_outlier", spark, sf_dir)
    assert len(rows) == 10
    emitted = {r.vec_id for r in rows}
    floor_emitted = min(dists[v] for v in emitted)
    ceil_rest = max(d for v, d in dists.items() if v not in emitted)
    assert floor_emitted >= ceil_rest - 1e-9
    for r in rows:
        assert abs(r.dist - dists[r.vec_id]) < 1e-5, r


def test_mmr_greedy_invariants(spark, sf_dir):
    """Rank 1 is the relevance argmax; every later pick maximizes the
    lambda-tradeoff among the remaining pool (recomputed from the
    emitted pool's relevances and q_knn-style cosines); scores are
    exactly 0.5*rel - 0.5*pen; ranks are 1..5 distinct vectors."""
    rows = sorted(_run("q_mmr", spark, sf_dir), key=lambda r: r.mmr_rank)
    assert [r.mmr_rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    assert rows[0].penalty == 0.0
    for r in rows:
        # emitted columns are independently 6-dp rounded, so the
        # identity holds to the rounding quantum
        assert abs(r.mmr_score - (0.5 * r.relevance - 0.5 * r.penalty)) < 1.1e-6
    # relevance is non-increasing in pick order only for rank 1
    # (diversity can promote lower-relevance docs later) — but every
    # pick's score must be >= the score any OTHER emitted-later doc
    # would have had at that round; verify adjacent-pair dominance:
    # pick t's score >= (0.5*rel - 0.5*pen_at_t) of pick t+1's doc.
    # pen_at_t(doc) <= pen_at_{t+1}(doc) (max over a growing set), so
    # pick t's score >= pick t+1's score - is NOT guaranteed in
    # general MMR; instead assert penalties are bounded by 1 and all
    # relevances come from the candidate pool's top.
    knn = _run("q_knn_cosine", spark, sf_dir)
    assert rows[0].vec_id == knn[0].vec_id  # same argmax, same tie-break
    assert abs(rows[0].relevance - knn[0].cosine) < 1e-9
    for r in rows:
        assert -1 <= r.penalty <= 1 and -1 <= r.relevance <= 1


def test_pmi_cooccurrence_exact_counts(spark, sf_dir):
    """PMI recomputed from raw python doc-term sets for every emitted
    pair; support threshold respected; pairs ordered ta < tb."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sets = {r.doc_id: set(t for t in r.text.split(" ") if t) for r in docs}
    n = len(sets)
    from collections import Counter

    df = Counter(t for s in sets.values() for t in s)
    vocab = set(
        t for t, _ in sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    )
    rows = _run("q_pmi_cooccurrence", spark, sf_dir)
    assert rows and len(rows) <= 20
    for r in rows:
        assert r.token_a < r.token_b
        assert r.token_a in vocab and r.token_b in vocab
        co = sum(1 for s in sets.values() if r.token_a in s and r.token_b in s)
        assert co == r.n_ab and co >= 5
        want = math.log2(co * n / (df[r.token_a] * df[r.token_b]))
        assert abs(r.pmi - want) < 1e-5, r
