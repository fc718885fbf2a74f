"""Independent python references and invariants for the round-6
feature-engineering (operators/feature_eng.py) and time-evolution
(operators/timeseries.py, graph.q_mahalanobis) operators — the oracle
parity test proves Spark==DuckDB; these prove both equal the *math*.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_tree_score


def _walk(node, row):
    while not isinstance(node, tuple):
        node = node["left"] if row[node["feat"]] < node["thr"] else node["right"]
    return node


def test_tree_score_matches_python_walk(spark, sf_dir):
    from fraud_detection_spark.operators.feature_eng import _TREE_BIAS, _TREES

    out = REGISTRY["q_tree_score"].fn(spark, sf_dir).toPandas()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
        .toPandas()
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # testdata, so compare as whole-row multisets: recompute the
    # expected output from the input features with a python tree walk.
    rows = []
    for r in li.itertuples():
        row = {
            "l_quantity": r.l_quantity,
            "l_extendedprice": r.l_extendedprice,
            "l_discount": r.l_discount,
            "l_tax": r.l_tax,
        }
        leaves = [_walk(t, row) for t in _TREES]
        margin = _TREE_BIAS + sum(lf[1] for lf in leaves)
        score = 1.0 / (1.0 + math.exp(-margin))
        rows.append(
            (
                r.l_orderkey,
                r.l_linenumber,
                *[lf[0] for lf in leaves],
                math.floor(score * 10**6 + 0.5) / 10**6,
            )
        )
    cols = ["l_orderkey", "l_linenumber", "leaf0", "leaf1", "leaf2", "tree_score"]
    want = pd.DataFrame(rows, columns=cols).sort_values(cols).reset_index(drop=True)
    got = out[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_tree_score_is_bounded_sigmoid(spark, sf_dir):
    pdf = REGISTRY["q_tree_score"].fn(spark, sf_dir).toPandas()
    assert ((pdf.tree_score > 0) & (pdf.tree_score < 1)).all()
    # every leaf combination observed maps to exactly one score value
    g = pdf.groupby(["leaf0", "leaf1", "leaf2"]).tree_score.nunique()
    assert (g == 1).all()


# ---------------------------------------------------------------------------
# q_onehot_topk


def test_onehot_topk_invariants(spark, sf_dir):
    pdf = REGISTRY["q_onehot_topk"].fn(spark, sf_dir).toPandas()
    oh = pdf[[f"oh_{i}" for i in range(1, 6)]]
    # exactly one indicator set iff the category is in the top K
    assert (oh.sum(axis=1) == (pdf.cat_idx > 0).astype(int)).all()
    # indicator position equals cat_idx
    hot = oh.to_numpy().argmax(axis=1) + 1
    in_top = pdf.cat_idx > 0
    assert (hot[in_top.to_numpy()] == pdf.cat_idx[in_top].to_numpy()).all()
    # the K encoded categories really are the K most frequent
    freq = pdf.groupby("p_type").size().sort_values(ascending=False)
    top_true = set()
    counts = sorted(set(freq.values), reverse=True)
    # ties broken by name: recompute rank exactly as declared
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    top_true = {t for t, _ in ranked[:5]}
    top_got = set(pdf.loc[pdf.cat_idx > 0, "p_type"])
    assert top_got == top_true
    del counts


# ---------------------------------------------------------------------------
# q_robust_scale


def test_robust_scale_centers_median(spark, sf_dir):
    pdf = REGISTRY["q_robust_scale"].fn(spark, sf_dir).toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_extendedprice", "l_quantity"
    ).toPandas()
    for col, out in (("l_extendedprice", "r_price"), ("l_quantity", "r_qty")):
        x = np.sort(li[col].to_numpy())
        n = len(x)
        # percentile_disc: smallest value with cume_dist >= frac
        med = x[int(np.ceil(0.5 * n)) - 1]
        q1 = x[int(np.ceil(0.25 * n)) - 1]
        q3 = x[int(np.ceil(0.75 * n)) - 1]
        want = (li[col] - med) / (q3 - q1)
        got = pdf[out]
        assert np.abs(np.sort(want) - np.sort(got)).max() < 1e-6


# ---------------------------------------------------------------------------
# q_sample_weighted


def test_sample_weighted_deterministic_and_biased(spark, sf_dir):
    fn = REGISTRY["q_sample_weighted"].fn
    a = fn(spark, sf_dir).toPandas().sort_values("o_orderkey").reset_index(drop=True)
    b = fn(spark, sf_dir).toPandas().sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 100
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_totalprice"
    ).toPandas()
    # expected-weight property: the sample mean weight must exceed the
    # population mean (weighted sampling favors heavy rows); with
    # n=100 the separation is many sigma on this data
    assert a.o_totalprice.mean() > orders.o_totalprice.mean() * 1.15


# ---------------------------------------------------------------------------
# q_ewma


def test_ewma_matches_python_reference(spark, sf_dir):
    from fraud_detection_spark.operators.timeseries import _EWMA_W

    got = REGISTRY["q_ewma"].fn(spark, sf_dir).toPandas().set_index("event_id")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, g in ev.groupby("user_id"):
        vals = g.value.to_list()
        for i, eid in enumerate(g.event_id):
            num = den = 0.0
            for k, wk in enumerate(_EWMA_W):
                if i - k >= 0:
                    num += vals[i - k] * wk
                    den += wk
            assert abs(got.loc[eid, "ewma"] - num / den) < 1e-5, (uid, eid)


def test_ewma_first_event_is_identity(spark, sf_dir):
    """With no history the EWMA must equal the value itself (the
    adjust=True renormalization property)."""
    got = REGISTRY["q_ewma"].fn(spark, sf_dir).toPandas()
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .groupby("user_id")
        .first()
    )
    merged = ev.merge(got, on="event_id")
    assert (np.abs(merged.value.round(6) - merged.ewma) < 1e-6).all()


# ---------------------------------------------------------------------------
# q_cusum


def test_cusum_matches_python_reference(spark, sf_dir):
    got = REGISTRY["q_cusum"].fn(spark, sf_dir).toPandas().sort_values("day")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "value").toPandas()
    day = (ev.ts.astype("int64") // 10**9) // 86400
    units = np.floor(ev.value * 10000 + 0.5).astype("int64")
    d = pd.DataFrame({"day": day, "u": units}).groupby("day").agg(
        s=("u", "sum"), n=("u", "size")
    )
    day_mean = d.s / 10000 / d.n
    grand = np.floor(day_mean * 10000 + 0.5).astype("int64").sum() / 10000 / len(day_mean)
    s_curve = (day_mean - grand).cumsum()
    assert np.abs(got.s.to_numpy() - s_curve.round(4).to_numpy()).max() < 1e-9
    # CUSUM telescopes: the final S returns to n*(mean-of-means - grand)
    assert abs(s_curve.iloc[-1]) < len(day_mean) * 1e-4 + 1e-6


# ---------------------------------------------------------------------------
# q_scd2


def test_scd2_interval_invariants(spark, sf_dir):
    pdf = REGISTRY["q_scd2"].fn(spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    # row conservation: interval row counts sum to the order count
    assert pdf.n_rows.sum() == len(orders)
    # exactly one open (current) interval per customer
    cur = pdf.groupby("custkey").is_current.sum()
    assert (cur == 1).all()
    for ck, g in pdf.groupby("custkey"):
        g = g.sort_values("version")
        # versions are 1..n contiguous
        assert g.version.to_list() == list(range(1, len(g) + 1))
        # intervals chain: valid_to == next valid_from; last is NULL
        assert g.valid_to.iloc[:-1].to_list() == g.valid_from.iloc[1:].to_list()
        assert pd.isna(g.valid_to.iloc[-1])
        # adjacent versions change the attribute
        prios = g.prio.to_list()
        assert all(a != b for a, b in zip(prios, prios[1:]))


# ---------------------------------------------------------------------------
# q_mahalanobis


def test_mahalanobis_matches_numpy(spark, sf_dir):
    got = (
        REGISTRY["q_mahalanobis"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", *feats)
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    x = li[feats].to_numpy()
    z = (x - x.mean(axis=0)) / x.std(axis=0, ddof=1)
    d2 = (z**2).sum(axis=1)
    assert np.abs(d2 - got.d2).max() < 1e-4
    assert (got.is_outlier == (d2 > 9.488).astype(int)).mean() > 0.999
    # the flag rate should be loosely near the chi-square tail mass for
    # correlated-but-centered data: just sanity-bound it
    assert 0.0 < got.is_outlier.mean() < 0.25


# ---------------------------------------------------------------------------
# q_asof_interval


def test_asof_interval_covers_every_order_once(spark, sf_dir):
    got = REGISTRY["q_asof_interval"].fn(spark, sf_dir).toPandas()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    # every order matched by exactly one interval
    assert len(got) == len(orders)
    assert got.o_orderkey.value_counts().max() == 1
    # the overwhelming majority of orders fall in their own version's
    # interval; mismatches only occur on same-day priority flips
    assert got.own_version.mean() > 0.9
    # matched interval must contain the date
    iv = REGISTRY["q_scd2"].fn(spark, sf_dir).toPandas()
    m = got.merge(iv, on=["custkey", "version"])
    assert (m.datekey >= m.valid_from).all()
    assert ((m.valid_to.isna()) | (m.datekey < m.valid_to.fillna(10**9))).all()


# ---------------------------------------------------------------------------
# q_isotonic


def _pav_ref(rates, weights):
    """Quadratic-time reference PAV: repeatedly merge the first
    violating adjacent pair — independent of the stack implementation."""
    blocks = [[r, w, [i]] for i, (r, w) in enumerate(zip(rates, weights))]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][0] > blocks[i + 1][0] + 1e-15:
                r1, w1, m1 = blocks[i]
                r2, w2, m2 = blocks[i + 1]
                blocks[i : i + 2] = [
                    [(r1 * w1 + r2 * w2) / (w1 + w2), w1 + w2, m1 + m2]
                ]
                changed = True
                break
    out = [0.0] * len(rates)
    for r, _, members in blocks:
        for i in members:
            out[i] = r
    return out


def test_pav_matches_quadratic_reference():
    import random

    from fraud_detection_spark.operators.model_monitor import _pav

    rng = random.Random(7)
    for _ in range(50):
        n = rng.randint(1, 40)
        rates = [rng.random() for _ in range(n)]
        weights = [float(rng.randint(1, 100)) for _ in range(n)]
        got = _pav(rates, weights)
        want = _pav_ref(rates, weights)
        assert max(abs(a - b) for a, b in zip(got, want)) < 1e-12
        # monotone non-decreasing
        assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))
        # weighted mean preserved
        tot = sum(weights)
        assert (
            abs(
                sum(r * w for r, w in zip(got, weights)) / tot
                - sum(r * w for r, w in zip(rates, weights)) / tot
            )
            < 1e-12
        )


def test_isotonic_query_invariants(spark, sf_dir):
    pdf = REGISTRY["q_isotonic"].fn(spark, sf_dir).toPandas().sort_values("band")
    # calibrated rates are monotone in score band
    assert (pdf.rate_cal.diff().dropna() >= -1e-9).all()
    assert ((pdf.rate_cal >= 0) & (pdf.rate_cal <= 1)).all()
    # per-band mean scores are monotone by construction of the binning
    assert (pdf.mean_score.diff().dropna() > 0).all()
    # calibration preserves the global positive rate
    from fraud_detection_spark.operators.ml_metrics import scored

    s = scored(spark, sf_dir).toPandas()
    global_rate = s.label.mean()
    fitted_rate = (pdf.rate_cal * pdf.n).sum() / pdf.n.sum()
    assert abs(fitted_rate - global_rate) < 1e-4


def test_isotonic_minimax_matches_pav():
    """q_isotonic's declarative fit uses the minimax characterization
    fitted_i = max_{a<=i} min_{b>=i} pooledmean(a,b) (VERDICT r9 #4);
    cross-check it against the sequential PAV stack on random
    integer-weighted inputs, pooled means computed the same way the
    query does (integer prefix-sum ratios)."""
    import random

    from fraud_detection_spark.operators.model_monitor import _pav

    rng = random.Random(11)
    for _ in range(60):
        k = rng.randint(1, 51)
        pos = [rng.randint(0, 90) for _ in range(k)]
        n = [p + rng.randint(1, 100) for p in pos]
        cp = [0]
        cw = [0]
        for p, w in zip(pos, n):
            cp.append(cp[-1] + p)
            cw.append(cw[-1] + w)
        minimax = [
            max(
                min(
                    (cp[b + 1] - cp[a]) / (cw[b + 1] - cw[a])
                    for b in range(i, k)
                )
                for a in range(0, i + 1)
            )
            for i in range(k)
        ]
        pav = _pav([p / w for p, w in zip(pos, n)], [float(w) for w in n])
        assert max(abs(x - y) for x, y in zip(minimax, pav)) < 1e-12
        assert all(x <= y + 1e-15 for x, y in zip(minimax, minimax[1:]))


# ---------------------------------------------------------------------------
# Plan shape — the SCALE.md claims for this family, asserted


def test_tree_score_plan_zero_shuffle_codegen(spark, sf_dir):
    from fraud_detection_spark.plans.checks import formatted_plan

    plan = formatted_plan(REGISTRY["q_tree_score"].fn(spark, sf_dir))
    assert "Exchange" not in plan, "tree inference must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # formatted-mode marker for whole-stage codegen


def test_broadcast_stats_family_plans(spark, sf_dir):
    from fraud_detection_spark.plans.checks import (
        assert_broadcast_join,
        formatted_plan,
    )

    for name in ("q_robust_scale", "q_mahalanobis", "q_onehot_topk"):
        df = REGISTRY[name].fn(spark, sf_dir)
        assert_broadcast_join(df)
        plan = formatted_plan(df)
        assert "BatchEvalPython" not in plan, name
        # the fact table itself must not hash-repartition: the only
        # exchanges allowed are the stats/category aggregate's own
        # (SinglePartition or tiny-group) and the broadcast
        assert plan.count("Exchange hashpartitioning") <= 1, (name, plan)


def test_asof_interval_plan_broadcasts_dimension(spark, sf_dir):
    from fraud_detection_spark.plans.checks import (
        assert_broadcast_join,
        assert_no_cartesian,
    )

    df = REGISTRY["q_asof_interval"].fn(spark, sf_dir)
    assert_broadcast_join(df)
    assert_no_cartesian(df)


def test_sample_weighted_plan_is_top_n(spark, sf_dir):
    from fraud_detection_spark.plans.checks import formatted_plan

    plan = formatted_plan(REGISTRY["q_sample_weighted"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "must be per-partition top-N, not global sort"
    assert "Exchange rangepartitioning" not in plan


def test_ewma_scd2_windows_are_partitioned(spark, sf_dir):
    from fraud_detection_spark.plans.checks import formatted_plan

    for name in ("q_ewma", "q_scd2", "q_velocity"):
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_dir))
        # no single-partition window over the fact table: every Window
        # operator must sit under a hashpartitioning exchange on a key
        assert "Exchange SinglePartition" not in plan, (name, plan)


# ---------------------------------------------------------------------------
# q_record_linkage / q_cap_per_group


def test_record_linkage_recovers_planted_truth(spark, sf_dir):
    pdf = REGISTRY["q_record_linkage"].fn(spark, sf_dir).toPandas()
    n_parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter("length(p_name) > 6")
        .count()
    )
    # every dirty record resolves (its parent is always a candidate)
    assert len(pdf) == n_parts
    assert pdf.d_id.is_unique
    # one dropped char => best distance is exactly 1 when correct
    assert (pdf.loc[pdf.hit == 1, "lev"] == 1).all()
    assert pdf.hit.mean() >= 0.95


def test_record_linkage_plan_is_blocked_not_cartesian(spark, sf_dir):
    from fraud_detection_spark.plans.checks import formatted_plan

    plan = formatted_plan(REGISTRY["q_record_linkage"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, (
        "blocking must plan as an equi-join on the prefix key"
    )
    # the cheap length cut must sit in the join condition / filter, and
    # levenshtein must NOT be the join key (it runs post-join on
    # blocked candidates only)
    assert "levenshtein" in plan


def test_cap_per_group_invariants(spark, sf_dir):
    pdf = REGISTRY["q_cap_per_group"].fn(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    sizes = docs.groupby("source").size()
    got = pdf.groupby("source").size()
    for src, n in sizes.items():
        assert got.get(src, 0) == min(n, 30), src
    # deterministic: same kept set on a second run
    again = REGISTRY["q_cap_per_group"].fn(spark, sf_dir).toPandas()
    assert set(pdf.doc_id) == set(again.doc_id)


# ---------------------------------------------------------------------------
# q_time_split


def test_time_split_is_temporal(spark, sf_dir):
    pdf = REGISTRY["q_time_split"].fn(spark, sf_dir).toPandas().set_index("is_train")
    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert pdf.n.sum() == ev_n
    # train strictly precedes test — the whole point of the cut
    assert pdf.loc[1, "ts_max"] < pdf.loc[0, "ts_min"]
    # ~80/20 by construction of the percentile cutoff
    frac = pdf.loc[1, "n"] / pdf.n.sum()
    assert 0.75 <= frac <= 0.85


# ---------------------------------------------------------------------------
# q_kaplan_meier


def test_kaplan_meier_matches_product_limit_reference(spark, sf_dir):
    got = (
        REGISTRY["q_kaplan_meier"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("dur_days")
        .reset_index(drop=True)
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "ts", "event_type"
    ).toPandas()
    ev["sec"] = ev.ts.astype("int64") // 10**9
    durs = []
    for _, g in ev.groupby("user_id"):
        first = g.sec.min()
        errs = g.loc[g.event_type == "error", "sec"]
        if len(errs):
            durs.append(((errs.min() - first) // 86400, 1))
        else:
            durs.append(((g.sec.max() - first) // 86400, 0))
    import collections

    by_dur = collections.defaultdict(lambda: [0, 0])
    for d, e in durs:
        by_dur[d][0] += e
        by_dur[d][1] += 1 - e
    s, out = 1.0, {}
    at_risk = len(durs)
    extinct = False
    for d in sorted(by_dur):
        n_ev, n_cen = by_dur[d]
        if n_ev == at_risk:
            extinct = True
        if not extinct:
            s *= 1 - n_ev / at_risk
        out[d] = (at_risk, n_ev, n_cen, 0.0 if extinct else s)
        at_risk -= n_ev + n_cen
    assert got.dur_days.to_list() == sorted(out)
    for r in got.itertuples():
        n_risk, n_ev, n_cen, surv = out[r.dur_days]
        assert (r.n_risk, r.n_event, r.n_censored) == (n_risk, n_ev, n_cen)
        assert abs(r.survival - surv) < 1e-6, r.dur_days
    # survival is non-increasing and within [0, 1]
    assert (got.survival.diff().dropna() <= 1e-12).all()
    assert ((got.survival >= 0) & (got.survival <= 1)).all()
