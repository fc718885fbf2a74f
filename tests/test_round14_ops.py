"""Round-14 operators. Oracle parity is auto-covered by
test_oracle_parity's registry sweep; these tests pin semantics against
independent python references and pin the composition claims.
"""

from __future__ import annotations

import math

from fraud_detection_spark.registry import load_all, sql_round

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_boosted_multifeat (VERDICT r13 #4): independent python AdaBoost
# over multi-feature depth-1 stumps, plus the round-1 ==
# q_tree_multifeat-root composition pin.

_FEAT_SQL = {
    "disc": "CAST(l_discount AS DOUBLE)",
    "price": "(CAST(l_extendedprice AS DOUBLE) / 100000.0)",
    "qty": "CAST(l_quantity AS DOUBLE)",
}


def _fetch_rows(duck):
    """(label, {feat: 6-dp value}) per lineitem row — values rounded
    BY DUCKDB with the registry's exact sql_round text so the python
    reference sees the identical doubles both engines group on."""
    sel = ", ".join(f"{sql_round(_FEAT_SQL[f], 6)} AS {f}" for f in
                    ("disc", "price", "qty"))
    rows = duck.execute(
        "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{sel} FROM lineitem"
    ).fetchall()
    return [
        (int(l), {"disc": float(d), "price": float(p), "qty": float(q)})
        for l, d, p, q in rows
    ]


def _mf_stump(rows, wpos, wneg):
    """Best (feat, threshold) across all features by weighted Gini.
    rows[i] = (label, vals); wpos/wneg give row i's weight when its
    label is 1 / 0. Returns (feat, t, wpl, wnl, WP, WN)."""
    best = None
    WP = sum(wpos[i] for i, (l, _) in enumerate(rows) if l == 1)
    WN = sum(wneg[i] for i, (l, _) in enumerate(rows) if l == 0)
    for feat in ("disc", "price", "qty"):
        agg = {}
        for i, (l, v) in enumerate(rows):
            cur = agg.setdefault(v[feat], [0, 0])
            if l == 1:
                cur[0] += wpos[i]
            else:
                cur[1] += wneg[i]
        cwp = cwn = 0
        vals = sorted(agg)
        for val in vals[:-1]:  # the top value is never a candidate
            cwp += agg[val][0]
            cwn += agg[val][1]
            lp, ln = cwp, cwn
            nl = float(lp + ln)
            nr = float((WP + WN) - (lp + ln))
            pl, pr = float(lp), float(WP - lp)
            key = (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
                nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
            )
            cand = (key, feat, val, cwp, cwn)
            if best is None or cand[:3] < best[:3]:
                best = cand
    _, feat, t, wpl, wnl = best
    return feat, t, wpl, wnl, WP, WN


def _leafify(wpl, wnl, WP, WN):
    leaves = [(wpl, wnl), (WP - wpl, WN - wnl)]
    preds = [1 if p > n else -1 for p, n in leaves]
    e = sum(n if pr == 1 else p for (p, n), pr in zip(leaves, preds))
    return preds, e, WP + WN


def test_boosted_multifeat_matches_python_reference(spark, sf_dir, duck):
    got = (
        REGISTRY["q_boosted_multifeat"].fn(spark, sf_dir)
        .toPandas()
        .set_index("round")
    )
    rows = _fetch_rows(duck)
    n = len(rows)
    ones = [1] * n

    f1, t1, pl, nl, P1, N1 = _mf_stump(rows, ones, ones)
    preds1, e1, d1 = _leafify(pl, nl, P1, N1)
    r1 = got.loc[1]
    assert (r1.feat, r1.threshold) == (f1, t1)
    assert [r1.pred_left, r1.pred_right] == preds1
    assert abs(r1.w_err - e1 / d1) < 1e-6
    a1 = 0.5 * math.log((d1 - e1) / e1)
    assert abs(r1.alpha - a1) < 1e-6

    # exact integer reweighting: correct rows x e1, misclassified x
    # (d1 - e1) — the rational AdaBoost trick
    def br1(v):
        return 0 if v[f1] <= t1 else 1

    wpos, wneg = [], []
    for l, v in rows:
        pr = preds1[br1(v)]
        wpos.append(e1 if pr == 1 else d1 - e1)
        wneg.append(e1 if pr == -1 else d1 - e1)
    f2, t2, wpl, wnl, P2, N2 = _mf_stump(rows, wpos, wneg)
    preds2, e2, d2 = _leafify(wpl, wnl, P2, N2)
    r2 = got.loc[2]
    assert (r2.feat, r2.threshold) == (f2, t2)
    assert [r2.pred_left, r2.pred_right] == preds2
    assert abs(r2.w_err - e2 / d2) < 1e-6
    a2 = 0.5 * math.log((d2 - e2) / e2)
    assert abs(r2.alpha - a2) < 1e-6

    # ensemble train accuracies over the margin signs
    def br2(v):
        return 0 if v[f2] <= t2 else 1

    u1 = u2 = 0
    for l, v in rows:
        h1 = preds1[br1(v)]
        h2 = preds2[br2(v)]
        m1 = a1 * h1
        u1 += 1 if (m1 > 0) == (l == 1) else 0
        u2 += 1 if ((m1 + a2 * h2) > 0) == (l == 1) else 0
    assert abs(r1.acc - u1 / n) < 1e-6
    assert abs(r2.acc - u2 / n) < 1e-6


def test_boosted_multifeat_round1_equals_tree_multifeat_root(
    spark, sf_dir
):
    """Round 1 (uniform weights) IS q_tree_multifeat's root split —
    the composition claim, feature AND threshold."""
    bm = (
        REGISTRY["q_boosted_multifeat"].fn(spark, sf_dir)
        .toPandas()
        .set_index("round")
        .loc[1]
    )
    mf = (
        REGISTRY["q_tree_multifeat"].fn(spark, sf_dir)
        .toPandas()
        .set_index("node")
        .loc["root"]
    )
    assert bm.feat == mf.feat
    assert bm.threshold == mf.threshold


# ---------------------------------------------------------------------------
# Survival widenings (VERDICT r13 #6a/b): Nelson-Aalen + Greenwood and
# RMST against direct python references over the raw per-user
# durations.

_DUR_SQL = (
    "SELECT CASE WHEN MIN(CASE WHEN event_type = 'error' THEN "
    "epoch_ns(ts) // 1000000000 END) IS NOT NULL "
    "THEN (MIN(CASE WHEN event_type = 'error' THEN "
    "epoch_ns(ts) // 1000000000 END) "
    "- MIN(epoch_ns(ts) // 1000000000)) // 86400 "
    "ELSE (MAX(epoch_ns(ts) // 1000000000) "
    "- MIN(epoch_ns(ts) // 1000000000)) // 86400 END AS dur, "
    "CASE WHEN MIN(CASE WHEN event_type = 'error' THEN 1 END) "
    "IS NOT NULL THEN 1 ELSE 0 END AS ev "
    "FROM events GROUP BY user_id"
)


def _km_table(duck):
    """[(dur, n_risk, n_event, n_cens)] ascending + running KM/NA."""
    subs = [(int(d), int(e)) for d, e in duck.execute(_DUR_SQL).fetchall()]
    from collections import Counter

    ev_c = Counter(d for d, e in subs if e == 1)
    all_c = Counter(d for d, _ in subs)
    durs = sorted(all_c)
    n = len(subs)
    out, at_risk = [], n
    for d in durs:
        out.append((d, at_risk, ev_c.get(d, 0), all_c[d] - ev_c.get(d, 0)))
        at_risk -= all_c[d]
    return out


def test_nelson_aalen_matches_python_reference(spark, sf_dir, duck):
    got = (
        REGISTRY["q_nelson_aalen"].fn(spark, sf_dir)
        .toPandas()
        .set_index("dur_days")
        .sort_index()
    )
    na = gw = 0.0
    surv = 1.0
    alive = True
    for d, n_risk, n_ev, _nc in _km_table(duck):
        na += n_ev / n_risk
        if n_ev < n_risk:
            gw += (n_ev / n_risk) / (n_risk - n_ev)
            surv *= 1 - n_ev / n_risk
        else:
            alive = False
        row = got.loc[d]
        assert row.n_risk == n_risk and row.n_event == n_ev
        assert abs(row.na_cumhaz - na) < 1e-6
        exp_se = surv * math.sqrt(gw) if alive else 0.0
        assert abs(row.se_greenwood - exp_se) < 1e-6


def test_rmst_matches_python_reference(spark, sf_dir, duck):
    got = REGISTRY["q_rmst"].fn(spark, sf_dir).toPandas().iloc[0]
    H = int(got.horizon_days)
    km = _km_table(duck)
    # survival step values at each duration, 6-dp rounded as emitted
    surv, alive, steps = 1.0, True, []
    for d, n_risk, n_ev, _nc in km:
        if n_ev == n_risk:
            alive = False
        if alive:
            surv *= 1 - n_ev / n_risk
            s6 = math.floor(surv * 1e6 + 0.5) / 1e6
        else:
            s6 = 0.0
        steps.append((d, s6))
    # exact step integral: S=1 on [0, d_1), S(d_k) on [d_k, d_{k+1})
    rmst = min(steps[0][0], H)
    for (d, s6), nxt in zip(steps, steps[1:] + [(None, None)]):
        up = min(nxt[0], H) if nxt[0] is not None else H
        rmst += s6 * max(up - min(d, H), 0)
    assert got.n == sum(1 for _ in duck.execute(_DUR_SQL).fetchall())
    assert abs(got.rmst - rmst) < 1e-5
    assert 0.0 <= got.rmst <= H


# ---------------------------------------------------------------------------
# Calibration widenings (VERDICT r13 #6c/d): Hosmer-Lemeshow and the
# calibration slope against python references over raw scored rows.

_SCORED_ROWS = (
    "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
    "FLOOR((1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity "
    "+ 9.0 * l_discount + 0.8 * (l_extendedprice / 100000.0))))) "
    "* 1000000 + 0.5) / 1000000 AS score FROM lineitem"
)


def test_hosmer_lemeshow_matches_python_reference(spark, sf_dir, duck):
    got = REGISTRY["q_hosmer_lemeshow"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = duck.execute(_SCORED_ROWS).fetchall()
    from collections import defaultdict

    g = defaultdict(lambda: [0, 0, 0])  # n, ev, su(1e-6 units)
    for label, score in rows:
        dec = int(score * 10)
        g[dec][0] += 1
        g[dec][1] += int(label)
        g[dec][2] += int(math.floor(score * 1e6 + 0.5))
    hl, bins = 0.0, 0
    for dec in sorted(g):
        n, ev, su = g[dec]
        e1 = su / 1e6
        if su == 0 or su == n * 10**6:
            continue
        bins += 1
        gap = ev - e1
        hl += gap * gap / e1 + gap * gap / (n - e1)
    assert got.n_bins == bins
    assert got.df == bins - 2
    assert got.n == len(rows)
    assert abs(got.hl_stat - hl) < 1e-5


def test_calibration_slope_matches_numpy_reference(spark, sf_dir, duck):
    import numpy as np

    got = (
        REGISTRY["q_calibration_slope"].fn(spark, sf_dir).toPandas().iloc[0]
    )
    rows = [
        (int(l), float(s))
        for l, s in duck.execute(_SCORED_ROWS).fetchall()
        if 0.0 < s < 1.0
    ]
    y = np.array([l for l, _ in rows], dtype=float)
    u = np.array([int(math.floor(s * 1e6 + 0.5)) for _, s in rows])
    x = np.log(u / (1e6 - u))
    A = np.vstack([x, np.ones_like(x)]).T
    slope, intercept = np.linalg.lstsq(A, y, rcond=None)[0]
    assert got.n == len(rows)
    assert abs(got.slope - slope) < 1e-4
    assert abs(got.intercept - intercept) < 1e-4
    # an approximately calibrated scorer: slope near 1 within a loose
    # sanity band (the data is the model's own training distribution)
    assert 0.0 < got.slope < 3.0


# ---------------------------------------------------------------------------
# q_fleming_harrington: python reference with the left-continuous
# pooled-KM weight, plus family coherence vs the logrank trio.


def test_fleming_harrington_matches_python_reference(spark, sf_dir, duck):
    got = (
        REGISTRY["q_fleming_harrington"].fn(spark, sf_dir).toPandas().iloc[0]
    )
    subs = [
        (int(d), int(e), int(a))
        for a, d, e in duck.execute(
            "SELECT user_id % 2 AS arm, "
            "CASE WHEN MIN(CASE WHEN event_type = 'error' THEN "
            "epoch_ns(ts) // 1000000000 END) IS NOT NULL "
            "THEN (MIN(CASE WHEN event_type = 'error' THEN "
            "epoch_ns(ts) // 1000000000 END) "
            "- MIN(epoch_ns(ts) // 1000000000)) // 86400 "
            "ELSE (MAX(epoch_ns(ts) // 1000000000) "
            "- MIN(epoch_ns(ts) // 1000000000)) // 86400 END AS dur, "
            "CASE WHEN MIN(CASE WHEN event_type = 'error' THEN 1 END) "
            "IS NOT NULL THEN 1 ELSE 0 END AS ev "
            "FROM events GROUP BY user_id"
        ).fetchall()
    ]
    durs = sorted({d for d, _, _ in subs})
    su = vu = 0
    surv, alive, w = 1.0, True, 1.0
    at_risk = len(subs)
    at_risk1 = sum(a for _, _, a in subs)
    for d in durs:
        here = [(e, a) for dd, e, a in subs if dd == d]
        de = sum(e for e, _ in here)
        d1 = sum(e for e, a in here if a == 1)
        n, n1 = at_risk, at_risk1
        if de > 0:
            sh = n1 * 1.0 / n
            su += math.floor(w * (d1 - de * sh) * 1e9 + 0.5)
            if n > 1:
                vu += math.floor(
                    w * w
                    * (de * sh * (1 - sh) * (n - de) * 1.0 / (n - 1))
                    * 1e9
                    + 0.5
                )
        # advance the pooled KM and the next duration's weight
        if de == n:
            alive = False
        if alive:
            surv *= 1 - de * 1.0 / n
            w = math.floor(surv * 1e6 + 0.5) / 1e6
        else:
            w = 0.0
        at_risk -= len(here)
        at_risk1 -= sum(a for _, a in here)
    assert abs(got.s_fh - su / 1e9) < 1e-6
    assert abs(got.var_fh - vu / 1e9) < 1e-6
    assert abs(got.z - (su / 1e9) / math.sqrt(vu / 1e9)) < 1e-4
    # family coherence: with w = S(t-) <= 1, the FH variance can never
    # exceed the unweighted logrank variance
    lr = REGISTRY["q_logrank"].fn(spark, sf_dir).toPandas().iloc[0]
    assert got.var_fh <= lr.var_treat


# ---------------------------------------------------------------------------
# q_boosted_mf_tree2: the FULL composition — python AdaBoost of
# depth-2 multi-feature trees, plus the round-1 == q_tree_multifeat
# pin (all three splits).


def _mf_tree2_ref(rows, wpos, wneg):
    """Depth-2 multi-feature weighted-Gini tree via _mf_stump at the
    root and inside both branches. Returns splits, leaf preds, e, d,
    and a leaf() router."""
    f0, t0, wpl0, wnl0, WP, WN = _mf_stump(rows, wpos, wneg)
    li = [i for i, (_, v) in enumerate(rows) if v[f0] <= t0]
    ri = [i for i, (_, v) in enumerate(rows) if v[f0] > t0]

    def sub(idx):
        return (
            [rows[i] for i in idx],
            [wpos[i] for i in idx],
            [wneg[i] for i in idx],
        )

    fL, tL, wplL, wnlL, BPL, BNL = _mf_stump(*sub(li))
    fR, tR, wplR, wnlR, BPR, BNR = _mf_stump(*sub(ri))
    assert (BPL, BNL) == (wpl0, wnl0)  # branch totals consistency
    leaves = [
        (wplL, wnlL),
        (wpl0 - wplL, wnl0 - wnlL),
        (wplR, wnlR),
        ((WP - wpl0) - wplR, (WN - wnl0) - wnlR),
    ]
    preds = [1 if p > n else -1 for p, n in leaves]
    e = sum(n if pr == 1 else p for (p, n), pr in zip(leaves, preds))

    def leaf(v):
        if v[f0] <= t0:
            return 1 if v[fL] <= tL else 2
        return 3 if v[fR] <= tR else 4

    return {
        "splits": ((f0, t0), (fL, tL), (fR, tR)),
        "preds": preds,
        "e": e,
        "d": WP + WN,
        "leaf": leaf,
    }


def test_boosted_mf_tree2_matches_python_reference(spark, sf_dir, duck):
    got = (
        REGISTRY["q_boosted_mf_tree2"].fn(spark, sf_dir)
        .toPandas()
        .set_index("round")
    )
    rows = _fetch_rows(duck)
    n = len(rows)
    ones = [1] * n

    m1 = _mf_tree2_ref(rows, ones, ones)
    r1 = got.loc[1]
    assert (
        (r1.feat_root, r1.t_root),
        (r1.feat_left, r1.t_left),
        (r1.feat_right, r1.t_right),
    ) == m1["splits"]
    assert [r1.pred_l1, r1.pred_l2, r1.pred_l3, r1.pred_l4] == m1["preds"]
    assert abs(r1.w_err - m1["e"] / m1["d"]) < 1e-6
    a1 = 0.5 * math.log((m1["d"] - m1["e"]) / m1["e"])
    assert abs(r1.alpha - a1) < 1e-6

    wpos, wneg = [], []
    for l, v in rows:
        pr = m1["preds"][m1["leaf"](v) - 1]
        wpos.append(m1["e"] if pr == 1 else m1["d"] - m1["e"])
        wneg.append(m1["e"] if pr == -1 else m1["d"] - m1["e"])
    m2 = _mf_tree2_ref(rows, wpos, wneg)
    r2 = got.loc[2]
    assert (
        (r2.feat_root, r2.t_root),
        (r2.feat_left, r2.t_left),
        (r2.feat_right, r2.t_right),
    ) == m2["splits"]
    assert [r2.pred_l1, r2.pred_l2, r2.pred_l3, r2.pred_l4] == m2["preds"]
    assert abs(r2.w_err - m2["e"] / m2["d"]) < 1e-6
    a2 = 0.5 * math.log((m2["d"] - m2["e"]) / m2["e"])
    assert abs(r2.alpha - a2) < 1e-6

    u1 = u2 = 0
    for l, v in rows:
        h1 = m1["preds"][m1["leaf"](v) - 1]
        h2 = m2["preds"][m2["leaf"](v) - 1]
        u1 += 1 if (a1 * h1 > 0) == (l == 1) else 0
        u2 += 1 if ((a1 * h1 + a2 * h2) > 0) == (l == 1) else 0
    assert abs(r1.acc - u1 / n) < 1e-6
    assert abs(r2.acc - u2 / n) < 1e-6


def test_boosted_mf_tree2_round1_equals_tree_multifeat(spark, sf_dir):
    """Round 1 (uniform weights) IS q_tree_multifeat's exact tree —
    all three (feature, threshold) splits, node for node."""
    bm = (
        REGISTRY["q_boosted_mf_tree2"].fn(spark, sf_dir)
        .toPandas()
        .set_index("round")
        .loc[1]
    )
    mf = (
        REGISTRY["q_tree_multifeat"].fn(spark, sf_dir)
        .toPandas()
        .set_index("node")
    )
    assert (bm.feat_root, bm.t_root) == (
        mf.loc["root", "feat"],
        mf.loc["root", "threshold"],
    )
    assert (bm.feat_left, bm.t_left) == (
        mf.loc["left", "feat"],
        mf.loc["left", "threshold"],
    )
    assert (bm.feat_right, bm.t_right) == (
        mf.loc["right", "feat"],
        mf.loc["right", "threshold"],
    )


# ---------------------------------------------------------------------------
# q_pseudo_r2: numpy log-likelihood reference.


def test_pseudo_r2_matches_numpy_reference(spark, sf_dir, duck):
    import numpy as np

    got = REGISTRY["q_pseudo_r2"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = [
        (int(l), float(s))
        for l, s in duck.execute(_SCORED_ROWS).fetchall()
        if 0.0 < s < 1.0
    ]
    y = np.array([l for l, _ in rows], dtype=float)
    p = np.array([s for _, s in rows])
    n = len(rows)
    llm = float(np.sum(y * np.log(p) + (1 - y) * np.log(1 - p)))
    r = y.mean()
    ll0 = n * (r * math.log(r) + (1 - r) * math.log(1 - r))
    assert got.n == n
    assert abs(got.ll_model - llm) < 1e-3  # 1e-9-unit folds vs naive sum
    assert abs(got.ll_null - ll0) < 1e-5
    assert abs(got.mcfadden - (1 - llm / ll0)) < 1e-6
    nag = (1 - math.exp(2 * (ll0 - llm) / n)) / (
        1 - math.exp(2 * ll0 / n)
    )
    assert abs(got.nagelkerke - nag) < 1e-6
    # log-likelihoods are non-positive; McFadden/Nagelkerke < 1 and
    # NEGATIVE when the scorer's raw probabilities fit worse than the
    # base rate (true of this deliberately miscalibrated published
    # scorer — it ranks well, q_auc >> 0.5, but over-confidently), and
    # both agree in sign by construction
    assert got.ll_model < 0 and got.ll_null < 0
    assert got.mcfadden < 1.0 and got.nagelkerke < 1.0
    assert (got.mcfadden < 0) == (got.nagelkerke < 0)
