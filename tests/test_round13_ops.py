"""Round-13 operators and guards. Oracle parity is auto-covered by
test_oracle_parity's registry sweep; these tests pin semantics against
independent python references and pin load-bearing Spark behaviors.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_boosted_stumps overflow-guard mechanism (VERDICT r12 #1): the r13
# form NULL-propagates an overflowed candidate's weighted error and
# raises only on the picked 1-row table. Its loudness rests on two
# behaviors pinned here: (a) Spark ascending ORDER BY places NULLs
# FIRST, so any overflowed candidate IS the picked row; (b) a
# raise_error wrapped in when(isNull) on that 1-row table fires at
# materialization.


def test_asc_orderby_places_nulls_first(spark):
    df = spark.createDataFrame(
        [(3, "a"), (None, "b"), (1, "c")], "e int, t string"
    )
    top = df.orderBy("e", "t").limit(1).collect()[0]
    assert top["e"] is None and top["t"] == "b"


def test_null_pick_raises_loudly(spark):
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(3, "a"), (None, "b"), (1, "c")], "e int, t string"
    )
    picked = df.orderBy("e", "t").limit(1)
    guarded = picked.withColumn(
        "e",
        F.when(
            F.col("e").isNull(),
            F.raise_error(F.lit("overflow — headroom exhausted")).cast("int"),
        ).otherwise(F.col("e")),
    )
    with pytest.raises(SparkRuntimeException, match="headroom exhausted"):
        guarded.localCheckpoint()

    # and the guard is an identity when nothing overflowed
    clean = spark.createDataFrame([(3, "a"), (1, "c")], "e int, t string")
    picked2 = clean.orderBy("e", "t").limit(1)
    guarded2 = picked2.withColumn(
        "e",
        F.when(
            F.col("e").isNull(),
            F.raise_error(F.lit("overflow — headroom exhausted")).cast("int"),
        ).otherwise(F.col("e")),
    )
    assert guarded2.localCheckpoint().collect()[0]["e"] == 1


# ---------------------------------------------------------------------------
# page_hinkley_stream watermark-violation handling (ADVICE r12 #1): a
# row for a day at or before the series' newest CLOSED day must be
# DROPPED, not buffered — the old behavior re-closed the late day
# AFTER later days, folding it out of order into i/sx and corrupting
# every subsequent PH value.


def test_page_hinkley_stream_drops_late_closed_day(spark, tmp_path):
    import math
    import shutil

    from fraud_detection_spark.operators.timeseries import PH_DELTA
    from fraud_detection_spark.streaming.drift import page_hinkley_stream

    DAY = 86_400 * 1_000_000_000

    def ev(day, value):
        return (day * DAY + 1, float(value))

    # slice 1 closes days 1 and 2 (day 3 stays open); slice 2 carries
    # a LATE day-1 row (violation: last_closed == 2) plus days 4-5,
    # closing 3 and 4.
    slices = [
        [ev(1, 10.0), ev(1, 12.0), ev(2, 11.0), ev(3, 9.0)],
        [ev(1, 99.0), ev(4, 10.5), ev(5, 11.5)],
    ]
    src = tmp_path / "late_staged"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    out = str(tmp_path / "late_out")
    schema = "ts long, value double"
    for i, rows in enumerate(slices):
        batch = tmp_path / f"late_b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(batch))
        shutil.copytree(str(batch), str(src / f"s{i}"))
        q = (
            page_hinkley_stream(
                spark.readStream.schema(schema)
                .option("recursiveFileLookup", "true")
                .parquet(str(src))
            )
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    got = spark.read.parquet(out).toPandas().sort_values("day")
    # exactly days 1-4 emitted once each — no re-emitted day 1
    assert list(got.day) == [1, 2, 3, 4]

    # and the emitted statistics equal the python reference WITHOUT
    # the late row (i.e. it was dropped, not folded out of order)
    means = {1: 11.0, 2: 11.0, 3: 9.0, 4: 10.5}
    i, sx, mi, md = 0, 0.0, 0.0, 0.0
    mmin, mdmin = float("inf"), float("inf")
    for day in [1, 2, 3, 4]:
        x = means[day]
        i += 1
        sx += x
        mi += x - sx / i - PH_DELTA
        md += sx / i - x - PH_DELTA
        mmin = min(mmin, mi)
        mdmin = min(mdmin, md)
        r = got[got.day == day].iloc[0]
        assert r.day_mean == x, day
        assert r.ph_inc == math.floor((mi - mmin) * 1e6 + 0.5) / 1e6, day
        assert r.ph_dec == math.floor((md - mdmin) * 1e6 + 0.5) / 1e6, day


# ---------------------------------------------------------------------------
# q_delong degenerate-variance guard (ADVICE r12 #3): identical scorers
# make var = 0; bare division gives inf whose 6-dp rounding diverges
# across engines, so the shared expression text must emit NULL z in
# BOTH engines.


def test_delong_zero_variance_emits_null_z_in_both_engines(spark):
    import duckdb

    from fraud_detection_spark.operators.ml_metrics import _delong_final_sql

    fin = _delong_final_sql()
    # identical scorers: sua == sub, suaa == subb == suab (and v-side
    # alike) -> d10 = d01 = 0 -> var = 0
    agg = (
        "SELECT CAST(10 AS BIGINT) AS np, CAST(20 AS BIGINT) AS nn, "
        "CAST(100 AS BIGINT) AS sua, CAST(1100 AS BIGINT) AS suaa, "
        "CAST(100 AS BIGINT) AS sub, CAST(1100 AS BIGINT) AS subb, "
        "CAST(1100 AS BIGINT) AS suab, "
        "CAST(200 AS BIGINT) AS sva, CAST(2200 AS BIGINT) AS svaa, "
        "CAST(200 AS BIGINT) AS svb, CAST(2200 AS BIGINT) AS svbb, "
        "CAST(2200 AS BIGINT) AS svab"
    )
    q = f"SELECT {fin['z']} AS z, {fin['se']} AS se FROM ({agg})"
    srow = spark.sql(q).collect()[0]
    drow = duckdb.connect().execute(q).fetchone()
    assert srow["z"] is None and drow[0] is None
    assert srow["se"] == 0.0 and drow[1] == 0.0


# ---------------------------------------------------------------------------
# q_tree_multifeat (VERDICT r12 #4): multi-feature exact Gini split
# search — python reference over the exact 6-dp feature values.


def _mf_frame(duck):
    return duck.execute(
        "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        "FLOOR(CAST(l_discount AS DOUBLE) * 1000000 + 0.5) / 1000000 "
        "AS disc, "
        "FLOOR((CAST(l_extendedprice AS DOUBLE) / 100000.0) * 1000000 "
        "+ 0.5) / 1000000 AS price, "
        "FLOOR(CAST(l_quantity AS DOUBLE) * 1000000 + 0.5) / 1000000 "
        "AS qty FROM lineitem"
    ).df()


def _mf_best(pdf):
    """Exhaustive argmin over every (feat, threshold) candidate by the
    exact (key, feat, val) order; returns None for a pure/singleton
    branch."""
    n, p = len(pdf), int(pdf.label.sum())
    best = None
    for feat in ("disc", "price", "qty"):
        g = pdf.groupby(feat)["label"].agg(["size", "sum"]).sort_index()
        cum_n = g["size"].cumsum()
        cum_p = g["sum"].cumsum()
        for val, nl, pl in zip(g.index, cum_n, cum_p):
            if nl >= n:
                continue
            nr, pr = n - nl, p - pl
            key = (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
                nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
            )
            cand = (key, feat, val, int(nl), int(pl), int(nr), int(pr))
            if best is None or cand[:3] < best[:3]:
                best = cand
    return best


def test_tree_multifeat_matches_python_reference(spark, sf_dir, duck):
    got = (
        REGISTRY["q_tree_multifeat"].fn(spark, sf_dir)
        .toPandas()
        .set_index("node")
    )
    pdf = _mf_frame(duck)

    root = _mf_best(pdf)
    r = got.loc["root"]
    assert r.feat == root[1] and abs(r.threshold - root[2]) < 1e-12
    assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == root[3:]
    n, p = len(pdf), int(pdf.label.sum())
    base = 1.0 - (p / n) ** 2 - ((n - p) / n) ** 2
    assert abs(r.gini_base - base) < 1e-6
    assert abs(r.gain - (base - root[0] / n)) < 1e-6

    lmask = pdf[root[1]] <= root[2]
    for node, sub in (("left", pdf[lmask]), ("right", pdf[~lmask])):
        want = _mf_best(sub)
        if want is None:
            assert node not in got.index
            continue
        w = got.loc[node]
        assert w.feat == want[1], node
        assert abs(w.threshold - want[2]) < 1e-12, node
        assert (w.n_left, w.pos_left, w.n_right, w.pos_right) == want[3:]


# ---------------------------------------------------------------------------
# Survival pair (VERDICT r12 #6a/#6b): python references over the
# exact per-user duration table.


def _durations(duck, arm_sql):
    return duck.execute(
        f"SELECT {arm_sql} AS arm, CASE WHEN err_sec IS NOT NULL "
        "THEN (err_sec - first_sec) // 86400 "
        "ELSE (last_sec - first_sec) // 86400 END AS dur, "
        "CASE WHEN err_sec IS NOT NULL THEN 1 ELSE 0 END AS ev FROM ("
        "SELECT user_id, "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS pc, "
        "MIN(epoch_ns(ts) // 1000000000) AS first_sec, "
        "MAX(epoch_ns(ts) // 1000000000) AS last_sec, "
        "MIN(CASE WHEN event_type = 'error' THEN epoch_ns(ts) "
        "// 1000000000 END) AS err_sec FROM events GROUP BY user_id) u0, "
        "(SELECT CAST(COUNT(*) AS BIGINT) AS nu, "
        "CAST(SUM(pc2) AS BIGINT) AS tp FROM (SELECT "
        "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS pc2 FROM events GROUP BY user_id)) gl"
    ).fetchall()


def _risk_sets(rows):
    """-> sorted [(dur, de, d1, n, n1)] with suffix-sum risk sets."""
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0, 0, 0])  # de, d1, tot, tot1
    for arm, dur, ev in rows:
        c = per[dur]
        c[0] += ev
        c[1] += ev if arm == 1 else 0
        c[2] += 1
        c[3] += arm
    out, n, n1 = [], 0, 0
    for dur in sorted(per, reverse=True):
        de, d1, tot, tot1 = per[dur]
        n += tot
        n1 += tot1
        out.append((dur, de, d1, n, n1))
    return sorted(out)


def test_gehan_matches_weighted_python_reference(spark, sf_dir, duck):
    import math

    got = REGISTRY["q_gehan"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = _durations(duck, "user_id % 2")
    wo = we = 0
    v = 0.0
    for dur, de, d1, n, n1 in _risk_sets(rows):
        if de == 0:
            continue
        wo += n * d1
        we += de * n1
        if n > 1:
            v += math.floor(
                float(de) * n1 * (n - n1) * (n - de) / (n - 1) + 0.5
            )
    assert got.w_o_treat == wo and got.w_e_treat == we
    assert got.s_gehan == wo - we
    assert abs(got.var_gehan - v) < 1e-6 * max(v, 1)
    assert abs(got.z - (wo - we) / math.sqrt(v)) < 1e-4
    # weighted observed dominates unweighted: every term is n_j >= 1
    lr = REGISTRY["q_logrank"].fn(spark, sf_dir).toPandas().iloc[0]
    assert got.w_o_treat >= lr.o_treat


def test_cox_score_matches_python_reference(spark, sf_dir, duck):
    import math

    got = REGISTRY["q_cox_score"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = _durations(duck, "CASE WHEN pc * nu > tp THEN 1 ELSE 0 END")
    # the covariate must be non-degenerate (the ever-bought flag was)
    assert got.n_z0 > 0 and got.n_z1 > 0
    o1 = eu = iu = 0
    for dur, de, d1, n, n1 in _risk_sets(rows):
        if de == 0:
            continue
        o1 += d1
        sh = n1 * 1.0 / n
        eu += math.floor(de * sh * 1e9 + 0.5)
        if n > 1:
            iu += math.floor(
                de * sh * (1 - sh) * (n - de) * 1.0 / (n - 1) * 1e9 + 0.5
            )
    assert got.o_z1 == o1
    assert abs(got.e_z1 - eu / 1e9) < 1e-6
    assert abs(got["info"] - iu / 1e9) < 1e-6
    assert abs(got.z - (o1 - eu / 1e9) / math.sqrt(iu / 1e9)) < 1e-4


def test_spiegelhalter_matches_numpy_reference(spark, sf_dir, duck):
    import numpy as np

    got = (
        REGISTRY["q_spiegelhalter"].fn(spark, sf_dir)
        .toPandas()
        .set_index("decile")
        .sort_index()
    )
    pdf = duck.execute(
        "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        "FLOOR((1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity "
        "+ 9.0 * l_discount + 0.8 * (l_extendedprice / 100000.0))))) "
        "* 1000000 + 0.5) / 1000000 AS score FROM lineitem"
    ).df()
    pdf["decile"] = np.floor(pdf.score * 10).astype(int)
    for d, g in pdf.groupby("decile"):
        r = got.loc[d]
        y, p = g.label.values, g.score.values
        assert r.n == len(g) and r.events == y.sum()
        assert abs(r.mean_pred - p.mean()) < 1e-6
        assert abs(r.obs_rate - y.mean()) < 1e-6
        num = ((y - p) * (1 - 2 * p)).sum()
        var = ((1 - 2 * p) ** 2 * p * (1 - p)).sum()
        assert abs(r.num_spieg - num) < 1e-5
        if var == 0:
            assert np.isnan(r.z_spieg) or r.z_spieg is None
        else:
            assert abs(r.z_spieg - num / np.sqrt(var)) < 1e-4
    assert set(got.index) == set(pdf.decile.unique())


# ---------------------------------------------------------------------------
# q_boosted_tree2 (VERDICT r12 #6d): exact-integer python AdaBoost of
# depth-2 weighted-Gini trees, plus the round-1 == q_tree2 pin.


def _w_best_split(rows, lo, hi, base_wp, base_wn, WP, WN):
    """rows = [(score, cwp, cwn)] absolute weighted cums sorted by
    score; candidates lo < score < hi (branch-open interval); returns
    (key, score, wp_at, wn_at) argmin or None."""
    best = None
    for s, cwp, cwn in rows:
        if not (lo < s < hi):
            continue
        lp, ln = cwp - base_wp, cwn - base_wn
        nl = lp + ln
        nr = (WP + WN) - nl
        pr = WP - lp
        if nl <= 0 or nr <= 0:
            continue
        key = (nl - (lp * lp + (nl - lp) * (nl - lp)) / nl) + (
            nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
        )
        cand = (key, s, cwp, cwn)
        if best is None or cand[:2] < best[:2]:
            best = cand
    return best


def _w_tree2(weights):
    """weights = sorted [(score, wp, wn)] per-score weighted counts.
    Greedy depth-2 weighted-Gini tree; returns dict with thresholds,
    leaf preds, e, d."""
    INF = float("inf")
    cum, cwp, cwn = [], 0, 0
    for s, wp, wn in weights:
        cwp += wp
        cwn += wn
        cum.append((s, cwp, cwn))
    WP, WN = cwp, cwn
    smax = cum[-1][0]
    root = _w_best_split(cum, -INF, smax, 0, 0, WP, WN)
    t0, wp0, wn0 = root[1], root[2], root[3]
    left = _w_best_split(cum, -INF, t0, 0, 0, wp0, wn0)
    right = _w_best_split(cum, t0, smax, wp0, wn0, WP - wp0, WN - wn0)
    tl, wpl, wnl = left[1], left[2], left[3]
    tr, wpr, wnr = right[1], right[2], right[3]
    leaves = [
        (wpl, wnl),
        (wp0 - wpl, wn0 - wnl),
        (wpr - wp0, wnr - wn0),
        (WP - wpr, WN - wnr),
    ]
    preds = [1 if p > n else -1 for p, n in leaves]
    e = sum(n if pr == 1 else p for (p, n), pr in zip(leaves, preds))
    return {
        "t": (t0, tl, tr),
        "preds": preds,
        "e": e,
        "d": WP + WN,
        "bounds": (tl, t0, tr),
    }


def _region(s, bounds):
    tl, t0, tr = bounds
    if s <= tl:
        return 0
    if s <= t0:
        return 1
    if s <= tr:
        return 2
    return 3


def test_boosted_tree2_matches_python_reference(spark, sf_dir, duck):
    import math

    got = (
        REGISTRY["q_boosted_tree2"].fn(spark, sf_dir)
        .toPandas()
        .set_index("round")
    )
    per = duck.execute(
        "SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) "
        "AS BIGINT) AS pos FROM ("
        "SELECT l_returnflag, FLOOR((1.0 / (1.0 + EXP(-(-2.0 "
        "+ 0.03 * l_quantity + 9.0 * l_discount "
        "+ 0.8 * (l_extendedprice / 100000.0))))) * 1000000 + 0.5) "
        "/ 1000000 AS score FROM lineitem) GROUP BY score ORDER BY score"
    ).fetchall()
    w1 = [(float(s), int(p), int(c - p)) for s, c, p in per]

    m1 = _w_tree2(w1)
    r1 = got.loc[1]
    assert (r1.t_root, r1.t_left, r1.t_right) == m1["t"]
    assert [r1.pred_l1, r1.pred_l2, r1.pred_l3, r1.pred_l4] == m1["preds"]
    assert abs(r1.w_err - m1["e"] / m1["d"]) < 1e-6
    a1 = 0.5 * math.log((m1["d"] - m1["e"]) / m1["e"])
    assert abs(r1.alpha - a1) < 1e-6

    # round 2: exact integer reweighting (the rational AdaBoost trick)
    w2 = []
    for s, wp, wn in w1:
        k = _region(s, m1["bounds"])
        mp = m1["e"] if m1["preds"][k] == 1 else m1["d"] - m1["e"]
        mn = m1["e"] if m1["preds"][k] == -1 else m1["d"] - m1["e"]
        w2.append((s, wp * mp, wn * mn))
    m2 = _w_tree2(w2)
    r2 = got.loc[2]
    assert (r2.t_root, r2.t_left, r2.t_right) == m2["t"]
    assert [r2.pred_l1, r2.pred_l2, r2.pred_l3, r2.pred_l4] == m2["preds"]
    assert abs(r2.w_err - m2["e"] / m2["d"]) < 1e-6
    a2 = 0.5 * math.log((m2["d"] - m2["e"]) / m2["e"])
    assert abs(r2.alpha - a2) < 1e-6

    # ensemble train accuracies over the margin signs
    n = sum(p + q for _, p, q in w1)
    u1 = u2 = 0
    for s, wp, wn in w1:
        h1 = m1["preds"][_region(s, m1["bounds"])]
        h2 = m2["preds"][_region(s, m2["bounds"])]
        u1 += wp if a1 * h1 > 0 else wn
        u2 += wp if a1 * h1 + a2 * h2 > 0 else wn
    assert abs(r1.acc - u1 / n) < 1e-6
    assert abs(r2.acc - u2 / n) < 1e-6


def test_boosted_tree2_round1_equals_tree2(spark, sf_dir):
    """Round 1 (uniform weights) IS q_tree2's exact tree — the
    composition claim: thresholds must match node for node."""
    bt = (
        REGISTRY["q_boosted_tree2"].fn(spark, sf_dir)
        .toPandas()
        .set_index("round")
        .loc[1]
    )
    t2 = (
        REGISTRY["q_tree2"].fn(spark, sf_dir).toPandas().set_index("node")
    )
    assert bt.t_root == t2.loc["root", "threshold"]
    assert bt.t_left == t2.loc["left", "threshold"]
    assert bt.t_right == t2.loc["right", "threshold"]


# ---------------------------------------------------------------------------
# q_brier_decomp + q_tarone_ware (round-13 widenings)


def test_brier_decomp_matches_numpy_and_identity(spark, sf_dir, duck):
    import math

    import numpy as np

    got = REGISTRY["q_brier_decomp"].fn(spark, sf_dir).toPandas().iloc[0]
    pdf = duck.execute(
        "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y, "
        "FLOOR((1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity "
        "+ 9.0 * l_discount + 0.8 * (l_extendedprice / 100000.0))))) "
        "* 1000000 + 0.5) / 1000000 AS p FROM lineitem"
    ).df()
    pdf["k"] = np.floor(pdf.p * 10).astype(int)
    N = len(pdf)
    rbar = pdf.y.mean()
    rel = res = 0.0
    binned = 0.0
    for k, g in pdf.groupby("k"):
        pb, rk = g.p.mean(), g.y.mean()
        rel += len(g) * (pb - rk) ** 2
        res += len(g) * (rk - rbar) ** 2
        binned += ((pb - g.y) ** 2).sum()
    rel, res = rel / N, res / N
    unc = rbar * (1 - rbar)
    assert got.n == N
    assert abs(got.reliability - rel) < 1e-5
    assert abs(got.resolution - res) < 1e-5
    assert abs(got.uncertainty - unc) < 1e-6
    # the Murphy identity: REL - RES + UNC == the binned Brier score
    assert abs(got.brier_binned - (rel - res + unc)) < 1e-5
    assert abs(got.brier_binned - binned / N) < 1e-4
    # decomposition coherence with the unbinned q_brier: binning can
    # only LOWER the score (p-bar is the bin-optimal forecast)
    qb = REGISTRY["q_brier"].fn(spark, sf_dir).toPandas().iloc[0]
    assert got.brier_binned <= qb.brier + 1e-6


def test_tarone_ware_matches_python_reference(spark, sf_dir, duck):
    import math

    got = REGISTRY["q_tarone_ware"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = _durations(duck, "user_id % 2")
    su = vu = 0
    for dur, de, d1, n, n1 in _risk_sets(rows):
        if de == 0:
            continue
        sh = n1 * 1.0 / n
        su += math.floor(
            math.sqrt(float(n)) * (d1 - de * sh) * 1e6 + 0.5
        )
        if n > 1:
            vu += math.floor(
                n * (de * sh * (1 - sh) * (n - de) * 1.0 / (n - 1)) * 1e6
                + 0.5
            )
    assert abs(got.s_tw - su / 1e6) < 1e-6
    assert abs(got.var_tw - vu / 1e6) < 1e-6
    assert abs(got.z - (su / 1e6) / math.sqrt(vu / 1e6)) < 1e-4
    # trio coherence: TW variance sits between logrank's (w=1) and
    # gehan's (w=n) by construction (n * V vs V vs n^2 * V per term)
    lr = REGISTRY["q_logrank"].fn(spark, sf_dir).toPandas().iloc[0]
    ge = REGISTRY["q_gehan"].fn(spark, sf_dir).toPandas().iloc[0]
    assert lr.var_treat <= got.var_tw <= ge.var_gehan


# ---------------------------------------------------------------------------
# q_cindex (round-13 8th addition): brute-force O(n^2) pair
# enumeration under the textbook Harrell convention.


def test_cindex_matches_bruteforce_reference(spark, sf_dir, duck):
    got = REGISTRY["q_cindex"].fn(spark, sf_dir).toPandas().iloc[0]
    rows = duck.execute(
        # domain-bounded predictor (round 14): FLOOR(mean value * 10)
        # by exact integer division — matches the reworked q_cindex
        "SELECT CAST((SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) "
        "* 10) // (COUNT(*) * 10000) AS BIGINT) AS pred, "
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
    subs = [(int(p), int(d), int(e)) for p, d, e in rows]
    comp = conc = tied = 0
    for i, (pi, di, ei) in enumerate(subs):
        for j, (pj, dj, ej) in enumerate(subs):
            if i == j:
                continue
            # i is the EVENT anchor of the pair: earlier strict event,
            # or an event tying a censored subject at the same time
            if ei != 1:
                continue
            if not (di < dj or (di == dj and ej == 0)):
                continue
            comp += 1
            if pi > pj:
                conc += 1
            elif pi == pj:
                tied += 1
    assert got.comparable == comp
    assert got.concordant == conc
    assert got.tied_pred == tied
    assert abs(got.c_index - (conc + tied / 2) / comp) < 1e-6
    assert 0.0 <= got.c_index <= 1.0
