"""Round-15 operators. Oracle parity is auto-covered by
test_oracle_parity's registry sweep; these tests pin semantics against
independent python references and pin the composition claims.
"""

from __future__ import annotations

from fraud_detection_spark.registry import load_all, sql_round

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_xgb_round (VERDICT r14 #1): independent python Newton round —
# gradients/hessians from the 6-dp published score, XGBoost gain
# argmax over all three features, shrunken Newton leaf weights.

_FEAT_SQL = {
    "disc": "CAST(l_discount AS DOUBLE)",
    "price": "(CAST(l_extendedprice AS DOUBLE) / 100000.0)",
    "qty": "CAST(l_quantity AS DOUBLE)",
}

_SIG_SQL = (
    "1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity + 9.0 * l_discount "
    "+ 0.8 * (l_extendedprice / 100000.0))))"
)


def _fetch_gh_rows(duck):
    """(label, {feat: 6-dp val}, u) per lineitem row — values rounded
    BY DUCKDB with the registry's exact sql_round text so the python
    reference sees the identical doubles/integers both engines use."""
    sel = ", ".join(
        f"{sql_round(_FEAT_SQL[f], 6)} AS {f}" for f in ("disc", "price", "qty")
    )
    rows = duck.execute(
        "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{sel}, CAST(FLOOR(({sql_round(_SIG_SQL, 6)}) * 1000000 + 0.5) "
        "AS BIGINT) AS u FROM lineitem"
    ).fetchall()
    return [
        (int(l), {"disc": float(d), "price": float(p), "qty": float(q)}, int(u))
        for l, d, p, q, u in rows
    ]


def _newton_round_reference(rows, lam=1.0, eta=0.1):
    """Pure-python single Newton round: exact integer g/h sufficient
    statistics per distinct (feat, val), prefix sums in sorted-value
    order, gain key argmin with the (key, feat, val) tie-break."""
    n = len(rows)
    gt_u = sum(u - l * 1000000 for l, _, u in rows)
    ht_u = sum(u * (1000000 - u) for _, _, u in rows)
    GT, HT = gt_u / 1e6, ht_u / 1e12
    best = None
    for feat in ("disc", "price", "qty"):
        agg = {}
        for l, v, u in rows:
            cur = agg.setdefault(v[feat], [0, 0, 0])
            cur[0] += 1
            cur[1] += u - l * 1000000
            cur[2] += u * (1000000 - u)
        cn = cg = ch = 0
        vals = sorted(agg)
        for val in vals[:-1]:  # the top value is never a candidate
            cn += agg[val][0]
            cg += agg[val][1]
            ch += agg[val][2]
            GL, HL = cg / 1e6, ch / 1e12
            GR, HR = (gt_u - cg) / 1e6, (ht_u - ch) / 1e12
            kl = GL * GL / (HL + lam)
            kr = GR * GR / (HR + lam)
            cand = (-(kl + kr), feat, val, cn, GL, HL, GR, HR, kl, kr)
            if best is None or cand[:3] < best[:3]:
                best = cand
    key, feat, val, cn, GL, HL, GR, HR, kl, kr = best
    gain = 0.5 * ((kl + kr) - GT * GT / (HT + lam))
    return {
        "feat": feat,
        "threshold": val,
        "n_left": cn,
        "n_right": n - cn,
        "gain": gain,
        "w_left": -eta * GL / (HL + lam),
        "w_right": -eta * GR / (HR + lam),
    }


def _r6(x: float) -> float:
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def test_xgb_round_matches_python_reference(spark, duck, sf_dir):
    rows = _fetch_gh_rows(duck)
    want = _newton_round_reference(rows)
    got = REGISTRY["q_xgb_round"].fn(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0].asDict()
    assert r["feat"] == want["feat"]
    assert r["threshold"] == want["threshold"]
    assert r["n_left"] == want["n_left"]
    assert r["n_right"] == want["n_right"]
    assert r["gain"] == _r6(want["gain"])
    assert r["w_left"] == _r6(want["w_left"])
    assert r["w_right"] == _r6(want["w_right"])


def test_xgb_round_gh_identities(duck):
    """Pin the g/h integer encodings: sum(g) = sum(u)/1e6 - positives
    and h = p(1-p) exactly, so the Newton stats are integer-exact."""
    rows = _fetch_gh_rows(duck)
    gt_u = sum(u - l * 1000000 for l, _, u in rows)
    su = sum(u for _, _, u in rows)
    pos = sum(l for l, _, _ in rows)
    assert gt_u == su - pos * 1000000
    for l, _, u in rows[:100]:
        p = u / 1e6
        # double-arithmetic reconstruction agrees to ~1 ulp of 0.25
        assert abs(u * (1000000 - u) / 1e12 - p * (1 - p)) < 1e-12


def test_xgb_round_gain_positive_and_weights_signed(spark, sf_dir):
    """The published scorer is miscalibrated on lineitem (q_pseudo_r2's
    finding), so one Newton round MUST find positive structure gain;
    leaf weights carry the correction sign of their branch G."""
    r = REGISTRY["q_xgb_round"].fn(spark, sf_dir).collect()[0].asDict()
    assert r["gain"] > 0
    assert (r["w_left"] < 0) == (r["g_left"] > 0)
    assert (r["w_right"] < 0) == (r["g_right"] > 0)


# ---------------------------------------------------------------------------
# Shared KM duration-fold helper (VERDICT r14 #5): the 7 survival
# oracles are generated from _km_dur_sql; pin the generated text to
# the exact pre-refactor per-query bytes so the extraction can never
# silently change a hash-green oracle.

_KM_PREFIX_PLAIN = (
    "WITH u AS (SELECT user_id, "
    "MIN(epoch_ns(ts) // 1000000000) AS first_sec, "
    "MAX(epoch_ns(ts) // 1000000000) AS last_sec, "
    "MIN(CASE WHEN event_type = 'error' THEN epoch_ns(ts) // 1000000000 "
    "END) AS err_sec FROM events GROUP BY user_id), "
    "d AS (SELECT CASE WHEN err_sec IS NOT NULL "
    "THEN (err_sec - first_sec) // 86400 "
    "ELSE (last_sec - first_sec) // 86400 END AS dur, "
    "CASE WHEN err_sec IS NOT NULL THEN 1 ELSE 0 END AS ev FROM u), "
)

_KM_PREFIX_ARM = (
    "WITH u AS (SELECT user_id % 2 AS arm, "
    "MIN(epoch_ns(ts) // 1000000000) AS first_sec, "
    "MAX(epoch_ns(ts) // 1000000000) AS last_sec, "
    "MIN(CASE WHEN event_type = 'error' THEN epoch_ns(ts) // 1000000000 "
    "END) AS err_sec FROM events GROUP BY user_id), "
    "d AS (SELECT arm, CASE WHEN err_sec IS NOT NULL "
    "THEN (err_sec - first_sec) // 86400 "
    "ELSE (last_sec - first_sec) // 86400 END AS dur, "
    "CASE WHEN err_sec IS NOT NULL THEN 1 ELSE 0 END AS ev FROM u), "
)

_KM_FAMILY = {
    "q_kaplan_meier": False,
    "q_nelson_aalen": False,
    "q_rmst": False,
    "q_logrank": True,
    "q_gehan": True,
    "q_tarone_ware": True,
    "q_fleming_harrington": True,
}


def test_km_fold_sql_generation():
    from fraud_detection_spark.operators.timeseries import _km_dur_sql

    assert _km_dur_sql() == _KM_PREFIX_PLAIN
    assert _km_dur_sql(arm=True) == _KM_PREFIX_ARM
    for name, arm in _KM_FAMILY.items():
        assert REGISTRY[name].oracle.startswith(
            _KM_PREFIX_ARM if arm else _KM_PREFIX_PLAIN
        ), name


def test_km_fold_spark_columns(spark, sf_dir):
    from fraud_detection_spark.operators.timeseries import _km_durations

    d = _km_durations(spark, sf_dir)
    assert d.columns == ["dur", "ev"]
    a = _km_durations(spark, sf_dir, arm=True)
    assert a.columns == ["arm", "dur", "ev"]
    # the arm split partitions the same duration multiset
    tot = d.groupBy().count().collect()[0][0]
    tot_a = a.groupBy().count().collect()[0][0]
    assert tot == tot_a
