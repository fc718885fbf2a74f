"""Semantic property tests for the round-7 operator additions —
DuckDB-oracle parity lives in tests/test_oracle_parity.py; these pin
the claims the docstrings make."""

from __future__ import annotations

from fraud_detection_spark.registry import load_all


def _run(name, spark, sf_dir):
    return load_all()[name].fn(spark, sf_dir).collect()


def test_bloom_prefilter_never_misses_contamination(spark, sf_dir):
    """The Bloom guarantee: every exactly-contaminated doc must be a
    bloom candidate (zero false negatives); false positives exist only
    on top of the exact set."""
    rows = _run("q_bloom_prefilter", spark, sf_dir)
    assert rows
    fn = [r for r in rows if r.contaminated == 1 and r.bloom_candidate == 0]
    assert not fn, f"bloom false negatives: {fn[:5]}"
    # the prefilter is not vacuous: it admits the contaminated docs and
    # (on this corpus) stays a small superset
    n_cand = sum(r.bloom_candidate for r in rows)
    n_cont = sum(r.contaminated for r in rows)
    assert n_cand >= n_cont > 0
    assert n_cand <= len(rows)


def test_countmin_never_undercounts(spark, sf_dir):
    rows = _run("q_countmin", spark, sf_dir)
    assert 0 < len(rows) <= 20
    assert all(r.overcount >= 0 for r in rows)
    assert all(r.n_est == r.n_exact + r.overcount for r in rows)


def test_chi2_bounds(spark, sf_dir):
    (r,) = _run("q_chi2", spark, sf_dir)
    assert r.chi2 >= 0
    assert 0 <= r.cramers_v <= 1
    assert r.dof >= 1 and r.n > 0


def test_mutual_info_bounds(spark, sf_dir):
    (r,) = _run("q_mutual_info", spark, sf_dir)
    # MI of an observed joint distribution is >= 0 up to the 1e-9
    # fixed-point quantization, and <= min of the marginal entropies
    assert r.mi_bits >= -1e-6
    assert r.h_type > 0 and r.h_dow > 0
    assert r.mi_bits <= min(r.h_type, r.h_dow) + 1e-6
    assert -1e-6 <= r.nmi <= 1 + 1e-6


def test_triangle_count_invariant(spark, sf_dir):
    rows = _run("q_triangle_count", spark, sf_dir)
    assert rows, "suspicion-filtered projection should close triangles at every SF"
    # each triangle contributes exactly 3 vertex slots
    assert sum(r.n_triangles for r in rows) % 3 == 0
    assert all(r.n_triangles >= 1 for r in rows)


def test_neighbor_jaccard_bounds(spark, sf_dir):
    rows = _run("q_neighbor_jaccard", spark, sf_dir)
    assert rows
    assert all(0 < r.jaccard <= 1 for r in rows)
    assert all(r.n_shared >= 1 for r in rows)


def test_autocorrelation_shape(spark, sf_dir):
    rows = sorted(_run("q_autocorrelation", spark, sf_dir), key=lambda r: r.lag)
    assert [r.lag for r in rows] == list(range(1, 8))
    assert all(abs(r.acf) <= 1 + 1e-9 for r in rows)
    # n_pairs shrinks by one per lag over a gapless daily series
    assert all(a.n_pairs >= b.n_pairs for a, b in zip(rows, rows[1:]))


def test_window_suite_bounds(spark, sf_dir):
    rows = _run("q_window_suite", spark, sf_dir)
    assert rows
    for r in rows:
        assert 0 <= r.pct_rank <= 1
        assert 0 < r.cume_dist <= 1
        assert 1 <= r.quartile <= 4
        assert r.min_n <= r.n
    if len(rows) >= 3:
        assert all(r.third_n is not None for r in rows)


def test_session_stats_ordering(spark, sf_dir):
    (r,) = _run("q_session_stats", spark, sf_dir)
    assert r.n_sessions > 0
    assert 0 <= r.bounce_rate <= 1
    assert r.avg_events >= 1
    assert 0 <= r.p50_dur_sec <= r.p90_dur_sec <= r.max_dur_sec


def test_burstiness_bounds(spark, sf_dir):
    rows = _run("q_burstiness", spark, sf_dir)
    assert rows
    for r in rows:
        assert r.n_gaps >= 2
        assert r.cv is None or r.cv >= 0
        assert r.burstiness is None or -1 <= r.burstiness <= 1


def test_pr_ap_mcc_logloss_consistency(spark, sf_dir):
    """Cross-metric invariants for the round-7 evaluation additions."""
    pr = _run("q_pr_points", spark, sf_dir)
    assert pr and all(0 <= r.precision <= 1 and 0 <= r.recall <= 1 for r in pr)
    # recall is monotone non-decreasing as the threshold drops
    by_desc_bucket = sorted(pr, key=lambda r: -r.bucket)
    recs = [r.recall for r in by_desc_bucket]
    assert recs == sorted(recs)
    (ap,) = _run("q_avg_precision", spark, sf_dir)
    assert 0 <= ap.ap <= 1
    # AP can never beat the best precision on the curve
    assert ap.ap <= max(r.precision for r in pr) + 1e-9
    (m,) = _run("q_mcc", spark, sf_dir)
    assert 0 <= m.accuracy <= 1 and 0 <= m.balanced_accuracy <= 1
    assert -1 <= m.mcc <= 1 and -1 <= m.kappa <= 1
    (ll,) = _run("q_logloss", spark, sf_dir)
    assert ll.logloss > 0 and ll.n > 0


def test_first_touch_vs_last_touch(spark, sf_dir):
    """Both attribution queries cover the identical purchase set.
    (Their 'none' sets legitimately differ: last-touch looks back up
    to a day ACROSS purchase boundaries, first-touch only within the
    current journey — so no implication holds in either direction.)"""
    first = {r.event_id: r for r in _run("q_first_touch", spark, sf_dir)}
    last = {r.event_id: r for r in _run("q_attribution", spark, sf_dir)}
    assert set(first) == set(last) and first
    for f in first.values():
        assert (f.touch == "none") == (f.touch_age_sec == -1)
        assert f.touch != "purchase"
        assert f.touch == "none" or f.touch_age_sec >= 0


def test_forecast_backtest_shape(spark, sf_dir):
    rows = sorted(_run("q_forecast_backtest", spark, sf_dir), key=lambda r: r.horizon)
    assert [r.horizon for r in rows] == list(range(1, 8))
    for r in rows:
        assert r.abs_err >= 0
        assert abs(r.actual - r.forecast) <= r.abs_err + 1e-3


def test_new_edges_invariants(spark, sf_dir):
    rows = sorted(_run("q_new_edges", spark, sf_dir), key=lambda r: r.datekey)
    assert rows
    # the first active day is all-new by definition
    assert rows[0].new_rate == 1.0
    for r in rows:
        assert 0 <= r.n_new_edges <= r.n_active_edges
        assert 0 <= r.new_rate <= 1
    # every edge is new exactly once: sum of new == distinct edge count
    from fraud_detection_spark.operators.graph import edges

    assert sum(r.n_new_edges for r in rows) == edges(spark, sf_dir).count()


def test_conversion_lag_consistency(spark, sf_dir):
    (r,) = _run("q_conversion_lag", spark, sf_dir)
    (f,) = _run("q_funnel_steps", spark, sf_dir)
    assert r.n_converted == f.n_purchase
    assert 0 <= r.p50_lag_sec <= r.p90_lag_sec <= r.max_lag_sec
    assert r.avg_lag_sec >= 0


def test_robust_trend_vs_numpy(spark, sf_dir):
    """Theil–Sen slope must match an independent numpy computation of
    the disc-median pairwise slope over the same fixed-point daily
    means."""
    import numpy as np

    rows = _run("q_robust_trend", spark, sf_dir)
    (r,) = rows
    # rebuild daily means independently from the raw parquet
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["ts", "value"]]
    if ev.ts.dtype.kind == "M":
        sec = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    else:
        sec = ev.ts // 10**9
    day = (sec // 86400).astype("int64")
    units = np.floor(ev.value.to_numpy() * 10000 + 0.5).astype("int64")
    g = pd.DataFrame({"day": day, "u": units}).groupby("day")
    y = (g.u.sum().astype("float64") / 10000 / g.size()).to_numpy()
    t = np.arange(len(y))
    slopes = sorted(
        (y[j] - y[i]) / (t[j] - t[i])
        for i in range(len(y))
        for j in range(i + 1, len(y))
    )
    disc_median = slopes[(len(slopes) - 1) // 2]
    assert r.n_days == len(y)
    assert r.n_pairs == len(slopes)
    assert abs(r.slope - disc_median) < 1e-6


def test_moments_and_zipf_sanity(spark, sf_dir):
    (m,) = _run("q_moments", spark, sf_dir)
    assert m.n > 0 and m.std_pop >= 0
    assert m.excess_kurtosis >= -2 - 1e-9  # hard lower bound for any dist
    (z,) = _run("q_zipf_fit", spark, sf_dir)
    assert z.k > 10
    assert z.slope < 0  # frequency falls with rank, always
    assert 0 <= z.r2 <= 1


def test_corr_matrix_properties(spark, sf_dir):
    rows = _run("q_corr_matrix", spark, sf_dir)
    assert len(rows) == 6  # upper triangle of 4 columns
    for r in rows:
        assert -1 - 1e-9 <= r.corr <= 1 + 1e-9
    # the synthetic columns are independently generated, so every
    # correlation should be near zero — and exactly reproducible
    assert all(abs(r.corr) < 0.2 for r in rows)
    again = _run("q_corr_matrix", spark, sf_dir)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hbos_score_properties(spark, sf_dir):
    rows = _run("q_hbos", spark, sf_dir)
    from fraud_detection_spark.sources import load_table

    assert len(rows) == load_table(spark, sf_dir, "lineitem").count()
    scores = [r.hbos for r in rows]
    assert all(s >= 0 for s in scores)  # p(bin) <= 1 always
    assert len(set(round(s, 4) for s in scores)) > 10, "degenerate score"


def test_gini_matches_lorenz_area(spark, sf_dir):
    """The Gini scalar must equal the trapezoid area computed from
    q_lorenz's own curve (same bands)."""
    lor = sorted(_run("q_lorenz", spark, sf_dir), key=lambda r: r.band)
    g = 1.0
    p0 = v0 = 0.0
    for r in lor:
        g -= (r.cum_val + v0) * (r.cum_pop - p0)
        p0, v0 = r.cum_pop, r.cum_val
    (got,) = _run("q_gini", spark, sf_dir)
    assert got.n_bands == len(lor)
    assert abs(got.gini - g) < 1e-4
    assert 0 <= got.gini <= 1


def test_mann_kendall_and_runs_bounds(spark, sf_dir):
    (mk,) = _run("q_mann_kendall", spark, sf_dir)
    max_s = mk.n_days * (mk.n_days - 1) // 2
    assert -max_s <= mk.s <= max_s
    assert mk.trend == (1 if mk.s > 0 else (-1 if mk.s < 0 else 0))
    (rt,) = _run("q_runs_test", spark, sf_dir)
    assert rt.n1 + rt.n0 > 0
    assert 1 <= rt.runs <= rt.n1 + rt.n0


def test_collocations_and_pivot(spark, sf_dir):
    rows = _run("q_collocations", spark, sf_dir)
    assert 0 < len(rows) <= 30
    assert all(r.n12 >= 5 for r in rows)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    piv = _run("q_pivot_daily", spark, sf_dir)
    assert piv
    from fraud_detection_spark.sources import load_table

    total = sum(
        r.click + r.error + r.purchase + r.signup + r.view for r in piv
    )
    assert total == load_table(spark, sf_dir, "events").count()


def test_sprt_properties(spark, sf_dir):
    """LLR path is cumulative and decisions respect the Wald bounds;
    under H0-generated data the test should rarely cross upward early."""
    import math

    rows = sorted(_run("q_sprt", spark, sf_dir), key=lambda r: r.datekey)
    assert rows
    upper = math.log((1 - 0.10) / 0.05)
    lower = math.log(0.10 / (1 - 0.05))
    for r in rows:
        assert 0 <= r.k <= r.n
        if r.decision == 1:
            assert r.llr >= upper - 1e-9
        elif r.decision == -1:
            assert r.llr <= lower + 1e-9
        else:
            assert lower - 1e-9 < r.llr < upper + 1e-9
    # the observed rate IS the H0 baseline (p0 is fit on this data), so
    # the LLR must drift DOWN overall and finish at the H0 decision
    assert rows[-1].llr < 0
    assert rows[-1].decision == -1


def test_kl_mix_and_seasonal_strength_bounds(spark, sf_dir):
    rows = _run("q_kl_mix", spark, sf_dir)
    assert rows
    # KL >= 0 up to the 1e-9 quantization
    assert all(r.kl_bits >= -1e-6 for r in rows)
    (s,) = _run("q_seasonal_strength", spark, sf_dir)
    assert s.n_days > 0
    # group-means R^2 is in [0,1] by construction (up to quantization)
    assert -1e-6 <= s.seasonal_strength <= 1 + 1e-6


def test_entropy_by_source_bounds(spark, sf_dir):
    import math

    rows = _run("q_entropy_by_source", spark, sf_dir)
    assert rows
    for r in rows:
        assert r.n_tokens >= r.vocab >= 1
        assert -1e-6 <= r.entropy_bits <= math.log2(r.vocab) + 1e-6
