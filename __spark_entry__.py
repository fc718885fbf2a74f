"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on /root/testdata/sf0.001;
``queries()`` exposes every declared operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query (omitted => rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fraud-style scoring over lineitem ⋈ orders —
    scan -> broadcast-stats standard scale -> logistic score with
    published weights -> top-100 by score. Touches scan, join,
    aggregate-broadcast, codegen'd column math, and top-k in one DAG
    (SURVEY.md §7 Milestone 0)."""
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    stats = li.agg(
        F.avg("l_extendedprice").alias("mu_p"),
        F.stddev_samp("l_extendedprice").alias("sd_p"),
        F.avg("l_quantity").alias("mu_q"),
        F.stddev_samp("l_quantity").alias("sd_q"),
    )
    z_p = (F.col("l_extendedprice") - F.col("mu_p")) / F.col("sd_p")
    z_q = (F.col("l_quantity") - F.col("mu_q")) / F.col("sd_q")
    logit = F.lit(-1.0) + F.lit(0.7) * z_p + F.lit(0.4) * z_q + F.lit(6.0) * F.col("l_discount")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_custkey",
            F.col("o_orderstatus"),
            F.round(score, 6).alias("fraud_score"),
        )
        .orderBy(F.desc("fraud_score"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(100)
    )


# Declared-query ordering: the driver's per-round correctness check
# samples a prefix of this dict, so the ordering IS the verification
# schedule. Rounds 1-5 hand-curated it (taking the ever-green set from
# 83/143 to 148/148 with every oracle query driver-hash-green at least
# once); from round 6 the schedule is computed from the cumulative
# CORRECTNESS_r*.json history by fraud_detection_spark.rotation:
# changed-and-unsampled first, then oldest-driver-green first among
# queries NOT in the previous round's sample, previous-round sample
# last — consecutive rounds verify disjoint sets. Per-round inputs:
# _PINNED_HEAD (queries frozen at the very front of the schedule) and
# _TOUCHED_THIS_ROUND (queries whose implementation changed in the
# current round; fresh driver evidence wanted soonest).
#
# Round 7 freeze (VERDICT r6 next-round #1): these 15 operators have
# NEVER appeared in any CORRECTNESS_r*.json — round 6's 51 new queries
# competed for 50 sample slots and displaced them. They lead the r7
# sample unconditionally; new round-7 operators join BEHIND them.
# Pins AUTO-RETIRE: _ordered() drops any pinned name that has driver
# history, so once CORRECTNESS_r07 records them this list becomes a
# no-op and the normal rotation resumes without an edit (and without
# a stale-pin trap for round 8).
_PINNED_HEAD = (
    "q_asof_interval",
    "q_auc_by_segment",
    "q_cusum",
    "q_data_profile",
    "q_debounce",
    "q_distinctive_terms",
    "q_ewma",
    "q_hard_negatives",
    "q_hll_sketch",
    "q_kaplan_meier",
    "q_scd2",
    "q_sequence_gaps",
    "q_threshold_sweep",
    "q_token_fertility",
    "q_trend_forecast",
)

_TOUCHED_THIS_ROUND = frozenset({
    # round 7 edits (VERDICT r6 next-round items + ADVICE r6):
    "q_asof_interval",   # forced-broadcast hint dropped (V#2; also pinned)
    "q_fraud_rings",     # exact integer division for vertex->custkey (ADVICE)
    "q_active_users",    # exploded-offset equi-join replaces nested-loop (ADVICE)
    "q_dormancy",        # docstring/frame alignment (ADVICE; behavior unchanged)
    # new round-7 operators (join BEHIND the pinned 15, per the freeze):
    "q_session_paths",   # session path signatures (V#6)
    "q_path_entropy",    # per-user journey entropy (V#6)
    "q_session_stats",   # session duration/bounce distribution
    "q_burstiness",      # Goh-Barabási inter-event burstiness
    "q_chi2",            # chi-square independence + Cramér's V
    "q_mutual_info",     # MI / normalized MI of type × weekday
    "q_triangle_count",  # projected-graph triangle participation
    "q_neighbor_jaccard",  # neighbor-set similarity per pair
    "q_autocorrelation",   # daily-series ACF lags 1..7
    "q_window_suite",    # percent_rank/cume_dist/ntile/nth_value
    "q_countmin",        # count-min sketch heavy hitters
    "q_bloom_prefilter", # bloom decontamination prefilter
    "q_pr_points",       # binned precision-recall curve
    "q_avg_precision",   # average precision (AP)
    "q_mcc",             # MCC / kappa / balanced accuracy
    "q_logloss",         # binary cross-entropy (fixed-point exact)
    "q_first_touch",     # first-touch attribution per journey
    "q_forecast_backtest",  # rolling-origin holdout eval of the trend fit
    "q_new_edges",       # counterparty-novelty rate per day
    "q_conversion_lag",  # time-to-convert distribution
    "q_robust_trend",    # Theil-Sen median-slope trend
    "q_moments",         # skewness/kurtosis from exact power sums
    "q_zipf_fit",        # Zipf slope of the token distribution
    "q_corr_matrix",     # Pearson matrix via DECIMAL(38) exact sums
    "q_hbos",            # histogram-based outlier score
    "q_gini",            # banded Gini scalar (q_lorenz area)
    "q_mann_kendall",    # nonparametric trend test (integer S)
    "q_runs_test",       # Wald-Wolfowitz randomness test
    "q_collocations",    # PMI bigram collocations
    "q_pivot_daily",     # explicit-list pivot (day x type matrix)
    "q_sprt",            # Wald sequential test (anytime-valid monitor)
    "q_kl_mix",          # per-day KL of the type mix vs global
    "q_seasonal_strength",  # variance share of the DOW component
    "q_entropy_by_source",  # per-source unigram entropy
})


def _ordered():
    from pathlib import Path

    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.rotation import compute_priority, load_history

    reg = load_all()
    history = load_history(Path(__file__).parent)
    ever = {n for rows in history.values() for n in rows}
    # auto-retire satisfied pins: a pin exists to force FIRST driver
    # evidence; once the evidence exists the rotation owns the slot
    live_pins = tuple(n for n in _PINNED_HEAD if n not in ever)
    order = compute_priority(
        list(reg), history, _TOUCHED_THIS_ROUND, pinned=live_pins
    )
    return {n: reg[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
