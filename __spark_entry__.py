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
# last — consecutive rounds verify disjoint sets. The only per-round
# input is _TOUCHED_THIS_ROUND: queries whose implementation changed
# in the current round (fresh driver evidence wanted soonest).
_TOUCHED_THIS_ROUND = frozenset({
    # round 6 edits (VERDICT r5 next-round items + ADVICE):
    "q_quality_classifier",       # new operator (V#7)
    "q_token_fertility",          # new operator (bytes/token by lang)
    "q_semdedup",                 # new operator (SemDeDup cluster-blocked)
    "q_edit_distance",            # length-bound prefilter + cache drop (V#4)
    "q_edit_distance_threshold",  # new thresholded variant (V#4)
    "q_text_normalize",           # n_bytes_* rename (ADVICE)
    "q_chunk_dedup",              # chunker profile outcome (V#5)
    "q_media_features",           # stdlib image decode branch (V#3)
    "q_multimodal",
    # model-monitoring battery (operators/model_monitor.py, new):
    "q_ks_stat",
    "q_psi",
    "q_calibration",
    "q_lift_bands",
    "q_benford",
    "q_target_encode",
    "q_woe_iv",
    "q_velocity",
    # transaction-graph / robust-stats family (operators/graph.py, new):
    "q_graph_degree",
    "q_mad_outlier",
    "q_pagerank",
    "q_ab_test",
    "q_hourly_profile",
    # behavioral-analytics family (operators/behavior.py, new):
    "q_retention_cohort",
    "q_funnel_steps",
    "q_event_transitions",
    "q_data_profile",             # numeric data-quality profile (new)
    # feature-engineering / time-evolution family (new this round):
    "q_tree_score",
    "q_onehot_topk",
    "q_robust_scale",
    "q_sample_weighted",
    "q_ewma",
    "q_cusum",
    "q_scd2",
    "q_mahalanobis",
    "q_hll_sketch",               # mergeable persisted-sketch cardinality
    "q_asof_interval",            # SCD2 point-in-time join
    "q_isotonic",                 # PAV calibration over bounded bands
    "q_cap_per_group",            # max-N-per-source curation cap
    "q_record_linkage",           # blocked fuzzy entity resolution
    "q_time_split",               # temporal eval split
    # AML screen family (operators/aml.py, new):
    "q_structuring",
    "q_dormancy",
    "q_round_amount",
    "q_fraud_rings",
    "q_champion_challenger",      # one-scan model comparison + McNemar
    "q_debounce",                 # time-bounded repeat-submission flag
    "q_kaplan_meier",             # survival curve w/ censoring
    "q_brier",
    "q_ece",
    "q_drift_profile",
    "q_trend_forecast",
    "q_shared_counterparties",
    "q_hard_negatives",
    "q_auc_by_segment",
    "q_threshold_sweep",
    "q_compression_ratio",
    "q_distinctive_terms",
    "q_basket_rules",
    "q_neighbor_degree",
    "q_rfm",
    "q_hhi",
    "q_attribution",
    "q_cohort_ltv",
    "q_duplicate_amounts",
    "q_sequence_gaps",
    "q_active_users",
    "q_growth_rates",
    "q_deseasonalize",
    "q_lorenz",
    "q_new_vs_returning",
})


def _ordered():
    from pathlib import Path

    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.rotation import compute_priority, load_history

    reg = load_all()
    order = compute_priority(
        list(reg), load_history(Path(__file__).parent), _TOUCHED_THIS_ROUND
    )
    return {n: reg[n] for n in order}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
