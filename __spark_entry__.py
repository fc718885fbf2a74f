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
# Round 8: the pin backlog is EMPTY (VERDICT r7: all 247 declared
# queries have driver evidence; the r7 pins auto-retired once
# CORRECTNESS_r07 recorded them). No new pins needed — the rotation
# owns the schedule; touched/new queries below lead it.
_PINNED_HEAD = ()

_TOUCHED_THIS_ROUND = frozenset({
    # round 17 (optimization round 2/2) — queries whose IMPLEMENTATION
    # changed this round (results proven identical, but fresh driver
    # hash evidence wanted soonest):
    # BIGINT hi/lo split of the Newton g/h histogram sums
    # (_sum_gu_dec/_sum_hu_dec in ml_metrics.py):
    "q_xgb_round",
    "q_xgb_round2",
    "q_xgb_tree2",
    "q_xgb_boosted_tree2",
    "q_xgb_fit",
    "q_xgb_gamma",
    "q_xgb_monotone",
    "q_xgb_alpha",
    "q_xgb_hist",
    # SQL-text constructor recompositions (identical Catalyst trees):
    "q_friedman",
    "q_autocorrelation",
    "q_knn_ivf_pq",
    "q_cell_balance",
    "q_ivfpq_probe_curve",
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
