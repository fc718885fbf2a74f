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
    # round 11 edits. The stale tail is down to ONE query (q_lag_delta,
    # r4 — VERDICT r10 #4), so the 50-slot sample has ample room: the
    # rotation puts touched first, then q_lag_delta, then the oldest
    # r5-green rows.
    #
    # VERDICT r10 #1 — POWER(x,2) -> x*x and POWER(m2,1.5) ->
    # m2*SQRT(m2) exact decompositions on BOTH engines (the 1-ulp
    # cross-engine class the sf0.1 q_hhi catch proved real); class
    # pinned closed by test_doc_claims.py::
    # test_no_correctly_roundable_power_in_any_oracle_or_query:
    "q_trend_forecast",
    "q_moments",
    "q_zipf_fit",
    "q_chi2",
    "q_embedding_outlier",
    # ADVICE r10 #1: BH oracle threshold now k*CAST(0.05 AS DOUBLE)/m
    # so both engines evaluate the identical double expression:
    "q_bh_fdr",
    # ADVICE r10 #3: rank bucket now integer bit-length (exactly
    # monotone), not floating-point floor(log2):
    "q_gini_index",
    # ADVICE r10 #2/#5: NULL-e raise_error guard in _pick_stump +
    # corrected headroom/margin-sign docstring claims:
    "q_boosted_stumps",
    # round-11 additions (VERDICT r10 #5 — 12 touched + 1 stale
    # (q_lag_delta, the whole remaining stale tail) = 13 <= 50):
    "q_map",
    "q_tree2",
    "q_cochran_armitage",
    "q_neardup_sources",
    # round-11 batch 2 (14 touched + 1 stale = 15 <= 50):
    "q_recall_at_k",
    "q_mcnemar",
    # round-11 batch 3 (15 touched + 1 stale = 16 <= 50):
    "q_jonckheere",
    # round-11 batch 4 (16 touched + 1 stale = 17 <= 50; 8th and
    # final addition — the full VERDICT r10 #5 budget):
    "q_friedman",
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
