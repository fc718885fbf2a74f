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
# samples a prefix of this dict, so queries whose oracle parity has not
# yet been independently driver-verified are listed FIRST — a rotation
# that converts locally-green-only queries into driver-green rows each
# round (rounds 1-4 took the ever-green set from 83 to 122 of 143).
# Round 5 closes the loop: the 13 oracle-checked queries with zero
# driver evidence lead, then this round's hash-changing/new queries
# (q_repetition + q_domain_mix_temp recompute flags from rounded
# values per VERDICT r4 ¶6 / ADVICE pow note; q_knn_ivf_pq is new),
# then the 8 rows-only queries that have never even had a driver
# rows-count row, then re-verification slots for queries last green in
# round 1 whose code paths this round touches (dedup/incremental,
# curation, corpus).
_SAMPLE_PRIORITY = [
    # (a) oracle-checked, never sampled r1-r4 — q_range_join missed the
    # r4 cut by one slot
    "q_range_join", "q_cross_join", "q_posexplode", "q_map_ops",
    "q_string_funcs", "q_date_funcs", "q_distinct_count", "q_null_funcs",
    "q_case_bucket", "q_filter_combo", "q_first_last",
    "q_scalar_subquery", "q_having",
    # (b) changed or new this round — need fresh driver-green rows
    "q_repetition", "q_domain_mix_temp", "q_knn_ivf_pq",
    "q_substring_dedup", "q_scrub_pii", "q_edit_distance", "q_text_normalize",
    "q_dedup_incremental",  # probe od!=nd fix (ADVICE r4)
    # (c) rows-only queries with zero driver rows across r1-r4 — the
    # driver records a rows-count/schema row (no_oracle), which is the
    # strongest evidence these can get
    "q_smote", "q_synth", "q_train_auc", "q_approx_distinct",
    "q_approx_quantile", "q_knn_batch", "q_knn_ivf", "q_knn_ivf_coarse",
    # (d) re-verification: r1-green queries sharing code with this
    # round's edits, plus the longest-unverified oracle queries
    "q_quality_score", "q_bm25", "q_lang_id", "q_fingerprint",
    "q_dedup_exact", "q_dedup_jaccard", "q_dedup_simhash",
    "q_dedup_embedding", "q_dedup_cluster", "q_chunk_dedup",
    "q_decontaminate", "q_domain_mix", "q_sample_uniform",
    "q_sample_stratified", "q_pack_sequences", "q_unigram_nll",
    "q_bpe_tokens", "q_pq_encode", "q_tfidf", "q_token_count",
    "q_multimodal", "q_groupby_count", "q_mean_std", "q_histogram",
    "q_confusion", "q_auc",
]
# After round 5 every oracle-bearing query should have at least one
# driver-green row and every rows-only query a driver rows row; from
# round 6 on, rotate slots (d)-style onto whatever was verified longest
# ago or changed in-round.


def _ordered():
    from fraud_detection_spark.registry import load_all

    reg = load_all()
    pri = [n for n in _SAMPLE_PRIORITY if n in reg]
    rest = [n for n in reg if n not in set(pri)]
    return {n: reg[n] for n in pri + rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
