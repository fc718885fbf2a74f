"""Partition invariance: declared-query results must be identical under
radically different physical partitioning (tiny scan splits + few
shuffle partitions vs the defaults). This is the property that keeps
the oracle hashes stable on any cluster layout — the portable round
absorbs aggregation-order jitter, hash-bucketing replaces RNG, and
every top-k is tie-broken.
"""

from __future__ import annotations

import hashlib

import pytest

# the queries most exposed to partitioning (aggregation order, windows,
# joins, folds, iterative loops)
RISKY = [
    "q_mean_std",
    "q_standard_scale",
    "q_auc",
    "q_auc_binned",
    "q_tpch_q1",
    "q_tpch_q5",
    "q_fingerprint",
    "q_knn_cosine",
    "q_window_running",
    "q_fold_assign",
    "q_split",
    "q_jaccard_topk",
    "q_dedup_cluster",
    # round 13: checkpointed argmin chains (tie-broken TakeOrdered over
    # exact integers), multi-feature (key, feat, val) argmins, and the
    # fixed-point survival/grid folds
    "q_boosted_tree2",
    "q_tree_multifeat",
    "q_cindex",
    "q_gehan",
    # round 14: the boosted multi-feature composition (DECIMAL
    # weighted bucket-offset cums + argmin chains) and the widenings
    # with per-row fixed-point folds / running survival windows
    "q_boosted_multifeat",
    "q_nelson_aalen",
    "q_rmst",
    "q_calibration_slope",
    "q_fleming_harrington",
    "q_pseudo_r2",
    # the depth-2 composition has MORE argmin/cum exposure than
    # q_boosted_multifeat (4 DECIMAL cum passes, 2 per-branch struct
    # argmins) — worth its ~2x17s here
    "q_boosted_mf_tree2",
]


def result_hash(df) -> str:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False, float_format="%.12g").encode()).hexdigest()


@pytest.mark.parametrize("name", RISKY)
def test_partition_invariant(name, spark, sf_dir):
    from fraud_detection_spark.registry import load_all

    q = load_all()[name]
    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    base_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        h1 = result_hash(q.fn(spark, sf_dir))
        # force many tiny scan splits and few shuffle partitions
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        h2 = result_hash(q.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", base_bytes)
    assert h1 == h2, f"{name} result depends on partitioning"


def test_events_ts_normalization_is_timezone_proof(spark, sf_dir, duck):
    """The driver runs a VANILLA session (no UTC pin), so the events.ts
    timestamp→epoch-nanos normalization in sources.load_table must not
    depend on the session timezone. Run it in a sibling session pinned
    to a hostile offset and compare against DuckDB's epoch_ns — a
    cast-through-TIMESTAMP implementation shifts by the UTC offset and
    fails this."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.sources import load_table

    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    got = (
        load_table(s2, sf_dir, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    want = duck.execute(
        "SELECT MIN(epoch_ns(ts)), MAX(epoch_ns(ts)) FROM events"
    ).fetchone()
    assert (got.lo, got.hi) == want
