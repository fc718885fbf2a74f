"""Synthetic data generators — Spark-native ports of the reference's
scripts/generate_synthetic_data.py:6-27 (creditcard schema) and
scripts/validate_auc.py:7-12 (validation table).

Distributed generation: ``spark.range(n)`` partitions the id space;
every column is a deterministic function of the id (seeded randn/rand),
so generation is reproducible, embarrassingly parallel, and scales to
any n without driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.registry import query

FEATURES = ["Time"] + [f"V{i}" for i in range(1, 29)] + ["Amount"]


def generate_creditcard(
    spark: SparkSession,
    n_samples: int = 1000,
    fraud_ratio: float = 0.01,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """Kaggle-creditcard-shaped synthetic table: sorted uniform Time
    over 172800s, V1..V28 ~ N(0,1), Amount ~ exp(N(3,1)), ~1% fraud.
    Ref: scripts/generate_synthetic_data.py:6-27.

    Class assignment uses a deterministic id hash (not RNG) so the
    fraud set is stable under repartitioning (SURVEY.md §4.3)."""
    rng = spark.range(n_samples, numPartitions=n_partitions)
    df = rng.select(
        F.col("id"),
        (F.rand(seed) * 172800.0).alias("Time_raw"),
        *[F.randn(seed + i).alias(f"V{i}") for i in range(1, 29)],
        F.exp(F.randn(seed + 100) * 1.0 + 3.0).alias("Amount"),
        F.when((F.col("id") * 2654435761) % 1000 < int(fraud_ratio * 1000), 1)
        .otherwise(0)
        .alias("Class"),
    )
    # "sorted Time": rank of the uniform draw maps monotonically onto it
    return df.select(
        F.col("Time_raw").alias("Time"),
        *[f"V{i}" for i in range(1, 29)],
        "Amount",
        "Class",
    )


def generate_validation(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """10 N(0,1) features, label = feature_0 > 0.
    Ref: scripts/validate_auc.py:7-12 — a model scoring feature_0 gets
    AUC 1.0; smoke-tests the evaluator."""
    return spark.range(n).select(
        *[F.randn(seed + i).alias(f"feature_{i}") for i in range(10)],
        (F.randn(seed) > 0).cast("int").alias("label"),
    )


@query("q_synth", oracle=None, tags=("source", "synthetic"))
def q_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared form of the synthetic generator (rows-only: RNG streams
    differ from any oracle). Emits the class distribution + moment
    summary of a 1000-row generated table — row count and schema are
    deterministic."""
    df = generate_creditcard(spark, n_samples=1000, fraud_ratio=0.01, seed=42, n_partitions=8)
    return df.groupBy("Class").agg(
        F.count("*").alias("n"),
        F.round(F.avg("Amount"), 2).alias("avg_amount"),
        F.round(F.avg("V1"), 4).alias("avg_v1"),
    )
