"""Leak-free fraud-feature assembly over the event stream — the
at-scale analog of the reference's ``preprocess.py`` (which builds its
feature matrix from a CSV already containing engineered V1..V28
columns; this pipeline is the step that *makes* such columns).

Every feature of an event is a function of STRICTLY EARLIER events of
the same user (trailing frames end at -1, never 0), so the table can
train a model without target leakage and the same expressions can
serve online (the streaming velocity twin shares the window logic).

Features per event:
    hour_of_day       local hour slot (0-23, from epoch seconds)
    user_event_idx    1-based sequence number within the user
    secs_since_prev   gap to the user's previous event (-1 if first)
    n_1h, n_24h       trailing event counts, current event EXCLUDED
    amt_24h           trailing 24h fixed-point amount sum, excluded
    ewma_prev         EWMA (decay 0.8, window 8) of the previous
                      amounts — the q_ewma composition shifted by one
    dev_ratio         value / ewma_prev (how unusual is this amount)
    expanding_mean    all-history mean amount, current excluded

Pseudo-label ``target``: the per-user median/MAD screen
(q_mad_outlier's 10×MAD cut) — a deterministic stand-in for the fraud
flag the reference's Class column provides (its data is synthetic
too: generate_synthetic_data.py:19-22).

Scale: ONE shuffle on user_id serves every window (all frames share
the partition key); the MAD label adds the two grouped-percentile
aggregates of q_mad_outlier with broadcast joins back. The optional
write hive-partitions by day so per-period training runs prune.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_spark.operators.timeseries import _EWMA_W
from fraud_detection_spark.sources import events_with_time

_EPS = 1e-9


def feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble the leak-free per-event feature matrix."""
    ev = events_with_time(spark, sf_dir).select(
        "event_id", "user_id", "ts", "ts_sec", "value"
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_1h = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, -1)
    w_24h = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-86400, -1)
    w_hist = w_ord.rowsBetween(Window.unboundedPreceding, -1)

    # EWMA of the PREVIOUS up-to-8 amounts: the q_ewma lag composition
    # shifted one event back (lag k+1 instead of lag k).
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k, wk in enumerate(_EWMA_W):
        lagk = F.lag("value", k + 1).over(w_ord)
        num = num + F.coalesce(lagk * F.lit(wk), F.lit(0.0))
        den = den + F.when(lagk.isNotNull(), F.lit(wk)).otherwise(F.lit(0.0))
    ewma_prev = F.when(den > 0, num / den)  # null for a user's first event

    feats = ev.select(
        "event_id",
        "user_id",
        F.col("ts_sec").cast("bigint").alias("ts_sec"),
        "value",
        ((F.col("ts_sec") % 86400) / 3600).cast("int").alias("hour_of_day"),
        F.row_number().over(w_ord).alias("user_event_idx"),
        F.coalesce(
            F.col("ts_sec") - F.lag("ts_sec").over(w_ord), F.lit(-1)
        ).cast("bigint").alias("secs_since_prev"),
        F.count("*").over(w_1h).cast("bigint").alias("n_1h"),
        F.count("*").over(w_24h).cast("bigint").alias("n_24h"),
        (
            F.coalesce(
                F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")).over(
                    w_24h
                ),
                F.lit(0),
            ).cast("double")
            / 10000
        ).alias("amt_24h"),
        ewma_prev.alias("ewma_prev"),
        F.avg("value").over(w_hist).alias("expanding_mean"),
    )
    feats = feats.withColumn(
        "dev_ratio",
        F.when(
            F.col("ewma_prev").isNotNull(),
            F.col("value") / (F.col("ewma_prev") + F.lit(_EPS)),
        ),
    )

    # pseudo-label: per-user 10×MAD robust outlier screen (q_mad_outlier)
    med = ev.groupBy("user_id").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "user_id").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)").alias("mad")
    )
    flags = (
        dev.join(F.broadcast(mad), "user_id")
        .select(
            "event_id",
            ((F.col("mad") > 0) & (F.col("adev") > 10 * F.col("mad")))
            .cast("int")
            .alias("target"),
        )
    )
    return feats.join(flags, "event_id")


@dataclass
class FeatureJobReport:
    n_rows: int
    n_users: int
    n_train: int
    n_test: int
    positive_rate: float
    output_path: str | None


def run_feature_job(
    spark: SparkSession,
    sf_dir: str,
    out_path: str | None = None,
    train_frac: float = 0.8,
) -> FeatureJobReport:
    """Build the feature table, split train/test by a deterministic
    user-level hash (all of a user's events land on one side — the
    grouped split that prevents same-user leakage across the split,
    which the reference's row-level train_test_split misses), and
    optionally persist hive-partitioned by day."""
    df = feature_table(spark, sf_dir)
    bucket = F.abs(F.xxhash64(F.col("user_id").cast("string"))) % 1000
    df = df.withColumn(
        "is_train", (bucket < int(train_frac * 1000)).cast("int")
    ).withColumn("day", (F.col("ts_sec") / 86400).cast("bigint"))
    if out_path is not None:
        df.write.mode("overwrite").partitionBy("day").parquet(out_path)
        df = spark.read.parquet(out_path)
    agg = df.agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("u"),
        F.sum("is_train").alias("tr"),
        F.avg("target").alias("pr"),
    ).collect()[0]
    return FeatureJobReport(
        n_rows=agg.n,
        n_users=agg.u,
        n_train=agg.tr,
        n_test=agg.n - agg.tr,
        positive_rate=float(agg.pr),
        output_path=out_path,
    )
