"""Aggregation operators.

Reference parity (SURVEY.md §2c): class distribution value_counts
(load_data.py:15, eda.py:17), np.bincount (preprocess.py:40),
null audits (preprocess.py:24, train_model.py:25), scaler-fit μ/σ
(preprocess.py:32, train_model.py:36-40), class-ratio scale_pos_weight
(train_model.py:52-54), mean |SHAP| (explain_model.py:39), histogram
(eda.py:31), recovery-validation conditional sums
(docs/WorkerRecoveryTestPlan.md).

Scale posture: all of these are hash aggregates with map-side partial
aggregation — one shuffle of (#groups × #partitions) partial rows, no
driver collection. The histogram is the two-pass-safe binned form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import fixed_avg, pround
from fraud_detection_spark.registry import query, sql_fixed_avg, sql_round
from fraud_detection_spark.sources import load_table


@query(
    "q_groupby_count",
    oracle=(
        "SELECT l_returnflag AS class, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    tags=("agg",),
)
def q_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class distribution. Ref: df['Class'].value_counts() load_data.py:15;
    np.bincount preprocess.py:40."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("class"))
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "q_null_counts",
    oracle=(
        "SELECT CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_custkey_nulls, "
        "CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_name_nulls, "
        "CAST(SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nationkey_nulls, "
        "CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_acctbal_nulls, "
        "CAST(SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_mktsegment_nulls "
        "FROM customer"
    ),
    tags=("agg", "profile"),
)
def q_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null audit. Ref: df.isnull().sum() preprocess.py:24.
    One pass over the table, all columns audited in a single aggregate."""
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        *[
            F.sum(F.col(col).isNull().cast("int")).cast("bigint").alias(f"{col}_nulls")
            for col in c.columns
        ]
    )


@query(
    "q_mean_std",
    oracle=(
        "SELECT l_returnflag, " + sql_round(sql_fixed_avg("l_quantity", 4), 4) + " AS mean_qty, "
        + sql_round("STDDEV_SAMP(l_quantity)", 4) + " AS std_qty, "
        + sql_round(sql_fixed_avg("l_extendedprice", 4), 4) + " AS mean_price, "
        + sql_round("STDDEV_SAMP(l_extendedprice)", 4) + " AS std_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    tags=("agg", "stats"),
)
def q_mean_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group μ/σ — the scaler-fit statistic. Ref: StandardScaler.fit
    preprocess.py:32-33, train_model.py:36-38. Single-pass (Welford-style
    partial moments merged across partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        pround(fixed_avg(F.col("l_quantity"), 4), 4).alias("mean_qty"),
        pround(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        pround(fixed_avg(F.col("l_extendedprice"), 4), 4).alias("mean_price"),
        pround(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
    )


@query(
    "q_class_ratio",
    oracle=(
        "SELECT CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS neg, "
        "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos, "
        + sql_round("SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) * 1.0 / SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)", 6) + " AS scale_pos_weight "
        "FROM lineitem"
    ),
    tags=("agg", "ml"),
)
def q_class_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class imbalance ratio. Ref: scale_pos_weight = neg/pos
    train_model.py:52-54 (label ≡ l_returnflag = 'R')."""
    li = load_table(spark, sf_dir, "lineitem")
    neg = F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
    pos = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    return li.agg(
        neg.cast("bigint").alias("neg"),
        pos.cast("bigint").alias("pos"),
        pround(neg * 1.0 / pos, 6).alias("scale_pos_weight"),
    )


@query(
    "q_mean_abs",
    oracle=(
        "SELECT " + sql_round(sql_fixed_avg("ABS(l_discount - 0.05)", 6), 6) + " AS mabs_discount, "
        + sql_round(sql_fixed_avg("ABS(l_tax - 0.04)", 6), 6) + " AS mabs_tax FROM lineitem"
    ),
    tags=("agg", "ml"),
)
def q_mean_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean absolute deviation. Ref: np.abs(shap_values).mean(axis=0)
    explain_model.py:39 (centered on nominal rates here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        pround(fixed_avg(F.abs(F.col("l_discount") - 0.05), 6), 6).alias("mabs_discount"),
        pround(fixed_avg(F.abs(F.col("l_tax") - 0.04), 6), 6).alias("mabs_tax"),
    )


@query(
    "q_histogram",
    oracle=(
        "SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM orders GROUP BY bucket"
    ),
    tags=("agg", "histogram"),
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram. Ref: sns.histplot(bins=100) eda.py:31.
    Binned group-by — the scale-safe histogram (vs sorting): one shuffle
    of (#bins) partial counts."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).cast("bigint").alias("bucket")
        ).agg(F.count("*").alias("cnt"))
    )


@query(
    "q_conditional_agg",
    oracle=(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS total, "
        "CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_high, "
        "CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_with_props "
        "FROM events GROUP BY event_type"
    ),
    tags=("agg",),
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional SUM(CASE WHEN ...) rollup. Ref: recovery-validation
    SQL in docs/WorkerRecoveryTestPlan.md (completed-shap counts)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("value") > 50.0, 1).otherwise(0)).cast("bigint").alias("n_high"),
        F.sum(
            F.when(F.get_json_object("props", "$.k").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_with_props"),
    )


@query(
    "q_winsorized_stats",
    oracle=(
        "WITH b AS (SELECT l_returnflag, "
        "quantile_disc(l_extendedprice, 0.05) AS p05, "
        "quantile_disc(l_extendedprice, 0.95) AS p95 "
        "FROM lineitem GROUP BY l_returnflag), "
        "w AS (SELECT l.l_returnflag, b.p05, b.p95, "
        "CAST(FLOOR(LEAST(GREATEST(l.l_extendedprice, b.p05), b.p95) "
        "* 100 + 0.5) AS BIGINT) AS cents "
        "FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag), "
        "s AS (SELECT l_returnflag, p05, p95, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "SUM(CAST(cents AS HUGEINT)) AS sc, "
        "SUM(CAST(cents AS HUGEINT) * cents) AS sc2 "
        "FROM w GROUP BY l_returnflag, p05, p95) "
        "SELECT l_returnflag, n, "
        + sql_round("p05", 2) + " AS p05, "
        + sql_round("p95", 2) + " AS p95, "
        + sql_round("CAST(sc AS DOUBLE) / 100 / n", 6) + " AS w_mean, "
        + sql_round(
            "SQRT((CAST(sc2 AS DOUBLE) - CAST(sc AS DOUBLE) * sc / n) "
            "/ (n - 1)) / 100",
            6,
        )
        + " AS w_std FROM s"
    ),
    tags=("agg", "robust", "stats"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/std of the line price per return-flag class:
    values clamped to the class's exact [p05, p95] before the moments
    — the robust location/scale estimate that keeps sample size
    (unlike trimming) while bounding the influence of the tails that
    drive fraud amounts. The feature-engineering companion to
    q_robust_scale's median/IQR: winsorized moments feed models that
    want (approximately) Gaussian inputs but can't afford outlier
    leverage.

    Exactness: PERCENTILE_DISC selects an ELEMENT (engine-exact, the
    q_percentiles discipline); clamping is pure comparison, no
    arithmetic; the clamped values fold to integer cents so both
    moments are exact integer sums — DECIMAL(38,0) on Spark, HUGEINT
    on DuckDB, the q_corr_matrix overflow discipline (BIGINT sums of
    cents-squared overflow at fact scale) — and the only float ops
    are the final divisions/sqrt on exact inputs.

    Scale: one grouped percentile pass (the exact-median cost,
    ≤|classes| rows out, broadcast back) + one map-side-combinable
    moment aggregate over the clamped scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    b = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p05"),
        F.expr(
            "percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("p95"),
    )
    cents = F.floor(
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95"))
        * 100
        + F.lit(0.5)
    ).cast("bigint")
    dec = cents.cast("decimal(38,0)")
    s = (
        li.join(F.broadcast(b), "l_returnflag")
        .groupBy("l_returnflag", "p05", "p95")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(dec).alias("sc"),
            F.sum(dec * cents).alias("sc2"),
        )
    )
    scd = F.col("sc").cast("double")
    return s.select(
        "l_returnflag",
        "n",
        pround(F.col("p05"), 2).alias("p05"),
        pround(F.col("p95"), 2).alias("p95"),
        pround(scd / 100 / F.col("n"), 6).alias("w_mean"),
        pround(
            F.sqrt(
                (F.col("sc2").cast("double") - scd * scd / F.col("n"))
                / (F.col("n") - 1)
            )
            / 100,
            6,
        ).alias("w_std"),
    )
