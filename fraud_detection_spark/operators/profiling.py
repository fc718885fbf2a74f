"""Data-profiling operator — the data-quality summary every pipeline
runs before trusting an input drop.

Reference parity: the reference's audit is three ad-hoc pandas calls
(df.isnull().sum() preprocess.py:24, df.shape load_data.py:7,
df['Class'].value_counts() load_data.py:15); this operator is the
engine-native generalization: one long-format profile row per numeric
column with row/null/distinct counts, min/max, and an exact
fixed-point mean.

Scale posture: the wide-to-long explode is a codegen'd generator over
ONE scan of the fact table (not one scan per column); the profile
aggregate is map-side combinable except the exact distinct count,
which shuffles (column, value) pairs — the documented exact form, with
approx_count_distinct as the beyond-100 TB twin (the
q_distinct_count ↔ q_approx_distinct pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import fp_units, pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in _PROFILE_COLS
    )
    return (
        f"WITH long AS ({legs}) "
        "SELECT col, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct, "
        "MIN(v) AS min_v, MAX(v) AS max_v, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(v * 10000 + 0.5) AS BIGINT)) AS DOUBLE) "
            "/ 10000 / COUNT(v)",
            6,
        )
        + " AS mean_v FROM long GROUP BY col"
    )


@query("q_data_profile", oracle=_profile_oracle(), tags=("quality", "profile"))
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format numeric profile of lineitem: per column, row count,
    null count, exact distinct count, min/max, fixed-point mean.

    Spark plan: explode an array<struct<col,v>> built in one projection
    — a single scan feeds all columns' profile rows (the oracle's
    UNION-ALL form would scan once per column); min/max are raw stored
    doubles (no arithmetic, hash-safe), the mean is exact fixed-point
    units."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"), F.col(c).cast("double").alias("v")
            )
            for c in _PROFILE_COLS
        ]
    )
    long = li.select(F.explode(pairs).alias("p")).select("p.col", "p.v")
    return long.groupBy("col").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.count_distinct("v").cast("bigint").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        pround(
            F.sum(fp_units(F.col("v"), 4)).cast("double") / 10000 / F.count("v"), 6
        ).alias("mean_v"),
    )


_GAP_BUCKET = 1000  # ids per completeness bucket


@query(
    "q_sequence_gaps",
    oracle=(
        "WITH b AS (SELECT event_id // 1000 AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_present, "
        "CAST(MIN(event_id) AS BIGINT) AS id_min, "
        "CAST(MAX(event_id) AS BIGINT) AS id_max "
        "FROM events GROUP BY bucket), "
        "g AS (SELECT MIN(event_id) AS lo, MAX(event_id) AS hi FROM events) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, n_present, "
        "CAST(CASE "
        "WHEN bucket = lo // 1000 AND bucket = hi // 1000 THEN hi - lo + 1 "
        "WHEN bucket = lo // 1000 THEN (bucket + 1) * 1000 - lo "
        "WHEN bucket = hi // 1000 THEN hi - bucket * 1000 + 1 "
        "ELSE 1000 END AS BIGINT) AS n_expected, "
        "CAST(CASE "
        "WHEN bucket = lo // 1000 AND bucket = hi // 1000 THEN hi - lo + 1 "
        "WHEN bucket = lo // 1000 THEN (bucket + 1) * 1000 - lo "
        "WHEN bucket = hi // 1000 THEN hi - bucket * 1000 + 1 "
        "ELSE 1000 END - n_present AS BIGINT) AS n_missing "
        "FROM b, g"
    ),
    tags=("quality", "profile", "agg"),
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit: per 1000-id bucket, how many ids of
    a supposedly gap-free sequence are present vs expected — missing
    ledger/invoice numbers are a first-class audit red flag, and in a
    pipeline the same check catches silently dropped partitions.

    The scalable shape: NOT a global lag-over-everything (that is one
    sorted partition of the whole table) but a two-phase audit — one
    hash aggregate folds the ids into |range|/1000 bucket rows with
    present-counts, and expected-counts come from the range bounds
    (edge buckets pro-rated); a second pass over FLAGGED buckets only
    (n_missing > 0, a tiny set) can then enumerate exact missing ids.
    This query is phase one, which is the whole scan cost."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    b = ev.groupBy(F.expr(f"event_id div {_GAP_BUCKET}").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.min("event_id").cast("bigint").alias("id_min"),
        F.max("event_id").cast("bigint").alias("id_max"),
    )
    g = ev.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    j = b.crossJoin(F.broadcast(g))
    lo_b = F.expr(f"lo div {_GAP_BUCKET}")
    hi_b = F.expr(f"hi div {_GAP_BUCKET}")
    expected = (
        F.when(
            (F.col("bucket") == lo_b) & (F.col("bucket") == hi_b),
            F.col("hi") - F.col("lo") + 1,
        )
        .when(F.col("bucket") == lo_b, (F.col("bucket") + 1) * _GAP_BUCKET - F.col("lo"))
        .when(F.col("bucket") == hi_b, F.col("hi") - F.col("bucket") * _GAP_BUCKET + 1)
        .otherwise(F.lit(_GAP_BUCKET))
    )
    return j.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_present",
        expected.cast("bigint").alias("n_expected"),
        (expected - F.col("n_present")).cast("bigint").alias("n_missing"),
    )
