"""Relational surface, batch 3: range join, array explode with
position, and map-typed column operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import fixed_sum, pround
from fraud_detection_spark.registry import query, sql_fixed_sum, sql_round
from fraud_detection_spark.sources import load_table


@query(
    "q_range_join",
    oracle=(
        "WITH bands AS (SELECT i AS band_id, i * 10.0 AS lo, (i + 1) * 10.0 AS hi "
        "FROM (SELECT unnest(range(0, 10)) AS i)) "
        "SELECT band_id, CAST(COUNT(*) AS BIGINT) AS n, "
        + sql_fixed_sum("value", 4) + " AS sum_value "
        "FROM events JOIN bands ON value >= lo AND value < hi "
        "GROUP BY band_id"
    ),
    tags=("join", "range"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: events joined to value bands via BETWEEN-style
    predicates. Spark plans a broadcast nested-loop join against the
    tiny band dimension — correct here; the 100 TB form bucketizes the
    range key and equi-joins on the bucket (guide §OLAP patterns),
    which this data's uniform [0,100) bands reduce to exactly:
    band_id = floor(value/10)."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n"),
            fixed_sum(F.col("value"), 4).alias("sum_value"),
        )
    )


@query(
    "q_posexplode",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents "
        "WHERE doc_id < 25) "
        "SELECT doc_id, CAST(i - 1 AS INT) AS pos, w[i] AS token "
        "FROM t, LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i)"
    ),
    tags=("array", "explode"),
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array -> (position, element) rows, preserving token
    order — the ordinal-aware flatten used for n-gram windows and
    token-position features."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 25)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


@query(
    "q_map_ops",
    oracle=(
        "SELECT event_id, 'k' AS first_key, "
        "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value, "
        "1 AS n_keys FROM events"
    ),
    tags=("map",),
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column operators: parse JSON into MapType, then
    map_keys / element_at / size — the JSONB-map access pattern of the
    reference's explanation read-back (api/app.py:265-277)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.size(m).alias("n_keys"),
    )


@query(
    "q_window_suite",
    oracle=(
        "WITH d AS (SELECT (epoch_ns(ts) // 1000000000) // 86400 AS day, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY day) "
        "SELECT CAST(day AS BIGINT) AS day, n, "
        + sql_round("PERCENT_RANK() OVER (ORDER BY n, day)", 6)
        + " AS pct_rank, "
        + sql_round("CUME_DIST() OVER (ORDER BY n, day)", 6)
        + " AS cume_dist, "
        "CAST(NTILE(4) OVER (ORDER BY n, day) AS INT) AS quartile, "
        "CAST(FIRST_VALUE(n) OVER (ORDER BY n, day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)"
        " AS min_n, "
        "CAST(NTH_VALUE(n, 3) OVER (ORDER BY n, day "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT)"
        " AS third_n FROM d"
    ),
    tags=("window", "relational"),
)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions in one declared
    query — PERCENT_RANK, CUME_DIST, NTILE(4), FIRST_VALUE and
    NTH_VALUE over the daily-volume series: where does each day's
    volume sit in the distribution (the percentile dashboards quote),
    which quartile is it in, and what are the reference days. Rounds
    out the window surface next to q_window_rank's rank/dense_rank and
    the lag/lead family used throughout.

    Plan: the event stream folds to ≤|days| rows map-side; every
    window runs on that bounded table (the unpartitioned ORDER BY is
    over ≤31 rows by construction — same bounded-window discipline as
    q_cusum). Ordering key (n, day) is a total order, so every
    function is deterministic on any layout."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select(F.expr("ts div 1000000000 div 86400").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    # bounded: ≤|days| rows by construction
    w = Window.orderBy("n", "day")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return d.select(
        F.col("day").cast("bigint").alias("day"),
        "n",
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
        pround(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.first("n").over(wf).cast("bigint").alias("min_n"),
        F.nth_value("n", 3).over(wf).cast("bigint").alias("third_n"),
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot_daily",
    oracle=(
        "SELECT CAST((epoch_ns(ts) // 1000000000) // 86400 AS BIGINT) AS day, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS {t}"
            for t in _PIVOT_TYPES
        )
        + " FROM events GROUP BY day"
    ),
    tags=("relational", "pivot", "agg"),
)
def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT surface: the day × event-type count matrix via
    DataFrame.pivot with an EXPLICIT value list — the explicit list is
    the scale-correct form (unlisted pivot runs an extra distinct job
    over the fact table to discover columns, and a high-cardinality
    pivot column explodes the schema; with the list the whole pivot
    compiles to the same one-pass conditional aggregation the oracle
    spells out). Nulls for absent (day, type) cells fold to 0 so the
    matrix is dense.

    One map-side-combinable aggregate; output is the bounded
    |days| × |types| matrix."""
    ev = load_table(spark, sf_dir, "events")
    p = (
        ev.select(
            F.expr("ts div 1000000000 div 86400").cast("bigint").alias("day"),
            "event_type",
        )
        .groupBy("day")
        .pivot("event_type", _PIVOT_TYPES)
        .count()
    )
    return p.select(
        "day",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(t)
            for t in _PIVOT_TYPES
        ],
    )
