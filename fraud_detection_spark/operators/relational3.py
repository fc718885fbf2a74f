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
