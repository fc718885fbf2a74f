"""Deterministic sampling + sequence-packing operators over
``documents`` — the training-data-pipeline ops every corpus job needs
(sample a corpus, stratify by language, pack documents into
fixed-token-budget training sequences), built RNG-free so they are
reproducible on any cluster layout and exactly oracle-checkable.

The "random" number for a row is a pure function of its key:
u(id) = first32bits(md5(id)) / 2^32 ∈ [0,1) — identical in Spark
(``conv(substring(md5(..),1,8),16,10)``) and DuckDB
(``('0x' || substr(md5(..),1,8))::BIGINT``). Sampling is then a simple
filter ``u < fraction``: stable under retries, repartitioning, and
incremental re-runs (a doc's fate never changes when the corpus
grows — the property RNG sampling lacks at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_spark.functions import pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

_U32 = 4294967296.0  # 2^32


def _u_expr(col: str):
    """Deterministic uniform in [0,1) from a key column (Spark side)."""
    return (
        F.conv(
            F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 8), 16, 10
        ).cast("bigint")
        / F.lit(_U32)
    )


def _u_sql(col: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8) AS BIGINT) / {_U32}"


@query(
    "q_sample_uniform",
    oracle=(
        "SELECT doc_id, lang, "
        + sql_round(_u_sql("doc_id"), 6)
        + " AS u FROM documents "
        f"WHERE {_u_sql('doc_id')} < 0.3"
    ),
    tags=("sampling",),
)
def q_sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~30% uniform sample, deterministic per doc_id (hash-uniform, no
    RNG): the scan filter is a pure column expression, so the sample is
    a narrow transformation — no shuffle, no state, stable under
    incremental corpus growth."""
    d = load_table(spark, sf_dir, "documents")
    u = _u_expr("doc_id")
    return d.select("doc_id", "lang", pround(u, 6).alias("u")).filter(u < 0.3)


@query(
    "q_sample_stratified",
    oracle=(
        "WITH s AS (SELECT doc_id, lang, "
        f"{_u_sql('doc_id')} AS u FROM documents) "
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled FROM s "
        "WHERE u < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END) "
        "GROUP BY lang"
    ),
    tags=("sampling",),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates (the language-rebalancing step of a
    corpus mix): en 50%, de 25%, rest 10% — one deterministic filter,
    then a count per stratum. At 100 TB the rates come from a tiny
    broadcast config table instead of a CASE."""
    d = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 0.5)
        .when(F.col("lang") == "de", 0.25)
        .otherwise(0.1)
    )
    return (
        d.filter(_u_expr("doc_id") < rate)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )


@query(
    "q_pack_sequences",
    oracle=(
        "WITH t AS (SELECT doc_id, doc_id % 8 AS shard, "
        "len(string_split(text, ' ')) AS n_tok FROM documents), "
        "c AS (SELECT doc_id, shard, n_tok, "
        "SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS tok_before FROM t) "
        "SELECT doc_id, CAST(shard AS BIGINT) AS shard, "
        "CAST(n_tok AS BIGINT) AS n_tok, "
        "CAST(tok_before // 2048 AS BIGINT) AS seq_id FROM c"
    ),
    tags=("sampling", "packing"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget (2048)
    training sequences. Docs are sharded by doc_id % 8 (one PARTITIONED
    running-sum window per shard — embarrassingly parallel, no global
    order), and a doc's sequence is floor(tokens_before / budget) —
    the streaming-concat packing a tokenizer pipeline uses.

    Integer-only math => hash-exact oracle. At 100 TB the shard count
    scales with the cluster; each shard's window state is one running
    sum."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(8)).alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return t.select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        "n_tok",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(2048))
        .cast("bigint")
        .alias("seq_id"),
    )


_CAP_N = 30


@query(
    "q_cap_per_group",
    oracle=(
        "WITH r AS (SELECT doc_id, source, ROW_NUMBER() OVER "
        f"(PARTITION BY source ORDER BY {_u_sql('doc_id')}, doc_id) AS rk "
        "FROM documents) "
        "SELECT doc_id, source, CAST(rk AS BIGINT) AS rk "
        f"FROM r WHERE rk <= {_CAP_N}"
    ),
    tags=("sampling", "curation"),
)
def q_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group cap: keep at most N documents per source, chosen by
    deterministic hash order — the "max N pages per domain" rule every
    web-corpus recipe applies so one giant domain cannot dominate the
    mix (the per-group form of q_sample_uniform's rate cut: a cap
    bounds the CONTRIBUTION, a rate only scales it).

    One window keyed by the group — shuffles once on source, sorts
    only within each group, and the hash sort key makes the kept set
    independent of physical row order (retry/layout-stable) AND stable
    under corpus growth: a new crawl shifts a group's kept set only
    where new docs hash below the old cap boundary. At 100 TB the
    same plan holds; for heavily skewed group sizes the window sort is
    the cost, and the standard refinement is a pre-filter at the cap
    quantile of u per group before the exact window."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_u_expr("doc_id").asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= _CAP_N)
    )
