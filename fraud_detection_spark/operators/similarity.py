"""Similarity search over the ``embeddings`` table (array<float>[64]):
brute-force cosine top-k as the exact baseline, LSH/IVF-bucketed ANN as
the scale path, plus general array-column operators.

Scale posture: the query vector is a broadcast literal — the corpus
scan is embarrassingly parallel with no shuffle (top-k via
TakeOrderedAndProject). The ANN variant prunes the scan to the query's
hash bucket: with b sign-planes the candidate set is ~n/2^b, the
standard IVF/LSH trade (recall measured against brute force in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import pround
from fraud_detection_spark.operators.dedup import _N_BANDS, attach_sketches
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

QUERY_VEC_ID = 0  # the corpus vector used as the search query


def cosine_to_query(e_col: str, q_col: str) -> Column:
    """Cosine similarity between two double-array columns (sequential
    fold => bit-identical across engines after float->double cast)."""
    dot = F.aggregate(
        F.zip_with(F.col(e_col), F.col(q_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    n1 = F.sqrt(F.aggregate(F.col(e_col), F.lit(0.0), lambda a, v: a + v * v))
    n2 = F.sqrt(F.aggregate(F.col(q_col), F.lit(0.0), lambda a, v: a + v * v))
    return dot / (n1 * n2)


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


@query(
    "q_knn_cosine",
    oracle=(
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
        f"WHERE vec_id = {QUERY_VEC_ID}) "
        "SELECT vec_id, label, "
        + sql_round("list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6) + " AS cosine "
        f"FROM embeddings CROSS JOIN q WHERE vec_id <> {QUERY_VEC_ID} "
        "ORDER BY cosine DESC, vec_id LIMIT 10"
    ),
    tags=("similarity", "knn"),
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against a query vector (vec_id=0) —
    the exact ANN baseline. Broadcast 1-row query side; top-k planned
    as TakeOrderedAndProject (per-partition heaps, no global sort)."""
    e = load_table(spark, sf_dir, "embeddings")
    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(_as_double("embedding").alias("qe"))
    )
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", _as_double("embedding").alias("e"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_knn_ivf",
    oracle=None,  # ANN: recall-vs-exact verified in pytest, not hash-equal
    tags=("similarity", "ann"),
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-rerank approximate nearest neighbours: every vector
    carries a 60-bit sign sketch (the 6×10-plane banded family shared
    with q_dedup_embedding); candidate shortlist = top-64 by Hamming
    similarity to the query's sketch (popcount over XORed band words —
    pure bit ops, TakeOrderedAndProject, no shuffle of vectors), exact
    cosine top-10 over the shortlist only.

    100 TB shape: the first pass reads 6 BIGINT sketch words per row
    instead of 64 floats (~85% scan-volume cut when sketches are
    materialized), stays in whole-stage codegen, and each partition
    contributes only its local top-64. Hamming over 60 random-plane
    bits is a consistent estimator of angle (E[h/60] = θ/π), so the
    shortlist recall is far higher than hard bucket-equality probing
    at the moderate cosine levels that matter for kNN."""
    e = load_table(spark, sf_dir, "embeddings")
    b = attach_sketches(e, ["vec_id", "label"])
    qv = b.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("e").alias("qe"),
        *[F.col(f"bk{i}").alias(f"qbk{i}") for i in range(_N_BANDS)],
    )
    hamming = None
    for i in range(_N_BANDS):
        h = F.bit_count(F.col(f"bk{i}").bitwiseXOR(F.col(f"qbk{i}")))
        hamming = h if hamming is None else (hamming + h)
    shortlist = (
        b.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv))
        .withColumn("hamming", hamming)
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(64)
    )
    return (
        shortlist.select(
            "vec_id",
            "label",
            pround(cosine_to_query("e", "qe"), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_array_ops",
    oracle=(
        "SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, "
        + sql_round("list_sum(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE)))", 6) + " AS head_sum, "
        + sql_round("sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))", 6) + " AS l2_norm, "
        + sql_round("list_max(list_transform(embedding, x -> CAST(x AS DOUBLE)))", 6) + " AS max_val "
        "FROM embeddings"
    ),
    tags=("array",),
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column operator surface: size, slice-sum, L2 norm via
    aggregate(fold), element max — the multimodal-column toolkit
    (embeddings travel through the engine as first-class arrays)."""
    e = load_table(spark, sf_dir, "embeddings")
    ed = _as_double("embedding")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        pround(
            F.aggregate(F.slice(ed, 1, 4), F.lit(0.0), lambda a, v: a + v), 6
        ).alias("head_sum"),
        pround(
            F.sqrt(F.aggregate(ed, F.lit(0.0), lambda a, v: a + v * v)), 6
        ).alias("l2_norm"),
        pround(F.array_max(ed), 6).alias("max_val"),
    )
