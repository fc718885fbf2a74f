"""Deduplication operators over ``documents`` / ``embeddings`` —
LLM-data-pipeline mandate: exact dedup, MinHash-LSH near-dup, SimHash,
and embedding-cosine near-dup with LSH sign-bucketing.

Scale posture:
- exact dedup groups on a 128-bit content hash (md5), never shuffles
  full text payloads for comparison beyond the group key;
- MinHashLSH banding turns the O(n²) pairwise problem into a
  bucket-join (approxSimilarityJoin);
- SimHash reduces each doc to a 32-bit signature with one explode +
  one aggregate — candidate pairing then groups on signature bands;
- embedding near-dup buckets on hyperplane sign bits first, so the
  quadratic pairwise check runs only within buckets (n²/2^b pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table


@query(
    "q_dedup_exact",
    oracle=(
        "SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_copies "
        "FROM documents GROUP BY md5(text)"
    ),
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-group on content, keep min doc_id per group
    (deterministic keeper — dropDuplicates() keeps an arbitrary row).
    At 100 TB: group on md5 so the shuffle key is 16 bytes, not the
    document body."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "q_dedup_near",
    oracle=None,  # LSH banding: model-dependent hash families — rows-only
    tags=("dedup", "lsh"),
)
def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH: shingle -> term-frequency
    vector -> MinHash signatures -> banded bucket self-join
    (approxSimilarityJoin at Jaccard distance <= 0.5), emit canonical
    pairs (a < b). Seeded => deterministic output.

    Pipeline: Tokenizer-equivalent split -> HashingTF(binary) ->
    MinHashLSH(numHashTables=8, seed=42). The LSH join is the scale
    path: candidate pairs come from hash-bucket equality, not a cross
    join."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    ).filter(F.size("tokens") > 0)
    htf = HashingTF(inputCol="tokens", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = htf.transform(toks)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


@query(
    "q_dedup_simhash",
    oracle=None,  # xxhash64 is engine-specific — rows-only + pytest properties
    tags=("dedup", "simhash"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document: hash each token to 64
    bits (xxhash64), accumulate ±1 per bit position over the doc's
    tokens, sign-threshold into the fingerprint. One explode + one
    aggregate — no UDF, fully codegen'd.

    Near-dup candidates are docs whose signatures agree on a band
    (here: top 16 bits), the classic simhash blocking scheme."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    h = tok.withColumn("h", F.xxhash64("w"))
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(32)
        ]
    )
    sig = bit_sums.select(
        "doc_id",
        sum(
            [F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(32)],
            F.lit(0),
        ).cast("bigint").alias("simhash"),
    )
    return sig.withColumn(
        "band", F.shiftright(F.col("simhash"), 16).cast("bigint")
    )


# Deterministic pseudo-hyperplanes for sign-bucket LSH over the 64-dim
# embeddings: plane j weight at dim d = +1 / -1 by a fixed arithmetic
# rule, so the same buckets are computable in ANSI SQL (oracle) and in
# Spark without any RNG.
_N_PLANES = 6


def _bucket_expr_spark(col: str):
    """Σ_j [ (Σ_d e[d] * s(j,d)) > 0 ] << j with s(j,d) = +1 if
    (d*(j+2)) % 5 < 2.5 else -1."""
    total = F.lit(0)
    for j in range(_N_PLANES):
        dot = F.aggregate(
            F.zip_with(
                F.transform(F.col(col), lambda x: x.cast("double")),
                F.transform(
                    F.sequence(F.lit(0), F.lit(63)),
                    lambda d: F.when((d * (j + 2)) % 5 < 2.5, F.lit(1.0)).otherwise(F.lit(-1.0)),
                ),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        total = total + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return total.cast("bigint")


def _bucket_sql(col: str = "embedding") -> str:
    parts = []
    for j in range(_N_PLANES):
        dot = (
            f"list_sum(list_transform(range(1, 65), d -> "
            f"CAST({col}[d] AS DOUBLE) * (CASE WHEN ((d - 1) * {j + 2}) % 5 < 2.5 "
            f"THEN 1.0 ELSE -1.0 END)))"
        )
        parts.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


@query(
    "q_dedup_embedding",
    oracle=(
        "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, "
        f"{_bucket_sql()} AS bucket FROM embeddings) "
        "SELECT vec_a, vec_b, cosine FROM ("
        "SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, "
        + sql_round("list_cosine_similarity(a.e, c.e)", 6) + " AS cosine "
        "FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) "
        "WHERE cosine > 0.3"
    ),
    tags=("dedup", "embedding"),
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with LSH sign-bucketing:
    bucket each vector by the sign pattern of 6 fixed hyperplanes, then
    compare pairs only within a bucket (cosine > 0.3 — the synthetic
    embeddings are near-orthogonal, 99.9th pct pairwise cosine ~0.38). The bucketing
    keeps the pairwise stage at n²/2^6 of the naive cross join; the
    hyperplanes are deterministic literals so the DuckDB oracle can
    reproduce the buckets exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        _bucket_expr_spark("embedding").alias("bucket"),
    )
    a, c = b.alias("a"), b.alias("c")
    dot = F.aggregate(
        F.zip_with(F.col("a.e"), F.col("c.e"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(F.col(f"{side}.e"), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    cosine = dot / (norm("a") * norm("c"))
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket")) & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            pround(cosine, 6).alias("cosine"),
        )
        .filter(F.col("cosine") > 0.3)
    )


def _embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric near-dup edge list from the sign-bucket cosine join."""
    p = q_dedup_embedding(spark, sf_dir).select("vec_a", "vec_b")
    return p.unionByName(
        p.select(F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b"))
    )


# the pair subquery reused inside the recursive oracle (without the
# outer SELECT of q_dedup_embedding's rounding projection)
def _pairs_sql() -> str:
    return (
        "WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, "
        f"{_bucket_sql()} AS bucket FROM embeddings), "
        "halfp AS (SELECT a.vec_id AS x, c.vec_id AS y FROM b a JOIN b c "
        "ON a.bucket = c.bucket AND a.vec_id < c.vec_id "
        "WHERE FLOOR(list_cosine_similarity(a.e, c.e) * 1000000 + 0.5) / 1000000 > 0.3), "
        "pairs AS (SELECT x, y FROM halfp UNION ALL SELECT y, x FROM halfp)"
    )


@query(
    "q_dedup_cluster",
    oracle=(
        "WITH RECURSIVE " + _pairs_sql()[5:] + ", "
        "reach(v, r) AS ("
        "SELECT vec_id, vec_id FROM embeddings "
        "UNION "
        "SELECT p.x, reach.r FROM pairs p JOIN reach ON p.y = reach.v) "
        "SELECT v AS vec_id, CAST(MIN(r) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY v"
    ),
    tags=("dedup", "cluster", "iterative"),
)
def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-duplicate graph — the dedup
    *clustering* step (keep one representative per component).
    Iterative min-label propagation: every vertex starts as its own
    cluster id; each round takes the min of its neighbours' labels;
    converges in O(graph diameter) rounds. The classic iterative Spark
    algorithm (same shape as large-scale connected components /
    label propagation), oracle-checked against a DuckDB recursive CTE.

    Scale: each round is one join + one aggregate on the edge list;
    localCheckpoint truncates lineage per round so plans stay flat.
    Near-dup graphs are sparse and shallow, so rounds are few."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id")
    edges = _embedding_pairs(spark, sf_dir).localCheckpoint()
    labels = e.select("vec_id", F.col("vec_id").alias("cluster_id"))
    for _ in range(20):  # diameter bound; convergence-checked below
        neighbor_min = (
            edges.join(labels, edges.vec_b == labels.vec_id)
            .groupBy(F.col("vec_a").alias("vec_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "vec_id", "left")
            .select(
                "vec_id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "vec_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    return labels
