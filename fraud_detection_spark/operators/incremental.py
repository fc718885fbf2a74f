"""Incremental dedup against a persisted corpus sketch index — the
shape a production 100 TB pipeline actually runs: documents arrive in
shards, each shard is checked against the *existing* corpus index (not
a one-shot full-corpus self-join), and surviving sketches are merged
back so the next shard sees them.

Reference parity: mirrors the reference's incremental-arrival
semantics — records arrive one at a time, are checked against the
existing store, and are upserted (/root/reference/xai_tasks.py:63-167
get-or-create + update; /root/reference/api/worker.py:90-95
ON CONFLICT upsert). Here the "store" is the MinHash-prefix sketch
index of operators/dedup.py's q_dedup_jaccard.

Three pieces:
- ``q_dedup_incremental`` (declared, oracle-checked): the pure dedup
  semantics — every "new" document (deterministic doc_id % 10 split
  plays the arriving shard) blocked-joined against the "historical"
  rest, exact Jaccard on candidates, order-free per-doc aggregates
  (n_dups / MIN dup_of / MAX jaccard). No side effects, so it is
  driver-runnable and DuckDB-differential-checkable.
- ``build_sketch_index`` / ``probe_index``: the physical index. The
  sketch table is exploded to one row per (blocking key, doc) and
  hive-partitioned by ``kb = key mod N_BUCKETS``; a probe collects the
  increment's bucket list (bounded by N_BUCKETS — metadata, not data)
  and reads the index with an ``isin`` filter that becomes a
  PartitionFilter: whole directories the increment can't match are
  never opened. That is the partition-pruning read path the 100 TB
  mandate asks for — probe IO scales with the increment, not the
  corpus.
- ``merge_sketch_index``: upserts surviving sketches by overwriting
  ONLY the affected buckets (dynamic partition overwrite) with
  existing-rows ⊎ new-rows deduped on (kb, mk, doc_id) — replaying the
  same increment is a no-op, the file-layout MERGE idempotency the
  reference gets from ON CONFLICT.

Scale posture: no stage ever shuffles document text — sketches are
bigint fingerprint arrays; blocking keys are 8-byte bigints; the only
driver-side collect is the increment's distinct bucket list (≤
N_BUCKETS rows). Index maintenance touches max(increment buckets)
partitions; everything else is untouched files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import pround
from fraud_detection_spark.operators.dedup import (
    _JACCARD_BLOCK_K,
    _JACCARD_CTES,
    _JACCARD_THRESHOLD,
    jaccard_sketch_docs,
)
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

# Deterministic arriving-shard split: every 10th doc is "new", the rest
# are the already-indexed historical corpus (~10% increment).
_INC_MOD = 10

# Hive-partition bucket count for the persisted index. Small enough
# that bucket directories stay chunky at 100 TB (each holds ~1/64 of
# the key space), large enough that a small increment prunes most IO.
N_BUCKETS = 64


@query(
    "q_dedup_incremental",
    oracle=(
        "WITH " + _JACCARD_CTES + ", "
        "jp AS (SELECT doc_a, doc_b, jaccard FROM ("
        "SELECT doc_a, doc_b, " + sql_round("jac", 6) + " AS jaccard FROM j) "
        f"WHERE jaccard >= {_JACCARD_THRESHOLD}), "
        "x AS (SELECT "
        f"CASE WHEN doc_a % {_INC_MOD} = 0 THEN doc_a ELSE doc_b END AS nd, "
        f"CASE WHEN doc_a % {_INC_MOD} = 0 THEN doc_b ELSE doc_a END AS od, "
        "jaccard FROM jp "
        f"WHERE (doc_a % {_INC_MOD} = 0) <> (doc_b % {_INC_MOD} = 0)), "
        "agg AS (SELECT nd AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups, "
        "CAST(MIN(od) AS BIGINT) AS dup_of, MAX(jaccard) AS max_jaccard "
        "FROM x GROUP BY nd) "
        "SELECT d.doc_id, CAST(COALESCE(a.n_dups, 0) AS BIGINT) AS n_dups, "
        "CAST(COALESCE(a.dup_of, -1) AS BIGINT) AS dup_of, "
        "COALESCE(a.max_jaccard, 0.0) AS max_jaccard, "
        "CAST(CASE WHEN a.n_dups IS NULL THEN 1 ELSE 0 END AS INT) AS is_unique "
        "FROM documents d LEFT JOIN agg a USING (doc_id) "
        f"WHERE d.doc_id % {_INC_MOD} = 0"
    ),
    tags=("dedup", "incremental", "jaccard"),
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dedup: check an arriving shard (doc_id % 10
    == 0) against the historical corpus via the same K=5 MinHash-prefix
    blocking + exact-Jaccard as q_dedup_jaccard, but joining ONLY
    new × historical (never historical × historical — that work was
    done when those shards arrived). Per new doc: duplicate count,
    deterministic MIN historical duplicate id (-1 if none), MAX
    jaccard, and the keep flag.

    All per-doc aggregates are order-free (COUNT / MIN / MAX), so the
    result is layout-invariant; the oracle reuses q_dedup_jaccard's CTE
    chain restricted to cross-boundary pairs — blocking is symmetric,
    so the candidate sets provably agree.

    Scale: candidate generation shuffles 8-byte blocking keys with the
    ~10%-sized increment on one side; exact Jaccard intersects bigint
    fingerprint arrays on candidates only. Document text never enters
    a shuffle. The persisted-index twin of this query
    (build_sketch_index/probe_index) additionally partition-prunes the
    historical side's IO; the declared form keeps the semantics
    side-effect-free for the driver."""
    d = load_table(spark, sf_dir, "documents").repartition("doc_id")
    s = jaccard_sketch_docs(d, k=_JACCARD_BLOCK_K).cache()
    is_new = F.col("doc_id") % _INC_MOD == 0
    keys = s.select("doc_id", F.explode("mk").alias("mk"))
    kn = keys.filter(is_new).select(F.col("doc_id").alias("nd"), "mk")
    ko = keys.filter(~is_new).select(F.col("doc_id").alias("od"), "mk")
    cand = kn.join(ko, "mk").select("nd", "od").distinct()
    x = s.select(F.col("doc_id").alias("nd"), F.col("sh64").alias("sha"))
    y = s.select(F.col("doc_id").alias("od"), F.col("sh64").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    jac = inter.cast("double") / (F.size("sha") + F.size("shb") - inter)
    hits = (
        cand.join(x, "nd")
        .join(y, "od")
        .select("nd", "od", pround(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
        .groupBy(F.col("nd").alias("doc_id"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("od").alias("dup_of"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
    return (
        d.filter(is_new)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce("dup_of", F.lit(-1)).cast("bigint").alias("dup_of"),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
            F.when(F.col("n_dups").isNull(), 1).otherwise(0).alias("is_unique"),
        )
    )


def sketch_index_rows(docs: DataFrame) -> DataFrame:
    """Exploded index rows for a document set: one row per (blocking
    key, doc) carrying the doc's full fingerprint array, plus the
    hive-partition bucket ``kb = pmod(mk, N_BUCKETS)``."""
    s = jaccard_sketch_docs(docs, k=_JACCARD_BLOCK_K)
    return s.select(
        "doc_id", "sh64", F.explode("mk").alias("mk")
    ).withColumn("kb", F.pmod("mk", F.lit(N_BUCKETS)).cast("int"))


def build_sketch_index(spark: SparkSession, docs: DataFrame, path: str) -> None:
    """Materialize the historical sketch index, hive-partitioned by
    key bucket (sources.sinks.write_partitioned layout)."""
    from fraud_detection_spark.sources.sinks import write_partitioned

    write_partitioned(sketch_index_rows(docs), path, ["kb"])


def probe_index(
    spark: SparkSession, path: str, new_docs: DataFrame, dedup_within: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Dedup an arriving shard against the persisted index with
    partition-pruned IO.

    Returns ``(hits, new_rows)``: ``hits`` = (doc_id, n_dups, dup_of,
    max_jaccard, is_unique) for the shard — same schema/semantics as
    q_dedup_incremental; ``new_rows`` = the shard's own index rows
    (for the subsequent merge). The index scan carries
    ``kb IN (<shard's buckets>)``: the bucket list is collected (≤
    N_BUCKETS ints — metadata), so the filter is static and becomes a
    PartitionFilter — directories outside the shard's key space are
    never read.

    ``dedup_within=True`` additionally blocks the shard against ITSELF
    (earlier doc_id wins), so a batch that arrives carrying its own
    near-duplicates doesn't insert both — the semantics a real
    ingestion pipeline needs, since within-batch dupes are invisible to
    the historical index. The self-join is shard × shard (increment-
    sized, not corpus-sized) on the same 8-byte blocking keys."""
    new_rows = sketch_index_rows(new_docs).cache()
    buckets = [r.kb for r in new_rows.select("kb").distinct().collect()]
    idx = (
        spark.read.parquet(path)
        .filter(F.col("kb").isin(buckets))
        .select(F.col("doc_id").alias("od"), F.col("sh64").alias("shb"), "mk")
        .withColumn("od_in_shard", F.lit(False))
    )
    kn = new_rows.select(F.col("doc_id").alias("nd"), F.col("sh64").alias("sha"), "mk")
    if dedup_within:
        # shard docs also act as candidate "older" side rows, but a
        # shard-vs-shard pair only counts when od < nd (earlier-id
        # wins) — historical pairs count in both directions
        idx = idx.unionByName(
            new_rows.select(
                F.col("doc_id").alias("od"), F.col("sh64").alias("shb"), "mk"
            ).withColumn("od_in_shard", F.lit(True))
        )
    inter = F.size(F.array_intersect("sha", "shb"))
    jac = inter.cast("double") / (F.size("sha") + F.size("shb") - inter)
    pairs = (
        kn.join(idx, "mk")
        # od != nd: a crash between merge_sketch_index and the stream
        # checkpoint commit replays a batch whose survivors are ALREADY
        # in the index — without this guard each survivor would join
        # its own index row (jaccard 1.0) and be flagged a duplicate of
        # itself on replay (ADVICE r4).
        .filter(F.col("od") != F.col("nd"))
        .filter(~F.col("od_in_shard") | (F.col("od") < F.col("nd")))
        .select("nd", "od", "sha", "shb")
        .distinct()
        .select("nd", "od", pround(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )
    agg = pairs.groupBy(F.col("nd").alias("doc_id")).agg(
        F.count("*").alias("n_dups"),
        F.min("od").alias("dup_of"),
        F.max("jaccard").alias("max_jaccard"),
    )
    hits = (
        new_docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            F.coalesce("dup_of", F.lit(-1)).cast("bigint").alias("dup_of"),
            F.coalesce("max_jaccard", F.lit(0.0)).alias("max_jaccard"),
            F.when(F.col("n_dups").isNull(), 1).otherwise(0).alias("is_unique"),
        )
    )
    return hits, new_rows


def merge_sketch_index(
    spark: SparkSession, path: str, new_rows: DataFrame
) -> None:
    """Merge surviving shard sketches into the index: dynamic partition
    overwrite of ONLY the buckets the shard touches, writing existing ⊎
    new deduped on (kb, mk, doc_id). Replay-idempotent (the dedup makes
    a second identical merge a no-op) and untouched buckets' files are
    never rewritten — maintenance cost scales with the shard."""
    new_rows = new_rows.localCheckpoint()  # sever lineage from the index read
    buckets = [r.kb for r in new_rows.select("kb").distinct().collect()]
    existing = spark.read.parquet(path).filter(F.col("kb").isin(buckets))
    merged = (
        existing.select("doc_id", "sh64", "mk", "kb")
        .unionByName(new_rows.select("doc_id", "sh64", "mk", "kb"))
        .dropDuplicates(["kb", "mk", "doc_id"])
        .localCheckpoint()  # materialize before overwriting what we read
    )
    # writer-level option, not a session conf: under foreachBatch the
    # plan may belong to a cloned session whose conf the driver session
    # cannot reach (see streaming/incremental.py's hits sink)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("kb")
        .parquet(path)
    )
    # drop the session's cached file listing for the path — a reader
    # that scanned the index before the overwrite would otherwise try
    # the deleted files (same contract as managed.py's refreshTable)
    spark.catalog.refreshByPath(path)
