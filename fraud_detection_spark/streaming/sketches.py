"""Streaming count-min sketch — the arrival form of q_countmin
(operators/scale.py): document shards land as files, each micro-batch
folds its tokens into a CMS partial, and the persisted sketch is the
elementwise SUM of the partials. Because CMS cells are plain integer
counters, the merge is exact addition — the streamed sketch is
BIT-IDENTICAL to the one q_countmin builds over the whole corpus in
batch (test-asserted), the strongest possible stream/batch parity.

Exactly-once effect without a state store: each micro-batch writes its
partial partitioned by its own batch_id with dynamic-partition
overwrite, so a checkpoint-replayed batch REPLACES its partition with
identical rows instead of double-counting (the same idempotence
pattern as streaming/incremental.py's hits sink). The live sketch is
an aggregate over the partial partitions — ≤ batches × d×w rows, KBs;
``compact_cms`` folds history into one partition when the partial
count grows.

Reference parity: the reference's worker counts events into Prometheus
counters (xai_tasks.py:48-50) — additive, restart-merged metrics; this
is the same additive-counter discipline applied to a content sketch.

Scale posture: the per-batch fold is a map-side-combinable aggregate
of the shard only; sketch IO is O(d×w) per batch regardless of corpus
size. At 100 TB the sketch answers "top tokens so far" at any moment
without ever materializing a vocabulary table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.operators.scale import (
    _cms_rows,
    cms_bucket,
    cms_cells,
    token_counts,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def cms_batch(batch_df: DataFrame, batch_id: int, sketch_path: str) -> None:
    """Fold one micro-batch into its own partial-sketch partition.
    Dynamic partition overwrite => replay-idempotent."""
    spark = batch_df.sparkSession
    cells = cms_cells(spark, token_counts(batch_df)).withColumn(
        "batch_id", F.lit(int(batch_id))
    )
    (
        cells.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(sketch_path)
    )


def read_cms(spark: SparkSession, sketch_path: str) -> DataFrame:
    """Current merged sketch: elementwise sum of all partials."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("j", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def compact_cms(spark: SparkSession, sketch_path: str) -> None:
    """Fold all partial partitions into a single batch_id=-1 partition
    (read -> localCheckpoint to sever lineage -> full overwrite).
    Merged totals are unchanged — addition is associative."""
    merged = read_cms(spark, sketch_path).withColumn(
        "batch_id", F.lit(-1)
    ).localCheckpoint()
    merged.write.mode("overwrite").partitionBy("batch_id").parquet(sketch_path)
    spark.catalog.refreshByPath(sketch_path)


def cms_estimate(
    spark: SparkSession, sketch_path: str, tokens: DataFrame
) -> DataFrame:
    """Point estimates for a token table (column ``w``): min over the
    d hashed cells — never an undercount, same math as q_countmin's
    probe stage."""
    js = _cms_rows(spark)
    probe = tokens.select("w").distinct().crossJoin(F.broadcast(js)).select(
        "w", "j", cms_bucket(F.col("w"), F.col("j")).alias("b")
    )
    cells = read_cms(spark, sketch_path)
    return (
        probe.join(cells, ["j", "b"], "left")
        .groupBy("w")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("n_est"))
    )


def run_cms_stream(
    spark: SparkSession,
    docs_dir: str,
    sketch_path: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Consume JSON document files and fold each micro-batch into the
    persisted sketch; availableNow drains the backlog and stops."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="fds-cms-ckpt-")
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.json(docs_dir)
        .writeStream.foreachBatch(
            lambda bdf, bid: cms_batch(bdf, bid, sketch_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
