"""Streaming incremental dedup — the arrival form of
operators/incremental.py: document shards land as files, each
micro-batch is probed against the persisted sketch index
(partition-pruned) and the surviving sketches are MERGEd back, so the
next shard sees them. Exactly-once effect through checkpointing +
idempotent effects in BOTH sinks, covering a crash at any point in the
batch: the merge dedupes on (kb, mk, doc_id) so re-merging is a no-op;
the hits sink dynamic-partition-overwrites the batch's own batch_id
partition so a replayed write replaces rather than appends; and
probe_index's od != nd guard keeps a replayed probe correct even after
the merge already committed the shard's survivors (each doc would
otherwise match its own index row at jaccard 1.0).

Reference parity: this is EP2's consume-check-upsert loop
(/root/reference/xai_tasks.py:63-167 acks_late + get-or-create upsert;
/root/reference/api/worker.py:90-95 ON CONFLICT) with the "store" being
the corpus dedup index instead of a results table.

Scale posture: inherits operators/incremental.py's properties — probe
IO is partition-pruned to the shard's key buckets, merges rewrite only
touched buckets, document text never shuffles. Backpressure via
maxFilesPerTrigger; state lives in the index files, not the stream
state store (restart-safe by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.operators.incremental import (
    merge_sketch_index,
    probe_index,
)

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def dedup_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int, index_path: str, results_path: str
) -> None:
    """One micro-batch: probe (within-shard dedup on — an arriving
    batch can carry its own dupes), record hits, merge survivors."""
    if batch_df.isEmpty():
        return
    hits, new_rows = probe_index(spark, index_path, batch_df, dedup_within=True)
    # materialize before the merge overwrites the index files both
    # plans read (same discipline as the batch tests)
    hits = hits.localCheckpoint()
    keep = hits.filter(F.col("is_unique") == 1).select("doc_id")
    surviving = new_rows.join(keep, "doc_id").localCheckpoint()
    # Idempotent hits sink: each batch owns its batch_id partition and a
    # replay overwrites it with identical rows (dynamic partition
    # overwrite — the canonical foreachBatch exactly-once pattern). An
    # append sink would double the rows whenever a crash lands between
    # this write and the checkpoint commit. The mode is a WRITER option,
    # not a session conf: foreachBatch hands the batch a cloned session,
    # so a conf set on the driver session would silently not apply and
    # the overwrite would drop every other batch's partition.
    (
        hits.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(results_path)
    )
    merge_sketch_index(spark, index_path, surviving)


def run_incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    results_path: str,
    checkpoint: str,
) -> None:
    """Drain all currently-available shard files (availableNow) through
    the probe+merge loop. Call again after more shards land — the
    checkpoint skips already-processed files, so replays are no-ops."""
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: dedup_batch(spark, df, bid, index_path, results_path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
