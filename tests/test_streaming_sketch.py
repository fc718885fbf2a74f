"""Streaming count-min sketch (streaming/sketches.py): the streamed,
per-batch-merged sketch must be BIT-IDENTICAL to the batch-built one —
CMS cells are integer counters, so the partial merge is exact
addition, and stream/batch parity is equality, not approximation."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_spark.operators.scale import cms_cells, token_counts
from fraud_detection_spark.sources import load_table
from fraud_detection_spark.streaming.sketches import (
    cms_batch,
    cms_estimate,
    compact_cms,
    read_cms,
    run_cms_stream,
)


def _cells_dict(df):
    return {(r.j, r.b): r.cnt for r in df.collect()}


def test_streamed_cms_equals_batch_cms(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    docs_dir = str(tmp_path / "docs")
    docs.repartition(4).write.json(docs_dir)
    sketch = str(tmp_path / "sketch")
    run_cms_stream(
        spark, docs_dir, sketch, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    streamed = _cells_dict(read_cms(spark, sketch))
    batch = _cells_dict(cms_cells(spark, token_counts(docs)))
    assert streamed == batch
    # multiple real micro-batches actually happened
    n_parts = (
        spark.read.parquet(sketch).select("batch_id").distinct().count()
    )
    assert n_parts >= 2

    # estimates over the streamed sketch match q_countmin's (same
    # probe math, same cells)
    from fraud_detection_spark.registry import load_all

    want = {
        r.token: r.n_est
        for r in load_all()["q_countmin"].fn(spark, sf_dir).collect()
    }
    toks = spark.createDataFrame([(t,) for t in want], "w string")
    got = {r.w: r.n_est for r in cms_estimate(spark, sketch, toks).collect()}
    assert got == want

    # an empty micro-batch adds nothing (dynamic overwrite touches no
    # partition when the partial is empty)
    assert spark.read.parquet(sketch).filter(F.col("batch_id") == 0).count() > 0
    cms_batch(docs.limit(0), 999, sketch)
    spark.catalog.refreshByPath(sketch)
    assert _cells_dict(read_cms(spark, sketch)) == batch

    # compaction folds partials without changing totals
    compact_cms(spark, sketch)
    assert _cells_dict(read_cms(spark, sketch)) == batch
    assert (
        spark.read.parquet(sketch).select("batch_id").distinct().count() == 1
    )


def test_cms_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Writing the same batch twice with the same batch_id leaves the
    sketch unchanged — the foreachBatch replay contract."""
    docs = load_table(spark, sf_dir, "documents")
    sketch = str(tmp_path / "sketch2")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    cms_batch(half, 0, sketch)
    spark.catalog.refreshByPath(sketch)
    before = _cells_dict(read_cms(spark, sketch))
    cms_batch(half, 0, sketch)  # replay
    spark.catalog.refreshByPath(sketch)
    assert _cells_dict(read_cms(spark, sketch)) == before
    # a genuinely new batch does change it
    cms_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, sketch)
    spark.catalog.refreshByPath(sketch)
    after = _cells_dict(read_cms(spark, sketch))
    assert after == _cells_dict(cms_cells(spark, token_counts(docs)))


def test_compact_then_replay_does_not_double_count(spark, sf_dir, tmp_path):
    """Round-7 ADVICE race: batch N's sink write lands, compaction
    folds it into batch_id=-1, the checkpoint never committed, so the
    restarted stream REPLAYS batch N. Without the compaction watermark
    the replay lands in a fresh batch_id=N partition whose counts are
    already inside -1 — double count. With it, the replay is skipped."""
    from fraud_detection_spark.streaming.sketches import compacted_watermark

    docs = load_table(spark, sf_dir, "documents")
    sketch = str(tmp_path / "sketch3")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    cms_batch(even, 0, sketch)
    cms_batch(odd, 1, sketch)  # written to sink, checkpoint NOT committed
    spark.catalog.refreshByPath(sketch)
    truth = _cells_dict(cms_cells(spark, token_counts(docs)))
    assert _cells_dict(read_cms(spark, sketch)) == truth

    compact_cms(spark, sketch)
    assert compacted_watermark(sketch) == 1
    cms_batch(odd, 1, sketch)  # restart replays batch 1 -> must skip
    spark.catalog.refreshByPath(sketch)
    assert _cells_dict(read_cms(spark, sketch)) == truth

    # post-compaction batches still fold in normally
    cms_batch(even, 2, sketch)
    spark.catalog.refreshByPath(sketch)
    merged = _cells_dict(read_cms(spark, sketch))
    even_cells = _cells_dict(cms_cells(spark, token_counts(even)))
    assert merged == {
        k: truth[k] + even_cells.get(k, 0) for k in truth
    }


def test_watermark_survives_next_compaction_overwrite(spark, sf_dir, tmp_path):
    """Round-8 ADVICE: the watermark sidecar used to live INSIDE the
    sketch directory, which compact_cms fully overwrites — a crash
    between the overwrite commit and the sidecar rewrite dropped ALL
    prior watermarks. Now the sidecar is a sibling of the directory:
    simulate the crash by deleting everything the overwrite deletes
    (the directory contents) right after a compaction and assert the
    watermark is still visible. Also: a legacy in-directory sidecar is
    still honored, and max(prior, hi) never regresses."""
    import shutil

    from fraud_detection_spark.streaming.sketches import (
        _legacy_watermark_path,
        _watermark_path,
        compacted_watermark,
    )

    docs = load_table(spark, sf_dir, "documents")
    sketch = str(tmp_path / "sketch4")
    cms_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, sketch)
    cms_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, sketch)
    spark.catalog.refreshByPath(sketch)
    compact_cms(spark, sketch)
    assert compacted_watermark(sketch) == 1

    # the crash window: the overwrite has deleted the directory, the
    # sidecar rewrite has not happened yet — prior watermarks must
    # survive because they live OUTSIDE the deleted tree
    shutil.rmtree(sketch)
    assert compacted_watermark(sketch) == 1

    # replayed batch <= watermark is still skipped after the "crash"
    cms_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, sketch)
    import os

    assert not os.path.exists(sketch)  # skip happened before any write

    # legacy in-directory sidecar still honored (max of both wins)
    cms_batch(docs.filter(F.col("doc_id") % 2 == 0), 5, sketch)
    os.makedirs(sketch, exist_ok=True)
    with open(_legacy_watermark_path(sketch), "w") as fh:
        fh.write("7")
    assert compacted_watermark(sketch) == 7
    # a new compaction advances the sibling sidecar to max(prior, hi)
    compact_cms(spark, sketch)
    assert compacted_watermark(sketch) == 7
    with open(_watermark_path(sketch)) as fh:
        assert int(fh.read()) == 7
