"""Incremental dedup (operators/incremental.py): the persisted-index
path must equal the declared side-effect-free query AND a full-corpus
recompute, probes must partition-prune, and merges must be
replay-idempotent.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fraud_detection_spark.operators.incremental import (
    _INC_MOD,
    build_sketch_index,
    merge_sketch_index,
    probe_index,
    sketch_index_rows,
)
from fraud_detection_spark.registry import load_all
from fraud_detection_spark.sources import load_table

REGISTRY = load_all()


@pytest.fixture()
def split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _INC_MOD == 0
    return d.filter(~is_new), d.filter(is_new)


def test_incremental_matches_cross_boundary_jaccard(spark, sf_dir):
    """The declared query's pair semantics == q_dedup_jaccard's exact
    full-corpus pairs restricted to cross-boundary (blocking is
    symmetric, so candidate sets agree)."""
    pairs = REGISTRY["q_dedup_jaccard"].fn(spark, sf_dir).toPandas()
    inc = REGISTRY["q_dedup_incremental"].fn(spark, sf_dir).toPandas()
    cross = pairs[(pairs.doc_a % _INC_MOD == 0) != (pairs.doc_b % _INC_MOD == 0)]
    want: dict[int, list[tuple[int, float]]] = {}
    for r in cross.itertuples():
        nd, od = (r.doc_a, r.doc_b) if r.doc_a % _INC_MOD == 0 else (r.doc_b, r.doc_a)
        want.setdefault(nd, []).append((od, r.jaccard))
    flagged = inc[inc.is_unique == 0]
    assert set(flagged.doc_id) == set(want)
    for r in flagged.itertuples():
        ods = want[r.doc_id]
        assert r.n_dups == len(ods)
        assert r.dup_of == min(o for o, _ in ods)
        assert r.max_jaccard == max(j for _, j in ods)
    # the split must exercise both outcomes at every sf
    assert (inc.is_unique == 1).any()


def test_probe_index_equals_declared_query(spark, sf_dir, tmp_path, split):
    hist, new = split
    path = str(tmp_path / "sketch_index")
    build_sketch_index(spark, hist, path)
    hits, _ = probe_index(spark, path, new)
    got = hits.toPandas().sort_values("doc_id").reset_index(drop=True)
    want = (
        REGISTRY["q_dedup_incremental"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_probe_partition_prunes(spark, sf_dir, tmp_path, split):
    """The probe's index scan must carry the bucket filter as a
    PartitionFilter (directory pruning), not a post-scan filter."""
    hist, new = split
    path = str(tmp_path / "sketch_index")
    build_sketch_index(spark, hist, path)
    # a tiny shard (3 docs) hits few buckets, so pruning is observable
    tiny = new.orderBy("doc_id").limit(3)
    hits, new_rows = probe_index(spark, path, tiny)
    plan = hits._sc._jvm.PythonSQLUtils.explainString(
        hits._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [kb" in plan.replace("`", ""), plan
    n_buckets = new_rows.select("kb").distinct().count()
    assert n_buckets < 64, "tiny shard should not touch every bucket"


def test_merge_then_recompute_equality_and_idempotency(
    spark, sf_dir, tmp_path, split
):
    """increment-then-merge == full recompute over (historical ∪ unique
    new docs), and replaying the merge is a no-op."""
    hist, new = split
    path = str(tmp_path / "sketch_index")
    build_sketch_index(spark, hist, path)
    hits, new_rows = probe_index(spark, path, new)
    # materialize: keep/surviving are lazy over the PRE-merge index
    # files, which the merge is about to overwrite
    keep = hits.filter(F.col("is_unique") == 1).select("doc_id").localCheckpoint()
    surviving = new_rows.join(keep, "doc_id").localCheckpoint()
    merge_sketch_index(spark, path, surviving)

    merged = spark.read.parquet(path).select("kb", "mk", "doc_id", "sh64")
    full = sketch_index_rows(
        hist.unionByName(new.join(keep, "doc_id"))
    ).select("kb", "mk", "doc_id", "sh64")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0

    # replay: identical second merge changes nothing
    n1 = merged.count()
    merge_sketch_index(spark, path, surviving)
    again = spark.read.parquet(path).select("kb", "mk", "doc_id", "sh64")
    assert again.count() == n1
    assert again.exceptAll(full).count() == 0


def test_probe_dedup_within_shard(spark, sf_dir, tmp_path):
    """A shard that carries its own near-duplicates: with
    dedup_within=True the later shard doc is flagged against the
    earlier one (earlier-id wins) on top of any historical matches;
    with the default False, shard-internal pairs are invisible."""
    pairs = REGISTRY["q_dedup_jaccard"].fn(spark, sf_dir).toPandas()
    assert len(pairs), "corpus has no near-dup pairs; fixture degenerate"
    docs = load_table(spark, sf_dir, "documents")
    a, b = int(pairs.iloc[0].doc_a), int(pairs.iloc[0].doc_b)
    shard_ids = {a, b} | set(
        r.doc_id for r in docs.select("doc_id").orderBy("doc_id").limit(3).collect()
    ) - {a, b}
    shard = docs.filter(F.col("doc_id").isin(list(shard_ids)))
    hist = docs.filter(~F.col("doc_id").isin(list(shard_ids)))
    path = str(tmp_path / "sketch_index")
    build_sketch_index(spark, hist, path)

    # expected dup partners per shard doc from the exact full pair set
    partners: dict[int, list[tuple[int, float]]] = {x: [] for x in shard_ids}
    for r in pairs.itertuples():
        for x, o in ((r.doc_a, r.doc_b), (r.doc_b, r.doc_a)):
            if x in shard_ids:
                in_shard = o in shard_ids
                partners[x].append((o, r.jaccard, in_shard))

    hits_w, _ = probe_index(spark, path, shard, dedup_within=True)
    got = {r.doc_id: r for r in hits_w.collect()}
    assert set(got) == shard_ids
    for x in shard_ids:
        want = [
            (o, j)
            for o, j, in_shard in partners[x]
            if (not in_shard) or o < x
        ]
        assert got[x].n_dups == len(want), (x, got[x], want)
        if want:
            assert got[x].dup_of == min(o for o, _ in want)
            assert got[x].max_jaccard == max(j for _, j in want)
            assert got[x].is_unique == 0
    # the later end of the chosen pair must actually be flagged via the
    # within-shard path
    assert got[b].n_dups >= 1

    hits_wo, _ = probe_index(spark, path, shard, dedup_within=False)
    got_wo = {r.doc_id: r for r in hits_wo.collect()}
    for x in shard_ids:
        want = [(o, j) for o, j, in_shard in partners[x] if not in_shard]
        assert got_wo[x].n_dups == len(want), (x, got_wo[x], want)


def test_streaming_incremental_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Shards arriving through the stream (probe -> hits -> merge per
    micro-batch) must leave the index and hit records identical to
    running the batch probe/merge sequence by hand, and replaying the
    drained stream must be a no-op (checkpoint + idempotent merge)."""
    from fraud_detection_spark.streaming.incremental import (
        run_incremental_dedup_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    shard1 = docs.filter(F.col("doc_id") % 3 == 1)
    shard2 = docs.filter(F.col("doc_id") % 3 == 2)

    # streaming run: two availableNow drains, one shard landing each
    s_index = str(tmp_path / "s_index")
    s_results = str(tmp_path / "s_results")
    ckpt = str(tmp_path / "ckpt")
    inbox = str(tmp_path / "inbox")
    build_sketch_index(spark, hist, s_index)
    shard1.coalesce(1).write.mode("append").parquet(inbox)
    run_incremental_dedup_stream(spark, inbox, s_index, s_results, ckpt)
    shard2.coalesce(1).write.mode("append").parquet(inbox)
    run_incremental_dedup_stream(spark, inbox, s_index, s_results, ckpt)

    # batch reference: same shards, same order, by hand
    from fraud_detection_spark.operators.incremental import merge_sketch_index

    b_index = str(tmp_path / "b_index")
    build_sketch_index(spark, hist, b_index)
    b_hits = []
    for shard in (shard1, shard2):
        hits, new_rows = probe_index(spark, b_index, shard, dedup_within=True)
        hits = hits.localCheckpoint()
        keep = hits.filter(F.col("is_unique") == 1).select("doc_id")
        surviving = new_rows.join(keep, "doc_id").localCheckpoint()
        b_hits.append(hits.toPandas())
        merge_sketch_index(spark, b_index, surviving)

    s_idx = spark.read.parquet(s_index).select("kb", "mk", "doc_id", "sh64")
    b_idx = spark.read.parquet(b_index).select("kb", "mk", "doc_id", "sh64")
    assert s_idx.exceptAll(b_idx).count() == 0
    assert b_idx.exceptAll(s_idx).count() == 0

    got = (
        spark.read.parquet(s_results)
        .drop("batch_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        pd.concat(b_hits).sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # replay the drained stream: checkpoint skips everything
    n_results = spark.read.parquet(s_results).count()
    n_index = s_idx.count()
    run_incremental_dedup_stream(spark, inbox, s_index, s_results, ckpt)
    assert spark.read.parquet(s_results).count() == n_results
    assert spark.read.parquet(s_index).count() == n_index


def test_crash_replay_mid_batch_is_idempotent(spark, sf_dir, tmp_path):
    """ADVICE r4: a crash can land AFTER merge_sketch_index committed
    but BEFORE the stream checkpoint — the replay then re-probes an
    index that already contains the shard's survivors and re-runs the
    hits write. The replay must reproduce the original results exactly:
    no survivor may match its own merged index row (od != nd guard) and
    the hits sink must overwrite, not append, its batch partition."""
    from fraud_detection_spark.streaming.incremental import dedup_batch

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    shard = docs.filter(F.col("doc_id") % 3 == 1)
    index = str(tmp_path / "index")
    results = str(tmp_path / "results")
    build_sketch_index(spark, hist, index)

    dedup_batch(spark, shard, 0, index, results)
    first = (
        spark.read.parquet(results)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n_index = spark.read.parquet(index).count()
    assert (first.is_unique == 1).any(), "degenerate shard: nothing survived"

    # replay the SAME batch — all effects already committed
    dedup_batch(spark, shard, 0, index, results)
    again = (
        spark.read.parquet(results)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, first)
    assert spark.read.parquet(index).count() == n_index
    # specifically: no doc flagged as a duplicate of itself
    assert (again.dup_of != again.doc_id).all()
