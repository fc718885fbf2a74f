"""End-to-end corpus-prep pipeline: invariants across stages and the
partitioned output layout."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_corpus_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from fraud_detection_spark.pipelines.corpus_job import run_corpus_pipeline

    out = str(tmp_path / "corpus")
    rep = run_corpus_pipeline(spark, sf_dir, output_path=out, min_tokens=20)

    # monotone funnel: input >= deduped >= quality-filtered
    assert rep.n_input >= rep.n_after_dedup >= rep.n_after_quality > 0
    assert rep.total_ws_tokens > 0
    assert sum(rep.by_lang.values()) == rep.n_after_quality

    # output round-trip: partitioned by lang, stats consistent
    back = spark.read.parquet(out)
    assert back.count() == rep.n_after_quality
    assert set(back.columns) >= {"doc_id", "text", "lang", "n_ws_tokens", "fingerprint"}
    got_langs = {
        r["lang"]: r["n"] for r in back.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got_langs == rep.by_lang

    # dedup invariant: no duplicate content in the output
    n_hashes = back.select(F.md5(F.col("text").cast("binary"))).distinct().count()
    assert n_hashes == rep.n_after_quality

    # quality invariant: every surviving doc meets the token floor
    assert back.filter(F.col("n_ws_tokens") < 20).count() == 0

    # fingerprint parity with the declared operator on surviving docs
    from fraud_detection_spark.registry import load_all

    fp = load_all()["q_fingerprint"].fn(spark, sf_dir)
    joined = back.select("doc_id", "fingerprint").join(
        fp.withColumnRenamed("fp", "fp_ref"), "doc_id"
    )
    assert joined.filter(F.col("fingerprint") != F.col("fp_ref")).count() == 0


def test_corpus_dedup_no_broadcast(spark, sf_dir):
    """The keeper-pick must not broadcast anything: every input to the
    dedup stage is corpus-sized, so the plan has to be a pure shuffle
    (window keeper-pick), never a BroadcastHashJoin. (near_dedup=False
    keeps the plan static — the LSH stage is iterative/model-driven and
    checked separately.)"""
    from fraud_detection_spark.pipelines.corpus_job import clean_corpus
    from fraud_detection_spark.plans.checks import assert_no_broadcast_join

    assert_no_broadcast_join(clean_corpus(spark, sf_dir, near_dedup=False))


def test_corpus_near_dedup_drops_cluster_members(spark, sf_dir):
    """With near-dedup on, the surviving corpus must contain no two
    docs from the same near-dup cluster, and every surviving doc must
    be its cluster's keeper."""
    from fraud_detection_spark.operators.dedup import q_dedup_doc_cluster
    from fraud_detection_spark.pipelines.corpus_job import clean_corpus

    corpus = clean_corpus(spark, sf_dir, near_dedup=True)
    clusters = q_dedup_doc_cluster(spark, sf_dir)
    joined = corpus.select("doc_id").join(clusters, "doc_id")
    assert joined.filter(F.col("is_keeper") == 0).count() == 0
    n_wo = clean_corpus(spark, sf_dir, near_dedup=False).count()
    assert corpus.count() <= n_wo


def test_corpus_pipeline_with_decontam_and_mix(spark, sf_dir, tmp_path):
    """Full pretraining prep: dedup -> quality -> decontamination ->
    temperature mix. Funnel stays monotone through the new stages, no
    contaminated/eval doc survives, and the mix keeps the smallest
    language of the cleaned corpus whole."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.operators.corpus import _EVAL_MOD
    from fraud_detection_spark.pipelines.corpus_job import run_corpus_pipeline
    from fraud_detection_spark.registry import load_all

    out = str(tmp_path / "corpus_full")
    rep = run_corpus_pipeline(
        spark,
        sf_dir,
        output_path=out,
        min_tokens=20,
        decontaminate=True,
        mix_temperature=2.0,
    )
    assert (
        rep.n_input
        >= rep.n_after_dedup
        >= rep.n_after_quality
        >= rep.n_after_decontam
        >= rep.n_after_mix
        > 0
    )
    back = spark.read.parquet(out)
    assert back.count() == rep.n_after_mix
    assert sum(rep.by_lang.values()) == rep.n_after_mix

    # no eval doc and no contaminated doc in the output
    assert back.filter(F.col("doc_id") % _EVAL_MOD == 0).count() == 0
    contaminated = (
        load_all()["q_decontaminate"]
        .fn(spark, sf_dir)
        .filter(F.col("contaminated") == 1)
        .select("doc_id")
    )
    assert back.join(contaminated, "doc_id", "left_semi").count() == 0
