"""End-to-end training-data preparation pipeline over ``documents`` —
the composition the LLM-data mandate describes, built entirely from
this engine's operators:

    scan -> exact dedup (content-hash, deterministic keeper)
         -> NEAR-dup removal (exact-Jaccard pairs -> connected
            components -> min-doc_id keeper per cluster)
         -> quality filter (token/stopword heuristics)
         -> benchmark decontamination (optional: drop eval docs and
            any train doc sharing an 8-gram with the eval set)
         -> temperature domain mix (optional: resample languages at
            (n_min/n_l)^(1-1/T) — the q_domain_mix_temp recipe over
            the CLEANED corpus counts)
         -> token accounting (whitespace + BPE-ish counts)
         -> fingerprint (polynomial rolling hash)
         -> partitioned write (hive layout by lang -> partition
            pruning for per-language training runs)

Every stage is a narrow transformation or a hash aggregate; the only
shuffles are the dedup group-by (16-byte md5 keys) and the final
write's partition split. At 100 TB this runs as one job per stage
boundary with no driver involvement; the report is a handful of
scalars via one aggregate pass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fraud_detection_spark.operators.text import STOPWORDS
from fraud_detection_spark.sources import load_table


@dataclass
class CorpusReport:
    n_input: int
    n_after_dedup: int
    n_after_quality: int
    total_ws_tokens: int
    by_lang: dict[str, int]
    output_path: str | None
    n_after_decontam: int | None = None
    n_after_mix: int | None = None


def quality_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = 20,
    near_dedup: bool = True,
) -> DataFrame:
    """Stages up to and including the quality filter (exact dedup ->
    near-dedup -> quality) — the boundary every optional downstream
    stage (decontamination, mixing) builds on. Split out so
    run_corpus_pipeline can cache THIS one DataFrame and derive all
    stage counts from the same plan instead of re-running the dedup
    cascade per count."""
    d = load_table(spark, sf_dir, "documents")

    # exact dedup: deterministic keeper = min doc_id per content hash.
    # One shuffle on the 16-byte hash key; no join and nothing broadcast —
    # the keeper table is corpus-sized, so a broadcast would OOM at scale.
    hashed = d.withColumn("text_hash", F.md5(F.col("text").cast("binary")))
    keeper_rank = Window.partitionBy("text_hash").orderBy("doc_id")
    deduped = (
        hashed.withColumn("_rn", F.row_number().over(keeper_rank))
        .filter(F.col("_rn") == 1)
        .select(*d.columns, "text_hash")
    )

    # near-dup removal: transitive clusters from MinHash-LSH pairs, one
    # min-doc_id keeper per cluster. Exact duplicates are Jaccard-1.0
    # pairs, so their cluster keeper coincides with the exact-dedup
    # keeper above — the semi join only removes additional NEAR dups.
    # Shuffle join on doc_id (keeper set is corpus-sized: no broadcast).
    if near_dedup:
        from fraud_detection_spark.operators.dedup import q_dedup_doc_cluster

        keepers = (
            q_dedup_doc_cluster(spark, sf_dir)
            .filter(F.col("is_keeper") == 1)
            .select("doc_id")
        )
        deduped = deduped.join(keepers, "doc_id", "left_semi")

    # quality heuristics (same expressions as q_quality_score)
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    quality = deduped.withColumn("n_ws_tokens", n_tok.cast("bigint")).withColumn(
        "passes_quality", (n_tok >= min_tokens) & (n_stop > 0)
    )
    return quality.filter(F.col("passes_quality")).drop("passes_quality")


def decontaminate_stage(spark: SparkSession, sf_dir: str, df: DataFrame) -> DataFrame:
    """Benchmark decontamination: drop the held-out eval docs AND every
    train doc sharing an 8-gram with them (q_decontaminate's
    broadcast-join-first plan; its output is already eval-free, so the
    semi join removes both populations in one pass)."""
    from fraud_detection_spark.operators.corpus import q_decontaminate

    clean_ids = (
        q_decontaminate(spark, sf_dir)
        .filter(F.col("contaminated") == 0)
        .select("doc_id")
    )
    return df.join(clean_ids, "doc_id", "left_semi")


def mix_stage(df: DataFrame, mix_temperature: float) -> DataFrame:
    """Temperature domain mix over the CLEANED corpus's language counts
    (not the raw table's — mixing after filtering is what a training
    recipe consumes). Same closed-form rate + md5-uniform acceptance as
    q_domain_mix_temp, including its 12-dp rate rounding (pow is not
    correctly-rounded libm math): deterministic, broadcast-only."""
    from fraud_detection_spark.functions import pround
    from fraud_detection_spark.operators.sampling import _u_expr

    counts = df.groupBy("lang").agg(F.count("*").alias("cnt"))
    nmin = counts.agg(F.min("cnt").alias("nmin"))
    rate = pround(
        F.pow(
            F.col("nmin").cast("double") / F.col("cnt"),
            F.lit(1.0 - 1.0 / mix_temperature),
        ),
        12,
    )
    return (
        df.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(nmin))
        .filter(_u_expr("doc_id") < rate)
        .drop("cnt", "nmin")
    )


def fingerprint_stage(df: DataFrame) -> DataFrame:
    """Content fingerprint for downstream near-dup passes (polynomial
    rolling hash over the token stream)."""
    w = F.split("text", " ")
    vals = F.transform(w, lambda t: (F.ascii(t) + F.length(t)).cast("bigint"))
    fp = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda h, x: (h * 31 + x) % 1000000007,
    )
    return df.withColumn("fingerprint", fp)


def clean_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = 20,
    near_dedup: bool = True,
    decontaminate: bool = False,
    mix_temperature: float | None = None,
) -> DataFrame:
    """documents -> deduped, quality-filtered corpus with token stats
    and a content fingerprint (all columns the downstream trainer
    needs; no payload leaves the executors)."""
    filtered = quality_corpus(
        spark, sf_dir, min_tokens=min_tokens, near_dedup=near_dedup
    )
    if decontaminate:
        filtered = decontaminate_stage(spark, sf_dir, filtered)
    if mix_temperature is not None:
        filtered = mix_stage(filtered, mix_temperature)
    return fingerprint_stage(filtered)


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    output_path: str | None = None,
    min_tokens: int = 20,
    near_dedup: bool = True,
    decontaminate: bool = False,
    mix_temperature: float | None = None,
) -> CorpusReport:
    d = load_table(spark, sf_dir, "documents")
    n_input = d.count()
    n_after_dedup = d.select(F.md5(F.col("text").cast("binary"))).distinct().count()

    # One pipeline, counted at its stage boundaries: the quality-stage
    # DataFrame (downstream of the expensive dedup cascade) is cached
    # once and every optional stage builds on the SAME plan — the
    # funnel report costs cheap recounts of cached rows, not two extra
    # re-executions of the MinHash/connected-components dedup per
    # enabled stage (ADVICE r4). At 100 TB the cache() becomes a
    # persisted boundary write; the shape is identical.
    extra = decontaminate or (mix_temperature is not None)
    base = quality_corpus(spark, sf_dir, min_tokens=min_tokens, near_dedup=near_dedup)
    if extra:
        base = base.cache()
    n_quality = base.count() if extra else None

    staged = base
    n_after_decontam = None
    if decontaminate:
        staged = decontaminate_stage(spark, sf_dir, staged)
        n_after_decontam = staged.count()
    if mix_temperature is not None:
        staged = mix_stage(staged, mix_temperature)
    corpus = fingerprint_stage(staged)

    stats = corpus.agg(
        F.count("*").alias("n"),
        F.sum("n_ws_tokens").alias("toks"),
    ).collect()[0]
    by_lang = {
        r["lang"]: r["n"]
        for r in corpus.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    if output_path:
        corpus.write.mode("overwrite").partitionBy("lang").parquet(output_path)
    if extra:
        base.unpersist()
    return CorpusReport(
        n_input=n_input,
        n_after_dedup=n_after_dedup,
        n_after_quality=int(n_quality) if n_quality is not None else int(stats["n"]),
        total_ws_tokens=int(stats["toks"] or 0),
        by_lang=by_lang,
        output_path=output_path,
        n_after_decontam=n_after_decontam,
        n_after_mix=int(stats["n"]) if mix_temperature is not None else None,
    )
