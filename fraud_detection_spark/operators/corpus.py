"""Corpus-curation operators — the remaining training-data-pipeline
surface a 100 TB pretraining job runs between dedup and tokenization:
benchmark decontamination (n-gram overlap against an eval set), domain
mixture rebalancing, corpus-length percentiles, and sketch-based
approximate distinct counts.

Reference parity: the reference pipeline has no corpus stage (it is a
tabular fraud pipeline); these extend the engine's LLM-data family
(SURVEY.md §2i / VERDICT round-2 "LLM-data-pipeline operators" table)
alongside operators/dedup.py, text.py and sampling.py.

Scale posture:
- decontamination broadcasts the *eval-set* n-gram fingerprints (eval
  benchmarks are MBs, the corpus is TBs) and joins the corpus grams
  against them BEFORE any shuffle: the broadcast hash join is map-side
  and discards every non-hit gram, so the only exchange carries the
  actual hits (near-zero rows at 100 TB). Grams travel as 64-bit
  xxhash64 fingerprints (8 bytes, not ~50-byte strings); a cross-doc
  false hit needs a 2^-64 collision.
- domain mixing computes per-source rates from a tiny aggregate (one
  row per source) broadcast back against the corpus; acceptance is the
  same deterministic md5-uniform used by operators/sampling.py, so the
  mix is reproducible under retries and incremental corpus growth.
- percentiles use PERCENTILE_DISC: the result is an actual corpus
  element (integer), not an interpolated double — order-free and
  bit-exact across engines, unlike interpolated quantiles whose
  floating interpolation formula differs between engines.
(Sketch aggregates — HLL approx-distinct, approximate quantiles — live
in operators/scale.py; the percentiles here are the *exact* integer
PERCENTILE_DISC twin, which is oracle-checkable.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import pround
from fraud_detection_spark.operators.sampling import _u_expr, _u_sql
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

# Word n-gram width for decontamination. Real pipelines use 8-13-word
# grams (WMDP/GPT-3 style); 8 keeps the synthetic ~30-word-vocab docs
# from matching on pure chance while still producing real overlaps.
_NGRAM = 8

# Deterministic "eval benchmark" split: every 17th doc plays the role
# of a held-out benchmark document the corpus must be scrubbed against.
_EVAL_MOD = 17


def _gram_expr(col: str) -> str:
    """Spark SQL expression producing the array of word 8-grams.

    sequence(1, n) REVERSES when n < 1 (it steps -1), so short docs
    must be guarded to an empty array explicitly — DuckDB's range()
    is empty for the same bounds and needs no guard.
    """
    return (
        f"CASE WHEN size({col}) >= {_NGRAM} THEN "
        f"transform(sequence(1, size({col}) - {_NGRAM - 1}), "
        f"i -> concat_ws(' ', slice({col}, i, {_NGRAM}))) "
        "ELSE array() END"
    )


@query(
    "q_decontaminate",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        "g AS (SELECT doc_id, unnest(list_transform("
        f"range(1, len(w) - {_NGRAM - 2}), "
        f"i -> array_to_string(w[i:i+{_NGRAM - 1}], ' '))) AS g FROM w), "
        f"eg AS (SELECT DISTINCT g FROM g WHERE doc_id % {_EVAL_MOD} = 0), "
        "tg AS (SELECT DISTINCT doc_id, g FROM g "
        f"WHERE doc_id % {_EVAL_MOD} <> 0), "
        "hits AS (SELECT doc_id, COUNT(*) AS n FROM tg JOIN eg USING (g) "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_shared_ngrams, "
        "CASE WHEN COALESCE(hits.n, 0) > 0 THEN 1 ELSE 0 END AS contaminated "
        "FROM documents d LEFT JOIN hits USING (doc_id) "
        f"WHERE d.doc_id % {_EVAL_MOD} <> 0"
    ),
    tags=("corpus", "text", "decontamination"),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 8-gram with the held-out eval set (GPT-3 §C / RefinedWeb-style
    n-gram scrubbing).

    Plan: both sides explode word 8-grams and fingerprint them with
    xxhash64 (8-byte join keys). The eval fingerprint set is DISTINCTed
    and **broadcast** — at 100 TB the eval benchmarks are MBs while the
    corpus is the big side. The corpus grams hit the broadcast hash
    join *first* (map-side, no shuffle), so every non-matching gram —
    ~all of them at scale — is discarded before any exchange; the only
    shuffle is the count-distinct over actual hits, which is near-zero
    rows regardless of corpus size. (Join-first ≡ distinct-first: the
    per-doc distinct-hit count only depends on the hit subset, and
    countDistinct dedups post-join. Catalyst will not push a join
    through an Aggregate, so the ordering is hand-chosen.) A false
    positive requires an xxhash64 collision between two distinct grams
    (~2^-64); the DuckDB oracle joins the raw gram strings and the
    stress suite pins exact equality.
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    grams = w.select(
        "doc_id", F.explode(F.expr(_gram_expr("w"))).alias("g")
    ).select("doc_id", F.xxhash64("g").alias("g64"))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_g = grams.filter(is_eval).select("g64").distinct()
    hits = (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_g), "g64")
        .groupBy("doc_id")
        .agg(F.count_distinct("g64").alias("n"))
    )
    return (
        d.filter(~is_eval)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_shared_ngrams"),
            F.when(F.coalesce("n", F.lit(0)) > 0, 1).otherwise(0).alias("contaminated"),
        )
    )


@query(
    "q_substring_dedup",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        "g AS (SELECT doc_id, unnest(list_transform("
        f"range(1, len(w) - {_NGRAM - 2}), "
        f"i -> array_to_string(w[i:i+{_NGRAM - 1}], ' '))) AS g FROM w), "
        "xdoc AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd "
        "FROM g GROUP BY g) WHERE nd >= 2), "
        "tot AS (SELECT doc_id, COUNT(*) AS n_slots FROM g GROUP BY doc_id), "
        "dup AS (SELECT doc_id, COUNT(*) AS n_dup FROM g JOIN xdoc USING (g) "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(t.n_slots, 0) AS BIGINT) AS n_gram_slots, "
        "CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_slots, "
        "CASE WHEN COALESCE(t.n_slots, 0) = 0 THEN 0.0 ELSE "
        + sql_round("CAST(COALESCE(p.n_dup, 0) AS DOUBLE) / t.n_slots", 6)
        + " END AS dup_frac, "
        "CASE WHEN COALESCE(p.n_dup, 0) > 0 THEN 1 ELSE 0 END AS has_dup "
        "FROM documents d LEFT JOIN tot t USING (doc_id) "
        "LEFT JOIN dup p USING (doc_id)"
    ),
    tags=("corpus", "dedup", "text"),
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring (span) deduplication — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better")
    family at word-8-gram granularity: a gram SLOT is duplicated when
    its gram also occurs in at least one OTHER document; per doc the
    query reports total slots, duplicated slots, duplicated fraction
    and a flag. Unlike whole-doc near-dedup (q_dedup_*), this
    localises repetition INSIDE otherwise-unique documents —
    boilerplate headers, licence blocks, templated paragraphs.

    Plan/scale: one gram explode; grams travel as xxhash64
    fingerprints (8 bytes, never text). The cross-doc gram set comes
    from a (g64, doc_id)-distinct + count aggregate — both map-side
    combinable — and joins back on the 8-byte key. No broadcast is
    FORCED on that join: the cross-doc set is corpus-scale, so at
    100 TB it must run as a shuffle join (AQE broadcasts it at test
    scale where it happens to fit — the right call at each size). A
    false dup needs a 2^-64 xxhash64 collision; the oracle joins raw
    gram strings."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    grams = w.select(
        "doc_id", F.explode(F.expr(_gram_expr("w"))).alias("g")
    ).select("doc_id", F.xxhash64("g").alias("g64"))
    xdoc = (
        grams.distinct()
        .groupBy("g64")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g64")
    )
    tot = grams.groupBy("doc_id").agg(F.count("*").alias("n_slots"))
    dup = grams.join(xdoc, "g64").groupBy("doc_id").agg(F.count("*").alias("n_dup"))
    return (
        d.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(dup, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_slots", F.lit(0)).cast("bigint").alias("n_gram_slots"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_slots"),
            F.when(F.coalesce("n_slots", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                pround(
                    F.coalesce("n_dup", F.lit(0)).cast("double") / F.col("n_slots"), 6
                )
            )
            .alias("dup_frac"),
            F.when(F.coalesce("n_dup", F.lit(0)) > 0, 1).otherwise(0).alias("has_dup"),
        )
    )


@query(
    "q_domain_mix",
    oracle=(
        "WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang), "
        "t AS (SELECT MIN(cnt) AS target FROM c) "
        "SELECT d.doc_id, d.lang FROM documents d "
        "JOIN c USING (lang) CROSS JOIN t "
        f"WHERE {_u_sql('d.doc_id')} < CAST(t.target AS DOUBLE) / c.cnt"
    ),
    tags=("corpus", "sampling"),
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: downsample every language to the
    size of the smallest one (uniform target mix — the DoReMi/Pile-
    style reweighting step, with the weights computed from the data
    instead of a config; the synthetic corpus is en-heavy, so the
    filter does real work).

    Plan: per-language counts are a tiny aggregate (one row per
    domain), the global min a one-row aggregate; both are
    **broadcast** back onto the corpus, so the corpus side is a single
    narrow filter — no corpus shuffle at any scale. Acceptance
    u(doc_id) < target/cnt uses the md5-uniform from
    operators/sampling.py: deterministic per document, so the mix is
    stable under retries, repartitioning and incremental corpus
    growth. target/cnt is the same BIGINT→DOUBLE division on both
    engines — bit-identical operands, bit-identical comparison.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    target = counts.agg(F.min("cnt").alias("target"))
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(target))
        .filter(_u_expr("doc_id") < F.col("target").cast("double") / F.col("cnt"))
        .select("doc_id", "lang")
    )


# Sampling temperature for q_domain_mix_temp. T=1 keeps the natural
# mix, T→∞ flattens to uniform (q_domain_mix); T≈2-3 is the usual
# multilingual-pretraining compromise (XLM-R §3.1-style).
_MIX_T = 2.0


@query(
    "q_domain_mix_temp",
    oracle=(
        "WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang), "
        "t AS (SELECT MIN(cnt) AS nmin FROM c) "
        "SELECT d.doc_id, d.lang FROM documents d "
        "JOIN c USING (lang) CROSS JOIN t "
        f"WHERE {_u_sql('d.doc_id')} < "
        + sql_round(
            f"POWER(CAST(t.nmin AS DOUBLE) / c.cnt, {1.0 - 1.0 / _MIX_T})", 12
        )
    ),
    tags=("corpus", "sampling"),
)
def q_domain_mix_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixture: sample language l at rate
    (n_min/n_l)^(1-1/T) so mid-size domains aren't starved the way the
    uniform q_domain_mix starves them (T=2 here: the largest language
    is downsampled by sqrt of its size ratio, the smallest is kept
    whole).

    The rate is the closed form of the standard temperature recipe
    p_l ∝ (n_l/N)^(1/T) scaled to the largest total that upsamples
    nothing: rate_l = p_l·M/n_l with M = min_l n_l/p_l — the Σ(n^1/T)
    normalizer cancels, leaving (n_min/n_l)^(1-1/T). That matters for
    the oracle: no cross-language float SUM whose accumulation order
    could differ between engines; the surviving float math is one
    BIGINT→DOUBLE division and one POWER on bit-identical operands.
    pow() is not guaranteed correctly-rounded, so the rate is rounded
    to 12 dp on both engines (pround / sql_round) before the
    comparison — a last-ulp libm divergence can then never flip a
    document's membership (the u values are md5-uniforms with ~2⁻³²
    granularity, far coarser than 10⁻¹²).

    Plan: identical to q_domain_mix — tiny per-language aggregate +
    one-row min, both broadcast back, corpus side a single narrow
    filter (no corpus shuffle at any scale); md5-uniform acceptance is
    deterministic per doc_id, so the mix is stable under retries and
    incremental growth."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("cnt"))
    target = counts.agg(F.min("cnt").alias("nmin"))
    rate = pround(
        F.pow(F.col("nmin").cast("double") / F.col("cnt"), F.lit(1.0 - 1.0 / _MIX_T)),
        12,
    )
    return (
        d.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(target))
        .filter(_u_expr("doc_id") < rate)
        .select("doc_id", "lang")
    )


@query(
    "q_percentiles",
    oracle=(
        "SELECT lang, "
        "CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25, "
        "CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS p50, "
        "CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75, "
        "CAST(quantile_disc(n_chars, 0.90) AS BIGINT) AS p90, "
        "CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99 "
        "FROM documents GROUP BY lang"
    ),
    tags=("corpus", "agg"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length percentiles via PERCENTILE_DISC.

    Disc, not cont, on purpose: the discrete percentile returns an
    actual element of the group (SQL-standard smallest value with
    cume_dist ≥ fraction — same definition in Spark and DuckDB), so
    the result is an exact integer on both engines. Interpolated
    percentiles evaluate `a + (b-a)*frac` in engine-specific order and
    can differ in the last double bit. One shuffle on the group key;
    each group's percentile is a single sorted pass.
    """
    d = load_table(spark, sf_dir, "documents")

    def p(frac: float, name: str):
        return (
            F.expr(f"percentile_disc({frac}) WITHIN GROUP (ORDER BY n_chars)")
            .cast("bigint")
            .alias(name)
        )

    return d.groupBy("lang").agg(
        p(0.25, "p25"), p(0.50, "p50"), p(0.75, "p75"),
        p(0.90, "p90"), p(0.99, "p99"),
    )


# --- Bloom-filter decontamination prefilter ---------------------------

_BLOOM_M = 1 << 21  # bits (sized ~10x the eval gram-bits: ~130k grams x 3 at sf0.1)
_BLOOM_K = 3     # hash functions

# shared gram CTEs (same construction q_decontaminate verifies)
_BLOOM_GRAM_SQL = (
    "w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "g AS (SELECT doc_id, unnest(list_transform("
    f"range(1, len(w) - {_NGRAM - 2}), "
    f"i -> array_to_string(w[i:i+{_NGRAM - 1}], ' '))) AS g FROM w), "
    f"ks AS (SELECT unnest(range({_BLOOM_K})) AS i), "
    "ebits AS (SELECT DISTINCT "
    "CAST('0x' || substr(md5('b' || CAST(ks.i AS VARCHAR) || ':' || g.g), "
    f"1, 8) AS BIGINT) % {_BLOOM_M} AS bit "
    f"FROM g, ks WHERE doc_id % {_EVAL_MOD} = 0), "
    "tg AS (SELECT DISTINCT doc_id, g FROM g "
    f"WHERE doc_id % {_EVAL_MOD} <> 0)"
)


@query(
    "q_bloom_prefilter",
    oracle=(
        "WITH " + _BLOOM_GRAM_SQL + ", "
        "tb AS (SELECT doc_id, g, ks.i, "
        "CAST('0x' || substr(md5('b' || CAST(ks.i AS VARCHAR) || ':' || g), "
        f"1, 8) AS BIGINT) % {_BLOOM_M} AS bit FROM tg, ks), "
        "pg AS (SELECT doc_id, g, COUNT(*) AS hit "
        "FROM tb JOIN ebits USING (bit) GROUP BY doc_id, g "
        f"HAVING COUNT(*) = {_BLOOM_K}), "
        "cand AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pass "
        "FROM pg GROUP BY doc_id), "
        "ex AS (SELECT tg.doc_id, COUNT(*) AS n FROM tg "
        f"JOIN (SELECT DISTINCT g FROM g WHERE doc_id % {_EVAL_MOD} = 0) eg "
        "USING (g) GROUP BY tg.doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(cand.n_pass, 0) AS BIGINT) AS n_bloom_hits, "
        "CAST(CASE WHEN COALESCE(cand.n_pass, 0) > 0 THEN 1 ELSE 0 END AS INT)"
        " AS bloom_candidate, "
        "CAST(CASE WHEN COALESCE(ex.n, 0) > 0 THEN 1 ELSE 0 END AS INT)"
        " AS contaminated "
        "FROM documents d LEFT JOIN cand USING (doc_id) "
        "LEFT JOIN ex ON ex.doc_id = d.doc_id "
        f"WHERE d.doc_id % {_EVAL_MOD} <> 0"
    ),
    tags=("corpus", "text", "decontamination", "sketch"),
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination prefilter: the eval set's word
    8-grams compress to a 2^21-bit / 3-hash Bloom filter (256 KB — vs
    the full gram set q_decontaminate broadcasts), and every training
    gram is screened against it. A gram passes only if ALL 3 of its
    bit positions are set, so the screen can NEVER miss a real
    contamination (no false negatives — the Bloom guarantee, asserted
    per-row against the exact `contaminated` flag the query also
    emits); false positives are bounded by (1−e^(−kn/m))^k and get
    resolved by the exact join over the tiny candidate set. At 100 TB
    this is the standard two-stage scrub: ship the KB-sized filter
    map-side with NO join at all for ~every gram, run the exact
    (broadcast) join only on Bloom survivors.

    Plan: the filter's set bits come from the eval grams (tiny side);
    training grams explode to 3 (gram, bit) rows and count matched
    bits per gram — pure broadcast joins, the corpus never shuffles
    until the per-doc candidate aggregate. Hashing is the portable
    md5-prefix idiom, so the oracle reproduces every bit decision."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select("doc_id", F.split("text", " ").alias("w"))
    grams = w.select("doc_id", F.explode(F.expr(_gram_expr("w"))).alias("g"))
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    ks = d.sparkSession.range(_BLOOM_K).select(F.col("id").cast("int").alias("i"))

    def bit(g_col, i_col):
        h = F.md5(
            F.concat(F.lit("b"), i_col.cast("string"), F.lit(":"), g_col).cast(
                "binary"
            )
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _BLOOM_M

    ebits = (
        grams.filter(is_eval)
        .crossJoin(F.broadcast(ks))
        .select(bit(F.col("g"), F.col("i")).alias("bit"))
        .distinct()
    )
    tg = grams.filter(~is_eval).distinct()
    tb = tg.crossJoin(F.broadcast(ks)).select(
        "doc_id", "g", bit(F.col("g"), F.col("i")).alias("bit")
    )
    pg = (
        tb.join(F.broadcast(ebits), "bit")
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("hit"))
        .filter(F.col("hit") == _BLOOM_K)
    )
    cand = pg.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_pass"))
    eg = grams.filter(is_eval).select("g").distinct()
    # the exact stage probes ONLY bloom-survivor docs — the whole point
    # of the two-stage scrub (the no-false-negative guarantee makes the
    # restriction lossless: a contaminated doc is always a candidate).
    # The oracle computes the exact flag over all docs; results are
    # identical, which the hash check re-proves every round.
    ex = (
        tg.join(cand.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(eg), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    return (
        d.filter(~is_eval)
        .join(cand, "doc_id", "left")
        .join(ex, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_pass", F.lit(0)).cast("bigint").alias("n_bloom_hits"),
            F.when(F.coalesce("n_pass", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("bloom_candidate"),
            F.when(F.coalesce("n", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )
