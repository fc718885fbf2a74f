"""Quality-filter / retrieval / clustering curation operators — the
remaining pretraining-corpus surface between raw text and tokenization:
Gopher-style repetition metrics, BM25 retrieval scoring, denylist
scrubbing (the PII-redaction shape), and nearest-centroid assignment
(the k-means / IVF E-step, oracle-checked).

Reference parity: the reference (a tabular fraud pipeline) has no text
stage; these extend the engine's LLM-data family (SURVEY.md §2i,
VERDICT round-2 "LLM-data-pipeline operators" table) alongside
operators/corpus.py, text.py, dedup.py and similarity.py.

Scale posture:
- repetition metrics are one zero-shuffle Arrow pass (per-doc
  metrics never need data from another row, so no explode/agg/join
  belongs in the plan);
- BM25 keeps the corpus side shuffle-free: per-term tf is a per-row
  codegen'd ``size(w) - size(array_remove(w, t))`` difference (no
  interpreted higher-order function), the only aggregate is one
  1-row corpus-stats frame broadcast back, so the plan is
  scan → codegen'd math → top-k (TakeOrderedAndProject);
- denylist scrubbing is a pure per-row map (broadcast-sized denylist
  folded into the expression) — zero shuffles;
- centroid assignment cross-joins a BROADCAST centroid table (k rows
  — model state, not data) and reduces with a map-side-combinable
  min(struct) per vector; at 100 TB this is the classic IVF
  list-building pass: one scan, one narrow agg, no wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fixed_sum, pround
from fraud_detection_spark.registry import query, sql_fixed_sum, sql_round
from fraud_detection_spark.sources import load_table

# --- q_repetition -----------------------------------------------------

# Flag thresholds (Gopher §A1.1-style repetition filters, adapted to
# word n-grams): a doc is repetitive if >60% of its words are repeats
# of earlier words OR its most frequent 2-gram covers >8% of 2-gram
# slots. The synthetic word-soup corpus straddles both thresholds, so
# the flag is exercised in both directions. The 2-gram rule only
# applies from _TOP2_MIN_WORDS up: the share of an n-word doc is at
# least 1/(n-1), so any doc under ~14 words would trip the 8%
# threshold mechanically — at n=20 the floor is 5.3%, safely below the
# threshold, so the rule measures repetition rather than brevity.
_DUP_WORD_MAX = 0.60
_TOP2_MAX = 0.08
_TOP2_MIN_WORDS = 20


@query(
    "q_repetition",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        "b AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct FROM w), "
        "g AS (SELECT doc_id, unnest(list_concat("
        "list_transform(range(1, len(w)), i -> '2:' || array_to_string(w[i:i+1], ' ')), "
        "list_transform(range(1, len(w) - 1), i -> '3:' || array_to_string(w[i:i+2], ' '))"
        ")) AS g FROM w), "
        "c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM g GROUP BY doc_id, g), "
        "a AS (SELECT doc_id, "
        "MAX(CASE WHEN g LIKE '2:%' THEN cnt END) AS top2, "
        "SUM(CASE WHEN g LIKE '2:%' THEN cnt ELSE 0 END) AS n2, "
        "SUM(CASE WHEN g LIKE '3:%' AND cnt > 1 THEN cnt ELSE 0 END) AS dup3, "
        "SUM(CASE WHEN g LIKE '3:%' THEN cnt ELSE 0 END) AS n3 "
        "FROM c GROUP BY doc_id) "
        "SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words, "
        + sql_round("1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_words", 6)
        + " AS dup_word_frac, "
        + sql_round("CAST(COALESCE(a.top2, 0) AS DOUBLE) / CASE WHEN COALESCE(a.n2, 0) = 0 THEN 1 ELSE a.n2 END", 6)
        + " AS top2gram_share, "
        + sql_round("CAST(COALESCE(a.dup3, 0) AS DOUBLE) / CASE WHEN COALESCE(a.n3, 0) = 0 THEN 1 ELSE a.n3 END", 6)
        + " AS dup3gram_frac, "
        "CASE WHEN "
        + sql_round("1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_words", 6)
        + f" > {_DUP_WORD_MAX} "
        f"OR (b.n_words >= {_TOP2_MIN_WORDS} AND "
        + sql_round(
            "CAST(COALESCE(a.top2, 0) AS DOUBLE) / "
            "CASE WHEN COALESCE(a.n2, 0) = 0 THEN 1 ELSE a.n2 END",
            6,
        )
        + f" > {_TOP2_MAX}) "
        "THEN 1 ELSE 0 END AS repetitive "
        "FROM b LEFT JOIN a USING (doc_id)"
    ),
    tags=("curation", "quality", "text"),
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics per document: duplicate
    -word fraction, share of 2-gram slots taken by the most frequent
    2-gram, fraction of 3-gram occurrences that are repeats, and the
    keep/drop flag — the standard repetition filters a pretraining
    pipeline runs after dedup (Rae et al. 2021, §A1.1, re-expressed
    over word n-grams).

    The flag is computed from the ROUNDED metrics — the same 6-decimal
    values the query emits (both engines agree; the oracle's CASE uses
    the identical sql_round expressions) — so a consumer re-deriving
    the flag from the displayed columns always reproduces it. The
    2-gram rule is gated on n_words >= 20 (see _TOP2_MIN_WORDS): the
    share of an n-word doc is floored at 1/(n-1), so shorter docs
    would be flagged for brevity, not repetition.

    Scale: per-document metrics are embarrassingly parallel, so the
    whole operator is ONE Arrow mapInPandas pass over the scan — zero
    shuffles, zero joins; identical plan at 500 rows and at 100 TB.
    (The first-working JVM shape — a tagged 2-gram/3-gram explode +
    two hash aggregates + a join back — was measured ~4x slower at
    sf0.1: two exchanges of ~10⁶ gram rows to recompute per-doc-local
    counts that never needed to leave their row. Per-doc Counter
    passes over ~10² grams replace them; all arithmetic is IEEE
    double, bit-matching the SQL oracle.)"""

    def metrics(batches):
        import math

        from collections import Counter

        import pandas as pd

        def r6(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            rows = []
            for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
                w = t.split(" ")
                n = len(w)
                dup_word = 1.0 - len(set(w)) / n
                c2 = Counter(zip(w, w[1:]))
                top2, n2 = (max(c2.values()), n - 1) if n >= 2 else (0, 1)
                c3 = Counter(zip(w, w[1:], w[2:]))
                dup3 = sum(c for c in c3.values() if c > 1)
                n3 = n - 2 if n >= 3 else 1
                dup_word_r = r6(dup_word)
                top2_share_r = r6(top2 / max(n2, 1))
                flag = (
                    1
                    if dup_word_r > _DUP_WORD_MAX
                    or (n >= _TOP2_MIN_WORDS and top2_share_r > _TOP2_MAX)
                    else 0
                )
                rows.append(
                    (
                        doc_id,
                        n,
                        dup_word_r,
                        top2_share_r,
                        r6(dup3 / max(n3, 1)),
                        flag,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_words",
                    "dup_word_frac",
                    "top2gram_share",
                    "dup3gram_frac",
                    "repetitive",
                ],
            )

    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(
            metrics,
            schema=(
                "doc_id bigint, n_words bigint, dup_word_frac double, "
                "top2gram_share double, dup3gram_frac double, repetitive int"
            ),
        )
    )


# --- q_bm25 -----------------------------------------------------------

# Fixed retrieval query (terms verified present in the synthetic
# corpus vocabulary); Okapi parameters at the canonical defaults.
_BM25_TERMS = ("spark", "join", "window")
_K1 = 1.2
_B = 0.75
_BM25_TOPK = 15


# Shared oracle pieces: corpus stats CTE chain + the (unrounded) Okapi
# score expression — used by q_bm25's top-k and q_rrf's full ranking.
_BM25_STATS_SQL = (
    "w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "tf AS (SELECT doc_id, len(w) AS dl, "
    + ", ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    + " FROM w), "
    "s AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, "
    + ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    + " FROM tf)"
)
_BM25_EXPR = " + ".join(
    f"ln((n - df{i} + 0.5) / (df{i} + 0.5) + 1.0) * "
    f"(tf{i} * {_K1 + 1.0}) / "
    f"(tf{i} + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl))"
    for i in range(len(_BM25_TERMS))
)


@query(
    "q_bm25",
    oracle=(
        "WITH " + _BM25_STATS_SQL + " "
        "SELECT doc_id, CAST(dl AS BIGINT) AS doc_len, "
        + sql_round(_BM25_EXPR, 6)
        + " AS bm25 "
        "FROM tf CROSS JOIN s "
        f"ORDER BY bm25 DESC, doc_id LIMIT {_BM25_TOPK}"
    ),
    tags=("curation", "retrieval", "text"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 for a fixed 3-term query (k1=1.2, b=0.75,
    Lucene's non-negative idf = ln((N-df+0.5)/(df+0.5)+1)) — the
    retrieval-scoring op a curation pipeline uses to mine topical
    subsets of a corpus.

    Scale: per-term tf is a per-row codegen'd ``size(w) -
    size(array_remove(w, t))`` difference (NO gram explode, NO shuffle
    on the corpus side, no interpreted higher-order function — see the
    inline comment at term_count); the corpus statistics
    (N, avgdl, per-term df) are one 1-row aggregate broadcast back;
    the score is codegen'd arithmetic with a fixed term order (t0 +
    t1 + t2 — summation order pinned on both engines, so rounding
    cannot drift); top-k plans as TakeOrderedAndProject."""
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus (doc_id, doc_len, bm25) table for the fixed query —
    q_bm25's scoring core, factored so q_rrf can fuse the complete
    lexical ranking (not just the top-15) with the semantic one."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    def term_count(t: str):
        # size(w) - size(array_remove(w, t)) instead of a filter()
        # lambda: array_remove is a plain codegen'd expression, while
        # higher-order functions evaluate interpreted per element.
        return F.size("w") - F.size(F.array_remove("w", t))

    tf = d.select(
        "doc_id",
        F.size("w").alias("dl"),
        *[term_count(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = tf.agg(
        F.count("*").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        tf_i = F.col(f"tf{i}")
        idf = F.log(
            (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5) + 1.0
        )
        norm = tf_i + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl"))
        term = idf * (tf_i * (_K1 + 1.0)) / norm
        score = term if score is None else score + term
    return tf.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        F.col("dl").cast("bigint").alias("doc_len"),
        pround(score, 6).alias("bm25"),
    )


# --- q_scrub_terms ----------------------------------------------------

# Denylist playing the role of a PII / sensitive-term blocklist. Real
# pipelines load thousands of patterns from a file and broadcast them;
# here the list is inline but the plan shape (broadcast constant folded
# into a per-row map) is identical.
_DENYLIST = ("key", "customer", "secret")
_REDACTED = "<redacted>"


@query(
    "q_scrub_terms",
    oracle=(
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents) "
        "SELECT doc_id, "
        "CAST(len(list_filter(w, x -> x IN ("
        + ", ".join(f"'{t}'" for t in _DENYLIST)
        + "))) AS BIGINT) AS n_redacted, "
        "md5(array_to_string(list_transform(w, x -> CASE WHEN x IN ("
        + ", ".join(f"'{t}'" for t in _DENYLIST)
        + f") THEN '{_REDACTED}' ELSE x END), ' ')) AS scrub_md5 "
        "FROM w"
    ),
    tags=("curation", "scrub", "text"),
)
def q_scrub_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing — the PII-redaction shape: replace every
    blocklisted token with a redaction marker, count replacements, and
    fingerprint the scrubbed text (md5 is identical hex in both
    engines, so the entire rewritten document is oracle-checked
    without shipping the text through the comparator).

    Scale: a pure per-row map over the scan — zero shuffles; the
    denylist is a broadcast-sized constant folded into the codegen'd
    expression (a production list swaps in via a broadcast join or
    an Aho-Corasick pandas_udf without changing the plan shape)."""
    deny = F.array(*[F.lit(t) for t in _DENYLIST])
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    scrubbed = F.transform(
        "w",
        lambda x: F.when(F.array_contains(deny, x), F.lit(_REDACTED)).otherwise(x),
    )
    n_redacted = None
    for t in _DENYLIST:
        # codegen'd count (array_remove), vs an interpreted filter()
        hit = F.size("w") - F.size(F.array_remove("w", t))
        n_redacted = hit if n_redacted is None else n_redacted + hit
    return d.select(
        "doc_id",
        n_redacted.cast("bigint").alias("n_redacted"),
        F.md5(F.concat_ws(" ", scrubbed)).alias("scrub_md5"),
    )


# --- q_scrub_pii ------------------------------------------------------

# Regex redaction patterns (category -> (pattern, replacement)). These
# are RE2-safe constructs (no backrefs/lookaround), so Spark's Java
# regex and DuckDB's RE2 match identically. The word-soup corpus
# contains no PII-shaped strings, so the query seeds deterministic
# synthetic contact strings derived from doc_id into each document
# (identically on both engines) to exercise every pattern end-to-end;
# a real ingest drops the seeding stage and runs the same redactor.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b555-\d{4}\b"


@query(
    "q_scrub_pii",
    oracle=(
        "WITH a AS (SELECT doc_id, text || ' reach user' || doc_id::VARCHAR "
        "|| '@mail' || (doc_id % 7)::VARCHAR || '.example.com ip 10.' "
        "|| (doc_id % 256)::VARCHAR || '.0.' || (doc_id % 100)::VARCHAR "
        "|| ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t "
        "FROM documents) "
        "SELECT doc_id, "
        f"CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email, "
        f"CAST(len(regexp_extract_all(t, '{_PII_IPV4}')) AS BIGINT) AS n_ip, "
        f"CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone, "
        "md5(regexp_replace(regexp_replace(regexp_replace(t, "
        f"'{_PII_EMAIL}', '<email>', 'g'), "
        f"'{_PII_IPV4}', '<ip>', 'g'), "
        f"'{_PII_PHONE}', '<phone>', 'g')) AS scrub_md5 "
        "FROM a"
    ),
    tags=("curation", "scrub", "pii", "text"),
)
def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction — the pattern-based sibling of the denylist
    scrub (q_scrub_terms): emails, IPv4 addresses and phone-shaped
    strings are counted and replaced with typed markers, and the fully
    rewritten document is md5-fingerprinted so the oracle checks the
    entire redacted text, not just the counts.

    Scale: a pure per-row map over the scan — zero shuffles; the
    pattern set is a compiled constant per task (a production list of
    hundreds of patterns would combine into an alternation or an
    Aho-Corasick pandas_udf, same plan shape). Patterns avoid
    backrefs/lookaround so Java regex (Spark) and RE2 (DuckDB) agree
    construct-for-construct."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
        F.lit(" call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    a = d.select("doc_id", aug.alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<email>"),
            _PII_IPV4,
            "<ip>",
        ),
        _PII_PHONE,
        "<phone>",
    )
    return a.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_IPV4), F.lit(0)))
        .cast("bigint")
        .alias("n_ip"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), F.lit(0)))
        .cast("bigint")
        .alias("n_phone"),
        F.md5(red).alias("scrub_md5"),
    )


# --- q_centroid_assign ------------------------------------------------

# The first k embeddings (vec_id < _K) serve as fixed centroids: the
# assignment step is then fully deterministic and oracle-checkable
# (unlike a trained-k-means assignment, whose centroids are model
# state — that variant lives in similarity.ivf_search / q_knn_ivf_coarse
# with invariant tests instead of an oracle).
_K_CENTROIDS = 8


@query(
    "q_centroid_assign",
    oracle=(
        "WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce "
        f"FROM embeddings WHERE vec_id < {_K_CENTROIDS}), "
        "d AS (SELECT e.vec_id, c.cid, "
        + sql_round("list_distance(CAST(e.embedding AS DOUBLE[]), c.ce)", 6)
        + " AS dist FROM embeddings e CROSS JOIN c), "
        "r AS (SELECT vec_id, cid, dist, "
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) "
        "SELECT vec_id, CAST(cid AS BIGINT) AS cluster, dist FROM r WHERE rn = 1"
    ),
    tags=("curation", "clustering", "similarity"),
)
def q_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the k-means / IVF E-step) against
    k=8 fixed centroids: per-vector argmin of L2 distance with a
    deterministic centroid-id tie-break.

    Scale: the centroid table is k rows of model state — broadcast;
    the argmin is min(struct(dist, cid)) grouped by vec_id, which
    Spark executes with map-side partial aggregation (each partition
    reduces its own k candidates before any exchange). This is the
    IVF list-building pass: one corpus scan, one narrow agg — the
    same plan at 500 rows and at 100 TB. The L2 fold is sequential on
    both engines (zip_with/aggregate vs list_distance), so rounded
    distances are bit-identical."""
    e = load_table(spark, sf_dir, "embeddings")
    to_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cents = (
        e.filter(F.col("vec_id") < _K_CENTROIDS)
        .select(F.col("vec_id").alias("cid"), to_double.alias("ce"))
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("e"), F.col("ce"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    best = (
        e.select("vec_id", to_double.alias("e"))
        .crossJoin(F.broadcast(cents))
        .select("vec_id", pround(dist, 6).alias("dist"), "cid")
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
    )
    return best.select(
        "vec_id",
        F.col("m.cid").cast("bigint").alias("cluster"),
        F.col("m.dist").alias("dist"),
    )


# --- q_unigram_nll ----------------------------------------------------


@query(
    "q_unigram_nll",
    oracle=(
        "WITH tok AS (SELECT doc_id, w FROM (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS w FROM documents) WHERE w <> ''), "
        "c AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w), "
        "n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c), "
        "v AS (SELECT w, " + sql_round("-ln(cnt / total)", 6) + " AS nll "
        "FROM c CROSS JOIN n), "
        "d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
        + sql_fixed_sum("nll", 6) + " AS nll_sum "
        "FROM tok JOIN v USING (w) GROUP BY doc_id) "
        "SELECT doc_id, n_tokens, "
        + sql_round("nll_sum / n_tokens", 6) + " AS mean_nll FROM d"
    ),
    tags=("curation", "quality", "text", "lm"),
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: per-document mean negative
    log-likelihood under the corpus's own unigram language model — the
    perplexity-filter shape (CCNet/Gopher-style "score every doc with
    a cheap LM, drop the tails") with the simplest possible LM so the
    whole operator stays SQL-expressible and oracle-exact. High
    mean_nll = rare-token-heavy documents; low = repetitive/common.

    Determinism discipline: each token's nll is rounded to 6 dp FIRST
    (absorbing any last-ulp ln() divergence between engines at the
    vocabulary level, ~10¹-10⁵ distinct values — not per row), then
    per-doc summation uses the fixed-point integer SUM
    (functions.fixed_sum), so no accumulation order on any cluster
    layout can move the result.

    Scale: the unigram table is vocabulary-sized — model state, not
    data — and is BROADCAST back onto the token stream; the only
    corpus-scale shuffle is the per-doc aggregate (map-side
    combinable). A real pipeline swaps the broadcast table for a
    trained n-gram/LM scorer delivered exactly the same way."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    c = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    n = c.agg(F.sum("cnt").cast("double").alias("total"))
    v = c.crossJoin(F.broadcast(n)).select(
        "w", pround(-F.log(F.col("cnt") / F.col("total")), 6).alias("nll")
    )
    agg = (
        tok.join(F.broadcast(v), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            fixed_sum(F.col("nll"), 6).alias("nll_sum"),
        )
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        pround(F.col("nll_sum") / F.col("n_tokens"), 6).alias("mean_nll"),
    )


# --- q_quality_classifier ---------------------------------------------

# fastText-style hashed-bigram linear quality model (the standard
# LLM-corpus quality-filter tier above the unigram-LM score: e.g. the
# CCNet/LLaMA "page looks like a Wikipedia reference" classifier).
# The model is FIXED published state, not trained here: bigrams hash
# into _QC_BUCKETS buckets and bucket b carries weight
#   w(b) = ((b * 1103515245 + 12345) mod 2^20) / 2^20 - 0.5
# (an LCG step — deterministic, integer-exact in any engine, values
# are dyadic rationals so every sum below is FP-exact). A real
# deployment swaps in learned weights delivered the same way.
_QC_BUCKETS = 256
_QC_WEIGHTS = [
    ((b * 1103515245 + 12345) % (1 << 20)) / float(1 << 20) - 0.5
    for b in range(_QC_BUCKETS)
]
_QC_BIAS = 0.25
_QC_SCALE = 4.0


def _quality_classifier_sql() -> str:
    wlist = "[" + ", ".join(repr(w) for w in _QC_WEIGHTS) + "]"
    logit = f"{_QC_BIAS} + {_QC_SCALE} * wsum / GREATEST(n_bigrams, 1)"
    prob = sql_round(f"1.0 / (1.0 + exp(-({logit})))", 6)
    return (
        "WITH tok AS (SELECT doc_id, "
        "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws "
        "FROM documents), "
        "bg AS (SELECT doc_id, CASE WHEN len(ws) >= 2 THEN "
        "list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i + 1]) "
        "ELSE CAST([] AS VARCHAR[]) END AS bgs FROM tok), "
        "sc AS (SELECT doc_id, len(bgs) AS n_bigrams, "
        "COALESCE(list_sum(list_transform(bgs, s -> "
        f"{wlist}[CAST(CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) % {_QC_BUCKETS} AS INT) + 1]"
        ")), 0.0) AS wsum FROM bg) "
        "SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams, "
        f"{prob} AS quality_prob, "
        f"CASE WHEN {prob} >= 0.5 THEN 1 ELSE 0 END AS keep "
        "FROM sc"
    )


@query(
    "q_quality_classifier",
    oracle=_quality_classifier_sql(),
    tags=("curation", "text", "quality"),
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram linear quality classifier (fastText-shape): per
    document, hash every word bigram into a fixed bucket space, sum
    the published bucket weights, squash mean-weight through a
    sigmoid, threshold at 0.5 into a keep flag. The reference serves
    the same fixed-weight linear-scorer shape over tabular features
    (/root/reference/predict_single.py:30); here it runs over text at
    corpus scale.

    Scale: ZERO shuffles — tokenize/bigram/hash/score are doc-local
    inside one Arrow mapInPandas stage, and the 256-double weight
    table ships to the python workers inside the closure (the
    model-state delivery path: weights travel with the task, the
    corpus never moves; a bucket space too big for a closure would
    swap to an F.broadcast join exactly like q_unigram_nll's LM
    table). Hashing is the engine's portable md5-prefix idiom
    (dedup.py q_dedup_simhash), so the oracle reproduces every bucket
    bit-exactly; weights are dyadic rationals, so doc-local
    left-to-right summation is FP-exact in both engines and the 6-dp
    rounded sigmoid cannot flake. An all-JVM column-expression twin
    was A/B'd and rejected: nested HOF lambdas evaluate interpreted
    (no codegen), measuring 20x slower — see _qc_score_batches."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", "text").mapInPandas(
        _qc_scorer(), schema="doc_id long, n_bigrams long, wsum double"
    )
    logit = F.lit(_QC_BIAS) + F.lit(_QC_SCALE) * F.col("wsum") / F.greatest(
        F.col("n_bigrams"), F.lit(1)
    )
    prob = pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    return scored.select(
        "doc_id",
        "n_bigrams",
        prob.alias("quality_prob"),
        F.when(prob >= 0.5, 1).otherwise(0).alias("keep"),
    )


def _qc_scorer():
    """Arrow batch scorer for q_quality_classifier: per doc, split to
    words, hash each bigram's md5 prefix into the bucket space, sum
    the bucket weights. Python-side md5 is byte-identical to the
    engines' md5, and the weights are dyadic rationals, so the
    left-to-right float sum matches DuckDB's list_sum exactly.

    Why Arrow and not column expressions: the same math as nested
    higher-order functions (transform/aggregate lambdas) runs on
    Spark's INTERPRETED expression path — no whole-stage codegen
    inside HOF lambdas — at ~4 ms/doc (≈20 s at sf0.1, dominated by
    per-bigram interpreted Md5/Conv/array churn). This one Arrow pass
    measures ~1 s on the identical corpus (20x) and keeps the same
    shuffle count: zero.

    Returned as a CLOSURE over plain locals (weights list, bucket
    count) so cloudpickle serializes it by value — a module-level
    function pickles by reference and would require this package on
    every python worker's import path (breaks when the consuming
    driver runs from a different cwd)."""
    w = list(_QC_WEIGHTS)
    n_buckets = _QC_BUCKETS

    def gen(batches):
        import hashlib
        import re as _re

        import pandas as pd

        word_re = _re.compile(r"[^a-z0-9]+")
        for pdf in batches:
            nbs, wsums = [], []
            for text in pdf["text"]:
                words = [t for t in word_re.split(text.lower()) if t]
                if len(words) >= 2:
                    nb = len(words) - 1
                    s = 0.0
                    for i in range(nb):
                        bg = (words[i] + "_" + words[i + 1]).encode()
                        b = int(hashlib.md5(bg).hexdigest()[:8], 16) % n_buckets
                        s += w[b]
                else:
                    nb, s = 0, 0.0
                nbs.append(nb)
                wsums.append(s)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "n_bigrams": nbs, "wsum": wsums}
            )

    return gen


_COMP_MAX_RATIO = 0.45  # below => suspiciously compressible (repetitive)


def _compression_batches(batches):
    import zlib

    import pandas as pd

    for pdf in batches:
        raw = pdf["text"].str.encode("utf-8")
        n_raw = raw.str.len().astype("int64")
        n_comp = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_raw": n_raw,
                "n_comp": n_comp,
                "ratio": (n_comp / n_raw.clip(lower=1)).round(6),
            }
        )


@query("q_compression_ratio", oracle=None, tags=("curation", "quality", "text"))
def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality filter: zlib(level 6) bytes over raw
    bytes per document, flagging docs that compress suspiciously well —
    the classic low-entropy screen from the large-corpus curation
    literature (boilerplate, repeated templates and looped n-grams
    compress far below natural prose; the complementary high-ratio
    tail catches binary junk). Complements the exact token-statistics
    repetition screen (q_repetition) with a model-free whole-document
    entropy estimate.

    Rows-only by necessity: no SQL engine exposes zlib. One Arrow
    ``mapInPandas`` pass — zero shuffle, the bytes never leave the
    executor; determinism comes from zlib's fixed algorithm (asserted
    by the double-run test, plus a python-reference recomputation)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = d.mapInPandas(
        _compression_batches,
        schema="doc_id long, n_raw long, n_comp long, ratio double",
    )
    return out.withColumn(
        "low_entropy", (F.col("ratio") < _COMP_MAX_RATIO).cast("int")
    )


# --- q_rrf ------------------------------------------------------------

_RRF_K = 60       # the canonical reciprocal-rank-fusion constant
_RRF_TOPK = 20
_RRF_QUERY_DOC = 0  # doc_id <-> vec_id pairing; 0 is the query doc


@query(
    "q_rrf",
    oracle=(
        "WITH " + _BM25_STATS_SQL + ", "
        "lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY "
        + sql_round(_BM25_EXPR, 6)
        + f" DESC, doc_id) AS r_lex FROM tf CROSS JOIN s "
        f"WHERE doc_id <> {_RRF_QUERY_DOC}), "
        "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
        f"WHERE vec_id = {_RRF_QUERY_DOC}), "
        "sem AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER (ORDER BY "
        + sql_round(
            "list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe)", 6
        )
        + " DESC, vec_id) AS r_sem "
        f"FROM embeddings CROSS JOIN q WHERE vec_id <> {_RRF_QUERY_DOC}) "
        "SELECT lex.doc_id, CAST(r_lex AS BIGINT) AS lex_rank, "
        "CAST(r_sem AS BIGINT) AS sem_rank, "
        + sql_round(
            f"1.0 / ({_RRF_K} + r_lex) + 1.0 / ({_RRF_K} + r_sem)", 6
        )
        + " AS rrf FROM lex JOIN sem ON lex.doc_id = sem.doc_id "
        f"ORDER BY rrf DESC, lex.doc_id LIMIT {_RRF_TOPK}"
    ),
    tags=("curation", "retrieval", "similarity"),
)
def q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal rank fusion: the corpus ranked
    lexically (BM25 for the fixed query, q_bm25's scoring core) and
    semantically (cosine to the query embedding, q_knn_cosine's
    form), fused as Σ 1/(60 + rank) — the standard score-free way to
    combine heterogeneous rankings (BM25 magnitudes and cosines are
    incomparable; ranks always are), and the default first stage of
    a modern lexical+vector search stack. Top-20 with both
    constituent ranks exposed for debugging.

    Exactness: both rankings ROW_NUMBER over a 6-dp-rounded score
    with id tie-break — proven-identical scores (q_bm25 /
    q_knn_cosine) make the ranks identical integers; the fused score
    is a fixed-order two-term sum of exact-integer reciprocals,
    identical IEEE on both engines.

    Scale: each ranking is its own bounded pipeline (corpus stats
    broadcast, codegen'd scores); the rank windows are the only
    single-partition steps — at 100 TB swap them for a two-stage
    top-M-then-rank (RRF only needs ranks up to the fusion window,
    since 1/(60+r) decays past usefulness by r ≈ a few hundred); the
    final join is |corpus|-keyed and AQE-planned."""
    from fraud_detection_spark.operators.similarity import (
        _as_double,
        cosine_to_query,
    )

    lex_scores = bm25_scores(spark, sf_dir).filter(
        F.col("doc_id") != _RRF_QUERY_DOC
    )
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = lex_scores.select(
        "doc_id", F.row_number().over(w_lex).alias("r_lex")
    )

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == _RRF_QUERY_DOC).select(
        _as_double("embedding").alias("qe")
    )
    sem_scores = (
        e.filter(F.col("vec_id") != _RRF_QUERY_DOC)
        .select(F.col("vec_id").alias("doc_id"), _as_double("embedding").alias("e"))
        .crossJoin(F.broadcast(qv))
        .select("doc_id", pround(cosine_to_query("e", "qe"), 6).alias("cosine"))
    )
    w_sem = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    sem = sem_scores.select(
        "doc_id", F.row_number().over(w_sem).alias("r_sem")
    )

    rrf = 1.0 / (_RRF_K + F.col("r_lex")) + 1.0 / (_RRF_K + F.col("r_sem"))
    return (
        lex.join(sem, "doc_id")
        .select(
            "doc_id",
            F.col("r_lex").cast("bigint").alias("lex_rank"),
            F.col("r_sem").cast("bigint").alias("sem_rank"),
            pround(rrf, 6).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(_RRF_TOPK)
    )


# --- q_token_budget ---------------------------------------------------


@query(
    "q_token_budget",
    oracle=(
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
        "m AS (SELECT doc_id, len(w) AS n_tok, "
        "len(list_filter(w, x -> x IN ('the','a','of','and','to','in'))) "
        "AS n_stop FROM t), "
        "r AS (SELECT doc_id, n_tok, ROW_NUMBER() OVER (ORDER BY "
        + sql_round("n_stop * 1.0 / n_tok", 6)
        + " DESC, doc_id) AS rnk, COUNT(*) OVER () AS nd FROM m), "
        "d AS (SELECT CAST(CEIL(rnk * 10.0 / nd) AS BIGINT) AS decile, "
        "COUNT(*) AS n_docs, SUM(n_tok) AS toks FROM r GROUP BY decile), "
        "c AS (SELECT decile, "
        "CAST(SUM(n_docs) OVER (ORDER BY decile) AS BIGINT) AS n_docs, "
        "CAST(SUM(toks) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens, "
        "CAST(SUM(toks) OVER () AS BIGINT) AS tot FROM d) "
        "SELECT decile, n_docs, cum_tokens, "
        + sql_round("cum_tokens * 1.0 / tot", 6) + " AS token_share FROM c"
    ),
    tags=("curation", "quality", "window"),
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-yield curve of quality filtering: rank the corpus by the
    stopword-ratio quality key (q_quality_score's strongest single
    heuristic — natural text is stopword-dense, template/machine text
    isn't) and report, at each decile of the ranking, how many
    training tokens the filtered corpus keeps — the curve a pretraining
    data team reads to price a quality threshold ("top 30% of docs =
    41% of tokens"). Answers the budget question q_quality_score's
    per-doc gate can't.

    Exactness: the ranking orders by the 6-dp-rounded ratio with
    doc_id ties (identical integers on both engines — the q_rrf
    discipline); decile boundaries use the explicit CEIL(rank·10/n)
    formula rather than NTILE (engines split remainders differently);
    token counts and their cumsums are exact integers.

    Scale: one codegen'd tokenize/count pass; the rank is the one
    global sort (at 100 TB: bucket the 6-dp quality key into a
    histogram first and rank bucket-locally — the q_auc_binned
    treatment); deciles aggregate to a 10-row table."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    from fraud_detection_spark.operators.text import STOPWORDS

    stop_arr = F.array(*[F.lit(t) for t in STOPWORDS])
    m = d.select(
        "doc_id",
        F.size(w).alias("n_tok"),
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).alias(
            "n_stop"
        ),
    )
    quality = pround(F.col("n_stop") * 1.0 / F.col("n_tok"), 6)
    w_rank = Window.orderBy(quality.desc(), F.asc("doc_id"))
    w_all = Window.partitionBy()
    r = m.select(
        "n_tok",
        F.row_number().over(w_rank).alias("rnk"),
        F.count("*").over(w_all).alias("nd"),
    )
    dec = r.select(
        F.ceil(F.col("rnk") * 10.0 / F.col("nd")).cast("bigint").alias("decile"),
        "n_tok",
    ).groupBy("decile").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("toks")
    )
    w_cum = Window.orderBy("decile")
    return dec.select(
        "decile",
        F.sum("n_docs").over(w_cum).cast("bigint").alias("n_docs"),
        F.sum("toks").over(w_cum).cast("bigint").alias("cum_tokens"),
        F.sum("toks").over(w_all).cast("bigint").alias("tot"),
    ).select(
        "decile",
        "n_docs",
        "cum_tokens",
        pround(F.col("cum_tokens") * 1.0 / F.col("tot"), 6).alias("token_share"),
    )
