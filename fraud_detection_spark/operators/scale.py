"""Scale-path operator variants: the forms you run at 100 TB when the
exact/test-scale form has a bottleneck, declared alongside their exact
twins so both are graded.

- q_auc_binned : trapezoid AUC over the 50-bucket score histogram —
  replaces q_auc's global rank window (single ordered partition) with
  two tiny aggregates; error vs exact AUC is O(1/bins) and measured in
  tests.
- q_approx_distinct / q_approx_quantile : HyperLogLog++ / quantile
  sketches — the mergeable one-pass forms of q_distinct_count /
  q_quantiles (engine-specific sketches => rows-only; accuracy
  asserted vs exact in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import pround
from fraud_detection_spark.operators.ml_metrics import SCORED_SQL, scored
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table


@query(
    "q_auc_binned",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), b AS ("
        "SELECT CAST(FLOOR(score * 50) AS BIGINT) AS bucket, "
        "SUM(label) AS pos, COUNT(*) - SUM(label) AS neg FROM s GROUP BY bucket), "
        "c AS (SELECT bucket, "
        "SUM(pos) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) * 1.0 "
        "/ SUM(pos) OVER () AS tpr, "
        "SUM(neg) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) * 1.0 "
        "/ SUM(neg) OVER () AS fpr FROM b), "
        "d AS (SELECT tpr, fpr, "
        "LAG(tpr, 1, 0.0) OVER (ORDER BY fpr, tpr) AS ptpr, "
        "LAG(fpr, 1, 0.0) OVER (ORDER BY fpr, tpr) AS pfpr FROM c) "
        "SELECT " + sql_round("SUM((fpr - pfpr) * (tpr + ptpr) / 2.0)", 6) + " AS auc "
        "FROM d"
    ),
    tags=("ml", "metric", "scale"),
)
def q_auc_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned (trapezoid) AUC — the 100 TB form of q_auc: one histogram
    aggregate over 50 score buckets, then windows over the ~50-row
    bucket table only. No global sort/rank of the fact table. Accuracy
    vs the exact rank-sum AUC is O(1/bins) (asserted in tests)."""
    s = scored(spark, sf_dir)
    b = s.groupBy(F.floor(F.col("score") * 50).cast("bigint").alias("bucket")).agg(
        F.sum("label").alias("pos"),
        (F.count("*") - F.sum("label")).alias("neg"),
    )
    w_cum = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = b.select(
        (F.sum("pos").over(w_cum) * 1.0 / F.sum("pos").over(w_all)).alias("tpr"),
        (F.sum("neg").over(w_cum) * 1.0 / F.sum("neg").over(w_all)).alias("fpr"),
    )
    w_lag = Window.orderBy("fpr", "tpr")
    d = c.select(
        "tpr",
        "fpr",
        F.lag("tpr", 1, 0.0).over(w_lag).alias("ptpr"),
        F.lag("fpr", 1, 0.0).over(w_lag).alias("pfpr"),
    )
    return d.agg(
        pround(
            F.sum((F.col("fpr") - F.col("pfpr")) * (F.col("tpr") + F.col("ptpr")) / 2.0), 6
        ).alias("auc")
    )


@query("q_approx_distinct", oracle=None, tags=("agg", "approx", "scale"))
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts (rsd=0.01) — the mergeable
    one-pass scale form of q_distinct_count (no expand, no two-phase
    exact distinct shuffle). Engine-specific sketch => rows-only;
    error vs exact asserted in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("n_supps_approx"),
    )


@query("q_approx_quantile", oracle=None, tags=("agg", "approx", "scale"))
def q_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles (accuracy 10000) — the
    mergeable scale form of q_quantiles (exact interpolation needs the
    full value multiset per group)."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        pround(F.percentile_approx("o_totalprice", 0.25, 10000), 4).alias("p25"),
        pround(F.percentile_approx("o_totalprice", 0.5, 10000), 4).alias("p50"),
        pround(F.percentile_approx("o_totalprice", 0.75, 10000), 4).alias("p75"),
    )


@query("q_hll_sketch", oracle=None, tags=("agg", "approx", "scale", "sketch"))
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Datasketches-HLL cardinality: per-day sketches of the
    active user set, merged per event type with ``hll_union_agg`` —
    the incremental form of COUNT(DISTINCT) at 100 TB. Unlike
    ``approx_count_distinct`` (whose HLL++ sketch is consumed inside
    one aggregate and never surfaced), ``hll_sketch_agg`` materializes
    the sketch as a BINARY value, so daily sketches can be PERSISTED
    and later unioned without rescanning history — yesterday's 100 TB
    is one ~1.5 KB row per (day, type). ``build_hll_index`` /
    ``estimate_from_index`` below are that persisted path; this
    declared query runs the same two-level aggregate in one plan.

    Engine-specific sketch => rows-only; tests assert ≤5% error vs the
    exact distinct count, merge associativity (daily-then-union ==
    direct), and persistence round-trip stability.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"),
        F.expr("ts div 1000000000 div 86400").alias("day"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"), F.count("*").alias("n"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_union_agg("sk").alias("sk"),
            F.sum("n").cast("bigint").alias("n_events"),
        )
        .select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("bigint").alias("est_users"),
            "n_events",
        )
    )


def build_hll_index(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Persist per-(event_type, day) HLL sketches as a parquet index —
    the artifact an incremental pipeline appends one day at a time
    (same persisted-index pattern as operators/incremental.py's dedup
    sketches). Each row is a few KB regardless of how many users the
    day saw, so the index for years of 100 TB/day history is MBs."""
    ev = load_table(spark, sf_dir, "events")
    (
        ev.groupBy(
            F.col("event_type"),
            F.expr("ts div 1000000000 div 86400").alias("day"),
        )
        .agg(F.hll_sketch_agg("user_id").alias("sk"), F.count("*").alias("n"))
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def estimate_from_index(
    spark: SparkSession, index_dir: str, day_min: int | None = None
) -> DataFrame:
    """Distinct-user estimates per event type from the persisted sketch
    index alone — no fact-table scan. ``day_min`` prunes old days
    before the union (predicate pushdown on the tiny index)."""
    idx = spark.read.parquet(index_dir)
    if day_min is not None:
        idx = idx.filter(F.col("day") >= day_min)
    return (
        idx.groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("sk"), F.sum("n").cast("bigint").alias("n_events"))
        .select(
            "event_type",
            F.hll_sketch_estimate("sk").cast("bigint").alias("est_users"),
            "n_events",
        )
    )


# --- Count-min sketch heavy hitters ----------------------------------

_CMS_D = 4    # hash rows (error probability decays as 2^-d)
_CMS_W = 512  # buckets per row (overestimate ~ 2N/w)
_CMS_TOPK = 20



def cms_bucket(tok_col, j_col):
    """Portable CMS bucket: md5-prefix of 'cms{j}:{token}' mod _CMS_W —
    identical hex/arithmetic in Spark and DuckDB (the sampling.py
    idiom)."""
    h = F.md5(
        F.concat(F.lit("cms"), j_col.cast("string"), F.lit(":"), tok_col).cast(
            "binary"
        )
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _CMS_W


def _cms_rows(spark: SparkSession) -> DataFrame:
    return spark.range(_CMS_D).select(F.col("id").cast("int").alias("j"))


def token_counts(docs: DataFrame) -> DataFrame:
    """documents(text) -> (w, n) whitespace token counts (the
    q_token_freq aggregate)."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def cms_cells(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """(w, n) token counts -> (j, b, cnt) count-min cells. Additive in
    the input: cells of a union of corpora = elementwise sum of their
    cells — the mergeability streaming/sketches.py builds on."""
    js = _cms_rows(spark)
    return (
        counts.crossJoin(F.broadcast(js))
        .groupBy("j", cms_bucket(F.col("w"), F.col("j")).alias("b"))
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


@query(
    "q_countmin",
    oracle=(
        "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w "
        "FROM documents), "
        "c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tok "
        "WHERE w <> '' GROUP BY w), "
        f"js AS (SELECT unnest(range({_CMS_D})) AS j), "
        "cell AS (SELECT j, "
        "CAST('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':' || w), "
        f"1, 8) AS BIGINT) % {_CMS_W} AS b, "
        "CAST(SUM(n) AS BIGINT) AS cnt FROM c, js GROUP BY j, b), "
        f"top AS (SELECT w, n FROM c ORDER BY n DESC, w LIMIT {_CMS_TOPK}), "
        "probe AS (SELECT top.w, top.n, js.j, "
        "CAST('0x' || substr(md5('cms' || CAST(js.j AS VARCHAR) || ':' || "
        f"top.w), 1, 8) AS BIGINT) % {_CMS_W} AS b FROM top, js) "
        "SELECT probe.w AS token, MAX(probe.n) AS n_exact, "
        "CAST(MIN(cell.cnt) AS BIGINT) AS n_est, "
        "CAST(MIN(cell.cnt) - MAX(probe.n) AS BIGINT) AS overcount "
        "FROM probe JOIN cell ON cell.j = probe.j AND cell.b = probe.b "
        "GROUP BY probe.w"
    ),
    tags=("scale", "sketch", "text"),
)
def q_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode–Muthukrishnan) heavy-hitter estimates:
    a 4×512 counter matrix replaces the unbounded token-frequency
    table; each token's estimate is the MIN of its 4 hashed cells —
    never an undercount, overcount bounded by ~2N/w per row. THE
    mergeable fixed-memory answer to "top tokens over 100 TB" when
    even the vocabulary doesn't fit (8 KB of counters here vs the full
    q_token_freq table); per-partition sketches ADD elementwise, so
    the whole stream folds map-side exactly like q_hll_sketch's
    registers.

    Implementation: cell(j,b) = Σ counts of tokens hashing to b under
    row j — algebraically identical whether folded from the raw stream
    or from the per-token count table; the engine folds token counts
    first (one map-combinable shuffle, the same aggregate q_token_freq
    runs) so the 4-way hash explosion touches |vocab| rows, not
    |stream|. Hashing is the portable md5-prefix idiom (identical hex
    in both engines); probes are the exact top-20 tokens, so the
    oracle checks estimate AND overcount bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    c = token_counts(d)
    js = _cms_rows(spark)
    cell = cms_cells(spark, c)
    top = c.orderBy(F.desc("n"), F.asc("w")).limit(_CMS_TOPK)
    probe = top.crossJoin(F.broadcast(js)).select(
        "w", "n", "j", cms_bucket(F.col("w"), F.col("j")).alias("b")
    )
    return (
        probe.join(cell, ["j", "b"])
        .groupBy("w")
        .agg(
            F.max("n").alias("n_exact"),
            F.min("cnt").cast("bigint").alias("n_est"),
            (F.min("cnt") - F.max("n")).cast("bigint").alias("overcount"),
        )
        .select(F.col("w").alias("token"), "n_exact", "n_est", "overcount")
    )
