"""Entity resolution / record linkage.

A fraud platform constantly reconciles dirty entity mentions (merchant
strings, account names) against a clean master list; the reference has
no entity layer at all (its rows are anonymous PCA features). This
module implements the standard blocked fuzzy-linkage shape — and makes
it *oracle-checkable* by planting the dirt deterministically: every
master name is corrupted by dropping one hash-chosen character, then
the linker must recover the parent. Both the corruption and the link
are pure SQL, so DuckDB verifies the whole round trip bit-exactly, and
the planted ground truth turns precision into a testable invariant
instead of an anecdote.

Pipeline (one declared query):
  master  = part(p_partkey, p_name)
  dirty   = drop char at pos 5 + md5(key) % (len-5)   -- keeps the
            4-char blocking prefix intact by construction
  block   = equal 4-char prefix AND |len(a)-len(b)| <= 1  (the cheap
            codegen'd length cut BEFORE levenshtein — q_edit_distance's
            scale rule)
  score   = levenshtein <= 3
  resolve = best (lowest distance, then lowest key) master per dirty
            record via a window over the candidate set

Scale: candidates exist only within a block (prefix × length band), so
the join is an equi-join on the block key with a residual band filter —
never all-pairs; the resolve window partitions by the dirty id. The
O(len²) levenshtein runs on blocked candidates only, after the free
length cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.registry import query
from fraud_detection_spark.sources import load_table

# position of the dropped character: 5 + md5-hash % (len-5); the first
# four characters survive, so blocking on them is sound by construction
_POS_SQL = (
    "5 + CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 4) AS BIGINT)"
    " % (length(p_name) - 5)"
)
_DIRTY_SQL = (
    "SELECT p_partkey AS d_id, p_name AS orig_name, "
    f"substr(p_name, 1, CAST({_POS_SQL} AS INT) - 1) || "
    f"substr(p_name, CAST({_POS_SQL} AS INT) + 1) AS d_name "
    "FROM part WHERE length(p_name) > 6"
)


@query(
    "q_record_linkage",
    oracle=(
        f"WITH dirty AS ({_DIRTY_SQL}), "
        # resolve DISTINCT strings, not rows: the fuzzy join runs on
        # |distinct mentions| x |master entities|, then maps back
        "masters AS (SELECT p_name AS m_name, MIN(p_partkey) AS rep_id "
        "FROM part GROUP BY p_name), "
        "mentions AS (SELECT DISTINCT d_name FROM dirty), "
        "cand AS (SELECT n.d_name, m.m_name, m.rep_id, "
        "levenshtein(n.d_name, m.m_name) AS lev "
        "FROM mentions n JOIN masters m "
        "ON substr(n.d_name, 1, 4) = substr(m.m_name, 1, 4) "
        "AND abs(length(n.d_name) - length(m.m_name)) <= 1 "
        "AND levenshtein(n.d_name, m.m_name) <= 3), "
        "best AS (SELECT d_name, m_name, rep_id, CAST(lev AS INT) AS lev, "
        "ROW_NUMBER() OVER (PARTITION BY d_name ORDER BY lev, m_name) AS rk "
        "FROM cand) "
        "SELECT d.d_id, b.rep_id AS match_id, b.lev, "
        "CAST(CASE WHEN d.orig_name = b.m_name THEN 1 ELSE 0 END AS INT) AS hit "
        "FROM dirty d JOIN best b ON d.d_name = b.d_name AND b.rk = 1"
    ),
    tags=("linkage", "dedup", "join"),
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage with planted ground truth (module
    docstring). Entity identity is the NAME, not the row key — the
    synthetic part table reuses ~64 names across thousands of rows, so
    the resolution target is the master ENTITY (name + its minimum
    part key as representative id); ``hit`` marks dirty records
    resolved to their parent's name. Accuracy is oracle-checked and
    the test asserts ≥95% (a miss needs a DIFFERENT name within edit
    distance of the one-char-dropped variant inside the same block).

    Scale lesson (caught by the bench, not by correctness): the naive
    row×row blocked join was quadratic in duplicate names — prefix
    blocks of thousands of identical strings levenshtein'd each other
    for 49.7 s at sf0.1. The standard fix is to resolve DISTINCT
    strings once: |distinct mentions| × |master entities| candidates
    (bounded by vocabulary, not rows), then broadcast the resolved map
    back over the mention rows (0.9 s, same output). At 100 TB this is
    exactly how string-heavy linkage survives: score unique strings,
    join results back."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    pos = (
        F.lit(5)
        + F.conv(
            F.substring(F.md5(F.col("p_partkey").cast("string").cast("binary")), 1, 4),
            16,
            10,
        ).cast("bigint")
        % (F.length("p_name") - 5)
    ).cast("int")
    # expr-based substring: the drop position is a column, and
    # F.substring takes only literal positions
    dirty = (
        p.filter(F.length("p_name") > 6)
        .withColumn("__pos", pos)
        .select(
            F.col("p_partkey").alias("d_id"),
            F.col("p_name").alias("orig_name"),
            F.expr(
                "concat(substr(p_name, 1, __pos - 1), substr(p_name, __pos + 1))"
            ).alias("d_name"),
        )
    )
    masters = p.groupBy(F.col("p_name").alias("m_name")).agg(
        F.min("p_partkey").alias("rep_id")
    )
    mentions = dirty.select("d_name").distinct()
    cand = (
        mentions.join(
            masters,
            on=[
                F.substring("d_name", 1, 4) == F.substring("m_name", 1, 4),
                F.abs(F.length("d_name") - F.length("m_name")) <= 1,
            ],
        )
        .withColumn("lev", F.levenshtein("d_name", "m_name").cast("int"))
        .filter(F.col("lev") <= 3)
    )
    w = Window.partitionBy("d_name").orderBy("lev", "m_name")
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("d_name", "m_name", "rep_id", "lev")
    )
    return dirty.join(F.broadcast(best), "d_name").select(
        "d_id",
        F.col("rep_id").alias("match_id"),
        "lev",
        (F.col("orig_name") == F.col("m_name")).cast("int").alias("hit"),
    )
