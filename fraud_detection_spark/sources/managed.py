"""MERGE-INTO upsert on a Spark-SQL-managed table — the catalog twin
of the JDBC staging+MERGE recipe (sources/jdbc.py) and of the
reference's ``ON CONFLICT DO UPDATE`` result sink (api/worker.py:90-99).

Spark's MERGE INTO statement executes only against catalogs whose
tables implement row-level operations (DSv2 ``SupportsRowLevelOperations``
— Delta, Iceberg). The built-in ``spark_catalog`` with parquet tables
raises ``UNSUPPORTED_FEATURE.TABLE_OPERATION`` (verified on this
pyspark 4.1.2 build, no lakehouse jar in the sandbox). So:

- ``merge_into_managed`` first submits the real ``MERGE INTO`` SQL —
  the one-line production path once the table lives in Delta
  (``spark.read...write.format("delta").saveAsTable(...)`` plus
  ``--packages io.delta:delta-spark_2.13:<ver>``) or Iceberg;
- on ``UNSUPPORTED_FEATURE`` it falls back to the semantically
  identical join-rewrite: target LEFT ANTI staging (rows the merge
  leaves untouched) UNION staging (rows inserted-or-updated), written
  back with ``INSERT OVERWRITE``. This is upsert-by-key with
  last-writer-wins — exactly what MERGE's
  ``WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`` produces when the
  staging batch has unique keys.

Idempotence: replaying the same batch is a no-op (anti-join drops the
same rows, union re-adds identical ones) — asserted under replay in
tests/test_managed_merge.py, mirroring test_jdbc.py's replay test.

Scale posture: the anti-join shuffles on the merge key (AQE-coalesced,
broadcast when the batch is small — the common case for an upsert
batch); the overwrite is one atomic catalog commit. A lakehouse MERGE
additionally prunes untouched FILES — strictly better, same call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def _merge_sql(target: str, staging_view: str, key_cols: list[str], cols: list[str]) -> str:
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    set_ = ", ".join(f"{c} = s.{c}" for c in cols if c not in key_cols)
    ins_cols = ", ".join(cols)
    ins_vals = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {target} t USING {staging_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {set_} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def merge_into_managed(
    spark: SparkSession,
    target_table: str,
    updates: DataFrame,
    key_cols: list[str],
) -> str:
    """Upsert ``updates`` into managed ``target_table`` by ``key_cols``.

    Returns which path ran: ``"merge"`` (catalog executed MERGE INTO)
    or ``"join-rewrite"`` (portable fallback). ``updates`` must have
    unique keys (a MERGE precondition — Spark raises on multi-match,
    and the rewrite would pick an arbitrary winner otherwise)."""
    cols = spark.table(target_table).columns
    staging = "merge_staging_src"
    updates.select(*cols).createOrReplaceTempView(staging)
    try:
        spark.sql(_merge_sql(target_table, staging, key_cols, cols))
        return "merge"
    except Exception as ex:  # UnsupportedOperationException is not AnalysisException
        if "UNSUPPORTED_FEATURE" not in str(ex) and not isinstance(ex, AnalysisException):
            raise
    # join-rewrite fallback: untouched ⊎ upserted, one atomic overwrite.
    target = spark.table(target_table)
    untouched = target.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    merged = untouched.select(*cols).unionByName(updates.select(*cols))
    # materialize before overwriting the table being read (self-overwrite
    # of a v1 table would otherwise read-while-truncate)
    merged.localCheckpoint().createOrReplaceTempView("merge_staging_out")
    spark.sql(f"INSERT OVERWRITE TABLE {target_table} SELECT * FROM merge_staging_out")
    # v1 tables cache their file listing per session — without this a
    # reader that scanned the table before the overwrite sees (and
    # fails on) the deleted files
    spark.catalog.refreshTable(target_table)
    return "join-rewrite"


def scores_table_ddl(spark: SparkSession, table: str) -> None:
    """The reference's results-table shape (api/worker.py upsert target):
    one row per transaction with score + explanation payload."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} "
        "(txn_id BIGINT, fraud_score DOUBLE, model_version STRING, payload STRING) "
        "USING parquet"
    )


def upsert_scores(spark: SparkSession, table: str, batch: DataFrame) -> str:
    """Upsert a scored batch into the managed results table (the
    foreachBatch body for a streaming scorer; batch = one micro-batch).
    Deduplicates the batch on txn_id first (last write wins within a
    batch is meaningless for identical replays; for divergent ones the
    max-score row is the deterministic winner)."""
    scores_table_ddl(spark, table)
    w_rows = batch.groupBy("txn_id").agg(
        F.max(F.struct("fraud_score", "model_version", "payload")).alias("r")
    )
    deduped = w_rows.select(
        "txn_id", "r.fraud_score", "r.model_version", "r.payload"
    )
    return merge_into_managed(spark, table, deduped, ["txn_id"])
