"""Sinks: parquet/CSV/JSON writers with partitioned layout.

Reference parity: df.to_csv (eda.py:46), np.savez_compressed
(preprocess.py:49 — replaced outright by parquet), joblib artifacts
(preprocess.py:52-57 — replaced by MLlib PipelineModel.save), JDBC
upsert (api/worker.py:90-99 — the streaming module's foreachBatch
MERGE covers it; a real cluster would use df.write.jdbc or Delta
MERGE INTO).

Scale posture: ``write_partitioned`` materializes hive-style
``col=value`` directories, so downstream readers get *partition
pruning* — a filter on the partition column skips whole directories
before any IO. This is the physical design lever for 100 TB tables
(partition by date/tenant; bucket by join key where co-located joins
matter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-partitioned write (the 100 TB table layout)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink (reference df.to_csv parity, eda.py:46)."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read back a partitioned layout; partition-column filters prune
    directories (verify via PartitionFilters in .explain())."""
    return spark.read.format(fmt).load(path)
