"""ORC source/sink — the second columnar format a Spark warehouse
speaks natively (no extra jars; spark-avro/Delta need packages this
container lacks, so the format-portability story is carried by ORC).

Reference parity: the reference persists intermediates as CSV/npz
(eda.py:46, preprocess.py:49); a warehouse replaces those with a
columnar format. Parquet is the engine default (sources/tables.py);
ORC here proves the scan/sink layer is format-agnostic and that the
same Catalyst contracts hold: predicate pushdown into the ORC reader
(PushedFilters), column pruning (ReadSchema), and hive-partitioned
layouts with PartitionFilters — all asserted in
tests/test_orc_roundtrip.py.

Scale posture: identical to the parquet path — ORC carries min/max
stride statistics and bloom filter support, so pushed predicates skip
stripes the way parquet skips row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
    """ORC sink, optionally hive-partitioned."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — filters and projections push down exactly like
    parquet (asserted in tests via PushedFilters / ReadSchema)."""
    return spark.read.orc(path)
