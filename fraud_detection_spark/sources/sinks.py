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


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of the given numeric columns.

    Each column is min-max scaled to ``bits`` levels with a broadcast
    stats row, then the bit planes are interleaved MSB-first into one
    BIGINT sort key — pure codegen integer math (shiftleft/or), no UDF.
    Returns (key_column_builder) taking the stats-joined DataFrame.

    The interleaved key must fit a signed BIGINT: ``len(cols) * bits``
    may not exceed 63, else the interleave silently overflows into the
    sign bit and produces wrapped/negative keys — a broken clustering
    layout, not an error (ADVICE r6). Guarded explicitly.
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(
            f"zorder_key: {len(cols)} cols x {bits} bits = "
            f"{len(cols) * bits} key bits > 63 (BIGINT sign-bit overflow); "
            f"use bits <= {63 // len(cols)}"
        )

    def key(df):
        quant = []
        for c in cols:
            lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
            q = F.floor(
                (F.col(c) - lo) / ((hi - lo) / (1 << bits) + F.lit(1e-300))
            ).cast("bigint")
            quant.append(F.least(q, F.lit((1 << bits) - 1)))
        one = F.lit(1).cast("bigint")
        z = F.lit(0).cast("bigint")
        for plane in range(bits - 1, -1, -1):
            for qc in quant:
                # bitwiseOR/AND, not |/& (those are Column LOGICAL ops)
                z = F.shiftleft(z, 1).bitwiseOR(
                    F.shiftright(qc, plane).bitwiseAND(one)
                )
        return z

    return key


def write_zorder(df, cols: list, path: str, bits: int = 16, files: int = 8) -> None:
    """Z-order clustered parquet write: range-partition + sort by the
    Morton key of ``cols`` so EVERY clustered column has narrow per-file
    (and per-row-group) min/max ranges — multi-column data skipping,
    where a plain sort helps only its leading column. This is the
    Delta/Iceberg OPTIMIZE ZORDER layout, built from primitives:
    broadcast min/max stats -> codegen'd bit interleave ->
    repartitionByRange(key) -> sortWithinPartitions(key) -> parquet.

    At 100 TB the win is row-group pruning on ANY clustered dimension:
    parquet footers carry min/max per column, and a Z-layout makes
    those ranges tight for all ``cols`` simultaneously (verified by the
    bounding-box test, which reads the written footers)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[
            s
            for c in cols
            for s in (
                F.min(c).alias(f"__min_{c}"),
                F.max(c).alias(f"__max_{c}"),
            )
        ]
    )
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "__z", zorder_key(cols, bits)(df)
    )
    (
        keyed.repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
