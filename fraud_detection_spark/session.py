"""SparkSession factory tuned for the engine.

Local test mode runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
same settings scale to a multi-executor cluster because every knob here
is about the *logical* plan (AQE, shuffle partitioning, Arrow) rather
than hand-placed physical scheduling.

Scale notes (100 TB posture):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces hand-tuned ``spark.sql.shuffle.partitions`` at scale.
- Arrow on: every pandas_udf / mapInPandas boundary is Arrow-batched.
- UTC session timezone: deterministic timestamp semantics, matching the
  DuckDB oracle (naive timestamps treated as UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "fraud_detection_spark") -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def health_check(spark: SparkSession) -> dict:
    """Liveness/readiness probe (reference /status + /health,
    api/app.py:130-175): a trivial query proves the session executes;
    streaming query states are reported per active stream."""
    ok = spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
    return {
        "session": "UP" if ok else "DOWN",
        "version": spark.version,
        "streams": {
            q.name or q.id: ("ACTIVE" if q.isActive else "STOPPED")
            for q in spark.streams.active
        },
    }
