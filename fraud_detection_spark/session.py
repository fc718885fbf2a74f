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
        # Python-client call-site capture (DataFrame debugging context,
        # Spark 4 default ON) wraps EVERY DataFrame/Column op in ~3
        # extra py4j round trips (conf.get + origin set/clear) plus a
        # stack inspection. At ~1 ms per round trip that tax dominates
        # plan CONSTRUCTION for expression-heavy operators (measured
        # r16: interleaved A/B halves q_friedman/q_autocorrelation/
        # q_delong construction; the 178-query suite spends ~50% of
        # wall-clock in construction). Client-side only: plans,
        # results and scale posture are bit-identical — the flag only
        # drops the py4j chatter that attaches Python call sites to
        # JVM error messages (guide §1.2 "per-task work" applied to
        # the driver's own hot loop).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ADVICE r16: PySpark latches is_debugging_enabled process-globally
    # (pyspark/errors/utils.py: _enable_debugging_cache) at the FIRST
    # DataFrame op against the then-active session. If a session
    # existed (or any DataFrame op ran) before this factory applied the
    # flag, the disable would silently not take effect for the process.
    # Make it deterministic: ensure the runtime conf is false even on a
    # reused pre-existing session, and reset the latch so the next op
    # re-reads the (now false) conf.
    if spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") != "false":
        spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
    import pyspark.errors.utils as _pyspark_errors_utils

    if getattr(_pyspark_errors_utils, "_enable_debugging_cache", None) is not False:
        _pyspark_errors_utils._enable_debugging_cache = None
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
