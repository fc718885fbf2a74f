"""Event-time window operators — batch-equivalent forms of the
Structured Streaming semantics (SURVEY.md §2g): tumbling / sliding /
session windows, stream dedup, per-key lag deltas.

The reference's online path is a hand-built micro-batch stream (Celery
queue, api/app.py:242-250 -> xai_tasks.py:63-167); Spark's windowed
aggregations subsume it. These declared queries run the *same* window
expressions batch-side so the DuckDB oracle can verify them; the real
``readStream`` path reuses identical column logic in
fraud_detection_spark/streaming/serving.py.

Time handling: events.ts is parquet TIMESTAMP(NANOS) — Spark loads it
as epoch nanos (LongType, see sources.tables), DuckDB truncates it to
its µs TIMESTAMP. Window boundaries are emitted as epoch seconds
(BIGINT) via *integer* arithmetic on both engines (Spark ``div``,
DuckDB ``epoch_ns // ...``) — timezone-proof and precision-exact.
Spark-side windows use the native F.window/F.session_window operators
on the µs-precision timestamp (``ts_m``), matching DuckDB's precision.

Scale posture: tumbling/session windows are hash aggregates keyed by
(bucket) or (user, session) — partial aggregation applies; the sliding
window expands each row into exactly window/slide = 2 rows before
aggregating (same expansion streaming uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fixed_sum, pround
from fraud_detection_spark.registry import query, sql_fixed_sum, sql_round
from fraud_detection_spark.sources import events_with_time, load_table

# epoch seconds from the ns timestamp, integer-exact, both engines
_SEC_SQL = "(epoch_ns(ts) // 1000000000)"


@query(
    "q_tumbling_window",
    oracle=(
        f"SELECT ({_SEC_SQL} // 600) * 600 AS window_start, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        f"{sql_fixed_sum('value', 4)} AS sum_value "
        "FROM events GROUP BY window_start"
    ),
    tags=("window", "streaming"),
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time window via the native
    F.window(ts, '10 minutes') aggregate (the streaming form adds
    withWatermark; the expression is identical)."""
    ev = events_with_time(spark, sf_dir)
    w = F.window("ts_m", "10 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            fixed_sum(F.col("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_sliding_window",
    oracle=(
        f"WITH e AS (SELECT {_SEC_SQL} AS t, value FROM events), "
        "x AS (SELECT (t // 300) * 300 AS window_start, value FROM e "
        "UNION ALL SELECT (t // 300) * 300 - 300 AS window_start, value FROM e) "
        "SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_events, "
        f"{sql_fixed_sum('value', 4)} AS sum_value FROM x GROUP BY window_start"
    ),
    tags=("window", "streaming"),
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-minute length, 5-minute slide): every event
    belongs to exactly two windows. Native F.window expansion; the
    oracle reproduces it with an explicit two-bucket UNION ALL."""
    ev = events_with_time(spark, sf_dir)
    w = F.window("ts_m", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            fixed_sum(F.col("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_session_window",
    oracle=(
        "WITH o AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) IS NULL OR "
        "ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        ">= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), "
        "s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id "
        "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o) "
        "SELECT user_id, CAST(epoch_ns(MIN(ts)) // 1000000000 AS BIGINT) AS session_start, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, sid"
    ),
    tags=("window", "streaming"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window per user, 30-minute inactivity gap — the native
    F.session_window aggregate (streaming-capable, state-store backed
    in a real stream). Oracle: classic lag/cumsum gap construction.
    Spark's session end is EXCLUSIVE (a gap of exactly 30 min starts a
    new session), so the oracle's new-session predicate is >=, not >."""
    ev = events_with_time(spark, sf_dir)
    sw = F.session_window("ts_m", "30 minutes")
    return (
        ev.groupBy("user_id", sw.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )


@query(
    "q_stream_dedup",
    oracle=(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT DISTINCT event_id, event_type FROM ("
        "SELECT event_id, event_type FROM events "
        "UNION ALL SELECT event_id, event_type FROM events)) GROUP BY event_type"
    ),
    tags=("dedup", "streaming"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates over an at-least-once event stream (duplicate
    delivery simulated by self-union) — batch analog of streaming
    dropDuplicates('event_id') with watermark-bounded state."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    doubled = ev.unionByName(ev)
    return (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_lag_delta",
    oracle=(
        f"SELECT event_id, {sql_round('value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)', 4)} "
        "AS delta FROM events"
    ),
    tags=("window",),
)
def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value delta vs previous event (LAG) — the ordered-scan
    primitive behind the reference's ROC sweep (evaluate_model.py:49)
    and trapezoid AUC (evaluate_model.py:50). Partitioned by user =>
    parallel, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        pround(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


_DEBOUNCE_SEC = 600


@query(
    "q_debounce",
    oracle=(
        "WITH e AS (SELECT event_id, user_id, event_type, "
        "(epoch_ns(ts) // 1000000000) AS ts_sec FROM events), "
        "g AS (SELECT *, ts_sec - LAG(ts_sec) OVER "
        "(PARTITION BY user_id, event_type ORDER BY ts_sec, event_id) AS gap "
        "FROM e) "
        "SELECT event_id, user_id, event_type, "
        "CAST(CASE WHEN gap IS NOT NULL AND gap <= 600 THEN 1 ELSE 0 END "
        "AS INT) AS is_bounce "
        "FROM g"
    ),
    tags=("dedup", "window", "streaming"),
)
def q_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: flag repeat events of the same (user, type) arriving
    within 10 minutes of the previous one — duplicate *submissions*
    (double-click, retry storm) rather than duplicate *deliveries*
    (exact event_id replays, which q_stream_dedup handles). Downstream
    keeps ``is_bounce = 0`` rows. The classic event-stream hygiene
    filter between ingestion and feature computation.

    One LAG over a (user_id, event_type)-partitioned window — single
    shuffle, no state; the streaming twin is dropDuplicatesWithinWatermark
    on the composite key. Flagging (not dropping) keeps the operator a
    per-row annotation so the oracle checks every row."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000000").alias("ts_sec"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_sec", "event_id")
    gap = F.col("ts_sec") - F.lag("ts_sec").over(w)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        (gap.isNotNull() & (gap <= _DEBOUNCE_SEC)).cast("int").alias("is_bounce"),
    )
