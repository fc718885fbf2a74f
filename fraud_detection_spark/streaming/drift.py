"""Streaming input-drift monitor — the online twin of the batch
monitoring pair q_cusum (when did the mean move) + q_psi (how far did
the distribution move).

A deployed scorer's first failure mode is silent input drift (the
reference serves with zero distribution checks, deploy.py:36-44).
This operator watches the event stream per event-time day and emits,
per closed window:

    n          events in the day
    day_mean   exact fixed-point mean amount (layout-independent)
    psi        population-stability index of the day's amount
               histogram against a published reference distribution
               (10 fixed [0,100) bands, Laplace-smoothed so empty
               bands stay finite)

Engineering notes:
- Plain event-time windowed aggregation — no custom state: Spark's
  windowed agg IS the right stateful operator here, with watermarks
  bounding state and late data folded per event-time semantics.
- Window boundaries are epoch-aligned on the internal microsecond
  value (``timestamp_seconds`` -> ``window('1 day')``), so day ids
  match the batch twin's integer ``ts_sec div 86400`` under ANY
  session timezone (asserted by the parity test on a vanilla-style
  session).
- The day's mean uses per-row fixed-point units (the engine-wide
  ``fixed_sum`` discipline), so stream/batch parity is exact, not
  approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Published reference shares for the 10 amount bands [0,10), ... [90,100):
# the uniform prior a fraud amount screen starts from before learning the
# live mix. Any fixed reference works — PSI measures distance from it.
REF_SHARES = [0.1] * 10
_SMOOTH = 0.5  # Laplace count added per band


def _band_aggs():
    return [
        F.sum(
            (F.floor(F.col("value") / 10).cast("int") == i).cast("long")
        ).alias(f"b{i}")
        for i in range(10)
    ]


def _drift_select(grouped: DataFrame, day_col) -> DataFrame:
    n = F.col("n").cast("double")
    psi = None
    for i, ref in enumerate(REF_SHARES):
        share = (F.col(f"b{i}") + F.lit(_SMOOTH)) / (n + F.lit(_SMOOTH * 10))
        term = (share - F.lit(ref)) * F.log(share / F.lit(ref))
        psi = term if psi is None else psi + term
    return grouped.select(
        day_col.alias("day"),
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("units").cast("double") / 10000 / F.col("n")
        ).alias("day_mean_raw"),
        psi.alias("psi_raw"),
    ).select(
        "day",
        "n",
        F.expr("floor(day_mean_raw * 10000 + 0.5) / 10000").alias("day_mean"),
        F.expr("floor(psi_raw * 1000000 + 0.5) / 1000000").alias("psi"),
    )


def drift_stream(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming form: ``events`` needs ``ts_sec`` (epoch seconds) and
    ``value``. One windowed aggregation; watermark bounds state."""
    with_ts = events.withColumn("_ets", F.timestamp_seconds(F.col("ts_sec")))
    grouped = (
        with_ts.withWatermark("_ets", watermark)
        .groupBy(F.window("_ets", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
            ).alias("units"),
            *_band_aggs(),
        )
    )
    day = (F.col("w.start").cast("long") / 86400).cast("bigint")
    return _drift_select(grouped, day)


def drift_batch(events: DataFrame) -> DataFrame:
    """Batch twin on the same input columns — the parity oracle for the
    stream (and the q_cusum/q_psi-shaped offline backfill)."""
    grouped = events.groupBy(
        F.expr("ts_sec div 86400").cast("bigint").alias("d")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
        ).alias("units"),
        *_band_aggs(),
    )
    return _drift_select(grouped, F.col("d"))


def session_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows per user (30-min inactivity gap):
    the stateful twin of the declared batch query q_session_window,
    sharing the native ``session_window`` aggregate — one definition
    of sessionhood for batch and stream, which is the whole point of
    Structured Streaming's unified model. State = open sessions only,
    closed by the watermark. ``events`` needs ``ts_m`` (a microsecond
    timestamp, as events_with_time provides) and ``user_id``."""
    return (
        events.withWatermark("ts_m", "1 day")
        .groupBy(F.col("user_id"), F.session_window("ts_m", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )


def structuring_stream(events: DataFrame) -> DataFrame:
    """The structuring screen (q_structuring) as a streaming
    aggregation: per-account totals and below-threshold band counts
    update as events arrive, so the flag flips ONLINE the moment an
    account crosses the rule — not at the nightly batch. Same band,
    same flag rule, exact parity with the batch query asserted in
    tests. State is one row per account (bounded by the account
    population); complete/update output modes both apply."""
    in_band = (
        (F.col("value") >= 81.0) & (F.col("value") < 90.0)
    ).cast("int")
    g = events.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(in_band).cast("bigint").alias("n_band"),
    )
    share = F.col("n_band") * 1.0 / F.col("n")
    # double math, not F.expr with a bare 0.09 literal (that parses as
    # DECIMAL and the output column comes back as decimal.Decimal)
    lift = F.floor(share / F.lit(0.09) * 1000000 + F.lit(0.5)) / 1000000
    return g.select(
        "user_id",
        "n",
        "n_band",
        lift.alias("lift"),
        ((F.col("n_band") >= 10) & (share > 0.18)).cast("int").alias("flag"),
    )
