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
from pyspark.sql import types as T

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


# --- Page-Hinkley online changepoint (q_page_hinkley's stream twin) --

PH_OUTPUT = T.StructType(
    [
        T.StructField("series", T.StringType()),
        T.StructField("day", T.LongType()),
        T.StructField("day_mean", T.DoubleType()),
        T.StructField("ph_inc", T.DoubleType()),
        T.StructField("ph_dec", T.DoubleType()),
        T.StructField("alarm", T.IntegerType()),
    ]
)

# PH accumulators + the open-day partial buffer (parallel arrays).
#
# CHECKPOINT COMPATIBILITY (ADVICE r13 #3): round 13 appended two
# fields (last_closed, late_rows_dropped) to this struct. A streaming
# query restored from a pre-round-13 checkpoint carries 9-field state:
# Spark's state-schema compatibility check (on by default,
# spark.sql.streaming.stateStore.stateSchemaCheck) fails such a resume
# with StateSchemaNotCompatible — the ONLY supported upgrade path is a
# FRESH checkpoint directory (the monitor is a derived view; its state
# rebuilds from the source feed). Disabling the schema check does NOT
# make the old checkpoint readable: the stored 9-field UnsafeRow bytes
# would be reinterpreted JVM-side against the 11-field schema
# (misaligned offsets — garbage or a JVM error before Python sees the
# tuple). The 9-field pad in _ph_updater below is defense-in-depth for
# state handed over as a clean tuple (e.g. a replayed/migrated store),
# not a supported resume path.
PH_STATE = T.StructType(
    [
        T.StructField("i", T.LongType()),
        T.StructField("sx", T.DoubleType()),
        T.StructField("mi", T.DoubleType()),
        T.StructField("mmin", T.DoubleType()),
        T.StructField("md", T.DoubleType()),
        T.StructField("mdmin", T.DoubleType()),
        T.StructField("pend_days", T.ArrayType(T.LongType())),
        T.StructField("pend_units", T.ArrayType(T.LongType())),
        T.StructField("pend_cnts", T.ArrayType(T.LongType())),
        # watermark-violation bookkeeping (ADVICE r12 #1): the newest
        # day already closed and folded into i/sx, and the count of
        # late rows dropped because their day was <= last_closed —
        # folding them AFTER later days would corrupt the sequential
        # statistic for every subsequent day of the series.
        T.StructField("last_closed", T.LongType()),
        T.StructField("late_rows_dropped", T.LongType()),
    ]
)


def _ph_updater(delta: float, lam: float):
    """Factory for the per-series Page-Hinkley state function
    (closure — ships by value, see streaming/stateful.py's pickling
    contract). Every float op replicates q_page_hinkley's batch
    expression STRUCTURE exactly (same association order), so the
    emitted rows are bit-identical to the batch query's — asserted by
    the parity test, the same stream==batch discipline as every other
    streaming op in this package."""

    def update_ph(key, pdfs, state):
        import math as _math

        import pandas as _pd

        if state.exists:
            # defense-in-depth for legacy 9-field (pre-round-13) state
            # tuples delivered intact (a replayed/migrated store): pad
            # the two appended bookkeeping fields with their no-history
            # defaults. NOT a checkpoint-resume path — see the PH_STATE
            # compatibility note (ADVICE r13 #3)
            got = tuple(state.get)
            if len(got) == 9:
                got = got + (None, 0)
            (
                i, sx, mi, mmin, md, mdmin, pd_, pu_, pc_,
                last_closed, late_dropped,
            ) = got
            pend = {d: [u, c] for d, u, c in zip(pd_, pu_, pc_)}
        else:
            i, sx, mi, mmin, md, mdmin = 0, 0.0, 0.0, None, 0.0, None
            pend = {}
            mmin = float("inf")
            mdmin = float("inf")
            last_closed = None
            late_dropped = 0
        for pdf in pdfs:
            for day, grp in pdf.groupby("day"):
                # watermark violation (ADVICE r12 #1): a day at or
                # before the newest CLOSED day has already been folded
                # into i/sx — buffering it would close it out of order
                # later and corrupt every subsequent PH value for this
                # series. Drop it and count it; parity with the batch
                # query holds only for the in-order feed, which is the
                # documented upstream contract.
                if last_closed is not None and int(day) <= last_closed:
                    late_dropped += int(len(grp))
                    continue
                # per-row fixed-point units, the engine-wide fixed_sum
                # discipline (python floor == Spark FLOOR on doubles)
                units = int(
                    sum(
                        int(_math.floor(v * 10000 + 0.5))
                        for v in grp["value"].astype(float)
                    )
                )
                cur = pend.setdefault(int(day), [0, 0])
                cur[0] += units
                cur[1] += int(len(grp))
        out = []
        if pend:
            hi = max(pend)
            # close every day strictly before the newest open day —
            # event-time monotone closure (the upstream feed is
            # watermark-ordered at day grain; late rows for a closed
            # day would be a watermark violation upstream too)
            for day in sorted(d for d in pend if d < hi):
                units, cnt = pend.pop(day)
                last_closed = day if last_closed is None else max(
                    last_closed, day
                )
                y = float(units) / 10000 / cnt
                x = _math.floor(y * 10000 + 0.5) / 10000
                i += 1
                sx += x
                ti = x - sx / i - delta
                td = sx / i - x - delta
                mi += ti
                md += td
                mmin = mi if mi < mmin else mmin
                mdmin = md if md < mdmin else mdmin
                phi = mi - mmin
                phd = md - mdmin
                out.append(
                    {
                        "series": key[0],
                        "day": day,
                        "day_mean": _math.floor(x * 10000 + 0.5) / 10000,
                        "ph_inc": _math.floor(phi * 1000000 + 0.5) / 1000000,
                        "ph_dec": _math.floor(phd * 1000000 + 0.5) / 1000000,
                        "alarm": int(phi > lam or phd > lam),
                    }
                )
        days = sorted(pend)
        state.update(
            (
                i,
                sx,
                mi,
                mmin,
                md,
                mdmin,
                days,
                [pend[d][0] for d in days],
                [pend[d][1] for d in days],
                last_closed,
                late_dropped,
            )
        )
        if out:
            yield _pd.DataFrame(out)

    return update_ph


def page_hinkley_stream(
    events: DataFrame,
    delta: float | None = None,
    lam: float | None = None,
    series_expr=None,
) -> DataFrame:
    """events(ts nanos, value) -> online two-sided Page-Hinkley rows
    per closed event-time day, exact twin of
    operators/timeseries.py::q_page_hinkley (δ/λ default to its
    literals). A day closes when a later day FOR THAT SERIES appears —
    emit-on-close; the newest open day stays buffered in state (one
    (units, count) pair per open day, O(1) in practice). Rows whose
    day is at or before the series' newest CLOSED day are watermark
    violations and are DROPPED (counted in state, ADVICE r12 #1) —
    folding them out of order would corrupt i/sx and every subsequent
    PH value; stream==batch parity is over the in-order feed.

    ``series_expr`` keys the monitor: default is the single 'amount'
    series (the q_page_hinkley twin); pass a column/expression (e.g.
    ``F.col('event_type')``) to run one INDEPENDENT PH monitor per
    key — each key carries its own accumulators and day closure in
    the state store, which is exactly how a per-feature drift
    deployment fans out (multi-key parity is test-asserted).

    Scale: state is a handful of scalars per series key. The
    sequential statistic is inherently single-series, so the per-key
    shuffle is the algorithm, not a bottleneck: every upstream event
    fold is map-side-combinable before the keyed stage at day grain."""
    from fraud_detection_spark.operators.timeseries import PH_DELTA, PH_LAMBDA

    d = delta if delta is not None else PH_DELTA
    w = lam if lam is not None else PH_LAMBDA
    series = (
        F.lit("amount")
        if series_expr is None
        else (F.col(series_expr) if isinstance(series_expr, str) else series_expr)
    )
    keyed = events.select(
        series.cast("string").alias("series"),
        F.expr("ts div 1000000000 div 86400").cast("long").alias("day"),
        F.col("value"),
    )
    from pyspark.sql.streaming.state import GroupStateTimeout

    return keyed.groupBy("series").applyInPandasWithState(
        _ph_updater(d, w),
        outputStructType=PH_OUTPUT,
        stateStructType=PH_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
