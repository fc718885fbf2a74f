"""Custom stateful streaming operator via applyInPandasWithState —
the Spark-native form of the reference's per-transaction status state
machine (PENDING -> COMPLETED, db/models.py:11-14, tracked across
retries in xai_tasks.py:116-133).

Operator: per-user running profile — event count, running mean value,
and last-seen epoch — maintained in the state store across
micro-batches. At scale the state is one small row per key,
checkpointed by the state store; no unbounded buffering.

Pickling contract: every function handed to applyInPandasWithState is
built by a factory as a CLOSURE over plain locals, so cloudpickle
serializes it by value. A module-level function pickles by reference
(worker does ``import fraud_detection_spark...``), which breaks the
moment the consuming driver's python workers don't have this repo on
their import path — verified by driving a vanilla session from a
foreign cwd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("last_seen_sec", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_sec", T.LongType()),
    ]
)


def _profile_updater():
    """Factory for the per-user profile state function (closure —
    ships by value, see module docstring)."""

    def update_user_profile(key, pdfs, state):
        """Merge this micro-batch's events for one user into the
        running (count, total, last_seen) state; emit the updated
        profile row."""
        import pandas as _pd

        n, total, last_sec = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                last_sec = max(last_sec, int(pdf["ts_sec"].max()))
        state.update((n, total, last_sec))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "mean_value": [total / n if n else 0.0],
                "last_seen_sec": [last_sec],
            }
        )

    return update_user_profile


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events(user_id, value, ts_sec) -> stateful per-user profile.
    Works on a streaming DataFrame; the same module's batch_profile()
    is the equivalence oracle used in tests."""
    return events.groupBy("user_id").applyInPandasWithState(
        _profile_updater(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_profile(events: DataFrame) -> DataFrame:
    """Batch-equivalent of the stateful operator (final state after all
    events) — used to verify streaming/batch parity."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        (F.sum("value") / F.count("*")).alias("mean_value"),
        F.max("ts_sec").alias("last_seen_sec"),
    )


# --- trailing-window velocity features (q_velocity's streaming twin) --

VELOCITY_OUTPUT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_sec", T.LongType()),
        T.StructField("n_1h", T.LongType()),
        T.StructField("amt_1h", T.DoubleType()),
    ]
)

# per-user ring of in-window events: parallel (ts, cents) arrays — one
# small bounded row per key in the state store, pruned every batch
VELOCITY_STATE = T.StructType(
    [
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("cents", T.ArrayType(T.LongType())),
    ]
)

_VEL_WINDOW_SEC = 3600


def _velocity_updater(window_sec: int = _VEL_WINDOW_SEC):
    """Factory for the trailing-window velocity state function
    (closure — ships by value, see module docstring)."""

    def update_velocity(key, pdfs, state):
        """Per-user trailing-1h velocity: for each event emit the count
        and fixed-point value sum of that user's events in [t-3600, t].

        RANGE-frame parity detail: the batch twin's RANGE window
        includes every row whose ts falls in the frame — including
        same-ts peers. So events are processed one *distinct
        timestamp* at a time: all events sharing a ts enter the buffer
        first, then each emits. Value cents use the engine's
        fixed-point convention (FLOOR(value·10⁴+0.5)) so streaming and
        batch sums are bit-equal.

        Ordering caveat (inherent to streaming): events arriving in a
        LATER micro-batch than a newer event (late data) are folded
        into the buffer when they arrive, but rows already emitted are
        not retracted — the batch form is the ground truth a backfill
        recomputes. The buffer is pruned to the newest-seen ts minus
        the window, so state per key stays bounded by the per-user
        in-window event rate."""
        import math

        import pandas as _pd

        if state.exists:
            ts_buf, cents_buf = list(state.get[0]), list(state.get[1])
        else:
            ts_buf, cents_buf = [], []
        batches = [pdf for pdf in pdfs if len(pdf)]
        if not batches:
            state.update((ts_buf, cents_buf))
            return
        ev = _pd.concat(batches, ignore_index=True).sort_values(
            ["ts_sec", "event_id"], kind="mergesort"
        )
        out_rows = []
        for t, grp in ev.groupby("ts_sec", sort=True):
            t = int(t)
            # admit the whole ts-cohort before emitting (RANGE peers)
            for _, r in grp.iterrows():
                ts_buf.append(t)
                cents_buf.append(
                    int(math.floor(float(r["value"]) * 10000 + 0.5))
                )
            lo = t - window_sec
            keep = [i for i, x in enumerate(ts_buf) if x >= lo]
            ts_buf = [ts_buf[i] for i in keep]
            cents_buf = [cents_buf[i] for i in keep]
            n = len(ts_buf)
            amt = sum(cents_buf) / 10000.0
            for _, r in grp.iterrows():
                out_rows.append((int(r["event_id"]), int(key[0]), t, n, amt))
        state.update((ts_buf, cents_buf))
        yield _pd.DataFrame(
            out_rows,
            columns=["event_id", "user_id", "ts_sec", "n_1h", "amt_1h"],
        )

    return update_velocity


def velocity_stream(events: DataFrame) -> DataFrame:
    """events(event_id, user_id, value, ts_sec) -> per-event trailing
    1h velocity features, maintained in the state store. Streaming twin
    of the declared batch operator q_velocity
    (operators/model_monitor.py) — the batch RANGE window IS the
    equivalence oracle (asserted in tests)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _velocity_updater(),
        outputStructType=VELOCITY_OUTPUT,
        stateStructType=VELOCITY_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- state API v2 twin (transformWithStateInPandas, Spark 4) --------


def _profile_processor():
    """Factory for the state-v2 per-user profile processor — the
    modern twin of _profile_updater built on transformWithStateInPandas
    (typed ValueState in the RocksDB state store, explicit lifecycle,
    timer support). Same math, same output schema; batch_profile stays
    the equivalence oracle. Returned from a factory and defined over
    plain locals for the same ship-by-value pickling contract as the
    v1 functions."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState(
                "profile", "n bigint, total double, last_sec bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as _pd

            if self._state.exists():
                n, total, last_sec = self._state.get()
            else:
                n, total, last_sec = 0, 0.0, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    last_sec = max(last_sec, int(pdf["ts_sec"].max()))
            self._state.update((n, total, last_sec))
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "mean_value": [total / n if n else 0.0],
                    "last_seen_sec": [last_sec],
                }
            )

        def close(self):
            pass

    return ProfileProcessor()


def user_profile_stream_v2(events: DataFrame) -> DataFrame:
    """State-API-v2 form of user_profile_stream. Requirements the
    caller/test must provide (both absent here degrade gracefully —
    the test skips, v1 remains the in-container path):

    - the RocksDB state store provider on the session:
        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    - protobuf on the python workers (the v2 worker protocol is
      proto-based; this container has no protobuf and pip installs are
      not allowed, so the path is declared + test-gated, exactly like
      the Kafka connector jar in streaming/sockets.py).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        _profile_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
