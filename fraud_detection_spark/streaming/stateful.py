"""Custom stateful streaming operator via applyInPandasWithState —
the Spark-native form of the reference's per-transaction status state
machine (PENDING -> COMPLETED, db/models.py:11-14, tracked across
retries in xai_tasks.py:116-133).

Operator: per-user running profile — event count, running mean value,
and last-seen epoch — maintained in the state store across
micro-batches. At scale the state is one small row per key,
checkpointed by the state store; no unbounded buffering.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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


def update_user_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's events for one user into the running
    (count, total, last_seen) state; emit the updated profile row."""
    n, total, last_sec = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_sec = max(last_sec, int(pdf["ts_sec"].max()))
    state.update((n, total, last_sec))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "mean_value": [total / n if n else 0.0],
            "last_seen_sec": [last_sec],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """events(user_id, value, ts_sec) -> stateful per-user profile.
    Works on a streaming DataFrame; the same module's batch_profile()
    is the equivalence oracle used in tests."""
    return events.groupBy("user_id").applyInPandasWithState(
        update_user_profile,
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
