"""Stateful streaming twin of the session-path family (VERDICT r7 #5).

The batch journey analytics (q_session_paths / q_path_entropy /
q_session_stats, operators/behavior.py) sessionize the events table
with a 30-min inactivity gap and emit per-session path signatures.
The reference's online leg — the correlation-ID thread it gives every
request (api/app.py:121-128) — is exactly a LIVE session stream; this
module is that leg on Spark Structured Streaming.

Operator: ``session_path_stream`` — per-user gap sessionization in
``applyInPandasWithState``. State is ONE open session per user (sid,
last-seen sec, start sec, event count, first-8-step path signature):
bounded by |users|, never by events — a gap-free bot session holds 8
path steps and two timestamps no matter how long it runs. A session
row is emitted the moment a later event closes it (gap >= 1800 s) and
on idle timeout (ProcessingTimeTimeout), so the downstream frequency
table sees every finished journey without waiting for the user to
come back.

Semantics match the batch side exactly (the parity test feeds the
same events and asserts set-equality of (user_id, sid, path)):

- same gap convention: ``sec - last >= _SESSION_GAP_SEC`` opens a new
  session (the session_window exclusive-end convention);
- same total order: events walked by (ts_sec, event_id) — ties broken
  identically to the batch window's ORDER BY;
- same signature: first _PATH_MAX_STEPS event types joined by '>';
- sids are 1-based per user in event order, like the batch cumsum.

Cross-batch late data: a micro-batch is walked in timestamp order,
but an event EARLIER than the open session's last-seen that arrives
in a LATER micro-batch cannot be re-sequenced (its session already
advanced) — it extends the open session if within gap of last-seen,
else opens a new one. The batch twin, seeing all data at once, is the
ground truth the parity tests pin for in-order feeds; out-of-order
feeds get watermark-style best effort, the same trade every
streaming sessionizer makes.

Pickling contract: the state function is a closure built by a factory
(ships by value — see streaming/stateful.py's module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

# Same constants as operators/behavior.py's batch family — imported
# there from here would invert the dependency; both cite this pairing.
SESSION_GAP_SEC = 1800
PATH_MAX_STEPS = 8

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("sid", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("t0_sec", T.LongType()),
        T.StructField("t1_sec", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("sid", T.LongType()),
        T.StructField("last_sec", T.LongType()),
        T.StructField("t0_sec", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("path", T.StringType()),
    ]
)


def _session_updater(gap_sec: int, max_steps: int, idle_timeout_ms: int):
    """Factory for the per-user sessionizer (closure — ships by
    value). Emits one row per CLOSED session; keeps the open one in
    state; closes idle sessions via processing-time timeout."""

    def update_sessions(key, pdfs, state):
        import pandas as _pd

        user_id = key[0]
        out = []

        if state.hasTimedOut:
            # idle flush: the open session is over by definition
            sid, last, t0, n, path = state.get
            out.append((user_id, sid, path, n, t0, last))
            state.remove()
            yield _pd.DataFrame(
                out,
                columns=["user_id", "sid", "path", "n_events", "t0_sec", "t1_sec"],
            )
            return

        batch = _pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_sec", "event_id"], kind="mergesort")

        if state.exists:
            walker = state.get
        else:
            walker = _EMPTY_WALKER

        rows = zip(
            batch["ts_sec"].astype("int64"),
            batch["event_id"].astype("int64"),
            batch["event_type"].astype(str),
        )
        state.update(_walk_events(user_id, rows, walker, gap_sec, max_steps, out))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _pd.DataFrame(
            out,
            columns=["user_id", "sid", "path", "n_events", "t0_sec", "t1_sec"],
        )

    return update_sessions


def session_path_stream(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    max_steps: int = PATH_MAX_STEPS,
    idle_timeout_ms: int | None = SESSION_GAP_SEC * 1000,
) -> DataFrame:
    """events(user_id, ts_sec, event_id, event_type) — streaming —
    -> one row per closed session (SESSION_SCHEMA). State is one
    bounded row per user in the state store; shuffle is the same
    user_id hash the batch family pays once.

    ``idle_timeout_ms=None`` disables the idle flush (NoTimeout).
    Use that for availableNow BACKLOG runs: with a processing-time
    timer pending, availableNow cannot terminate until the timer
    fires in real time and spins no-data micro-batches while it
    waits (observed: a tight batch loop burning 32 cores for the
    full 30-min idle window). Continuous production streams keep the
    default so abandoned sessions still close."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _session_updater(gap_sec, max_steps, idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def path_frequencies(sessions: DataFrame) -> DataFrame:
    """Downstream of the sessionizer: corpus path-frequency table —
    the streaming feed of q_session_paths' `g` aggregate. Runs on the
    emitted (closed) sessions; one tiny hash aggregate per batch."""
    return sessions.groupBy("path").agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )


# ---------------------------------------------------------------------------
# Out-of-order feeds: bounded reorder buffer (VERDICT r8 #7)
# ---------------------------------------------------------------------------

REORDER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sid", T.LongType()),
        T.StructField("last_sec", T.LongType()),
        T.StructField("t0_sec", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("path", T.StringType()),
        T.StructField("buf_ts", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_et", T.ArrayType(T.StringType())),
        T.StructField("max_sec", T.LongType()),
    ]
)

_EMPTY_WALKER = (0, None, 0, 0, "")


def _walk_events(user_id, rows, walker, gap_sec, max_steps, out):
    """Advance the sessionizer over (sec, event_id, etype) rows
    (already sorted), appending closed sessions to ``out`` and
    returning the updated walker tuple — the exact loop
    ``_session_updater`` runs, factored so the reordered variant
    shares it verbatim."""
    sid, last, t0, n, path = walker
    for sec, _eid, etype in rows:
        sec = int(sec)
        if last is None or sec - last >= gap_sec:
            if last is not None:
                out.append((user_id, sid, path, n, t0, last))
            sid, t0, n, path = sid + 1, sec, 0, ""
        if n < max_steps:
            path = etype if n == 0 else path + ">" + etype
        n += 1
        last = sec
    return (sid, last, t0, n, path)


def _session_updater_reordered(gap_sec, max_steps, late_sec, idle_timeout_ms):
    """Factory for the watermark-buffered sessionizer (closure —
    ships by value). Events are HELD in a per-user reorder buffer and
    only walked once the per-user event-time frontier
    (max_seen_sec - late_sec) passes them, so an earlier-timestamped
    event arriving up to ``late_sec`` late — in any later micro-batch
    — is re-sequenced EXACTLY as the batch twin would order it. Only
    events later than the bound fall back to the best-effort
    append-to-open-session behavior of ``_session_updater`` (the
    documented trade; see the module docstring). Buffer size is
    bounded by each user's event volume inside the lateness window."""

    def update_sessions(key, pdfs, state):
        import pandas as _pd

        user_id = key[0]
        out = []
        cols = ["user_id", "sid", "path", "n_events", "t0_sec", "t1_sec"]

        if state.hasTimedOut:
            sid, last, t0, n, path, bts, beid, bet, _mx = state.get
            walker = (sid, last, t0, n, path)
            held = sorted(zip(bts or [], beid or [], bet or []))
            walker = _walk_events(user_id, held, walker, gap_sec, max_steps, out)
            sid, last, t0, n, path = walker
            if last is not None:
                out.append((user_id, sid, path, n, t0, last))
            state.remove()
            yield _pd.DataFrame(out, columns=cols)
            return

        batch = _pd.concat(list(pdfs), ignore_index=True)

        if state.exists:
            sid, last, t0, n, path, bts, beid, bet, max_sec = state.get
            walker = (sid, last, t0, n, path)
            pend = list(zip(bts or [], beid or [], bet or []))
        else:
            walker = _EMPTY_WALKER
            pend, max_sec = [], None

        for sec, eid, etype in zip(
            batch["ts_sec"].astype("int64"),
            batch["event_id"].astype("int64"),
            batch["event_type"].astype(str),
        ):
            sec = int(sec)
            pend.append((sec, int(eid), etype))
            max_sec = sec if max_sec is None else max(max_sec, sec)

        pend.sort()
        frontier = max_sec - late_sec
        ready = [r for r in pend if r[0] <= frontier]
        held = [r for r in pend if r[0] > frontier]
        walker = _walk_events(user_id, ready, walker, gap_sec, max_steps, out)

        sid, last, t0, n, path = walker
        state.update(
            (
                sid,
                last,
                t0,
                n,
                path,
                [r[0] for r in held],
                [r[1] for r in held],
                [r[2] for r in held],
                max_sec,
            )
        )
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _pd.DataFrame(out, columns=cols)

    return update_sessions


def session_path_stream_reordered(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    max_steps: int = PATH_MAX_STEPS,
    late_sec: int = SESSION_GAP_SEC,
    idle_timeout_ms: int | None = SESSION_GAP_SEC * 1000,
) -> DataFrame:
    """Out-of-order-tolerant twin of ``session_path_stream``
    (VERDICT r8 #7): identical emitted schema and in-order semantics,
    plus an exactness guarantee for late data — any event arriving at
    most ``late_sec`` of event time behind its user's newest seen
    event is re-sequenced into its true position before the
    sessionizer walks it (a bounded per-user reorder buffer in the
    state row; the walker only ever consumes events below the
    frontier max_seen - late_sec). Divergence from the batch ground
    truth is therefore possible ONLY beyond the lateness bound, where
    the best-effort in-order behavior applies — the parity tests pin
    both sides of the boundary.

    Cost vs the in-order twin: state carries the lateness window's
    events per user (bounded by rate x late_sec, not by history) and
    emission of a closed session waits until the frontier passes it —
    the standard watermark latency/completeness trade. Idle-timeout
    flush drains the buffer and closes the open session; pass
    ``idle_timeout_ms=None`` for availableNow backlog runs (same
    pending-timer spin documented on ``session_path_stream``) and
    flush with a max-timestamp sentinel instead."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _session_updater_reordered(gap_sec, max_steps, late_sec, idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=REORDER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
