"""Streaming session-path twin vs the batch family (VERDICT r7 #5).

Feeds the SAME events the batch q_session_paths family reads, sliced
into time-ordered files processed one per micro-batch (state must
carry open sessions across batches), and asserts the emitted closed
sessions are EXACTLY the batch sessionization minus each user's final
(still-open) session — (user_id, sid, path) set equality plus
n_events/t0/t1 value equality.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _batch_sessions(spark, sf_dir):
    """Batch ground truth: one row per (user_id, sid) with path
    (first-8 signature), n_events, t0/t1 — the _session_paths
    construction widened with the session aggregate."""
    from pyspark.sql import Window
    from fraud_detection_spark.operators.behavior import (
        _PATH_MAX_STEPS,
        _SESSION_GAP_SEC,
    )
    from fraud_detection_spark.sources import events_with_time

    ev = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    new_s = (
        F.lag("ts_sec").over(w).isNull()
        | (F.col("ts_sec") - F.lag("ts_sec").over(w) >= _SESSION_GAP_SEC)
    ).cast("int")
    s = ev.select(
        "user_id",
        "ts_sec",
        "event_id",
        "event_type",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("rn") <= _PATH_MAX_STEPS,
                        F.struct("ts_sec", "event_id", "event_type"),
                    )
                )
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    w_sess = Window.partitionBy("user_id", "sid").orderBy("ts_sec", "event_id")
    return (
        s.withColumn("rn", F.row_number().over(w_sess))
        .groupBy("user_id", "sid")
        .agg(
            path.alias("path"),
            F.count("*").cast("bigint").alias("n_events"),
            F.min("ts_sec").alias("t0_sec"),
            F.max("ts_sec").alias("t1_sec"),
        )
    )


def run_session_stream(spark, sf_dir, tmp_path, n_slices=3, query_name="sessions"):
    """Write events as n time-ordered slices and run ONE availableNow
    query per slice against the SAME checkpoint: micro-batch k sees
    exactly slice k, open sessions carry across batches through the
    state store — a deterministic in-order multi-batch feed that does
    not depend on file-listing order. Returns (emitted_pdf,
    wall_seconds, n_input_rows)."""
    import shutil
    import time

    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.sessions import session_path_stream

    ev = (
        events_with_time(spark, sf_dir)
        .select("user_id", "ts_sec", "event_id", "event_type")
        .orderBy("ts_sec", "event_id")
    )
    pdf = ev.toPandas()
    n = len(pdf)
    rows_per = (n + n_slices - 1) // n_slices
    src = tmp_path / "sess_src"
    src.mkdir()
    for i in range(n_slices):
        chunk = pdf.iloc[i * rows_per : (i + 1) * rows_per]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(src / f"slice_{i:03d}"))
    paths = sorted(str(p) for p in src.glob("slice_*"))

    schema = ev.schema
    ckpt = str(tmp_path / "sess_ckpt")
    out = str(tmp_path / "sess_out")
    staged = tmp_path / "staged"
    staged.mkdir()
    total_wall = 0.0
    for i, p in enumerate(paths):
        shutil.copytree(p, str(staged / f"s{i}"))
        stream_in = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(staged))
        t = time.time()
        # parquet sink, not memory: the memory sink cannot recover
        # from a checkpoint, and the per-slice restarts ARE recoveries
        q = (
            session_path_stream(stream_in, idle_timeout_ms=None)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        total_wall += time.time() - t
    got = spark.read.parquet(out).toPandas()
    return got, total_wall, n


def test_session_path_stream_matches_batch(spark, sf_dir, tmp_path):
    got, _, _ = run_session_stream(spark, sf_dir, tmp_path)

    batch = _batch_sessions(spark, sf_dir).toPandas()
    last_sid = batch.groupby("user_id")["sid"].transform("max")
    want = batch[batch["sid"] < last_sid]  # open sessions not yet emitted

    key = ["user_id", "sid"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s), (len(got_s), len(want_s))
    assert len(got_s) > 0
    for c in ["user_id", "sid", "path", "n_events", "t0_sec", "t1_sec"]:
        assert (got_s[c].values == want_s[c].values).all(), c


def test_path_frequencies_feed(spark, sf_dir, tmp_path):
    """The downstream frequency aggregate over emitted sessions equals
    q_session_paths' frequency table restricted to closed sessions."""
    from fraud_detection_spark.streaming.sessions import path_frequencies

    got, _, _ = run_session_stream(
        spark, sf_dir, tmp_path, query_name="sessions_freq"
    )
    sessions = spark.createDataFrame(got)
    freq = {
        r.path: r.n_sessions for r in path_frequencies(sessions).collect()
    }
    batch = _batch_sessions(spark, sf_dir).toPandas()
    last_sid = batch.groupby("user_id")["sid"].transform("max")
    closed = batch[batch["sid"] < last_sid]
    want = closed.groupby("path").size().to_dict()
    assert freq == want


def _run_sliced(spark, tmp_path, slices, stream_factory, subdir="re"):
    """Feed pandas slices one availableNow run per slice against one
    checkpoint (same harness as run_session_stream, parameterized by
    the stream constructor and an explicit slice list)."""
    import pandas as pd

    base = tmp_path / subdir
    base.mkdir()
    staged = base / "staged"
    staged.mkdir()
    ckpt, out = str(base / "ckpt"), str(base / "out")
    schema = "user_id bigint, ts_sec bigint, event_id bigint, event_type string"
    for i, chunk in enumerate(slices):
        if not len(chunk):
            continue
        spark.createDataFrame(pd.DataFrame(chunk)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staged / f"s{i}"))
        stream_in = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(staged))
        q = (
            stream_factory(stream_in)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out).toPandas()


def test_reordered_stream_resequences_scrambled_feed_exactly(
    spark, sf_dir, tmp_path
):
    """VERDICT r8 #7: with the reorder buffer and a lateness bound
    covering the scramble, a feed whose events are RANDOMLY shuffled
    across micro-batches must still emit exactly the batch ground
    truth — the r8 in-order twin documented this as impossible
    (cross-batch late events could not be re-sequenced)."""
    import numpy as np

    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.sessions import (
        session_path_stream_reordered,
    )

    pdf = (
        events_with_time(spark, sf_dir)
        .select("user_id", "ts_sec", "event_id", "event_type")
        .toPandas()
    )
    rng = np.random.default_rng(7)
    pdf = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    span = int(pdf["ts_sec"].max() - pdf["ts_sec"].min())
    late = span + 1

    n_slices = 4
    slices = list(np.array_split(np.arange(len(pdf)), n_slices))
    parts = [pdf.iloc[ix] for ix in slices]
    # sentinel: one far-future event per user pushes every user's
    # frontier past all real events AND closes their last session
    sent_ts = int(pdf["ts_sec"].max()) + late + 30 * 60 + 1
    users = pdf["user_id"].unique()
    import pandas as pd

    def flush_wave(ts, tag):
        return pd.DataFrame(
            {
                "user_id": users,
                "ts_sec": ts,
                "event_id": 10**12 + tag * 10**6 + np.arange(len(users)),
                "event_type": "flush",
            }
        )

    # two waves: wave 1 raises the frontier past every real event but
    # is itself held; wave 2 raises it past wave 1 so wave 1 is WALKED
    # and closes each user's final real session (wave 1's own session
    # stays open and unemitted, wave 2 stays held)
    parts.append(flush_wave(sent_ts, 1))
    parts.append(flush_wave(sent_ts + late + 1, 2))

    got = _run_sliced(
        spark,
        tmp_path,
        parts,
        lambda s: session_path_stream_reordered(
            s, late_sec=late, idle_timeout_ms=None
        ),
    )
    want = _batch_sessions(spark, sf_dir).toPandas()  # ALL sessions

    key = ["user_id", "sid"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s), (len(got_s), len(want_s))
    assert len(got_s) > 0
    for c in ["user_id", "sid", "path", "n_events", "t0_sec", "t1_sec"]:
        assert (got_s[c].values == want_s[c].values).all(), c


def test_reordered_stream_boundary_of_lateness_bound(spark, tmp_path):
    """Divergence appears ONLY beyond the lateness bound: the same
    4-slice feed with an event 9950 s late diverges (best-effort
    append to the open session) under late_sec=100 but re-sequences
    exactly under late_sec=20000."""
    from fraud_detection_spark.streaming.sessions import (
        session_path_stream_reordered,
    )

    # user 1: A(t=0) B(t=50) one batch session; X(t=5000); Z(t=10000)
    A = dict(user_id=1, ts_sec=0, event_id=1, event_type="A")
    B = dict(user_id=1, ts_sec=50, event_id=3, event_type="B")
    X = dict(user_id=1, ts_sec=5000, event_id=2, event_type="X")
    Z = dict(user_id=1, ts_sec=10000, event_id=4, event_type="Z")
    S = dict(user_id=1, ts_sec=100000, event_id=9, event_type="flush")
    feed = [[A, X], [Z], [B], [S]]  # B arrives 9950 s late

    got = _run_sliced(
        spark,
        tmp_path,
        feed,
        lambda s: session_path_stream_reordered(
            s, late_sec=100, idle_timeout_ms=None
        ),
        subdir="tight",
    )
    got = got.sort_values("sid").reset_index(drop=True)
    # beyond the bound: B was finalized after the walker reached X, so
    # it best-effort-extends the open [X] session — documented trade
    assert list(got["path"]) == ["A", "X>B"], got
    assert list(got["n_events"]) == [1, 2]

    got2 = _run_sliced(
        spark,
        tmp_path,
        feed,
        lambda s: session_path_stream_reordered(
            s, late_sec=20000, idle_timeout_ms=None
        ),
        subdir="wide",
    )
    got2 = got2.sort_values("sid").reset_index(drop=True)
    # inside the bound: B re-sequences into [A, B]; [Z] stays open
    # (the sentinel is itself still above the frontier)
    assert list(got2["path"]) == ["A>B", "X"], got2
    assert list(got2["n_events"]) == [2, 1]
    assert list(got2["t0_sec"]) == [0, 5000]
    assert list(got2["t1_sec"]) == [50, 5000]
