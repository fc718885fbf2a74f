"""Partitioned-sink round-trips (with partition-pruning evidence) and
the custom stateful streaming operator's batch parity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_partitioned_parquet_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.sinks import read_partitioned, write_partitioned

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"])

    back = read_partitioned(spark, out)
    assert back.count() == docs.count()

    filtered = back.filter(F.col("lang") == "en").select("doc_id")
    plan = formatted_plan(filtered)
    assert "PartitionFilters" in plan and "lang" in plan, plan
    assert filtered.count() == docs.filter(F.col("lang") == "en").count()


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.sinks import write_csv, write_json

    nat = load_table(spark, sf_dir, "nation")
    write_csv(nat, str(tmp_path / "nation_csv"))
    back = spark.read.option("header", True).csv(
        str(tmp_path / "nation_csv"), inferSchema=True
    )
    assert back.count() == nat.count()
    assert set(back.columns) == set(nat.columns)

    write_json(nat, str(tmp_path / "nation_json"))
    back_j = spark.read.json(str(tmp_path / "nation_json"))
    assert back_j.count() == nat.count()


def test_stateful_stream_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState over a file stream must converge to the
    batch aggregate after the backlog is processed."""
    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.stateful import (
        batch_profile,
        user_profile_stream,
    )

    ev = events_with_time(spark, sf_dir).select("user_id", "value", "ts_sec")
    src = str(tmp_path / "stream_src")
    ev.coalesce(2).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        user_profile_stream(stream_in)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # 'update' mode may emit a row per micro-batch per key: keep the last
    got = (
        spark.sql("SELECT * FROM profiles")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("mean_value", "n_events").alias("mean_value"),
            F.max("last_seen_sec").alias("last_seen_sec"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = batch_profile(ev).toPandas().sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert (abs(got["mean_value"].values - want["mean_value"].values) < 1e-9).all()
    assert (got["last_seen_sec"].values == want["last_seen_sec"].values).all()


def test_health_check(spark):
    from fraud_detection_spark.session import health_check

    h = health_check(spark)
    assert h["session"] == "UP"
    assert h["version"].startswith("4.")


def test_orc_partitioned_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """ORC is the second columnar format Spark ships natively — the
    same partitioned layout, round-trip fidelity, and partition-pruning
    contract as parquet must hold (PartitionFilters reaches the ORC
    scan)."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.sinks import read_partitioned, write_partitioned

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "orc")
    write_partitioned(li, out, ["l_returnflag"], fmt="orc")

    back = read_partitioned(spark, out, fmt="orc")
    assert back.count() == li.count()
    a = sorted(map(tuple, li.collect()))
    b = sorted(
        map(tuple, back.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag").collect())
    )
    assert a == b

    pruned = back.filter(F.col("l_returnflag") == "R")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "l_returnflag" in plan, plan


def test_velocity_stream_matches_batch_range_window(spark, sf_dir, tmp_path):
    """The stateful trailing-1h velocity operator must reproduce the
    declared batch RANGE-window query (q_velocity) exactly — count AND
    fixed-point amount — when the backlog arrives in order (one file =
    one micro-batch, so the in-batch ts-cohort handling is what's
    under test, including same-ts RANGE peers)."""
    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.stateful import velocity_stream

    ev = events_with_time(spark, sf_dir).select(
        "event_id", "user_id", "value", "ts_sec"
    )
    src = str(tmp_path / "vel_src")
    ev.orderBy("ts_sec", "event_id").coalesce(1).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        velocity_stream(stream_in)
        .writeStream.format("memory")
        .queryName("velocity")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.sql("SELECT event_id, n_1h, amt_1h FROM velocity")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        load_all()["q_velocity"].fn(spark, sf_dir)
        .select("event_id", "n_1h", "amt_1h")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.event_id.values == want.event_id.values).all()
    assert (got.n_1h.values == want.n_1h.values).all()
    assert (abs(got.amt_1h.values - want.amt_1h.values) < 1e-9).all()


def test_state_v2_profile_matches_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (state API v2, RocksDB store) must
    converge to the same batch aggregate as the v1 operator. The v2
    python worker protocol rides protobuf, which this container lacks
    (no pip install allowed) — skip when the proto module can't
    import; the operator stays import-gated the same way."""
    import pytest

    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
    except ImportError as ex:
        pytest.skip(f"state API v2 needs protobuf: {ex}")

    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.stateful import (
        batch_profile,
        user_profile_stream_v2,
    )

    ev = events_with_time(spark, sf_dir).select("user_id", "value", "ts_sec")
    src = str(tmp_path / "v2_src")
    ev.coalesce(2).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream_in = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            user_profile_stream_v2(stream_in)
            .writeStream.format("memory")
            .queryName("profiles_v2")
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "v2_ckpt"))
            .start()
        )
        q.awaitTermination()
    except Exception as ex:  # pragma: no cover - environment gate
        if "RocksDB" in str(ex) or "UnsatisfiedLink" in str(ex):
            pytest.skip(f"RocksDB state store unavailable: {ex}")
        raise
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    got = (
        spark.sql("SELECT * FROM profiles_v2")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("mean_value", "n_events").alias("mean_value"),
            F.max("last_seen_sec").alias("last_seen_sec"),
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        batch_profile(ev).toPandas().sort_values("user_id").reset_index(drop=True)
    )
    assert (got.user_id.values == want.user_id.values).all()
    assert (got.n_events.values == want.n_events.values).all()
    assert (abs(got.mean_value.values - want.mean_value.values) < 1e-9).all()
    assert (got.last_seen_sec.values == want.last_seen_sec.values).all()


def test_drift_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming drift monitor (windowed agg over event-time days)
    must equal its batch twin exactly: same day ids (epoch-aligned
    windows vs integer div), same fixed-point means, same smoothed PSI."""
    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.drift import drift_batch, drift_stream

    ev = events_with_time(spark, sf_dir).select("event_id", "ts_sec", "value")
    src = str(tmp_path / "drift_src")
    ev.orderBy("ts_sec", "event_id").coalesce(1).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        drift_stream(stream_in)
        .writeStream.format("memory")
        .queryName("drift")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.sql("SELECT * FROM drift").toPandas().sort_values("day").reset_index(drop=True)
    )
    want = drift_batch(ev).toPandas().sort_values("day").reset_index(drop=True)
    assert got.day.to_list() == want.day.to_list()
    assert got.n.to_list() == want.n.to_list()
    assert (got.day_mean - want.day_mean).abs().max() == 0.0
    assert (got.psi - want.psi).abs().max() == 0.0
    # drift against the uniform prior is present and finite
    assert got.psi.notna().all() and (got.psi >= 0).all()


def test_zorder_write_shrinks_rowgroup_bounding_boxes(spark, sf_dir, tmp_path):
    """Z-order clustering must make per-file min/max ranges tight on
    BOTH clustered columns simultaneously (the data-skipping property),
    verified from the actual parquet footers — vs the unordered layout
    where every file spans ~the full domain on at least one column."""
    import pyarrow.parquet as pq

    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.sinks import write_zorder

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    li.repartition(8).write.mode("overwrite").parquet(plain)
    write_zorder(li, ["l_quantity", "l_extendedprice"], zord, files=8)

    def mean_box_volume(path):
        import os

        vols, dom = [], {}
        files = [
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        ]
        # global domain from all footers
        spans = {c: [float("inf"), float("-inf")] for c in ("l_quantity", "l_extendedprice")}
        boxes = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                box = {}
                for i in range(md.num_columns):
                    col = md.row_group(rg).column(i)
                    name = col.path_in_schema
                    if name in spans:
                        st = col.statistics
                        box[name] = (st.min, st.max)
                        spans[name][0] = min(spans[name][0], st.min)
                        spans[name][1] = max(spans[name][1], st.max)
                boxes.append(box)
        vol = 0.0
        for box in boxes:
            v = 1.0
            for c, (lo, hi) in box.items():
                width = spans[c][1] - spans[c][0]
                v *= (hi - lo) / width
            vol += v
        del dom, vols
        return vol / len(boxes)

    v_plain = mean_box_volume(plain)
    v_z = mean_box_volume(zord)
    # random layout: every row group spans ~the whole plane (volume ~1);
    # z-order: each covers a small tile
    assert v_plain > 0.5, v_plain
    assert v_z < v_plain / 3, (v_z, v_plain)
    # and the data survives intact
    back = spark.read.parquet(zord)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)


def test_session_stream_matches_batch_session_window(spark, sf_dir, tmp_path):
    """Streaming session_window must emit the exact batch session set
    (q_session_window) once all data is processed — same native
    aggregate, state closed by the watermark under availableNow."""
    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.drift import session_stream

    ev = events_with_time(spark, sf_dir).select("event_id", "user_id", "ts_m")
    src = str(tmp_path / "sess_src")
    ev.orderBy("ts_m", "event_id").coalesce(1).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        session_stream(stream_in)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.sql("SELECT * FROM sessions")
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want = (
        load_all()["q_session_window"].fn(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    assert got.user_id.to_list() == want.user_id.to_list()
    assert got.session_start.to_list() == want.session_start.to_list()
    assert got.n_events.to_list() == want.n_events.to_list()


def test_structuring_stream_matches_batch(spark, sf_dir, tmp_path):
    """The online structuring screen must converge to the declared
    batch screen exactly once the backlog is processed."""
    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.streaming.drift import structuring_stream

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    src = str(tmp_path / "struct_src")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        structuring_stream(stream_in)
        .writeStream.format("memory")
        .queryName("structuring")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.sql("SELECT * FROM structuring")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        load_all()["q_structuring"].fn(spark, sf_dir)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got.user_id.to_list() == want.user_id.to_list()
    for c in ("n", "n_band", "flag"):
        assert got[c].to_list() == want[c].to_list(), c
    assert (got.lift - want.lift).abs().max() == 0.0


def test_zorder_key_rejects_sign_bit_overflow():
    """len(cols) * bits > 63 would silently interleave into the BIGINT
    sign bit, wrapping keys negative and breaking the clustering layout
    — the guard must raise instead (ADVICE r6)."""
    import pytest

    from fraud_detection_spark.sources.sinks import zorder_key

    # 4 cols x 16 bits = 64 > 63 -> reject, message names the safe bits
    with pytest.raises(ValueError, match="bits <= 15"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key([])
    # the boundary itself is fine: 3 x 21 = 63
    assert zorder_key(["a", "b", "c"], bits=21) is not None
