"""Streaming throughput smoke for the stateful + drift paths (round
17, VERDICT r16 #7 — the only operator family with zero bench
evidence). Drives the FULL sf0.1 events table as an in-order file
backlog (availableNow) through

  * the applyInPandasWithState trailing-1h velocity operator, and
  * the windowed/watermarked drift aggregation,

each to a memory sink, asserting exact parity with the declared batch
twins (q_velocity / drift_batch — the existing equivalence oracles)
and printing measured rows/s. The figures are recorded in SCALE.md
("Streaming throughput, measured (round 17)") — re-measure here when
either path changes. bench.py itself is untouched (the driver contract
does not time streams).

Gated behind SPARK_GRAFT_SCALE_TESTS=1 (~2-4 min at sf0.1).
"""

from __future__ import annotations

import json
import os
import time

import pytest

SCALE_SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TESTS") != "1",
    reason="scale exercise; run with SPARK_GRAFT_SCALE_TESTS=1",
)


def test_velocity_stream_throughput_sf01(spark, tmp_path):
    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.stateful import velocity_stream

    ev = events_with_time(spark, SCALE_SF_DIR).select(
        "event_id", "user_id", "value", "ts_sec"
    )
    n_in = ev.count()
    src = str(tmp_path / "vel_src")
    # 4 ordered slices = 4 micro-batches: state survives batch
    # boundaries at volume, not just the single-batch unit test
    (
        ev.orderBy("ts_sec", "event_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        velocity_stream(stream_in)
        .writeStream.format("memory")
        .queryName("velocity_tp")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "vel_ckpt"))
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0

    got = (
        spark.sql("SELECT event_id, n_1h, amt_1h FROM velocity_tp")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = (
        load_all()["q_velocity"]
        .fn(spark, SCALE_SF_DIR)
        .select("event_id", "n_1h", "amt_1h")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == n_in
    assert (got.event_id.values == want.event_id.values).all()
    assert (got.n_1h.values == want.n_1h.values).all()
    assert (abs(got.amt_1h.values - want.amt_1h.values) < 1e-9).all()
    print(
        json.dumps(
            {
                "exercise": "velocity_stream_sf01",
                "input_rows": n_in,
                "wall_seconds": round(wall, 2),
                "rows_per_sec": round(n_in / wall, 1),
            }
        )
    )


def test_drift_stream_throughput_sf01(spark, tmp_path):
    from fraud_detection_spark.sources import events_with_time
    from fraud_detection_spark.streaming.drift import drift_batch, drift_stream

    ev = events_with_time(spark, SCALE_SF_DIR).select("ts_sec", "value")
    n_in = ev.count()
    src = str(tmp_path / "drift_src")
    ev.orderBy("ts_sec").coalesce(1).write.mode("overwrite").parquet(src)

    stream_in = spark.readStream.schema(ev.schema).parquet(src)
    t0 = time.perf_counter()
    q = (
        drift_stream(stream_in)
        .writeStream.format("memory")
        .queryName("drift_tp")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "drift_ckpt"))
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0

    got = (
        spark.sql("SELECT * FROM drift_tp").toPandas().sort_values("day")
    )
    want = drift_batch(
        events_with_time(spark, SCALE_SF_DIR)
    ).toPandas().sort_values("day")
    # append mode emits only watermark-closed windows: every emitted
    # day must match the batch twin exactly. With a 1-day watermark the
    # final window AND the watermark-delay day stay open at backlog
    # end, so all but (at most) two days must have closed.
    assert len(got) >= len(want) - 2, (len(got), len(want))
    merged = got.merge(want, on="day", suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged.n_s.values == merged.n_b.values).all()
    assert (abs(merged.day_mean_s.values - merged.day_mean_b.values) < 1e-9).all()
    assert (abs(merged.psi_s.values - merged.psi_b.values) < 1e-9).all()
    print(
        json.dumps(
            {
                "exercise": "drift_stream_sf01",
                "input_rows": n_in,
                "closed_days": int(len(got)),
                "wall_seconds": round(wall, 2),
                "rows_per_sec": round(n_in / wall, 1),
            }
        )
    )
