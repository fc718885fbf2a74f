"""Watermark + event-time window aggregation on a real stream
(SURVEY §2g: the streaming semantics the reference lacks).

Append-mode windowed aggregation with withWatermark: windows are
emitted only once the watermark passes their end — late rows beyond
the watermark are dropped from closed windows.
"""

from __future__ import annotations

import os

import pandas as pd


def test_watermark_window_append_mode(spark, tmp_path):
    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1: events in windows [0,60) and [60,120)
    pd.DataFrame(
        {
            "ts_sec": [10, 20, 70],
            "value": [1.0, 2.0, 3.0],
        }
    ).to_parquet(os.path.join(src, "a.parquet"))
    # batch 2: event-time jumps to 400 -> watermark becomes 370 and the
    # first two windows are evicted+emitted during batch 3's planning
    pd.DataFrame({"ts_sec": [400], "value": [4.0]}).to_parquet(
        os.path.join(src, "b.parquet")
    )
    # batch 3: keeps the stream moving (watermark already past 60; the
    # old windows are now closed and gone from state)
    pd.DataFrame({"ts_sec": [410], "value": [4.5]}).to_parquet(
        os.path.join(src, "bb.parquet")
    )
    # batch 4: a LATE row for the long-closed [0,60) window -> dropped
    # (observed semantics: a late row arriving in the SAME batch where
    # the watermark first passes its window still merges before
    # eviction — the drop only applies in later batches, which is why
    # this arrives two batches after the jump)
    pd.DataFrame({"ts_sec": [15], "value": [99.0]}).to_parquet(
        os.path.join(src, "c.parquet")
    )
    # FileStreamSource orders batches by modification time — make the
    # ordering deterministic (a -> b -> bb -> c)
    now = os.stat(os.path.join(src, "c.parquet")).st_mtime
    for i, f in enumerate(["a", "b", "bb"]):
        os.utime(os.path.join(src, f + ".parquet"), (now - 30 + i * 10,) * 2)

    stream = (
        spark.readStream.schema("ts_sec long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.timestamp_seconds("ts_sec"))
        .withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", "60 seconds").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").cast("long").alias("w_start"), "n", "total")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["w_start"]: (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM wm").collect()
    }
    # closed windows emitted exactly once; the late row (ts=15,
    # value=99) arrived after the watermark passed 60 -> dropped
    assert got[0] == (2, 3.0), got
    assert got[60] == (1, 3.0), got
    # the [360,420) window is still open (watermark hasn't passed it)
    assert 360 not in got, got
    # and the state operator actually counted one watermark-dropped row
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    assert dropped == 1, dropped
