"""Stream-stream interval join: the streaming result (two watermarked
file streams, availableNow) must equal the batch result of the SAME
join definition — the engine's batch/stream parity rule applied to
Spark's hardest streaming operator."""

from __future__ import annotations

import json
import os

import pytest


def _write(dirpath, fname, rows):
    with open(os.path.join(dirpath, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def feeds(tmp_path):
    left = tmp_path / "left"
    right = tmp_path / "right"
    left.mkdir()
    right.mkdir()
    # left: scoring requests; right: enrichment records arriving later
    _write(
        str(left),
        "l1.json",
        [
            {"user_id": 1, "ts_l": "2024-01-01 10:00:00", "txn": "a"},
            {"user_id": 1, "ts_l": "2024-01-01 10:30:00", "txn": "b"},
            {"user_id": 2, "ts_l": "2024-01-01 10:05:00", "txn": "c"},
        ],
    )
    _write(
        str(right),
        "r1.json",
        [
            # within 10 min of txn a -> joins
            {"user_id": 1, "ts_r": "2024-01-01 10:04:00", "risk": 0.9},
            # 20 min after txn a, 10 before b: joins NOTHING backwards,
            # but is within [b-10min window]? b at 10:30, r at 10:20 is
            # BEFORE b -> no (right must follow left)
            {"user_id": 1, "ts_r": "2024-01-01 10:20:00", "risk": 0.5},
            # exactly at the 10-min bound of txn c -> joins (inclusive)
            {"user_id": 2, "ts_r": "2024-01-01 10:15:00", "risk": 0.1},
            # different user -> never joins
            {"user_id": 9, "ts_r": "2024-01-01 10:00:00", "risk": 0.2},
        ],
    )
    return str(left), str(right)


L_SCHEMA = "user_id int, ts_l timestamp, txn string"
R_SCHEMA = "user_id int, ts_r timestamp, risk double"


def _canon(rows):
    return sorted(
        (r["user_id"], str(r["ts_l"]), str(r["ts_r"]), r["txn"], r["risk"])
        for r in rows
    )


def test_stream_stream_interval_join_matches_batch(spark, feeds, tmp_path):
    from fraud_detection_spark.streaming.joins import interval_join, prepare_right

    ldir, rdir = feeds

    # batch truth
    lb = spark.read.schema(L_SCHEMA).json(ldir)
    rb = prepare_right(spark.read.schema(R_SCHEMA).json(rdir))
    batch = interval_join(lb, rb).collect()
    assert len(batch) > 0

    # same definition over two watermarked streams
    ls = (
        spark.readStream.schema(L_SCHEMA)
        .json(ldir)
        .withWatermark("ts_l", "1 hour")
    )
    rs = prepare_right(
        spark.readStream.schema(R_SCHEMA).json(rdir)
    ).withWatermark("r_ts_r", "1 hour")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        interval_join(ls, rs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(out_dir).collect()

    assert _canon(streamed) == _canon(batch)
    # semantic spot-checks: inclusive bound joins, trailing right rows don't
    got = {(r["user_id"], r["txn"], r["risk"]) for r in streamed}
    assert (1, "a", 0.9) in got
    assert (2, "c", 0.1) in got  # exactly at the +10min bound
    assert not any(u == 9 for u, _, _ in got)
    assert (1, "a", 0.5) not in got  # 20 min later, outside window
