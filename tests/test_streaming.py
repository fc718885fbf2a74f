"""Integration test for the Structured Streaming serving path
(reference EP2: request -> score -> async explain -> idempotent upsert).
"""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def dirs(tmp_path):
    req = tmp_path / "requests"
    req.mkdir()
    return str(req), str(tmp_path / "results"), str(tmp_path / "ckpt")


def write_requests(req_dir: str, rows: list[dict], fname: str) -> None:
    with open(os.path.join(req_dir, fname), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_serving_stream_end_to_end(spark, dirs):
    from fraud_detection_spark.streaming.serving import run_serving_stream

    req_dir, res_dir, ckpt = dirs
    write_requests(
        req_dir,
        [
            {"transaction_id": "t1", "correlation_id": "c1", "f_value": 10.0, "f_k": 1.0, "f_hour": 3.0},
            {"transaction_id": "t2", "correlation_id": None, "f_value": 99.0, "f_k": 5.0, "f_hour": 12.0},
            # poison record: unscorable features -> terminal FAILED
            {"transaction_id": "t_bad", "correlation_id": "cx", "f_value": None, "f_k": None, "f_hour": None},
        ],
        "batch1.json",
    )
    run_serving_stream(spark, req_dir, res_dir, ckpt)
    out = spark.read.parquet(res_dir)
    rows = {r["transaction_id"]: r.asDict() for r in out.collect()}
    assert set(rows) == {"t1", "t2", "t_bad"}
    assert rows["t1"]["status"] == "COMPLETED"
    assert rows["t_bad"]["status"] == "FAILED" and rows["t_bad"]["score"] is None
    assert rows["t1"]["correlation_id"] == "c1"
    assert rows["t2"]["correlation_id"] is not None  # uuid assigned
    assert 0.0 <= rows["t1"]["score"] <= 1.0
    assert rows["t1"]["prediction"] in (0, 1)
    assert "shap_f_value" in out.columns

    # second batch: new key + UPDATED version of t1 -> upsert must
    # replace, not duplicate (ON CONFLICT DO UPDATE parity)
    write_requests(
        req_dir,
        [
            {"transaction_id": "t1", "correlation_id": "c1b", "f_value": 20.0, "f_k": 1.0, "f_hour": 3.0},
            {"transaction_id": "t3", "correlation_id": "c3", "f_value": 1.0, "f_k": 0.0, "f_hour": 0.0},
        ],
        "batch2.json",
    )
    run_serving_stream(spark, req_dir, res_dir, ckpt)
    out2 = spark.read.parquet(res_dir)
    rows2 = {r["transaction_id"]: r.asDict() for r in out2.collect()}
    assert set(rows2) == {"t1", "t2", "t3", "t_bad"}
    assert out2.count() == 4, "upsert duplicated keys"
    assert rows2["t1"]["correlation_id"] == "c1b", "t1 not updated in place"


def test_scoring_logic_batch_stream_parity(spark):
    """The same score_requests() column logic must work on a plain
    batch DataFrame (single definition for both planes)."""
    from fraud_detection_spark.streaming.serving import REQUEST_SCHEMA, score_requests

    df = spark.createDataFrame(
        [("tx", "c", 10.0, 1.0, 3.0)], schema=REQUEST_SCHEMA
    )
    out = score_requests(df).collect()[0]
    import math

    expected = 1.0 / (1.0 + math.exp(-(-1.0 + 0.02 * 10.0 + 0.01 * 1.0 - 0.05 * 3.0)))
    assert abs(out["score"] - round(expected, 6)) < 1e-9
