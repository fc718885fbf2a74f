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
    from fraud_detection_spark.streaming.serving import read_results

    out = read_results(spark, res_dir)
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
    # snapshot every committed file before batch 2 so we can prove the
    # merge is incremental (untouched buckets' files byte-identical)
    from fraud_detection_spark.streaming.serving import current_result_paths

    def snapshot(res_dir):
        files = {}
        for vdir in current_result_paths(res_dir):
            for name in sorted(os.listdir(vdir)):
                if name.endswith(".parquet"):
                    p = os.path.join(vdir, name)
                    with open(p, "rb") as f:
                        files[p] = f.read()
        return files

    before = snapshot(res_dir)

    run_serving_stream(spark, req_dir, res_dir, ckpt)
    out2 = read_results(spark, res_dir)
    rows2 = {r["transaction_id"]: r.asDict() for r in out2.collect()}
    assert set(rows2) == {"t1", "t2", "t3", "t_bad"}
    assert out2.count() == 4, "upsert duplicated keys"
    assert rows2["t1"]["correlation_id"] == "c1b", "t1 not updated in place"

    # incremental MERGE: buckets NOT containing t1/t3 must be untouched
    # (same path, same bytes) — the batch rewrites only what it touches
    after = snapshot(res_dir)
    surviving = {p: b for p, b in before.items() if p in after}
    assert surviving, "expected at least one untouched bucket to survive batch 2"
    for p, b in surviving.items():
        assert after[p] == b, f"untouched bucket file rewritten: {p}"


def test_upsert_crash_recovery(spark, tmp_path):
    """Commit protocol: a crash between writing a new version dir and
    flipping the bucket pointer must leave the committed state fully
    readable, and replaying the batch must converge (exactly-once
    effect of the checkpoint + keyed merge)."""
    from fraud_detection_spark.streaming.serving import (
        REQUEST_SCHEMA,
        _bucket_root,
        read_results,
        score_requests,
        upsert_batch,
    )

    res_dir = str(tmp_path / "results")
    os.makedirs(res_dir)
    df1 = score_requests(
        spark.createDataFrame(
            [("a", "c", 1.0, 1.0, 1.0), ("b", "c", 2.0, 2.0, 2.0)], REQUEST_SCHEMA
        )
    )
    upsert_batch(df1, 0, res_dir)
    assert {r["transaction_id"] for r in read_results(spark, res_dir).collect()} == {
        "a",
        "b",
    }

    # simulate the crash window: an uncommitted version dir exists but
    # its bucket pointer was never flipped — reader must ignore it
    root = _bucket_root(res_dir)
    bdir = os.path.join(root, sorted(os.listdir(root))[0])
    os.makedirs(os.path.join(bdir, "v1"))
    assert {r["transaction_id"] for r in read_results(spark, res_dir).collect()} == {
        "a",
        "b",
    }

    # replay of that batch id commits cleanly over the leftover dir
    df2 = score_requests(
        spark.createDataFrame([("a", "c2", 9.0, 9.0, 9.0)], REQUEST_SCHEMA)
    )
    upsert_batch(df2, 1, res_dir)
    out = {r["transaction_id"]: r.asDict() for r in read_results(spark, res_dir).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["correlation_id"] == "c2"

    # double-applying the same batch converges to the same keys
    upsert_batch(df2, 1, res_dir)
    out2 = {r["transaction_id"]: r.asDict() for r in read_results(spark, res_dir).collect()}
    assert set(out2) == {"a", "b"}
    assert out2["a"]["correlation_id"] == "c2"


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
