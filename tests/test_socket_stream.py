"""Socket-source streaming ingress (streaming/sockets.py): a real TCP
server feeds JSON request lines; the streamed scores must equal the
batch scores of the same rows (single scoring definition), and
malformed lines must dead-letter as FAILED — the reference's queue
front door semantics (api/app.py:244-246, xai_tasks.py:150-152).
"""

from __future__ import annotations

import json
import socket
import threading
import time

import pytest

REQUESTS = [
    {"transaction_id": "t1", "correlation_id": "c1", "f_value": 120.0, "f_k": 3.0, "f_hour": 2.0},
    {"transaction_id": "t2", "correlation_id": None, "f_value": 5.0, "f_k": 1.0, "f_hour": 23.0},
    {"transaction_id": "t3", "correlation_id": "c3", "f_value": 900.0, "f_k": 9.0, "f_hour": 11.0},
]


class _LineServer(threading.Thread):
    """Accepts one client and writes the request lines, then holds the
    connection open (the socket source reconnects on close, which would
    duplicate rows — not what this test is about)."""

    def __init__(self, lines):
        super().__init__(daemon=True)
        self.lines = lines
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()

    def run(self):
        conn, _ = self.sock.accept()
        with conn:
            conn.sendall(("\n".join(self.lines) + "\n").encode())
            self._stop.wait(timeout=60)

    def stop(self):
        self._stop.set()
        self.sock.close()


@pytest.fixture()
def line_server():
    lines = [json.dumps(r) for r in REQUESTS] + ["{not-json"]
    srv = _LineServer(lines)
    srv.start()
    yield srv
    srv.stop()


def test_socket_stream_scores_match_batch(spark, line_server):
    from fraud_detection_spark.streaming.serving import REQUEST_SCHEMA, score_requests
    from fraud_detection_spark.streaming.sockets import run_socket_scoring_stream

    q = run_socket_scoring_stream(
        spark, "127.0.0.1", line_server.port, query_name="sock_scores_t"
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            if spark.sql("SELECT * FROM sock_scores_t").count() >= 4:
                break
            time.sleep(0.5)
        got = spark.sql("SELECT * FROM sock_scores_t").toPandas()
    finally:
        q.stop()

    assert len(got) == 4, f"expected 3 scored + 1 dead-letter, got {len(got)}"

    # dead-letter: the malformed line has no transaction_id and FAILED status
    dead = got[got["transaction_id"].isna()]
    assert len(dead) == 1
    assert (dead["status"] == "FAILED").all()

    # streamed scores == batch scores of the same rows (single definition)
    batch = score_requests(
        spark.createDataFrame(
            [tuple(r.values()) for r in REQUESTS], schema=REQUEST_SCHEMA
        )
    ).toPandas()
    live = got.dropna(subset=["transaction_id"]).set_index("transaction_id")
    ref = batch.set_index("transaction_id")
    for txn in ref.index:
        assert live.loc[txn, "score"] == ref.loc[txn, "score"]
        assert live.loc[txn, "status"] == "COMPLETED"
    # correlation-id passthrough + uuid default for the null one
    assert live.loc["t1", "correlation_id"] == "c1"
    assert isinstance(live.loc["t2", "correlation_id"], str)
    assert len(live.loc["t2", "correlation_id"]) > 0


def test_kafka_ingress_gate(spark):
    """read_kafka_requests is the wired production ingress: with the
    spark-sql-kafka connector on the classpath it yields the typed
    request stream; without it (this sandbox) it must fail loudly with
    Spark's standard missing-data-source error, never silently degrade."""
    import pytest

    from fraud_detection_spark.streaming.serving import REQUEST_SCHEMA
    from fraud_detection_spark.streaming.sockets import read_kafka_requests

    try:
        df = read_kafka_requests(spark, "broker:9092", "requests")
    except Exception as e:
        msg = str(e).lower()
        assert "kafka" in msg and ("failed to find" in msg or "data source" in msg), e
        return
    # connector present: the parse must produce the typed request schema
    assert df.schema.fieldNames() == REQUEST_SCHEMA.fieldNames()  # pragma: no cover
