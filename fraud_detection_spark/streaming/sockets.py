"""Broker-backed streaming ingress — the socket-source demo of the
reference's queue front door (Redis/Celery enqueue, api/app.py:244-246
-> worker dequeue xai_tasks.py:63), plus the documented Kafka swap.

The engine's scoring DAG is source-agnostic: every transformation
hangs off a DataFrame of request records, so the ingress is exactly
one ``readStream`` call. This module wires the TCP socket source — the
only out-of-the-box NETWORK source in a jar-less sandbox — to prove
the path end-to-end against a real socket (tests spin an in-process
TCP server and assert streamed scores equal batch scores).

Production swap is :func:`read_kafka_requests` — implemented, not just
documented: the configured Kafka reader goes live the moment the
``spark-sql-kafka-0-10`` connector jar is on the classpath (no broker
or jar exists in this sandbox, so its ``.load()`` gate is test-pinned
to fail loudly, like the PIL image-decode gate). Everything from
:func:`parse_requests` down is identical across ingresses. The socket
source is NOT fault-tolerant (no replayable offsets — Spark's own
caveat); Kafka carries offsets in the checkpoint and upgrades the
pipeline to exactly-once-effect with the same idempotent MERGE sink
(streaming/serving.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.streaming.serving import REQUEST_SCHEMA, score_requests


def read_socket_requests(spark: SparkSession, host: str, port: int) -> DataFrame:
    """One JSON request per line over TCP -> streaming DataFrame of
    typed request records (the socket twin of the Kafka value parse)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return parse_requests(raw)


def kafka_reader(
    spark: SparkSession,
    servers: str,
    topic: str,
    starting_offsets: str = "latest",
):
    """Configured Kafka ``DataStreamReader`` — the production ingress,
    wired for real rather than documented: call ``.load()`` on a
    cluster with the ``spark-sql-kafka-0-10`` connector jar and the
    stream starts; in this jar-less sandbox ``.load()`` raises Spark's
    standard "Failed to find data source: kafka" (asserted in
    tests/test_socket_stream.py, the same optional-dependency gate
    pattern as the PIL image decoder).

    ``failOnDataLoss=false``: expired/compacted offsets log instead of
    killing the query — at-least-once delivery matches the idempotent
    MERGE sink (serving.py), giving exactly-once EFFECT end-to-end."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )


def read_kafka_requests(spark: SparkSession, servers: str, topic: str) -> DataFrame:
    """Kafka ingress -> typed request records: record value cast to
    string, then the SAME parse_requests every other ingress uses."""
    raw = kafka_reader(spark, servers, topic).load().selectExpr(
        "CAST(value AS STRING) AS value"
    )
    return parse_requests(raw)


def parse_requests(raw: DataFrame) -> DataFrame:
    """``value: string`` (socket line / Kafka record value) -> typed
    request columns. Malformed JSON yields null transaction_id rows,
    which score_requests routes to the FAILED dead-letter status."""
    return raw.select(
        F.from_json(F.col("value"), REQUEST_SCHEMA).alias("r")
    ).select("r.*")


def run_socket_scoring_stream(
    spark: SparkSession,
    host: str,
    port: int,
    query_name: str = "socket_scores",
):
    """Socket ingress -> scoring DAG -> in-memory sink (demo/test rig).

    Returns the StreamingQuery; read results from the ``query_name``
    in-memory table. The production variant replaces BOTH ends:
    Kafka ingress (docstring above) and the foreachBatch MERGE sink
    (serving.run_serving_stream) — the middle is this same DAG."""
    scored = score_requests(read_socket_requests(spark, host, port))
    return (
        scored.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .start()
    )
