"""MERGE INTO on a Spark-SQL-managed table (sources/managed.py): the
catalog twin of test_jdbc.py's staging+MERGE upsert. Asserts the MERGE
semantics (update matched, insert unmatched), idempotence under exact
replay, and last-writer-wins under a divergent replay — the properties
the reference's ON CONFLICT upsert guarantees (api/worker.py:90-99).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

TBL = "test_scores_managed"


@pytest.fixture()
def clean_table(spark):
    spark.sql(f"DROP TABLE IF EXISTS {TBL}")
    yield
    spark.sql(f"DROP TABLE IF EXISTS {TBL}")


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, schema="txn_id bigint, fraud_score double, model_version string, payload string"
    )


def test_merge_upsert_semantics(spark, clean_table):
    from fraud_detection_spark.sources.managed import upsert_scores

    a = _batch(spark, [(1, 0.9, "v1", "p1"), (2, 0.2, "v1", "p2")])
    path = upsert_scores(spark, TBL, a)
    assert path in ("merge", "join-rewrite")
    got = {r["txn_id"]: r["fraud_score"] for r in spark.table(TBL).collect()}
    assert got == {1: 0.9, 2: 0.2}

    # update 1, insert 3 — classic WHEN MATCHED / WHEN NOT MATCHED
    b = _batch(spark, [(1, 0.95, "v2", "p1b"), (3, 0.5, "v2", "p3")])
    upsert_scores(spark, TBL, b)
    rows = {r["txn_id"]: (r["fraud_score"], r["model_version"]) for r in spark.table(TBL).collect()}
    assert rows == {1: (0.95, "v2"), 2: (0.2, "v1"), 3: (0.5, "v2")}


def test_merge_idempotent_replay(spark, clean_table):
    """Replaying the identical batch (at-least-once delivery) must be a
    no-op: same rows, same values, same count."""
    from fraud_detection_spark.sources.managed import upsert_scores

    batch = _batch(spark, [(i, i / 10.0, "v1", f"p{i}") for i in range(20)])
    upsert_scores(spark, TBL, batch)
    before = sorted(map(tuple, spark.table(TBL).collect()))
    upsert_scores(spark, TBL, batch)  # exact replay
    after = sorted(map(tuple, spark.table(TBL).collect()))
    assert before == after
    assert len(after) == 20


def test_merge_batch_dedup_deterministic(spark, clean_table):
    """A micro-batch carrying the same txn twice upserts exactly one
    deterministic winner (max score-struct), not an arbitrary row."""
    from fraud_detection_spark.sources.managed import upsert_scores

    dup = _batch(spark, [(7, 0.1, "v1", "lo"), (7, 0.8, "v1", "hi")])
    upsert_scores(spark, TBL, dup)
    rows = spark.table(TBL).filter(F.col("txn_id") == 7).collect()
    assert len(rows) == 1
    assert rows[0]["fraud_score"] == 0.8
    assert rows[0]["payload"] == "hi"


def test_streaming_managed_sink_idempotent(spark, tmp_path):
    """run_serving_stream_managed: at-least-once replay of the same
    request files converges to the same keyed rows (created_at is the
    reference results DDL's CURRENT_TIMESTAMP default — excluded)."""
    import json

    from fraud_detection_spark.streaming.serving import run_serving_stream_managed

    spark.sql("DROP TABLE IF EXISTS test_results_managed")
    req_dir = tmp_path / "reqs"
    req_dir.mkdir()
    rows = [
        {"transaction_id": f"t{i}", "correlation_id": f"c{i}",
         "f_value": 10.0 * i, "f_k": float(i % 4), "f_hour": float(i % 24)}
        for i in range(12)
    ]
    (req_dir / "batch0.json").write_text("\n".join(json.dumps(r) for r in rows))

    def table_state():
        pdf = spark.table("test_results_managed").toPandas()
        return sorted(
            map(tuple, pdf.drop(columns=["created_at"]).itertuples(index=False))
        )

    try:
        run_serving_stream_managed(
            spark, str(req_dir), table="test_results_managed",
            checkpoint_dir=str(tmp_path / "ck1"),
        )
        first = table_state()
        assert len(first) == 12
        # replay with a FRESH checkpoint (worst-case at-least-once)
        run_serving_stream_managed(
            spark, str(req_dir), table="test_results_managed",
            checkpoint_dir=str(tmp_path / "ck2"),
        )
        assert table_state() == first
    finally:
        spark.sql("DROP TABLE IF EXISTS test_results_managed")
