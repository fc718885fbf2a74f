"""Online serving path — Structured Streaming re-expression of the
reference's EP2 (POST /predict -> Celery queue -> SHAP worker ->
Postgres upsert; api/app.py:178-260 -> xai_tasks.py:63-167).

Mapping (SURVEY.md §2g):
- request queue (Redis/Celery)       -> file/Kafka ``readStream`` of
  request records {transaction_id, correlation_id, features...}
- synchronous score + async explain  -> one streaming DAG computing
  score AND attribution columns (pure column math, broadcast weights)
- at-least-once + ON CONFLICT upsert -> ``foreachBatch`` idempotent
  MERGE keyed on transaction_id (checkpointed; replays overwrite the
  same keys — exactly-once effect)
- PENDING/COMPLETED status machine   -> status column set per batch
- correlation-id middleware          -> passthrough column

At scale the upsert target is a Delta/Iceberg table with MERGE INTO;
this container has plain parquet, so the merge is expressed as
read-existing -> anti-join -> union -> atomic rewrite, which preserves
the idempotence contract the reference gets from ON CONFLICT
(api/worker.py:90-95).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fraud_detection_spark.functions import linear_logit, sigmoid

REQUEST_SCHEMA = T.StructType(
    [
        T.StructField("transaction_id", T.StringType(), False),
        T.StructField("correlation_id", T.StringType(), True),
        T.StructField("f_value", T.DoubleType(), True),
        T.StructField("f_k", T.DoubleType(), True),
        T.StructField("f_hour", T.DoubleType(), True),
    ]
)

# published model (same convention as operators/ml_metrics.py)
WEIGHTS = [("f_value", 0.02), ("f_k", 0.01), ("f_hour", -0.05)]
BIAS = -1.0


def score_requests(df: DataFrame) -> DataFrame:
    """Scoring + linear attribution columns (works identically on a
    batch or streaming DataFrame — single definition for both paths).

    score   ≡ predict_proba (api/app.py:221-235)
    shap_*  ≡ LinearExplainer w·x attribution (xai_tasks.py:102-115)
    status  ≡ COMPLETED state (db/models.py:11-14)
    """
    logit = linear_logit(BIAS, [(w, F.col(c)) for c, w in WEIGHTS])
    out = df.withColumn("score", F.round(sigmoid(logit), 6))
    for c, w in WEIGHTS:
        out = out.withColumn(f"shap_{c}", F.round(F.lit(w) * F.col(c), 6))
    return (
        out.withColumn("prediction", (F.col("score") > 0.5).cast("int"))
        # dead-letter branch: rows whose features can't be scored end
        # in terminal FAILED (reference: MaxRetriesExceeded -> FAILED,
        # xai_tasks.py:150-152; PENDING/COMPLETED/FAILED enum
        # db/models.py:11-14)
        .withColumn(
            "status",
            F.when(F.col("score").isNull(), "FAILED").otherwise("COMPLETED"),
        )
        .withColumn(
            "correlation_id", F.coalesce(F.col("correlation_id"), F.expr("uuid()"))
        )
        # CURRENT_TIMESTAMP column default of the results DDL
        # (api/app.py:57, alembic 0001 :25-26)
        .withColumn("created_at", F.current_timestamp())
    )


def observed_scores(df: DataFrame):
    """Engine-side metrics (reference Prometheus counters/histograms,
    api/app.py:66-68): df.observe attaches named aggregates evaluated
    with the job — read them from the returned Observation without a
    second pass over the data."""
    from pyspark.sql import Observation

    obs = Observation("serving_metrics")
    out = score_requests(df).observe(
        obs,
        F.count(F.lit(1)).alias("predictions_submitted_total"),
        F.avg("score").alias("mean_score"),
        F.sum((F.col("score") > 0.5).cast("int")).alias("n_flagged"),
    )
    return out, obs


def upsert_batch(batch_df: DataFrame, batch_id: int, results_dir: str) -> None:
    """Idempotent MERGE keyed on transaction_id: new versions of a key
    replace old rows (ON CONFLICT DO UPDATE semantics,
    api/worker.py:90-99). Replayed batches converge to the same state.
    """
    spark = batch_df.sparkSession
    incoming = batch_df.dropDuplicates(["transaction_id"])
    if os.path.isdir(results_dir) and any(
        f.endswith(".parquet") for f in os.listdir(results_dir)
    ):
        existing = spark.read.parquet(results_dir)
        keep = existing.join(
            incoming.select("transaction_id"), "transaction_id", "left_anti"
        )
        merged = keep.unionByName(incoming, allowMissingColumns=True)
    else:
        merged = incoming
    # atomic swap: write new version, then move into place
    tmp = results_dir.rstrip("/") + f".tmp-{batch_id}"
    merged.write.mode("overwrite").parquet(tmp)
    bak = results_dir.rstrip("/") + f".bak-{batch_id}"
    if os.path.isdir(results_dir):
        os.rename(results_dir, bak)
    os.rename(tmp, results_dir)
    if os.path.isdir(bak):
        import shutil

        shutil.rmtree(bak, ignore_errors=True)


def run_serving_stream(
    spark: SparkSession,
    requests_dir: str,
    results_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Consume JSON request files, score, and upsert results —
    ``availableNow`` trigger processes the backlog and stops (tests);
    a production deployment runs the same query continuously with a
    processing-time trigger and Kafka source."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="fds-ckpt-")
    stream = (
        spark.readStream.schema(REQUEST_SCHEMA)
        .json(requests_dir)
        .transform(score_requests)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: upsert_batch(bdf, bid, results_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
