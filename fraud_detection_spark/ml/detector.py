"""Single-record scoring facade — the reference's EP4
(predict_single.py:6-32 `FraudDetector`): accept a feature dict,
realign to the training feature order with missing->0.0 defaults
(xai_tasks.py:86-90), scale+score through the persisted pipeline,
return (prediction, probability).

Batch-of-1 latency parity target: <= 500 ms warm (the reference's API
P95 alert threshold, BASELINE.md #3) — asserted in tests.
"""

from __future__ import annotations

from pyspark.ml import PipelineModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class FraudDetector:
    """Load once, score many — mirrors the module-global model load of
    api/worker.py:47-49 / the lru_cache of api/app.py:34."""

    def __init__(self, spark: SparkSession, model_path: str, feature_names: list[str]):
        self.spark = spark
        self.model = PipelineModel.load(model_path)
        self.feature_names = list(feature_names)

    def predict(self, features: dict[str, float]) -> tuple[int, float]:
        """dict -> aligned single-row frame -> (class, fraud score)."""
        row = [tuple(float(features.get(f, 0.0)) for f in self.feature_names)]
        df = self.spark.createDataFrame(
            row, schema=", ".join(f"`{f}` double" for f in self.feature_names)
        )
        out = (
            self.model.transform(df)
            .select(
                F.col("prediction").cast("int").alias("prediction"),
                vector_to_array("probability").getItem(1).alias("score"),
            )
            .collect()[0]
        )
        return int(out["prediction"]), float(out["score"])
