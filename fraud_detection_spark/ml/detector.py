"""Single-record scoring facade — the reference's EP4
(predict_single.py:6-32 `FraudDetector`): accept a feature dict,
realign to the training feature order with missing->0.0 defaults
(xai_tasks.py:86-90), scale+score through the persisted pipeline,
return (prediction, probability).

Serving architecture: the reference scores one transaction in-process
(predict_single.py loads the joblib model and calls it directly — no
cluster round-trip), and so does this facade. For linear pipelines
(VectorAssembler -> StandardScaler -> LogisticRegression, the shipped
model shape) the scaler means/stds and LR coefficients are pulled to
the driver ONCE at load; ``predict`` is then pure in-process
arithmetic — microseconds, no Spark job, no per-record Catalyst
planning. Launching a distributed job per single row is the wrong
tool at any scale; Spark stays the engine for *batch* scoring
(``predict_df``) and for non-linear models (GBT fallback path).

Batch-of-1 latency parity target: <= 500 ms warm (the reference's API
P95 alert threshold, BASELINE.md #3) — asserted in tests; the linear
fast path clears it by ~4 orders of magnitude.
"""

from __future__ import annotations

import math

from pyspark.ml import PipelineModel
from pyspark.ml.classification import LogisticRegressionModel
from pyspark.ml.feature import StandardScalerModel
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FraudDetector:
    """Load once, score many — mirrors the module-global model load of
    api/worker.py:47-49 / the lru_cache of api/app.py:34."""

    def __init__(self, spark: SparkSession, model_path: str, feature_names: list[str]):
        self.spark = spark
        self.model = PipelineModel.load(model_path)
        self.feature_names = list(feature_names)
        self._linear = self._extract_linear()

    def _extract_linear(self) -> dict | None:
        """Driver-side copy of the linear pipeline's math, taken once
        at load. Returns None for non-linear final stages (e.g. GBT),
        which fall back to the Spark path."""
        stages = list(self.model.stages)
        if not stages or not isinstance(stages[-1], LogisticRegressionModel):
            return None
        lr = stages[-1]
        mean = std = None
        with_mean = with_std = False
        for st in stages:
            if isinstance(st, StandardScalerModel):
                mean = st.mean.toArray().tolist()
                std = st.std.toArray().tolist()
                with_mean = st.getWithMean()
                with_std = st.getWithStd()
        cols = self.feature_names
        for st in stages:
            # honor the assembler's declared order if it differs
            if hasattr(st, "getInputCols"):
                try:
                    cols = list(st.getInputCols())
                except Exception:
                    pass
                break
        return {
            "cols": cols,
            "mean": mean,
            "std": std,
            "with_mean": with_mean,
            "with_std": with_std,
            "w": lr.coefficients.toArray().tolist(),
            "b": float(lr.intercept),
            "threshold": float(lr.getThreshold()),
        }

    def predict(self, features: dict[str, float]) -> tuple[int, float]:
        """dict -> (class, fraud score). In-process for linear models;
        single-row Spark job only for non-linear fallbacks."""
        if self._linear is not None:
            return self._predict_local(features)
        return self._predict_spark(features)

    def _predict_local(self, features: dict[str, float]) -> tuple[int, float]:
        p = self._linear
        x = [float(features.get(f, 0.0)) for f in p["cols"]]
        if p["mean"] is not None:
            z = []
            for i, v in enumerate(x):
                if p["with_mean"]:
                    v = v - p["mean"][i]
                if p["with_std"]:
                    # MLlib StandardScalerModel: zero-variance features
                    # scale to 0.0 (factor 1/std is 0 when std == 0)
                    v = v / p["std"][i] if p["std"][i] != 0.0 else 0.0
                z.append(v)
        else:
            z = x
        logit = p["b"] + sum(w * v for w, v in zip(p["w"], z))
        score = 1.0 / (1.0 + math.exp(-logit))
        return (1 if score > p["threshold"] else 0), float(score)

    def _predict_spark(self, features: dict[str, float]) -> tuple[int, float]:
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

    def predict_df(self, df: DataFrame) -> DataFrame:
        """Batch scoring — the distributed path (model.transform), for
        when there IS a batch to amortize a Spark job over."""
        return self.model.transform(df).select(
            *df.columns,
            F.col("prediction").cast("int").alias("prediction"),
            vector_to_array("probability").getItem(1).alias("score"),
        )
