"""Model persistence (reference joblib artifacts -> MLlib native
save/load), the GBT (XGBoost-family) pipeline variant, and serving
observability metrics."""

from __future__ import annotations

from pyspark.sql import functions as F


def _toy_df(spark, n=600):
    from fraud_detection_spark.sources.synthetic import generate_validation

    df = generate_validation(spark, n=n, seed=7)
    return df.withColumn("label", (F.col("feature_0") > 0).cast("int"))


FEATS = [f"feature_{i}" for i in range(10)]


def test_pipeline_model_save_load_roundtrip(spark, tmp_path):
    """PipelineModel.save/load replaces joblib.dump/load
    (preprocess.py:52-57, api/app.py:44-48): the reloaded model must
    score identically."""
    from pyspark.ml import PipelineModel

    from fraud_detection_spark.ml.pipeline import build_pipeline

    df = _toy_df(spark).cache()
    model = build_pipeline(FEATS, "label", None).fit(df)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    back = PipelineModel.load(path)

    a = model.transform(df).select("prediction").toPandas()
    b = back.transform(df).select("prediction").toPandas()
    assert (a["prediction"].values == b["prediction"].values).all()


def test_gbt_pipeline_trains(spark):
    """GBTClassifier variant (XGBClassifier parity: trees/depth/lr
    mirrored from train_model.py:69-80) learns the planted signal."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    from fraud_detection_spark.ml.pipeline import build_pipeline, deterministic_split

    df = _toy_df(spark, n=1500)
    train, test = deterministic_split(df, FEATS)
    model = build_pipeline(FEATS, "label", None, algo="gbt").fit(train)
    auc = BinaryClassificationEvaluator(labelCol="label").evaluate(model.transform(test))
    assert auc >= 0.85, auc


def test_observed_serving_metrics(spark):
    from fraud_detection_spark.streaming.serving import REQUEST_SCHEMA, observed_scores

    df = spark.createDataFrame(
        [("t1", "c1", 10.0, 1.0, 3.0), ("t2", "c2", 500.0, 9.0, 1.0)],
        schema=REQUEST_SCHEMA,
    )
    out, obs = observed_scores(df)
    n = out.count()  # triggers the job; observation fills in
    got = obs.get
    assert n == 2
    assert got["predictions_submitted_total"] == 2
    assert 0.0 <= got["mean_score"] <= 1.0
    assert got["n_flagged"] >= 1  # the 500-value row scores > 0.5
