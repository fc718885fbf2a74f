"""Declared queries for the ML stack (rows-only: training/resampling
are not SQL-expressible — the driver records row-count checks; exact
semantics are property-tested in tests/test_ml.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.ml.smote import smote_oversample
from fraud_detection_spark.registry import query
from fraud_detection_spark.sources import load_table


def events_labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> (event_id, features, label): the declared SMOTE input.
    label = event_type 'error' (the rare-ish class); features are the
    numeric columns value, props.k, hour-of-day."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("double").alias("f_value"),
        F.coalesce(F.get_json_object("props", "$.k").cast("double"), F.lit(0.0)).alias("f_k"),
        (F.expr("ts div 1000000000") % 86400 / 3600.0).alias("f_hour"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("label"),
    )


@query("q_smote", oracle=None, tags=("ml", "resample"))
def q_smote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMOTE class rebalance over the labeled events table; returns the
    per-(label, is_synthetic) counts — deterministic: synthetic count
    is exactly n_majority - n_minority. Ref: SMOTE().fit_resample
    preprocess.py:43-44."""
    df = events_labeled(spark, sf_dir)
    balanced = smote_oversample(
        df,
        feature_cols=["f_value", "f_k", "f_hour"],
        label_col="label",
        minority_label=1,
        k=5,
        seed=42,
        order_col="event_id",
    )
    return (
        balanced.groupBy("label", "is_synthetic")
        .agg(F.count("*").alias("n"))
    )


@query("q_train_auc", oracle=None, tags=("ml", "train"))
def q_train_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training parity probe: assemble features from
    lineitem (sampled to a bounded size), fit the
    VectorAssembler->StandardScaler->LogisticRegression pipeline with
    class weights, and emit the held-out AUC. Mirrors train_model.py's
    EP1 (scale -> weight -> fit -> AUC); the >=0.70 CI gate
    (ci-cd.yml:83) is asserted in tests/test_ml.py."""
    from fraud_detection_spark.ml.pipeline import (
        add_weight_col,
        build_pipeline,
        deterministic_split,
    )
    from fraud_detection_spark.sources.synthetic import generate_validation
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    # The AUC-gate fixture (validate_auc.py:7-12): planted signal
    # label ~ feature_0, so a correct pipeline scores well above the
    # 0.70 CI gate. (lineitem's returnflag is independent of its
    # numeric columns — training there can only yield AUC ~0.5.)
    feats = [f"feature_{i}" for i in range(10)]
    df = generate_validation(spark, n=4000, seed=42).withColumn(
        "label",
        ((F.col("feature_0") + 0.4 * F.col("feature_1")) > 0).cast("int"),
    )
    train, test = deterministic_split(df, feats)
    fitted = build_pipeline(feats, "label", "weight").fit(add_weight_col(train, "label"))
    # detach(): drops the session-referencing training summary (see
    # ml/pipeline.py) and doubles as the artifact save/load parity step
    # (joblib.dump/load -> PipelineModel.save/load, preprocess.py:52-57)
    from fraud_detection_spark.ml.pipeline import detach

    model = detach(fitted)
    ev = BinaryClassificationEvaluator(labelCol="label", metricName="areaUnderROC")
    auc = float(ev.evaluate(model.transform(test)))
    return spark.createDataFrame([(round(auc, 6),)], "auc double")
