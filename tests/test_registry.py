"""Model-registry flow parity (reference train_model.py:117-163 +
api/app.py:34-46): gate-checked registration, stage transitions with
Production-demotes-previous semantics, and serving-side load."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fraud_detection_spark.ml.registry import (
    get_version,
    latest_version,
    load_stage,
    register_model,
    transition_stage,
)


@pytest.fixture(scope="module")
def trained(spark):
    from fraud_detection_spark.ml.pipeline import build_pipeline
    from fraud_detection_spark.sources.synthetic import generate_validation

    df = generate_validation(spark, n=500, seed=7).withColumn(
        "label", (F.col("feature_0") > 0).cast("int")
    )
    feats = [f"feature_{i}" for i in range(10)]
    model = build_pipeline(feats, "label", None).fit(df)
    return model, df, feats


def test_auc_gate_rejects_and_accepts(trained, tmp_path):
    model, _, _ = trained
    root = str(tmp_path)
    assert (
        register_model(model, root, "fraud", {"test_auc": 0.62}, auc_threshold=0.70)
        is None
    ), "gate must reject below-threshold AUC"
    assert latest_version(root, "fraud") == 0

    rv = register_model(
        model,
        root,
        "fraud",
        {"test_auc": 0.91, "cv_auc_mean": 0.9},
        params={"model_type": "LogisticRegression", "cv_folds": 5},
        auc_threshold=0.70,
    )
    assert rv is not None and rv.version == 1 and rv.stage == "None"


def test_stage_machine_and_serving_load(trained, spark, tmp_path):
    model, df, _ = trained
    root = str(tmp_path)
    v1 = register_model(model, root, "fraud", {"test_auc": 0.9})
    v2 = register_model(model, root, "fraud", {"test_auc": 0.95})
    assert (v1.version, v2.version) == (1, 2)

    transition_stage(root, "fraud", 1, "Production")
    assert get_version(root, "fraud", 1).stage == "Production"

    # promoting v2 must demote v1 to Archived (single Production holder)
    transition_stage(root, "fraud", 2, "Production")
    assert get_version(root, "fraud", 2).stage == "Production"
    assert get_version(root, "fraud", 1).stage == "Archived"

    served = load_stage(root, "fraud", "Production")
    out = served.transform(df)
    assert out.filter(F.col("prediction").isNull()).count() == 0

    with pytest.raises(ValueError):
        transition_stage(root, "fraud", 2, "NotAStage")
    with pytest.raises(FileNotFoundError):
        load_stage(root, "fraud", "Staging")
