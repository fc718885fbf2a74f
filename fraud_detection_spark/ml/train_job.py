"""End-to-end training job — the reference's EP1 (`python
train_model.py`, SURVEY.md §3) as one Spark callable:

ingest -> null audit -> deterministic stratified split -> scale (fit on
train only) -> K-fold CV with SMOTE-inside-fold -> final fit -> held-out
AUC -> AUC gate -> persist artifacts.

Step parity (reference file:line):
1. ingest                train_model.py:22  (CSV; here any DataFrame)
2. null audit            train_model.py:24-25
3. stratified 80/20      train_model.py:31-33 (hash-bucketed here)
4. scale fit-on-train    train_model.py:36-40 (inside the Pipeline, so
                         refit per fold — leak-free by construction)
5. CV + SMOTE-in-fold    train_model.py:48-87
6. final fit + test AUC  train_model.py:91-110
7. persist               train_model.py:112-115 (PipelineModel.save)
8. AUC gate              train_model.py:152-163 / scripts/validate_auc.py
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fraud_detection_spark.ml.pipeline import TrainResult, train_with_cv


@dataclass
class TrainJobReport:
    null_counts: dict[str, int]
    class_counts: dict[int, int]
    result: TrainResult
    gate_threshold: float
    gate_passed: bool
    model_path: str | None = None
    fold_aucs: list[float] = field(default_factory=list)
    registered_version: int | None = None


def run_training_job(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_folds: int = 5,
    use_smote: bool = True,
    auc_threshold: float = 0.70,
    model_path: str | None = None,
    seed: int = 42,
    registry_root: str | None = None,
    model_name: str = "fraud-detection-model",
) -> TrainJobReport:
    """Run the full EP1 flow; persists the model only if the AUC gate
    passes (reference registers to MLflow on the same condition). With
    ``registry_root`` set, a gate-passing model is also registered as a
    new version in the file-based registry (ml/registry.py — the
    mlflow.register_model analog, train_model.py:152-163)."""
    null_counts = {
        c: int(n)
        for c, n in df.select(
            *[
                F.sum(F.col(c).isNull().cast("int")).alias(c)
                for c in [*feature_cols, label_col]
            ]
        )
        .collect()[0]
        .asDict()
        .items()
    }
    class_counts = {
        int(r[label_col]): int(r["cnt"])
        for r in df.groupBy(label_col).agg(F.count("*").alias("cnt")).collect()
    }
    result = train_with_cv(
        df, feature_cols, label_col, n_folds=n_folds, use_smote=use_smote, seed=seed
    )
    passed = result.test_auc >= auc_threshold
    saved = None
    if passed and model_path:
        result.model.write().overwrite().save(model_path)
        saved = model_path
    registered = None
    if registry_root is not None:
        import statistics

        from fraud_detection_spark.ml.registry import register_model

        rv = register_model(
            result.model,
            registry_root,
            model_name,
            metrics={
                "test_auc": result.test_auc,
                "cv_auc_mean": statistics.mean(result.fold_aucs)
                if result.fold_aucs
                else float("nan"),
                "cv_auc_std": statistics.pstdev(result.fold_aucs)
                if len(result.fold_aucs) > 1
                else 0.0,
            },
            params={
                "model_type": "LogisticRegression",
                "cv_folds": n_folds,
                "use_smote": use_smote,
            },
            auc_threshold=auc_threshold,
        )
        registered = rv.version if rv is not None else None
    return TrainJobReport(
        null_counts=null_counts,
        class_counts=class_counts,
        result=result,
        gate_threshold=auc_threshold,
        gate_passed=passed,
        model_path=saved,
        fold_aucs=result.fold_aucs,
        registered_version=registered,
    )
