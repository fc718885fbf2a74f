"""File-based model registry — the reference's MLflow tracking +
registry flow (train_model.py:117-163: log params/metrics, log the
model artifact, register a new version iff test AUC clears the gate;
api/app.py:34-46 loads the registered model for serving) re-expressed
without the mlflow dependency (not in this container).

Layout (plain directories + JSON, safe on any shared filesystem):

    registry_root/
      <model_name>/
        versions/
          v1/
            model/          <- PipelineModel.save
            meta.json       <- params, metrics, stage, timestamps
          v2/...
        LATEST              <- pointer file: highest registered version

Registration is gate-checked (``auc_threshold``, reference default via
MLFLOW_AUC_THRESHOLD) and versions move through the MLflow stage
machine: None -> Staging -> Production -> Archived. Promoting a version
to Production atomically demotes the previous Production version to
Archived, matching registry semantics. All pointer updates are
write-temp + ``os.replace`` (atomic), mirroring streaming/serving.py's
commit protocol.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.ml import PipelineModel

STAGES = ("None", "Staging", "Production", "Archived")


@dataclass
class RegisteredVersion:
    name: str
    version: int
    stage: str
    metrics: dict
    params: dict
    path: str


def _model_dir(root: str, name: str) -> str:
    return os.path.join(root, name)


def _version_dir(root: str, name: str, version: int) -> str:
    return os.path.join(_model_dir(root, name), "versions", f"v{version}")


def _write_pointer(path: str, content: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(content)
    os.replace(tmp, path)


def _meta_path(vdir: str) -> str:
    return os.path.join(vdir, "meta.json")


def _load_meta(vdir: str) -> dict:
    with open(_meta_path(vdir)) as f:
        return json.load(f)


def _save_meta(vdir: str, meta: dict) -> None:
    _write_pointer(_meta_path(vdir), json.dumps(meta, indent=1, sort_keys=True))


def latest_version(root: str, name: str) -> int:
    p = os.path.join(_model_dir(root, name), "LATEST")
    if not os.path.isfile(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def register_model(
    model: PipelineModel,
    root: str,
    name: str,
    metrics: dict,
    params: dict | None = None,
    auc_threshold: float = 0.70,
    auc_metric: str = "test_auc",
) -> RegisteredVersion | None:
    """Gate-checked registration (train_model.py:152-163): returns the
    new version, or None when the AUC gate rejects the model (the
    reference logs the run but skips ``mlflow.register_model``)."""
    auc = float(metrics.get(auc_metric, float("nan")))
    if not auc >= auc_threshold:
        return None
    version = latest_version(root, name) + 1
    vdir = _version_dir(root, name, version)
    os.makedirs(vdir, exist_ok=True)
    model.write().overwrite().save(os.path.join(vdir, "model"))
    meta = {
        "name": name,
        "version": version,
        "stage": "None",
        "metrics": {k: float(v) for k, v in metrics.items()},
        "params": dict(params or {}),
        "registered_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    _save_meta(vdir, meta)
    _write_pointer(os.path.join(_model_dir(root, name), "LATEST"), str(version))
    return RegisteredVersion(
        name=name,
        version=version,
        stage="None",
        metrics=meta["metrics"],
        params=meta["params"],
        path=vdir,
    )


def transition_stage(root: str, name: str, version: int, stage: str) -> None:
    """MLflow-registry stage semantics: promoting to Production demotes
    the current Production version to Archived first."""
    if stage not in STAGES:
        raise ValueError(f"unknown stage {stage!r} (expected one of {STAGES})")
    vdir = _version_dir(root, name, version)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(f"no version v{version} of {name!r} under {root}")
    if stage == "Production":
        for v in range(1, latest_version(root, name) + 1):
            if v == version:
                continue
            other = _version_dir(root, name, v)
            if os.path.isdir(other):
                m = _load_meta(other)
                if m["stage"] == "Production":
                    m["stage"] = "Archived"
                    _save_meta(other, m)
    meta = _load_meta(vdir)
    meta["stage"] = stage
    _save_meta(vdir, meta)


def get_version(root: str, name: str, version: int) -> RegisteredVersion:
    vdir = _version_dir(root, name, version)
    meta = _load_meta(vdir)
    return RegisteredVersion(
        name=name,
        version=version,
        stage=meta["stage"],
        metrics=meta["metrics"],
        params=meta["params"],
        path=vdir,
    )


def load_stage(root: str, name: str, stage: str = "Production") -> PipelineModel:
    """Serving-side load (api/app.py:34-46 pulls the Production model).
    Exactly one version may hold Production; highest version wins for
    other stages."""
    for v in range(latest_version(root, name), 0, -1):
        vdir = _version_dir(root, name, v)
        if os.path.isdir(vdir) and _load_meta(vdir)["stage"] == stage:
            return PipelineModel.load(os.path.join(vdir, "model"))
    raise FileNotFoundError(f"no {name!r} version in stage {stage!r} under {root}")
