"""HTTP facade integration: the reference's FastAPI surface driven
through a real socket — predict -> async explain lifecycle, validation
errors, health/status, correlation-id middleware."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

FEATS = [f"feature_{i}" for i in range(5)]


@pytest.fixture(scope="module")
def app_port(spark, tmp_path_factory):
    from fraud_detection_spark.ml.detector import FraudDetector
    from fraud_detection_spark.ml.pipeline import build_pipeline
    from fraud_detection_spark.sources.synthetic import generate_validation
    from fraud_detection_spark.streaming.api import ServingApp

    df = generate_validation(spark, n=400, seed=11).select(
        *FEATS, (F.col("feature_0") > 0).cast("int").alias("label")
    )
    path = str(tmp_path_factory.mktemp("api") / "model")
    build_pipeline(FEATS, "label", None).fit(df).write().overwrite().save(path)
    app = ServingApp(FraudDetector(spark, path, FEATS))
    port = app.start(0)
    yield port
    app.stop()


def _req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read()), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read()), dict(e.headers)


def test_status_health_and_correlation_header(app_port):
    code, body, headers = _req(app_port, "/status")
    assert code == 200 and body == {"status": "UP"}
    assert "X-Correlation-ID" in headers

    code, body, _ = _req(app_port, "/health")
    assert code == 200
    assert body["dependencies"]["spark"] == "UP"
    assert body["dependencies"]["model"] == "UP"


def test_predict_validation_422(app_port):
    code, body, _ = _req(
        app_port, "/predict", {"transaction_id": "bad", "features": [1.0, 2.0]}
    )
    assert code == 422 and "5 features" in body["detail"]

    code, body, _ = _req(app_port, "/predict", {"transaction_id": "bad2"})
    assert code == 422


def test_predict_and_async_explain_lifecycle(app_port):
    code, body, headers = _req(
        app_port,
        "/predict",
        {"transaction_id": "tx-1", "features": [2.0, 0.1, -0.3, 0.5, 1.0]},
    )
    assert code == 200
    assert body["transaction_id"] == "tx-1"
    assert body["prediction"] in (0, 1)
    assert 0.0 <= body["score"] <= 1.0
    assert body["explanation_status"] == "Calculation queued"
    assert body["correlation_id"] == headers["X-Correlation-ID"]

    # async worker commits the SHAP record; poll briefly
    deadline = time.time() + 60
    rec = None
    while time.time() < deadline:
        code, rec, _ = _req(app_port, "/explain/tx-1")
        if code == 200:
            break
        time.sleep(0.5)
    assert code == 200, f"explanation never arrived: {rec}"
    assert rec["status"] == "COMPLETED"
    assert len(rec["shap_values"]) == 5
    assert rec["feature_names"] == FEATS
    assert rec["correlation_id"] == body["correlation_id"]

    code, _, _ = _req(app_port, "/explain/never-submitted")
    assert code == 404
