"""CATALOG.md must match the registry (regenerate with
`python -m fraud_detection_spark.catalog`)."""

from __future__ import annotations

import os


def test_catalog_in_sync():
    from fraud_detection_spark.catalog import render

    path = os.path.join(os.path.dirname(__file__), "..", "CATALOG.md")
    assert os.path.exists(path), "CATALOG.md missing — run the generator"
    with open(path) as f:
        committed = f.read()
    assert committed == render(), (
        "CATALOG.md is stale — run `python -m fraud_detection_spark.catalog`"
    )
