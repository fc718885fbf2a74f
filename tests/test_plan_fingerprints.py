"""Pin the physical-plan shape of every bench-headline query.

A fingerprint drift (extra shuffle, broadcast join degrading to
sort-merge, codegen falling back to row-at-a-time Python) is a scale
regression even when test-scale wall-clock doesn't move. Fails with the
per-marker delta; regenerate intentionally with
``SPARK_GRAFT_REGEN_PLAN_FP=1``.
"""

from __future__ import annotations

import json
import os

FP_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")


def test_headline_plan_fingerprints(spark, sf_dir):
    from bench import HEADLINE
    from fraud_detection_spark.plans.fingerprint import plan_fingerprint
    from fraud_detection_spark.registry import load_all

    R = load_all()
    got = {}
    for name in HEADLINE:
        # Fingerprints must be cache-state independent: a shared .cache()
        # (e.g. the dedup shingle table) materialized by an earlier test
        # swaps the Arrow/Exchange stages for an InMemoryTableScan and
        # the counts drift. Capture every plan cold.
        spark.catalog.clearCache()
        got[name] = plan_fingerprint(R[name].fn(spark, sf_dir))

    if os.environ.get("SPARK_GRAFT_REGEN_PLAN_FP") == "1":
        from fraud_detection_spark.plans.fingerprint import FINGERPRINT_CONVENTION

        with open(FP_PATH, "w") as f:
            json.dump(
                {"_convention": FINGERPRINT_CONVENTION, **got},
                f,
                indent=1,
                sort_keys=True,
            )
        return

    assert os.path.exists(FP_PATH), (
        f"no committed fingerprints at {FP_PATH}; run with "
        "SPARK_GRAFT_REGEN_PLAN_FP=1 to create them"
    )
    with open(FP_PATH) as f:
        want = json.load(f)

    drift = []
    for name in HEADLINE:
        if name not in want:
            drift.append(f"{name}: no committed fingerprint (new query?)")
            continue
        for marker, n in got[name].items():
            expected = want[name].get(marker, 0)
            if n != expected:
                drift.append(f"{name}.{marker}: committed {expected}, now {n}")
    assert not drift, "plan drift detected:\n  " + "\n  ".join(drift)
