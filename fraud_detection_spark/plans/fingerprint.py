"""Plan fingerprints — a compact, diffable summary of each query's
physical plan (shuffle count, join strategies, python boundaries).

Round-over-round plan regressions (a broadcast join silently becoming a
sort-merge join, an extra Exchange appearing, an operator falling out
of codegen into BatchEvalPython) change performance at 100 TB long
before they change wall-clock at test scale. The committed fingerprint
file pins the intended plan shape; ``tests/test_plan_fingerprints.py``
fails on any drift and prints the delta.

Regenerate intentionally with:
    SPARK_GRAFT_REGEN_PLAN_FP=1 python -m pytest tests/test_plan_fingerprints.py
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from fraud_detection_spark.plans.checks import formatted_plan

# markers whose *count* is the fingerprint; order is the file layout
MARKERS = {
    "exchange": r"\bExchange\b",
    "broadcast_join": r"BroadcastHashJoin|BroadcastNestedLoopJoin",
    "sortmerge_join": r"SortMergeJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "cartesian": r"CartesianProduct",
    "python_row_udf": r"BatchEvalPython",
    "python_arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "window": r"\bWindow\b",
    "sort": r"\bSort\b",
}


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    plan = formatted_plan(df)
    return {name: len(re.findall(pat, plan)) for name, pat in MARKERS.items()}
