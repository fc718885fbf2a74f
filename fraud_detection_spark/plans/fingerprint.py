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
    "exchange": r"Exchange",
    "broadcast_join": r"BroadcastHashJoin|BroadcastNestedLoopJoin",
    "sortmerge_join": r"SortMergeJoin",
    "shuffled_hash_join": r"ShuffledHashJoin",
    "cartesian": r"CartesianProduct",
    "python_row_udf": r"BatchEvalPython",
    "python_arrow": r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "window": r"Window",
    "sort": r"Sort",
}

# Counting convention (ADVICE r5): each count is the number of PHYSICAL
# NODES of that kind — matched as `(<id>) <NodeName>` detail headers in
# the formatted plan, so one node counts once. This is the same
# convention as tests/test_plans.py's inline `\(\d+\) Exchange`
# assertions; before round 6 the fingerprint counted bare word matches
# (tree line + detail header = 2 per node), which read double.
FINGERPRINT_CONVENTION = (
    "counts are physical-plan NODES, matched as '(id) NodeName' detail "
    "headers in explain('formatted') — one node = 1 (same convention as "
    "test_plans.py inline assertions)"
)


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    plan = formatted_plan(df)
    return {
        name: len(re.findall(rf"\(\d+\) (?:{pat})\b", plan))
        for name, pat in MARKERS.items()
    }
