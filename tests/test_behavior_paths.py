"""Property tests for the sessionized user-journey path family
(operators/behavior.py: q_session_paths / q_path_entropy, VERDICT r6
next-round #6) — the DuckDB-oracle parity lives in
tests/test_oracle_parity.py; these pin the semantic claims."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from fraud_detection_spark.operators.behavior import (
    _PATH_MAX_STEPS,
    _session_paths,
    q_path_entropy,
    q_session_paths,
)
from fraud_detection_spark.operators.windows import q_session_window


def test_session_paths_agree_with_session_window_count(spark, sf_dir):
    """The path table has exactly one row per session as defined by
    q_session_window (same 30-min gap construction)."""
    n_paths = _session_paths(spark, sf_dir).count()
    n_sessions = q_session_window(spark, sf_dir).count()
    assert n_paths == n_sessions


def test_paths_are_truncated_and_well_formed(spark, sf_dir):
    p = _session_paths(spark, sf_dir)
    bad = p.filter(
        (F.size(F.split("path", ">")) > _PATH_MAX_STEPS)
        | (F.col("path") == "")
        | F.col("path").isNull()
    ).count()
    assert bad == 0


def test_top_paths_shares_and_ordering(spark, sf_dir):
    rows = q_session_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 50
    ns = [r.n_sessions for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(0 < r.share <= 1 for r in rows)


def test_entropy_bounds_and_single_path_zero(spark, sf_dir):
    """0 <= entropy <= log2(n_paths); a user with one distinct path has
    exactly 0.0 (not -0.0 — the sign normalization the oracle also
    applies)."""
    rows = q_path_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_sessions >= r.n_paths >= 1
        assert 0.0 <= r.entropy <= math.log2(r.n_paths) + 1e-9
        if r.n_paths == 1:
            assert r.entropy == 0.0 and math.copysign(1, r.entropy) == 1.0
