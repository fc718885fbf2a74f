"""Physical-plan assertions — the engine's "did Catalyst do what we
designed for" guardrails, used by tests and bench --explain.

At 100 TB the difference between a pruned scan and a full scan, or a
broadcast join and a shuffled one, is the whole game; these checks make
regressions visible at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """Assert a predicate reached the parquet scan (PushedFilters)."""
    plan = formatted_plan(df)
    if "PushedFilters" not in plan or fragment not in plan:
        raise AssertionError(
            f"expected pushed filter containing {fragment!r}; plan:\n{plan}"
        )


def assert_pruned_schema(df: DataFrame, max_columns: int) -> None:
    """Assert the scan reads at most ``max_columns`` columns
    (column pruning reached the reader)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("struct<", 1)[-1]
            n = schema.count(":")
            if n > max_columns:
                raise AssertionError(
                    f"scan reads {n} columns, expected <= {max_columns}:\n{line}"
                )
            return
    raise AssertionError(f"no ReadSchema found in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    """Assert at least one join executes as a broadcast join."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" not in plan and "BroadcastNestedLoopJoin" not in plan:
        raise AssertionError(f"no broadcast join in plan:\n{plan}")


def assert_no_broadcast_join(df: DataFrame) -> None:
    """Assert NO join executes as a broadcast — the guardrail for plans
    where every input is corpus-sized and a broadcast would OOM the
    executors at scale (e.g. the corpus dedup keeper-pick)."""
    plan = formatted_plan(df)
    if "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan:
        raise AssertionError(f"unexpected broadcast join in plan:\n{plan}")


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"cartesian product in plan:\n{plan}")
