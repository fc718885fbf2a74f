"""Differential test: every declared query with an oracle must match
DuckDB exactly (the driver's t2 gate, reproduced locally).

Comparison mirrors the driver: columns sorted by name, rows sorted by
all values, values compared after normalization (the queries themselves
round doubles, so equality here is exact).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: float(v) if hasattr(v, "as_tuple") else v  # Decimal -> float
            )
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        if a[c].dtype == "float64":
            ok = (
                (a[c].isna() & b[c].isna())
                | (a[c] - b[c]).abs().le(1e-9)
                | (a[c] == b[c])
            )
        else:
            ok = (a[c].isna() & b[c].isna()) | (a[c] == b[c])
        if not ok.all():
            bad = (~ok).idxmax()
            raise AssertionError(
                f"{name}: value mismatch col={c} row={bad}: "
                f"spark={a[c][bad]!r} duck={b[c][bad]!r}\n"
                f"spark head:\n{a.head()}\nduck head:\n{b.head()}"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(q.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(name, spark, sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "fraud_score" in df.columns


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
