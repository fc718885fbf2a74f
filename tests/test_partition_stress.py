"""Partition-layout stress: every oracle-checked query must match the
DuckDB oracle EXACTLY (bit-equal values, no tolerance) under two
hostile physical layouts — many tiny scan splits + 3 shuffle
partitions, and the default 32/32 layout.

This pins the round-2 flake class forever: ``round(SUM(double))`` is
partition-order dependent, so a query can be hash-green on one layout
and one cent off on another (q_tpch_q9, group (NATION_23, 2000), at
local[32] vs local[8]). Since round 3, money sums go through
``functions.fixed_sum`` / ``registry.sql_fixed_sum`` (per-row integer
units -> exact BIGINT sum), which this test verifies is sufficient:
exact equality to the oracle must hold on EVERY layout, not just the
one the CI machine happens to use.

Unlike test_oracle_parity (1e-9 tolerance — the gate that let the Q9
flake through locally), the comparison here is exact equality, matching
the driver's value-hash gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)

# (shuffle.partitions, files.maxPartitionBytes): a degenerate layout
# that reshapes every partial-aggregation tree, and the default layout.
LAYOUTS = [("3", str(64 * 1024)), ("32", str(128 * 1024 * 1024))]


def exact_norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: float(v) if hasattr(v, "as_tuple") else v  # Decimal
            )
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_exact(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, label: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), label
    a, b = exact_norm(spark_pdf), exact_norm(duck_pdf)
    assert len(a) == len(b), f"{label}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        ok = (a[c].isna() & b[c].isna()) | (a[c] == b[c])
        if not ok.all():
            i = (~ok).idxmax()
            raise AssertionError(
                f"{label}: EXACT mismatch col={c} row={i}: "
                f"spark={a[c][i]!r} duck={b[c][i]!r}"
            )


def _stress(name, spark, duck_con, sf_dir):
    q = REGISTRY[name]
    duck_pdf = duck_con.execute(q.oracle).df()
    base_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    base_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        for shuffle, max_bytes in LAYOUTS:
            spark.conf.set("spark.sql.shuffle.partitions", shuffle)
            spark.conf.set("spark.sql.files.maxPartitionBytes", max_bytes)
            spark_pdf = q.fn(spark, sf_dir).toPandas()
            assert_exact(spark_pdf, duck_pdf, f"{name}@shuffle={shuffle}")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", base_bytes)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_layout_stress_exact(name, spark, duck, sf_dir):
    _stress(name, spark, duck, sf_dir)


# The round-2 Q9 flake only fired at sf0.01 (more groups, longer sums
# — the pre-rounding double sat closer to a half-cent boundary), so the
# money-sum class additionally stresses at the driver's comparison SF.
MONEY_QUERIES = sorted(
    n
    for n, q in REGISTRY.items()
    if q.oracle is not None and ("tpch" in q.tags or n in {
        "q_join_inner", "q_rollup", "q_range_join", "q_tumbling_window",
        "q_sliding_window", "q_window_running", "q_case_bucket",
        "q_scalar_subquery", "q_mean_std", "q_mean_abs",
    })
)


@pytest.fixture(scope="module")
def duck001():
    import duckdb

    from fraud_detection_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_layout_stress_exact_sf001(name, spark, duck001):
    _stress(name, spark, duck001, "/root/testdata/sf0.01")
