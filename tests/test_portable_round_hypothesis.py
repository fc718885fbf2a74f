"""Property-based check of the engine's central determinism invariant:
``pround`` (Spark), ``sql_round`` (DuckDB) and the numpy twin must
agree bit-for-bit on ARBITRARY doubles — including the values where the
engines' native ROUNDs disagree (ties like 37704.575, subnormals,
negatives). Hypothesis drives the search; any counterexample is a
future oracle hash-flake caught before the driver finds it."""

from __future__ import annotations

import math

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fraud_detection_spark.registry import sql_double_lit, sql_round

_CON = duckdb.connect()


def _py_pround(x: float, n: int = 6) -> float:
    p = float(10**n)
    return math.floor(x * p + 0.5) / p


@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
    ),
    st.integers(min_value=0, max_value=6),
)
def test_pround_matches_duckdb_sql_round(x, n):
    """floor(x*10^n + 0.5)/10^n evaluated by DuckDB must equal the
    same IEEE ops evaluated by Python/numpy for any double."""
    # Feed x through sql_double_lit (quoted-string cast → strtod):
    # a BARE literal parses as DECIMAL first and DuckDB's
    # DECIMAL→DOUBLE cast can be 1 ulp off (see
    # test_bare_decimal_literal_hazard), so DuckDB would round a
    # *different double* — real oracles read parquet doubles and never
    # hit that path.
    got_duck = _CON.execute(
        f"SELECT {sql_round(sql_double_lit(x), n)}"
    ).fetchone()[0]
    want = _py_pround(x, n)
    assert got_duck == want or (math.isnan(got_duck) and math.isnan(want)), (
        x,
        n,
        got_duck,
        want,
    )
    got_np = float(np.floor(np.float64(x) * 10.0**n + 0.5) / 10.0**n)
    assert got_np == want, (x, n, got_np, want)


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False))
def test_native_round_disagreement_is_real(x):
    """Sanity for the design rationale: whenever DuckDB's native ROUND
    differs from the portable round, the portable one still matches
    Python — i.e. pround removes the engine dependence, not just moves
    it."""
    portable = _CON.execute(
        f"SELECT {sql_round(sql_double_lit(x), 2)}"
    ).fetchone()[0]
    assert portable == _py_pround(x, 2)


@settings(max_examples=300, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False))
def test_sql_double_lit_roundtrips(x):
    """sql_double_lit must deliver bit-identical doubles into DuckDB
    for ANY finite double — the contract every generated oracle literal
    (EWMA weights, tree thresholds, model coefficients) relies on."""
    got = _CON.execute(f"SELECT {sql_double_lit(x)}").fetchone()[0]
    assert got == x or (got == 0.0 and x == 0.0), (x, got)


def test_bare_decimal_literal_hazard():
    """Regression pin for the hypothesis find that motivated
    sql_double_lit: a bare >15-significant-digit literal parses as
    DECIMAL(17,8) and DuckDB's DECIMAL→DOUBLE conversion lands 1 ulp
    high of the correctly-rounded double, so CAST(bare AS DOUBLE)
    is NOT a faithful way to inject a double into oracle SQL."""
    x = 180143985.25465846
    bare = _CON.execute(f"SELECT CAST({x!r} AS DOUBLE)").fetchone()[0]
    quoted = _CON.execute(f"SELECT {sql_double_lit(x)}").fetchone()[0]
    assert quoted == x
    assert bare != x, (
        "DuckDB's bare-literal parse became correctly rounded — "
        "sql_double_lit is then optional (keep it for safety)"
    )
