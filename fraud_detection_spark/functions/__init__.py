"""Reusable column-expression helpers (all JVM-side, codegen-friendly)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(x: Column, n: int) -> Column:
    """Portable round: FLOOR(x*10^n + 0.5)/10^n — pure IEEE double ops,
    bit-identical in Spark and DuckDB (see registry.sql_round; Spark's
    native ROUND rounds the decimal string, DuckDB rounds the binary
    double, and they disagree on half-way-looking values)."""
    p = float(10 ** n)
    return F.floor(x * p + F.lit(0.5)) / p


def sigmoid(x: Column) -> Column:
    """Logistic function 1/(1+e^{-x}) — the predict_proba kernel
    (ref: model.predict_proba, evaluate_model.py:27)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


def linear_logit(bias: float, terms: list[tuple[float, Column]]) -> Column:
    """b + Σ wᵢ·xᵢ as a single codegen'd expression."""
    out: Column = F.lit(bias)
    for w, col in terms:
        out = out + F.lit(w) * col
    return out


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def zscore(x: Column, mu: Column, sd: Column) -> Column:
    """StandardScaler transform (ref: train_model.py:36-40)."""
    return (x - mu) / sd
