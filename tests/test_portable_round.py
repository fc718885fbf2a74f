"""The portable round (floor(x*10^n+0.5)/10^n) is the engine's core
cross-engine determinism mechanism — validate it bit-exactly against
DuckDB over a wide random sample plus adversarial boundary values, and
validate the CSV source round-trip with an explicit schema."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_pround_matches_duckdb_bit_exactly(spark, duck):
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            rng.uniform(-1e6, 1e6, 20000),
            rng.uniform(-1, 1, 20000),
            # adversarial: exact .xx5 decimal boundaries where native
            # ROUNDs disagree between engines
            np.round(rng.uniform(-1000, 1000, 20000), 3) + 0.0005,
            np.array([37704.575, 2.675, -2.675, 0.125, 1e9 + 0.005, 0.0]),
        ]
    )
    pdf = pd.DataFrame({"x": vals})

    from fraud_detection_spark.functions import pround
    import pyspark.sql.functions as F

    spark_out = (
        spark.createDataFrame(pdf)
        .select(pround(F.col("x"), 2).alias("r2"), pround(F.col("x"), 6).alias("r6"))
        .toPandas()
    )
    duck.register("vals", pdf)
    duck_out = duck.execute(
        "SELECT FLOOR(x * 100 + 0.5) / 100 AS r2, "
        "FLOOR(x * 1000000 + 0.5) / 1000000 AS r6 FROM vals"
    ).df()
    duck.unregister("vals")
    assert (spark_out["r2"].values == duck_out["r2"].values).all()
    assert (spark_out["r6"].values == duck_out["r6"].values).all()


def test_read_csv_explicit_schema(spark, sf_dir, tmp_path):
    """CSV source parity (load_data.py:4) with a declared schema — no
    inference pass."""
    from pyspark.sql import types as T

    from fraud_detection_spark.sources import load_table
    from fraud_detection_spark.sources.tables import read_csv

    nat = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    nat.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, path, schema)
    assert back.schema == schema
    assert back.count() == nat.count()
    assert {r["n_name"] for r in back.collect()} == {r["n_name"] for r in nat.collect()}
