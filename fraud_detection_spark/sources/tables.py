"""Table sources.

The driver's testdata is one parquet file per table under
``{sf_dir}/{name}.parquet``. Loading is a plain ``spark.read.parquet``
so Catalyst gets full predicate-pushdown / column-pruning freedom —
filters and projections in downstream operators reach the parquet
reader (verified in plans/checks.py).

Reference parity: the reference ingests CSV with inferred schemas
(load_data.py:4, preprocess.py:21, train_model.py:22). ``read_csv``
here takes an *explicit* schema — schema inference is a second full
pass over the data and is banned at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet scan, lazily planned).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; ``nanosAsLong`` maps it to LongType (epoch nanos).
    All event-time operators do integer epoch math on it (matching
    DuckDB's ``epoch_ns``), which is also timezone-proof.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + derived time columns: ``ts_sec`` (epoch seconds, long)
    and ``ts_m`` (microsecond-precision timestamp — same truncation
    DuckDB applies reading ns parquet into its µs TIMESTAMP)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("ts_sec", F.expr("ts div 1000000000")).withColumn(
        "ts_m", F.timestamp_micros(F.expr("ts div 1000"))
    )


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views for SQL-form operators."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV source with explicit schema (no inference pass).

    Mirrors reference load_data.py:4 / train_model.py:22 but with the
    schema declared up front.
    """
    return spark.read.csv(path, header=True, schema=schema)
