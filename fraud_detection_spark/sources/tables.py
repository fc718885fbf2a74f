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


# Lazy-PLAN memo, stored ON the SparkSession object itself:
# session-attribute dict {(sf_dir, table) -> unexecuted scan DataFrame}.
# Each spark.read.parquet call costs ~110-160 ms (events ~435 ms with
# its ts normalization) in file listing, footer read, schema analysis
# and py4j round trips, and the 178-query bench re-loads the same
# handful of tables ~220 times — ~30 s of pure re-planning per suite
# (measured r16). The memo reuses the immutable logical plan OBJECT;
# no data, no results, no intermediates are ever cached or persisted —
# every action on the returned DataFrame scans the parquet inputs
# exactly as before (plans are bit-identical, so fingerprints and
# results are unchanged).
#
# Why an attribute on the session and not a module-level dict keyed by
# applicationId (the round-16 scheme, replaced on ADVICE r16):
# - sibling sessions from spark.newSession() SHARE an applicationId
#   while having separate confs/catalogs — the old key could hand a
#   sibling a DataFrame bound to the wrong session (defeating e.g. the
#   hostile-timezone probe in tests/test_partition_invariance.py).
#   Distinct session objects now get distinct caches by construction,
#   and a cache hit is always bound to the session argument.
# - lifetime: the cache dies with the session object — a long-lived
#   process that creates/stops many sessions no longer accumulates
#   DataFrame/py4j handles referencing dead sessions.
# Two Python wrappers of the same JVM session get separate caches —
# only a miss (one extra re-plan), never a wrong-session hit.
#
# IMMUTABLE-INPUT ASSUMPTION: the memo captures the first read's file
# listing and schema for (sf_dir, name). If the parquet data at that
# path is regenerated/overwritten WITHIN one session's lifetime,
# cached plans would silently read stale file lists — call
# clear_plan_cache(spark) after rewriting data in-session (the
# driver's testdata is generated once and never rewritten, so the
# engine itself never needs to).
_CACHE_ATTR = "_fds_plan_cache"


def _plan_cache(spark: SparkSession) -> dict:
    cache = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    return cache


def clear_plan_cache(spark: SparkSession) -> None:
    """Invalidate the session's lazy-plan memo (see the immutable-input
    assumption above: required only if parquet inputs are rewritten
    in-place during the session's lifetime)."""
    getattr(spark, _CACHE_ATTR, {}).clear()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet scan, lazily planned).

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some
    testdata generations (Spark's vectorized reader rejects it;
    ``nanosAsLong`` maps it to LongType epoch nanos) and as
    TIMESTAMP(MICROS) in others (read as timestamp/timestamp_ntz).
    All event-time operators do integer epoch math on a LongType
    epoch-nanos ``ts`` (matching DuckDB's ``epoch_ns``, which accepts
    both physical types), so a timestamp-typed ``ts`` is normalized to
    epoch nanos here. The NTZ path uses ``timestampdiff`` from the NTZ
    epoch — pure wall-clock arithmetic, correct under ANY session
    timezone (the driver runs a vanilla session with no UTC pin; a
    cast-through-TIMESTAMP would shift by the session offset — verified
    hostile-tz in tests/test_partition_invariance.py). The conversion
    is a cheap codegen'd projection; it costs raw-``ts`` predicate
    pushdown, but every event-time operator filters on derived
    second/minute columns anyway (never pushable).
    """
    cache = _plan_cache(spark)
    key = (sf_dir, name)
    cached = cache.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        dt = df.schema["ts"].dataType
        if isinstance(dt, T.TimestampNTZType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                ) * F.lit(1000),
            )
        elif isinstance(dt, T.TimestampType):
            # instant-typed: unix_micros is timezone-independent
            df = df.withColumn("ts", (F.unix_micros("ts") * F.lit(1000)).cast("long"))
    cache[key] = df
    return df


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + derived time columns: ``ts_sec`` (epoch seconds, long)
    and ``ts_m`` (microsecond-precision timestamp — same truncation
    DuckDB applies reading ns parquet into its µs TIMESTAMP).

    Rides the load_table lazy-plan memo (same key scheme, same
    plan-object-only caveat): the two derived-column expressions are
    re-parsed identically on every call otherwise."""
    from pyspark.sql import functions as F

    cache = _plan_cache(spark)
    key = (sf_dir, "__events_with_time__")
    cached = cache.get(key)
    if cached is not None:
        return cached
    ev = load_table(spark, sf_dir, "events")
    df = ev.withColumn("ts_sec", F.expr("ts div 1000000000")).withColumn(
        "ts_m", F.timestamp_micros(F.expr("ts div 1000"))
    )
    cache[key] = df
    return df


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
