"""Registry-wide oracle physical-type parity (VERDICT r8 #2).

The round-8 q_anova / q_changepoint hash failures were not value bugs:
DuckDB widens SUM(BIGINT) to HUGEINT, which arrives via arrow as
decimal128(38,0) where Spark emits int64, and the driver's value hash
is type-sensitive. test_oracle_parity.py compares VALUES after dtype
normalization, so it could never catch that class. This test compares
the PHYSICAL column types: for every oracle query, DuckDB's
fetch_arrow_table().schema against the Spark DataFrame schema
(available lazily — only DuckDB executes, so the sweep is cheap at
sf0.001).

Both schemas fold to a canonical tag so only hash-relevant differences
fail: int64 vs decimal128(38,0) FAILS (the r8 bug), string vs
large_string does not (same hashed value).
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


def spark_type_tag(dt: T.DataType) -> str:
    if isinstance(dt, T.LongType):
        return "i64"
    if isinstance(dt, T.IntegerType):
        return "i32"
    if isinstance(dt, T.ShortType):
        return "i16"
    if isinstance(dt, T.ByteType):
        return "i8"
    if isinstance(dt, T.DoubleType):
        return "f64"
    if isinstance(dt, T.FloatType):
        return "f32"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType | T.TimestampNTZType):
        return "ts"
    if isinstance(dt, T.DecimalType):
        return f"dec({dt.precision},{dt.scale})"
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        return f"arr<{spark_type_tag(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_type_tag(dt.keyType)},{spark_type_tag(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        return "struct<" + ",".join(spark_type_tag(f.dataType) for f in dt.fields) + ">"
    return f"other:{dt.simpleString()}"


def arrow_type_tag(t: pa.DataType) -> str:
    if pa.types.is_int64(t):
        return "i64"
    if pa.types.is_int32(t):
        return "i32"
    if pa.types.is_int16(t):
        return "i16"
    if pa.types.is_int8(t):
        return "i8"
    if pa.types.is_float64(t):
        return "f64"
    if pa.types.is_float32(t):
        return "f32"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_decimal(t):
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"arr<{arrow_type_tag(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{arrow_type_tag(t.key_type)},{arrow_type_tag(t.item_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(arrow_type_tag(f.type) for f in t) + ">"
    return f"other:{t}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_dtype_parity(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    # Lazy for most queries — schema only, no Spark job. Queries
    # declared ``eager=True`` in the registry (q_mmr's collected
    # candidate pool, the iterative graph family's localCheckpoint
    # loops, the IVF index builds) DO run their bounded
    # construction-time jobs here; the dtype assertion below is
    # equally valid for them, just not free.
    sdf = q.fn(spark, sf_dir)
    spark_types = {f.name: spark_type_tag(f.dataType) for f in sdf.schema.fields}
    at = duck.execute(q.oracle).fetch_arrow_table()
    duck_types = {f.name: arrow_type_tag(f.type) for f in at.schema}
    assert spark_types == duck_types, (
        f"{name}: physical type mismatch (driver hash is type-sensitive)\n"
        f"  spark: {spark_types}\n  duck : {duck_types}"
    )
