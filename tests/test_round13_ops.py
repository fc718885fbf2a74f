"""Round-13 operators and guards. Oracle parity is auto-covered by
test_oracle_parity's registry sweep; these tests pin semantics against
independent python references and pin load-bearing Spark behaviors.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


# ---------------------------------------------------------------------------
# q_boosted_stumps overflow-guard mechanism (VERDICT r12 #1): the r13
# form NULL-propagates an overflowed candidate's weighted error and
# raises only on the picked 1-row table. Its loudness rests on two
# behaviors pinned here: (a) Spark ascending ORDER BY places NULLs
# FIRST, so any overflowed candidate IS the picked row; (b) a
# raise_error wrapped in when(isNull) on that 1-row table fires at
# materialization.


def test_asc_orderby_places_nulls_first(spark):
    df = spark.createDataFrame(
        [(3, "a"), (None, "b"), (1, "c")], "e int, t string"
    )
    top = df.orderBy("e", "t").limit(1).collect()[0]
    assert top["e"] is None and top["t"] == "b"


def test_null_pick_raises_loudly(spark):
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(3, "a"), (None, "b"), (1, "c")], "e int, t string"
    )
    picked = df.orderBy("e", "t").limit(1)
    guarded = picked.withColumn(
        "e",
        F.when(
            F.col("e").isNull(),
            F.raise_error(F.lit("overflow — headroom exhausted")).cast("int"),
        ).otherwise(F.col("e")),
    )
    with pytest.raises(SparkRuntimeException, match="headroom exhausted"):
        guarded.localCheckpoint()

    # and the guard is an identity when nothing overflowed
    clean = spark.createDataFrame([(3, "a"), (1, "c")], "e int, t string")
    picked2 = clean.orderBy("e", "t").limit(1)
    guarded2 = picked2.withColumn(
        "e",
        F.when(
            F.col("e").isNull(),
            F.raise_error(F.lit("overflow — headroom exhausted")).cast("int"),
        ).otherwise(F.col("e")),
    )
    assert guarded2.localCheckpoint().collect()[0]["e"] == 1
