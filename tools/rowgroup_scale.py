#!/usr/bin/env python
"""Multi-row-group parallel-scaling exercise (round 17, VERDICT r16 #4).

Finding (r16, confirmed r17): every testdata parquet file is ONE row
group, so every scan stage — and everything fused into it (the
stack-explode ×3 → g/h histogram partial aggregation) — runs as a
single task regardless of core count; the sf0.1 bench therefore
CANNOT demonstrate parallel scaling. This tool converts that claim
into a measured demonstration WITHOUT touching the driver's testdata:
it rewrites lineitem into N files (N independent scan splits) in a
temp dir, then times the trainer histogram pass against the rewritten
table in THIS process's session (local[$SPARK_GRAFT_CPUS]).

Run it at two core counts and compare (the env-gated test
tests/test_rowgroup_scale.py orchestrates 8 vs 32 via subprocesses):

    SPARK_GRAFT_CPUS=8  python tools/rowgroup_scale.py
    SPARK_GRAFT_CPUS=32 python tools/rowgroup_scale.py

Prints one JSON line: {"cpus": C, "files": N, "hist_secs": [...],
"hist_keyed_secs": [...], "cells": K, "match_single_file": bool}.

``hist_keyed_secs`` re-times the round-16 rejected keyed
``repartition(cpus, "feat", "val")`` fan-out variant under the SAME
multi-split fixture (VERDICT r16 #5): with real scan parallelism the
histogram's map side is already parallel, so the extra exchange is
predicted to stay a regression — measured either way.

The fact table is replicated RG_REPLICATE times before the rewrite so
the map side dominates fixed per-job overhead (at raw sf0.1 the pass
is ~1 s and overhead-bound — scaling is invisible); the SAME
replicated rows are also written as a single file, so the
single-vs-multi comparison isolates LAYOUT at fixed data.

Env:
    SPARK_GRAFT_SF_DIR    source dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS      cores (default 32)
    RG_FILES              split count for the rewrite (default 32)
    RG_REPLICATE          fact replication factor (default 8)
    RG_DIR                rewrite target (default /tmp/rg_scale_lineitem)
    RG_REPS               timing repetitions (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = int(os.environ.get("RG_FILES", "32"))
REPLICATE = int(os.environ.get("RG_REPLICATE", "8"))
RG_DIR = os.environ.get("RG_DIR", "/tmp/rg_scale_lineitem")
REPS = int(os.environ.get("RG_REPS", "3"))


def main() -> None:
    from pyspark.sql import functions as F

    from fraud_detection_spark.operators.ml_metrics import (
        _mf_unpivot,
        _sum_gu_dec,
        _sum_hu_dec,
        _xgb_base,
        _xgb_gh,
    )
    from fraud_detection_spark.session import get_spark

    spark = get_spark("rowgroup-scale")
    spark.range(1000).summary().collect()
    cpus = spark.sparkContext.defaultParallelism

    # one-time rewrite: the replicated fact written BOTH as N files
    # (N independent scan splits) and as one file (the testdata layout:
    # one row group => one non-empty scan task no matter the cores).
    # Same rows in both => the comparison isolates layout.
    multi_dir = os.path.join(RG_DIR, "multi")
    single_dir = os.path.join(RG_DIR, "single")
    cols = [
        "l_returnflag",
        "l_quantity",
        "l_discount",
        "l_extendedprice",
    ]
    if not (
        os.path.exists(os.path.join(multi_dir, "_SUCCESS"))
        and os.path.exists(os.path.join(single_dir, "_SUCCESS"))
    ):
        src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(cols)
        rep = src
        for _ in range(REPLICATE - 1):
            rep = rep.unionAll(src)
        rep.repartition(N_FILES).write.mode("overwrite").parquet(multi_dir)
        (
            spark.read.parquet(multi_dir)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(single_dir)
        )

    def hist(base):
        return (
            _mf_unpivot(base, ["gu", "hu"])
            .groupBy("feat", "val")
            .agg(
                F.count("*").cast("bigint").alias("cnt"),
                _sum_gu_dec("gu").alias("g"),
                _sum_hu_dec("hu").alias("h"),
            )
        )

    def base_from(path_df):
        from fraud_detection_spark.functions import pround
        from fraud_detection_spark.operators.ml_metrics import (
            B0,
            W_DISC,
            W_PRICE,
            W_QTY,
        )

        li = path_df
        logit = (
            F.lit(B0)
            + F.lit(W_QTY) * F.col("l_quantity")
            + F.lit(W_DISC) * F.col("l_discount")
            + F.lit(W_PRICE) * (F.col("l_extendedprice") / 100000.0)
        )
        u_int = F.floor(
            pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6) * 1000000
            + F.lit(0.5)
        ).cast("bigint")
        sel = li.select(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
            pround(F.col("l_discount").cast("double"), 6).alias("disc"),
            pround(F.col("l_extendedprice").cast("double") / 100000.0, 6).alias(
                "price"
            ),
            pround(F.col("l_quantity").cast("double"), 6).alias("qty"),
            u_int.alias("u"),
        )
        return _xgb_gh(sel)

    multi = base_from(spark.read.parquet(multi_dir))
    single = base_from(spark.read.parquet(single_dir))

    def timed(df):
        out = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out.append(round(time.perf_counter() - t0, 3))
        return out

    hist_multi_secs = timed(hist(multi))
    hist_single_secs = timed(hist(single))
    keyed = (
        _mf_unpivot(multi, ["gu", "hu"])
        .repartition(cpus, "feat", "val")
        .groupBy("feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    hist_keyed_secs = timed(keyed)

    # correctness: the multi-split histogram must equal the single-file
    # one bit-exactly (partition invariance over the same rows)
    a = hist(multi).orderBy("feat", "val").collect()
    b = hist(single).orderBy("feat", "val").collect()

    print(
        json.dumps(
            {
                "cpus": cpus,
                "files": N_FILES,
                "replicate": REPLICATE,
                "hist_multi_secs": hist_multi_secs,
                "hist_single_secs": hist_single_secs,
                "hist_keyed_secs": hist_keyed_secs,
                "cells": len(a),
                "match_single_file": a == b,
            }
        )
    )


if __name__ == "__main__":
    main()
