"""Persisted IVF index (operators/similarity.py build_ivf_index /
ivf_probe_persisted): the probe must be a partition-pruned read of only
the probed cells and must return the identical top-k to the in-memory
ivf_search form.
"""

from __future__ import annotations

import re

from fraud_detection_spark.operators.similarity import (
    build_ivf_index,
    ivf_probe_persisted,
    ivf_search,
)


def test_persisted_probe_matches_in_memory_and_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ivf")
    build_ivf_index(spark, sf_dir, path)
    res_mem, _, probed_mem = ivf_search(spark, sf_dir)
    res_idx, probed_idx = ivf_probe_persisted(spark, sf_dir, path)

    # same quantizer (seeded fit on identical input) => same probe set
    assert sorted(probed_idx) == sorted(probed_mem)

    got = res_idx.toPandas().sort_values("vec_id").reset_index(drop=True)
    want = res_mem.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert got.equals(want), (got, want)

    # partition pruning: the cell filter reaches the reader...
    plan = res_idx._sc._jvm.PythonSQLUtils.explainString(
        res_idx._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [cell" in plan.replace("`", ""), plan
    # ...and only probed-cell directories are actually read
    # (input_file_name() is evaluated on the post-pruning scan;
    # DataFrame.inputFiles() would list the whole unpruned index)
    from pyspark.sql import functions as F

    files = (
        spark.read.parquet(f"{path}/vectors")
        .filter(F.col("cell").isin(probed_idx))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    cells_read = {
        int(m.group(1))
        for r in files
        for m in [re.search(r"cell=(\d+)/", r.f)]
        if m
    }
    assert cells_read == set(probed_idx), (cells_read, probed_idx)
