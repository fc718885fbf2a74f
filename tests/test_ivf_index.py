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


def test_pq_encode_properties(spark, sf_dir):
    """q_pq_encode: every 4-bit sub-code in range, packed code < 2^32,
    reconstruction error non-negative and nontrivially distributed,
    deterministic across runs."""
    from fraud_detection_spark.registry import load_all

    got = load_all()["q_pq_encode"].fn(spark, sf_dir).toPandas()
    assert (got.pq_code >= 0).all() and (got.pq_code < 2**32).all()
    for s in range(8):
        sub = (got.pq_code // (16**s)) % 16
        assert sub.between(0, 15).all()
    assert (got.recon_err >= 0).all()
    assert got.recon_err.nunique() > 10, "degenerate quantization errors"
    again = load_all()["q_pq_encode"].fn(spark, sf_dir).toPandas()
    assert got.sort_values("vec_id").equals(again.sort_values("vec_id"))


def test_ivf_pq_probe_recall_and_pruning(spark, sf_dir, tmp_path):
    """IVF-PQ ADC probe: scans only (vec_id, pq_code) in the probed
    cells (partition + column pruned), reranks the ADC shortlist by
    exact cosine, and recovers the exact-in-probed-cells top-10 with
    recall >= 0.8 (measured 1.0 at sf0.001/sf0.01 with the default
    128-row shortlist; threshold leaves margin for corpus drift)."""
    from fraud_detection_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_probe,
        ivf_probe_persisted,
    )

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(spark, sf_dir, path)
    exact, probed_e = ivf_probe_persisted(spark, sf_dir, path)
    approx, probed_a = ivf_pq_probe(spark, sf_dir, path)
    assert sorted(probed_e) == sorted(probed_a)
    te = {r.vec_id for r in exact.collect()}
    ta = {r.vec_id for r in approx.collect()}
    assert len(te & ta) / 10 >= 0.8, (sorted(te), sorted(ta))

    plan = approx._sc._jvm.PythonSQLUtils.explainString(
        approx._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [cell" in plan.replace("`", ""), plan
    # the ADC scan must NOT read the embedding column (that is the
    # whole point of PQ) — embeddings appear only in the shortlist
    # rerank join, which scans the embeddings TABLE, not the index
    import re

    scans = re.findall(r"Location:.*?vectors.*?(?:\n.*?)*?ReadSchema: (\S+)", plan)
    assert scans, plan
    # the index stores its embedding array under column name 'e', so a
    # substring check for "embedding" would pass vacuously — assert the
    # scans read NOTHING beyond the ADC columns (no 'e', no arrays)
    for rs in scans:
        fields = {f.split(":")[0] for f in rs.strip("struct<>").split(",") if f}
        assert fields <= {"vec_id", "label", "pq_code"}, rs
        assert "array" not in rs, rs


def test_ivf_pq_append_incremental_matches_rebuild(spark, sf_dir, tmp_path):
    """append_ivf_pq (VERDICT r6 #7): with frozen model state (the full
    build's centroids + codebook), bootstrapping an index from a base
    subset and appending the held-out vectors must produce an index
    BIT-IDENTICAL in content (vec_id, cell, pq_code) to the full
    rebuild — which also proves the Arrow-side euclidean argmin agrees
    with MLlib KMeans.transform on every vector — and the probe over it
    must return the identical top-10. The second append may only add
    files under its touched cell directories."""
    import os

    from pyspark.sql import functions as F

    from fraud_detection_spark.operators.similarity import (
        _as_double,
        append_ivf_pq,
        build_ivf_pq_index,
        ivf_pq_probe,
    )
    from fraud_detection_spark.sources import load_table

    path_a = str(tmp_path / "full")
    build_ivf_pq_index(spark, sf_dir, path_a)

    # incremental index: same centroids (model state frozen), no vectors
    path_b = str(tmp_path / "incr")
    spark.read.parquet(f"{path_a}/centroids").coalesce(1).write.parquet(
        f"{path_b}/centroids"
    )
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("e")
    )
    base = vecs.filter(F.col("vec_id") % 10 != 7)
    held = vecs.filter(F.col("vec_id") % 10 == 7)
    append_ivf_pq(spark, path_b, base)

    def files_per_cell(p):
        out = {}
        root = f"{p}/vectors"
        for d in os.listdir(root):
            if d.startswith("cell="):
                out[int(d.split("=")[1])] = sorted(os.listdir(f"{root}/{d}"))
        return out

    before = files_per_cell(path_b)
    touched = append_ivf_pq(spark, path_b, held)
    after = files_per_cell(path_b)
    assert touched, "held-out vectors must land somewhere"
    for cell, files in before.items():
        if cell not in touched:
            assert after[cell] == files, f"untouched cell={cell} was modified"

    # content identical to the full rebuild (same model state)
    cols = ["vec_id", "cell", "pq_code"]
    a = sorted(map(tuple, spark.read.parquet(f"{path_a}/vectors").select(*cols).collect()))
    b = sorted(map(tuple, spark.read.parquet(f"{path_b}/vectors").select(*cols).collect()))
    assert a == b

    # probe parity: identical top-10 and probe set vs the rebuilt index
    res_a, probed_a = ivf_pq_probe(spark, sf_dir, path_a)
    res_b, probed_b = ivf_pq_probe(spark, sf_dir, path_b)
    assert probed_a == probed_b
    assert [tuple(r) for r in res_a.collect()] == [tuple(r) for r in res_b.collect()]
