"""Scale-path variants: accuracy vs their exact twins, and the
bucketed co-located join (no shuffle on the join key)."""

from __future__ import annotations

def test_binned_auc_close_to_exact(spark, sf_dir):
    from fraud_detection_spark.registry import load_all

    R = load_all()
    exact = R["q_auc"].fn(spark, sf_dir).collect()[0]["auc"]
    binned = R["q_auc_binned"].fn(spark, sf_dir).collect()[0]["auc"]
    assert abs(exact - binned) < 0.05, (exact, binned)


def test_approx_distinct_close_to_exact(spark, sf_dir):
    from fraud_detection_spark.registry import load_all

    R = load_all()
    exact = {
        r["l_returnflag"]: r["n_parts"]
        for r in R["q_distinct_count"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: r["n_parts_approx"]
        for r in R["q_approx_distinct"].fn(spark, sf_dir).collect()
    }
    for k, v in exact.items():
        assert abs(approx[k] - v) / max(v, 1) < 0.05, (k, v, approx[k])


def test_approx_quantile_close_to_exact(spark, sf_dir):
    from fraud_detection_spark.registry import load_all

    R = load_all()
    exact = R["q_quantiles"].fn(spark, sf_dir).collect()[0]
    approx = R["q_approx_quantile"].fn(spark, sf_dir).collect()[0]
    for c in ("p25", "p50", "p75"):
        assert abs(exact[c] - approx[c]) / exact[c] < 0.02, (c, exact[c], approx[c])


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables co-locate join keys at write time: a join of two
    tables bucketed by the same key into the same bucket count needs NO
    exchange — the physical design lever for repeated 100 TB joins.
    (saveAsTable requires the session catalog; tables are dropped and
    the warehouse dir is gitignored.)"""
    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    try:
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        # force a sort-merge join so the test exercises bucket
        # co-location rather than broadcasting the small test table
        joined = lb.hint("merge").join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_extendedprice"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # the join itself must not re-shuffle either bucketed side
        assert "Exchange hashpartitioning" not in plan, plan
        # and it must still be correct
        expect = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_banded_lsh_shrinks_candidates(spark, sf_dir):
    """The banded (6×10-plane) LSH must produce strictly fewer
    candidate pairs than the legacy single-band 6-plane bucketing —
    the quadratic within-bucket stage is what explodes at 100 TB."""
    from fraud_detection_spark.operators.dedup import embedding_candidates

    new = embedding_candidates(spark, sf_dir).count()
    old = embedding_candidates(spark, sf_dir, legacy=True).count()
    assert new > 0, "banded LSH produced no candidates at all"
    assert new < old / 2, f"banded candidates {new} not < half of legacy {old}"


def test_banded_lsh_planes_distinct_and_balanced():
    """All 60 deterministic hyperplanes must be pairwise distinct and
    sign-balanced (the legacy rule silently repeated with period 5)."""
    pats = set()
    for j in range(60):
        pat = tuple((d * (2 * j + 3) + 7 * j) % 64 < 32 for d in range(64))
        assert sum(pat) == 32, f"plane {j} unbalanced"
        pats.add(pat)
    assert len(pats) == 60


def test_doc_cluster_keeper_invariants(spark, sf_dir):
    """q_dedup_doc_cluster: exactly one keeper per cluster, keeper is
    the min doc_id of its cluster, every near-dup pair is co-clustered,
    and the clustering is invariant to input partitioning."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.registry import load_all

    R = load_all()
    out = R["q_dedup_doc_cluster"].fn(spark, sf_dir).cache()

    per = out.groupBy("cluster_id").agg(
        F.sum("is_keeper").alias("n_keepers"), F.min("doc_id").alias("min_doc")
    )
    assert per.filter(F.col("n_keepers") != 1).count() == 0
    assert per.filter(F.col("cluster_id") != F.col("min_doc")).count() == 0

    pairs = R["q_dedup_near"].fn(spark, sf_dir).select("doc_a", "doc_b")
    a = out.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb"))
    split_pairs = pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("ca") != F.col("cb"))
    assert split_pairs.count() == 0, "near-dup pair split across clusters"

    n_clusters = out.select("cluster_id").distinct().count()
    out2 = R["q_dedup_doc_cluster"].fn(spark, sf_dir)
    assert out2.select("cluster_id").distinct().count() == n_clusters


def test_shingle_arrow_matches_hof(spark, sf_dir):
    """shingle_docs (Arrow fast path) must produce exactly the shingle
    lists of the interpreted HOF expression it replaced — same values,
    same first-occurrence order, every doc."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.operators.dedup import _shingles_expr, shingle_docs
    from fraud_detection_spark.sources import load_table

    d = load_table(spark, sf_dir, "documents")
    hof = d.select("doc_id", _shingles_expr().alias("tokens")).toPandas()
    arrow = shingle_docs(d).toPandas()
    h = hof.sort_values("doc_id").reset_index(drop=True)
    a = arrow.sort_values("doc_id").reset_index(drop=True)
    assert len(h) == len(a)
    for i in range(len(h)):
        assert list(h["tokens"][i]) == list(a["tokens"][i]), f"doc {h['doc_id'][i]}"


def test_hll_sketch_close_to_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import load_table

    R = load_all()

    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["d"], r["n"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("d"), F.count("*").alias("n")
        )
        .collect()
    }
    got = {
        r["event_type"]: (r["est_users"], r["n_events"])
        for r in R["q_hll_sketch"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for k, (d, n) in exact.items():
        est, n_got = got[k]
        assert n_got == n, k
        assert abs(est - d) / max(d, 1) < 0.05, (k, d, est)


def test_hll_merge_matches_direct(spark, sf_dir):
    """Union of daily sketches must estimate like one direct sketch —
    the mergeability property the persisted-index path relies on."""
    from pyspark.sql import functions as F

    from fraud_detection_spark.registry import load_all
    from fraud_detection_spark.sources import load_table

    R = load_all()

    ev = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e"))
        .collect()
    }
    merged = {
        r["event_type"]: r["est_users"]
        for r in R["q_hll_sketch"].fn(spark, sf_dir).collect()
    }
    assert merged == {k: int(v) for k, v in direct.items()}


def test_hll_index_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """Persisted sketches must survive parquet round-trip bit-for-bit
    (identical estimates) and answer from the index without the fact
    table; day_min pruning must reduce the estimate monotonically."""
    from fraud_detection_spark.operators.scale import (
        build_hll_index,
        estimate_from_index,
    )
    from fraud_detection_spark.registry import load_all

    R = load_all()

    out = str(tmp_path / "hll_idx")
    build_hll_index(spark, sf_dir, out)
    full = {
        r["event_type"]: (r["est_users"], r["n_events"])
        for r in estimate_from_index(spark, out).collect()
    }
    live = {
        r["event_type"]: (r["est_users"], r["n_events"])
        for r in R["q_hll_sketch"].fn(spark, sf_dir).collect()
    }
    assert full == live
    days = sorted(
        r["day"]
        for r in spark.read.parquet(out).select("day").distinct().collect()
    )
    mid = days[len(days) // 2]
    pruned = {
        r["event_type"]: r["est_users"]
        for r in estimate_from_index(spark, out, day_min=mid).collect()
    }
    for k, est in pruned.items():
        assert est <= full[k][0]
