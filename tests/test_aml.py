"""AML screen invariants and independent python references
(operators/aml.py); oracle parity is covered by test_oracle_parity.
"""

from __future__ import annotations

import pandas as pd

from fraud_detection_spark.registry import load_all

REGISTRY = load_all()


def test_structuring_matches_pandas(spark, sf_dir):
    got = REGISTRY["q_structuring"].fn(spark, sf_dir).toPandas().set_index("user_id")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "value"
    ).toPandas()
    ev["band"] = ((ev.value >= 81.0) & (ev.value < 90.0)).astype(int)
    ref = (
        ev.groupby("user_id")
        .agg(n=("value", "size"), n_band=("band", "sum"))
        .reindex(got.index)
    )
    assert (got.n == ref.n).all() and (got.n_band == ref.n_band).all()
    want_flag = ((ref.n_band >= 10) & (ref.n_band / ref.n > 0.18)).astype(int)
    assert (got.flag == want_flag).all()


def test_dormancy_is_nonvacuous(spark, sf_dir):
    """The threshold must actually fire on this data (a 7-day rule was
    vacuously empty — max synthetic gap is ~6 days)."""
    assert len(REGISTRY["q_dormancy"].fn(spark, sf_dir).toPandas()) > 0


def test_dormancy_reference(spark, sf_dir):
    got = REGISTRY["q_dormancy"].fn(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    ).toPandas()
    ev["ts_sec"] = ev.ts.astype("int64") // 10**9
    rows = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts_sec", "event_id"])
        secs = g.ts_sec.to_numpy()
        prev = None
        for i, (eid, t) in enumerate(zip(g.event_id, secs)):
            if prev is not None and t - prev > 2 * 86400:
                burst = int(((secs >= t) & (secs <= t + 3600)).sum())
                rows.append((eid, uid, (t - prev) // 86400, burst))
            prev = t
    want = pd.DataFrame(
        rows, columns=["event_id", "user_id", "gap_days", "burst_n"]
    ).sort_values("event_id").reset_index(drop=True)
    got_s = got.sort_values("event_id").reset_index(drop=True)
    assert got_s.event_id.to_list() == want.event_id.to_list()
    assert got_s.gap_days.to_list() == want.gap_days.to_list()
    assert got_s.burst_n.to_list() == want.burst_n.to_list()
    assert (got_s.flag == (got_s.burst_n >= 3).astype(int)).all()


def test_round_amount_statistics(spark, sf_dir):
    got = REGISTRY["q_round_amount"].fn(spark, sf_dir).toPandas()
    # uniform amounts: global round share ~10% (|v - round(v)| < 0.05)
    p0 = got.n_round.sum() / got.n.sum()
    assert 0.05 < p0 < 0.15
    # binomial z's are roughly centered under the null
    assert abs((got.z * got.n).sum() / got.n.sum()) < 0.5


def _union_find_rings(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_fraud_rings_match_union_find(spark, sf_dir):
    import math

    from fraud_detection_spark.operators.aml import _RING_FACTOR
    from fraud_detection_spark.operators.graph import edges

    got = REGISTRY["q_fraud_rings"].fn(spark, sf_dir).toPandas()
    e = edges(spark, sf_dir).toPandas()
    k = math.ceil(_RING_FACTOR * e.n.mean())
    heavy = e[e.n >= k][["custkey", "suppkey"]]
    pairs = [(int(c) * 2, int(s) * 2 + 1) for c, s in heavy.itertuples(index=False)]
    labels = _union_find_rings(pairs)
    want = {
        v // 2: r for v, r in labels.items() if v % 2 == 0
    }
    got_map = dict(zip(got.custkey, got.ring_id))
    assert got_map == want
    # two customers sharing a heavy supplier are in one ring
    by_supp = heavy.groupby("suppkey").custkey.apply(list)
    for members in by_supp:
        rings = {got_map[c] for c in members}
        assert len(rings) == 1


def test_shared_counterparties_consistent_with_rings(spark, sf_dir):
    """Every pair sharing a heavy counterparty must land in the same
    connected component — the pairwise and component views of the same
    suspicious graph must agree."""
    pairs = REGISTRY["q_shared_counterparties"].fn(spark, sf_dir).toPandas()
    rings = REGISTRY["q_fraud_rings"].fn(spark, sf_dir).toPandas()
    ring_of = dict(zip(rings.custkey, rings.ring_id))
    assert len(pairs) > 0
    assert (pairs.n_shared >= 1).all()
    for r in pairs.itertuples():
        assert ring_of[r.cust_a] == ring_of[r.cust_b], (r.cust_a, r.cust_b)


def test_aml_plan_shapes(spark, sf_dir):
    """Pin the SCALE.md claims: the screens are single-shuffle shapes
    with no python boundary and no cartesian blowup."""
    from fraud_detection_spark.plans.checks import formatted_plan

    for name, max_hash_exchanges in (
        ("q_structuring", 1),   # one groupBy(user_id)
        ("q_round_amount", 1),  # groupBy + broadcast prior
        ("q_dormancy", 1),      # both windows share the user_id shuffle
    ):
        plan = formatted_plan(REGISTRY[name].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("Exchange hashpartitioning") <= max_hash_exchanges, (
            name,
            plan.count("Exchange hashpartitioning"),
        )


def test_shared_counterparties_plan_not_cartesian(spark, sf_dir):
    from fraud_detection_spark.plans.checks import formatted_plan

    plan = formatted_plan(REGISTRY["q_shared_counterparties"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the self-join keys on suppkey (equi-join), never a nested loop
    # over the edge list
    assert "BroadcastNestedLoopJoin" not in plan or "heavy" not in plan


def test_fpgrowth_agrees_with_basket_rules(spark, sf_dir):
    """MLlib FPGrowth on the same order→item baskets must find exactly
    the q_basket_rules pair set (same min support) with equal counts —
    the declared SQL form IS FPGrowth's first pass, and FPGrowth is
    the documented scale path for deeper itemsets."""
    from pyspark.ml.fpm import FPGrowth
    from pyspark.sql import functions as F

    from fraud_detection_spark.operators.analytics import _BASKET_MIN_SUPPORT
    from fraud_detection_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("item"))
        .distinct()
        .groupBy("okey")
        .agg(F.collect_set("item").alias("items"))
    )
    n_orders = baskets.count()
    model = FPGrowth(
        itemsCol="items",
        minSupport=_BASKET_MIN_SUPPORT / n_orders - 1e-9,
        minConfidence=0.0,
    ).fit(baskets)
    fp_pairs = {
        (min(r["items"]), max(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
        if len(r["items"]) == 2
    }
    sql_pairs = {
        (r.ante, r.cons): r.n_pair
        for r in REGISTRY["q_basket_rules"].fn(spark, sf_dir).collect()
    }
    assert sql_pairs == fp_pairs
