"""Physical-plan guardrails: the properties that matter at 100 TB —
pushdown, pruning, broadcast — asserted at test scale so regressions
are caught before they cost a cluster.
"""

from __future__ import annotations

from fraud_detection_spark.plans.checks import (
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pruned_schema,
    assert_pushed_filter,
    formatted_plan,
)
from fraud_detection_spark.registry import load_all


def test_filter_pushdown(spark, sf_dir):
    R = load_all()
    assert_pushed_filter(R["q_filter_threshold"].fn(spark, sf_dir), "GreaterThan(value,80.0)")
    assert_pushed_filter(R["q_point_lookup"].fn(spark, sf_dir), "EqualTo(c_custkey,42)")


def test_column_pruning(spark, sf_dir):
    R = load_all()
    # q_scan selects 4 of 11 lineitem columns — scan must not read more
    assert_pruned_schema(R["q_scan"].fn(spark, sf_dir), 4)
    assert_pruned_schema(R["q_project"].fn(spark, sf_dir), 4)


def test_dim_joins_broadcast(spark, sf_dir):
    R = load_all()
    assert_broadcast_join(R["q_join_broadcast"].fn(spark, sf_dir))
    assert_broadcast_join(R["q_knn_cosine"].fn(spark, sf_dir))
    assert_no_cartesian(R["q_jaccard_topk"].fn(spark, sf_dir))


def test_topk_avoids_global_sort(spark, sf_dir):
    R = load_all()
    plan = formatted_plan(R["q_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_q7_nation_pair_pushed_below_fact_joins(spark, sf_dir):
    """q_tpch_q7's OR-of-nation-pairs predicate can't be pushed through
    the 5-way join by Catalyst, so the query pushes it by construction:
    the n_name IN filter must reach the nation scans (dims shrink to the
    two nations BEFORE any fact join)."""
    R = load_all()
    plan = formatted_plan(R["q_tpch_q7"].fn(spark, sf_dir))
    assert "In(n_name" in plan, f"nation-pair filter not pushed to scan:\n{plan}"
    assert_no_cartesian(R["q_tpch_q7"].fn(spark, sf_dir))


def test_scoring_stays_in_codegen(spark, sf_dir):
    """The logistic-score pipeline must be pure whole-stage codegen —
    no Python evaluation (BatchEvalPython) in the hot path."""
    R = load_all()
    for q in ("q_lr_proba", "q_shap_linear", "q_standard_scale"):
        plan = formatted_plan(R[q].fn(spark, sf_dir))
        assert "BatchEvalPython" not in plan, f"{q} fell back to Python:\n{plan}"
        # AQE-wrapped plans (isFinalPlan=false) don't annotate codegen ids
        # until execution; either marker proves the JVM path
        assert "codegen id" in plan or "AdaptiveSparkPlan" in plan, (
            f"{q} has no codegen span:\n{plan}"
        )


def test_round4_operator_plan_shapes(spark, sf_dir):
    """Pin the scale claims of the round-4 operators at the plan level:
    - q_bpe_tokens / q_pq_encode are ONE Arrow pass: no Exchange at all;
    - q_unigram_nll broadcasts the vocabulary table (never shuffles the
      token stream against it) and keeps scoring JVM-side;
    - q_chunk_dedup is one Arrow chunking pass + one fingerprint
      group-by: exactly one Exchange, no window at all (the doc-local
      rewrite, round 5)."""
    from fraud_detection_spark.plans.checks import (
        assert_broadcast_join,
        formatted_plan,
    )
    from fraud_detection_spark.registry import load_all

    reg = load_all()
    for name in ("q_bpe_tokens", "q_pq_encode"):
        plan = formatted_plan(reg[name].fn(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"
        assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan

    nll = reg["q_unigram_nll"].fn(spark, sf_dir)
    assert_broadcast_join(nll)
    assert "BatchEvalPython" not in formatted_plan(nll)

    import re

    chunk_plan = formatted_plan(reg["q_chunk_dedup"].fn(spark, sf_dir))
    assert "Window" not in chunk_plan, chunk_plan
    assert "MapInPandas" in chunk_plan or "ArrowEvalPython" in chunk_plan, chunk_plan
    # only the fingerprint aggregation shuffles (2 exchanges: the
    # count-distinct two-phase agg); TakeOrdered handles the top-20
    # without a global sort exchange
    n_exchange = len(re.findall(r"\(\d+\) Exchange", chunk_plan))
    assert n_exchange <= 2, chunk_plan
    assert "TakeOrderedAndProject" in chunk_plan, chunk_plan


def test_round5_operator_plan_shapes(spark, sf_dir):
    """Pin the scale claims of the round-5 operators:
    - q_scrub_pii / q_text_normalize are pure per-row maps: no
      Exchange, no Python;
    - q_substring_dedup joins fingerprints, never a cartesian;
    - q_knn_ivf_pq never sorts globally (shortlist + top-k are
      TakeOrderedAndProject) and keeps Python to the Arrow encode."""
    from fraud_detection_spark.plans.checks import assert_no_cartesian, formatted_plan
    from fraud_detection_spark.registry import load_all

    reg = load_all()
    for name in ("q_scrub_pii", "q_text_normalize"):
        plan = formatted_plan(reg[name].fn(spark, sf_dir))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"
        assert "BatchEvalPython" not in plan, plan

    assert_no_cartesian(reg["q_substring_dedup"].fn(spark, sf_dir))

    pq_plan = formatted_plan(reg["q_knn_ivf_pq"].fn(spark, sf_dir))
    assert "CartesianProduct" not in pq_plan, pq_plan
    assert "TakeOrderedAndProject" in pq_plan, pq_plan
    assert "BatchEvalPython" not in pq_plan, pq_plan
    assert "MapInPandas" in pq_plan or "ArrowEvalPython" in pq_plan, pq_plan


def test_round6_edit_distance_threshold_plan(spark, sf_dir):
    """Pin the VERDICT r5 #4 scale claims:
    - q_edit_distance_threshold's codegen'd abs(len_a-len_b) cut sits
      BELOW the raw-text join-back (candidates are pruned on 8-byte
      lengths before any text is shuffled);
    - the bounded 3-arg levenshtein is what touches text;
    - q_edit_distance runs the banded (bounded-levenshtein) search and
      serves its top-k from the cached survivor table, never the
      unbounded DP on the full candidate set."""
    import re

    from fraud_detection_spark.registry import load_all

    reg = load_all()
    plan = (
        reg["q_edit_distance_threshold"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    f_idx = [i for i, l in enumerate(lines) if "abs(" in l and "len_a" in l]
    t_idx = [
        i for i, l in enumerate(lines) if "Join" in l and re.search(r"\bta#", l)
    ]
    assert f_idx and t_idx, plan
    # tree printing: deeper (earlier-executing) nodes have larger line
    # numbers — the length filter must execute before the text join
    assert min(f_idx) > max(t_idx), plan
    assert "levenshtein(ta" in plan and str(64) in plan, plan

    ed_plan = (
        reg["q_edit_distance"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-k is served from the cached banded-survivor table: the final
    # plan reads the cache (which holds the bounded-levenshtein rows),
    # so the unbounded DP never appears above it
    assert "InMemoryTableScan" in ed_plan, ed_plan
    assert "TakeOrderedAndProject" in ed_plan, ed_plan


def test_round6_quality_classifier_zero_shuffle(spark, sf_dir):
    """q_quality_classifier's scale claim: the whole hashed-bigram
    linear model is doc-local in ONE Arrow stage — no Exchange, no
    row-at-a-time Python. (The all-JVM HOF form was A/B'd out: lambda
    bodies evaluate interpreted, 20x slower — see _qc_score_batches.)"""
    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.registry import load_all

    plan = formatted_plan(
        load_all()["q_quality_classifier"].fn(spark, sf_dir)
    )
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_round6_semdedup_plan(spark, sf_dir):
    """q_semdedup's scale claims: centroid table broadcast (never a
    real cartesian), exactly one Arrow groups-stage for the per-cluster
    pair work, no row-at-a-time Python."""
    import re

    from fraud_detection_spark.plans.checks import formatted_plan
    from fraud_detection_spark.registry import load_all

    plan = formatted_plan(load_all()["q_semdedup"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan
