"""Model-monitoring & fraud-feature operators.

The reference evaluates its fraud model offline (confusion/ROC/AUC,
evaluate_model.py:26-50) and serves it online (api/app.py:209,
deploy.py:36-44) but has no drift / score-distribution monitoring
between the two — the standard MLOps gap its WorkerRecoveryTestPlan
SQL rollups gesture at. This module adds the canonical monitoring
battery a fraud team runs on a deployed scorer, each SQL-expressible
so the DuckDB oracle verifies it bit-exactly:

- q_ks_stat        KS separation of the score distributions
- q_psi            population-stability index (train vs holdout drift)
- q_calibration    reliability curve (predicted vs observed rate)
- q_lift_bands     cumulative gains / lift by score band
- q_benford        first-significant-digit law on amounts
- q_target_encode  smoothed mean target encoding (leak-free broadcast)
- q_woe_iv         weight-of-evidence + information value per category
- q_velocity       per-user rolling velocity features (range window)

Scale posture: every statistic is a hash aggregate with partial
(map-side) combine; cumulative passes run over *bounded* band tables
(≤1001 rows — same pattern as q_roc_points) never over the fact table;
encodings join back via broadcast of a ≤|categories| row table;
q_velocity's window is partitioned by user_id (no global sort). No
Python UDF anywhere — all whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fp_units, pround
from fraud_detection_spark.operators.ml_metrics import SCORED_SQL, scored
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import events_with_time, load_table

_SEC_SQL = "(epoch_ns(ts) // 1000000000)"

# Label fragment shared with the published model (ml_metrics.SCORED_SQL).
_LABEL_SQL = "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END"


@query(
    "q_ks_stat",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), b AS ("
        "SELECT CAST(FLOOR(score * 1000) AS BIGINT) AS bucket, "
        "SUM(label) AS pos, COUNT(*) - SUM(label) AS neg FROM s GROUP BY bucket), "
        "c AS (SELECT "
        "SUM(pos) OVER (ORDER BY bucket) AS cum_pos, "
        "SUM(neg) OVER (ORDER BY bucket) AS cum_neg, "
        "SUM(pos) OVER () AS tot_pos, SUM(neg) OVER () AS tot_neg FROM b) "
        "SELECT " + sql_round(
            "MAX(ABS(cum_pos * 1.0 / tot_pos - cum_neg * 1.0 / tot_neg))", 6
        )
        + " AS ks FROM c"
    ),
    tags=("ml", "monitor"),
)
def q_ks_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov statistic of score separation:
    max |CDF⁺(t) − CDF⁻(t)| over score thresholds — the classic fraud
    scorecard separation metric next to AUC (ref: the evaluation
    battery at evaluate_model.py:26-50, which stops at ROC/AUC).

    Scale-safe binned form (same pattern as q_roc_points): one hash
    aggregate folds the fact table into ≤1001 score buckets; the
    cumulative window runs over that bounded bucket table only. The
    CDF ratios are integer/integer divisions — deterministic in IEEE
    double on both engines; MAX is order-free."""
    s = scored(spark, sf_dir)
    b = (
        s.groupBy(F.floor(F.col("score") * 1000).cast("bigint").alias("bucket"))
        .agg(
            F.sum("label").alias("pos"),
            (F.count("*") - F.sum("label")).alias("neg"),
        )
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = b.select(
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("neg").over(w_cum).alias("cum_neg"),
        F.sum("pos").over(w_all).alias("tot_pos"),
        F.sum("neg").over(w_all).alias("tot_neg"),
    )
    return c.agg(
        pround(
            F.max(
                F.abs(
                    F.col("cum_pos") * 1.0 / F.col("tot_pos")
                    - F.col("cum_neg") * 1.0 / F.col("tot_neg")
                )
            ),
            6,
        ).alias("ks")
    )


@query(
    "q_psi",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), sp AS ("
        "SELECT score, CASE WHEN (l_orderkey * 2654435761 + l_linenumber) % 1000 < 800 "
        "THEN 1 ELSE 0 END AS is_train FROM s), "
        "b AS (SELECT CAST(FLOOR(score * 10) AS BIGINT) AS band, "
        "SUM(is_train) AS n_expected, SUM(1 - is_train) AS n_actual FROM sp GROUP BY band), "
        "t AS (SELECT band, n_expected, n_actual, "
        "SUM(n_expected) OVER () AS tot_e, SUM(n_actual) OVER () AS tot_a FROM b) "
        "SELECT band, CAST(n_expected AS BIGINT) AS n_expected, "
        "CAST(n_actual AS BIGINT) AS n_actual, "
        + sql_round(
            "(n_actual * 1.0 / tot_a - n_expected * 1.0 / tot_e) "
            "* LN((n_actual * 1.0 / tot_a) / NULLIF(n_expected * 1.0 / tot_e, 0))",
            6,
        )
        + " AS psi_term FROM t"
    ),
    tags=("ml", "monitor"),
)
def q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index terms per score band — the standard
    deployed-model drift monitor. "Expected" is the deterministic
    hash-train split (same Knuth hash as q_split, preprocess.py:36-38);
    "actual" the holdout; PSI = Σ (pₐ−pₑ)·ln(pₐ/pₑ) over 10 equal-width
    score bands. Emitting the per-band terms (not just the scalar)
    keeps the sum order-free for the oracle and is what a dashboard
    plots anyway (ref monitoring gap: deploy.py:36-44 scores with no
    distribution check).

    One hash aggregate to ≤11 bands; totals broadcast back. Empty
    bands yield NULL terms (NULLIF guard) rather than ±inf."""
    s = scored(spark, sf_dir)
    sp = s.select(
        "score",
        F.when(
            (F.col("l_orderkey") * F.lit(2654435761) + F.col("l_linenumber")) % 1000 < 800, 1
        )
        .otherwise(0)
        .alias("is_train"),
    )
    b = (
        sp.groupBy(F.floor(F.col("score") * 10).cast("bigint").alias("band"))
        .agg(
            F.sum("is_train").alias("n_expected"),
            F.sum(1 - F.col("is_train")).alias("n_actual"),
        )
    )
    tot = b.agg(
        F.sum("n_expected").alias("tot_e"), F.sum("n_actual").alias("tot_a")
    )
    p_a = F.col("n_actual") * 1.0 / F.col("tot_a")
    p_e = F.col("n_expected") * 1.0 / F.col("tot_e")
    return b.crossJoin(F.broadcast(tot)).select(
        "band",
        F.col("n_expected").cast("bigint").alias("n_expected"),
        F.col("n_actual").cast("bigint").alias("n_actual"),
        pround((p_a - p_e) * F.log(p_a / F.nullif(p_e, F.lit(0))), 6).alias("psi_term"),
    )


@query(
    "q_calibration",
    oracle=(
        f"WITH s AS ({SCORED_SQL}) "
        "SELECT CAST(FLOOR(score * 20) AS BIGINT) AS band, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) "
            "/ 1000000 / COUNT(*)",
            6,
        )
        + " AS mean_score, "
        + sql_round("SUM(label) * 1.0 / COUNT(*)", 6)
        + " AS pos_rate FROM s GROUP BY band"
    ),
    tags=("ml", "monitor"),
)
def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve: mean predicted score vs observed positive
    rate per score vigintile band — the calibration check the
    reference's 0.8 alert threshold (deploy.py:40) silently assumes.

    Single hash aggregate (map-side combinable). Mean score uses exact
    fixed-point units (scores are pre-rounded to 6 dp) so the result is
    layout- and engine-independent; pos_rate is integer/integer."""
    s = scored(spark, sf_dir)
    return (
        s.groupBy(F.floor(F.col("score") * 20).cast("bigint").alias("band"))
        .agg(
            F.count("*").alias("n"),
            pround(
                F.sum(fp_units(F.col("score"), 6)).cast("double") / 1000000 / F.count("*"), 6
            ).alias("mean_score"),
            pround(F.sum("label") * 1.0 / F.count("*"), 6).alias("pos_rate"),
        )
    )


@query(
    "q_lift_bands",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), b AS ("
        "SELECT CAST(FLOOR(score * 10) AS BIGINT) AS band, "
        "COUNT(*) AS n, SUM(label) AS pos FROM s GROUP BY band), "
        "c AS (SELECT band, n, "
        "SUM(n) OVER (ORDER BY band DESC) AS cum_n, "
        "SUM(pos) OVER (ORDER BY band DESC) AS cum_pos, "
        "SUM(n) OVER () AS tot_n, SUM(pos) OVER () AS tot_pos FROM b) "
        "SELECT band, CAST(n AS BIGINT) AS n_band, CAST(cum_n AS BIGINT) AS cum_n, "
        + sql_round("cum_pos * 1.0 / tot_pos", 6) + " AS capture, "
        + sql_round("(cum_pos * 1.0 / cum_n) / (tot_pos * 1.0 / tot_n)", 6)
        + " AS lift FROM c"
    ),
    tags=("ml", "monitor"),
)
def q_lift_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table by descending score band: what
    fraction of all fraud is captured reviewing the top bands, and the
    concentration vs random — the fraud-ops triage view of the same
    scores evaluate_model.py:49 sweeps into a ROC.

    Hash aggregate to ≤11 bands, then cumulative windows over that
    bounded band table only (q_roc_points pattern). All emitted ratios
    are integer/integer divisions — engine-exact."""
    s = scored(spark, sf_dir)
    b = (
        s.groupBy(F.floor(F.col("score") * 10).cast("bigint").alias("band"))
        .agg(F.count("*").alias("n"), F.sum("label").alias("pos"))
    )
    w_cum = Window.orderBy(F.desc("band")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = b.select(
        "band",
        F.col("n"),
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("n").over(w_all).alias("tot_n"),
        F.sum("pos").over(w_all).alias("tot_pos"),
    )
    return c.select(
        "band",
        F.col("n").cast("bigint").alias("n_band"),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        pround(F.col("cum_pos") * 1.0 / F.col("tot_pos"), 6).alias("capture"),
        pround(
            (F.col("cum_pos") * 1.0 / F.col("cum_n"))
            / (F.col("tot_pos") * 1.0 / F.col("tot_n")),
            6,
        ).alias("lift"),
    )


@query(
    "q_benford",
    oracle=(
        "WITH d AS (SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) "
        "AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit FROM lineitem), "
        "g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit), "
        "t AS (SELECT digit, n, SUM(n) OVER () AS tot FROM g) "
        "SELECT digit, CAST(n AS BIGINT) AS n, "
        + sql_round("n * 1.0 / tot", 6) + " AS obs_frac, "
        + sql_round("LOG10(1.0 + 1.0 / digit)", 6) + " AS benford_frac, "
        + sql_round("n * 1.0 / tot - LOG10(1.0 + 1.0 / digit)", 6)
        + " AS delta FROM t"
    ),
    tags=("fraud", "monitor"),
)
def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit test on transaction amounts —
    the classic forensic-accounting fraud screen (the reference's
    Amount column, eda.py:31, is exactly what an auditor would run
    this on). Observed first-digit frequency vs log10(1 + 1/d).

    The first digit comes from exact integer cents
    (FLOOR(price·100 + 0.5) → BIGINT → string head), never from
    floating log10/power-of-ten division, which disagrees between
    engines at exact powers of ten. One hash aggregate to 9 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    digit = (
        F.substring(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    g = li.select(digit).groupBy("digit").agg(F.count("*").alias("n"))
    tot = g.agg(F.sum("n").alias("tot"))
    obs = F.col("n") * 1.0 / F.col("tot")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return g.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        pround(obs, 6).alias("obs_frac"),
        pround(benford, 6).alias("benford_frac"),
        pround(obs - benford, 6).alias("delta"),
    )


@query(
    "q_target_encode",
    oracle=(
        f"WITH l AS (SELECT l_orderkey, l_linenumber, l_suppkey, {_LABEL_SQL} AS label "
        "FROM lineitem), "
        "enc AS (SELECT l_suppkey, SUM(label) AS pos_c, COUNT(*) AS n_c FROM l "
        "GROUP BY l_suppkey), "
        "pri AS (SELECT SUM(pos_c) * 1.0 / SUM(n_c) AS prior FROM enc) "
        "SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, "
        + sql_round("(enc.pos_c + 100.0 * pri.prior) / (enc.n_c + 100.0)", 6)
        + " AS te FROM l JOIN enc ON l.l_suppkey = enc.l_suppkey CROSS JOIN pri"
    ),
    tags=("ml", "feature"),
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed mean target encoding of a high-cardinality categorical:
    te(c) = (pos_c + m·prior)/(n_c + m), m=100, over the supplier key
    (the merchant-id shape) — the standard categorical featurizer for
    fraud models (the reference's features are pre-encoded PCA floats;
    this is the op that produces such features upstream).

    Plan: one hash aggregate builds the |categories|-row encoding
    table; the prior is a 1-row agg of that table; both broadcast back
    onto the fact scan — the fact table itself never shuffles. At a
    cardinality too big to broadcast, the same plan degrades to one
    shuffle join on the encode key."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
    )
    enc = li.groupBy("l_suppkey").agg(
        F.sum("label").alias("pos_c"), F.count("*").alias("n_c")
    )
    pri = enc.agg((F.sum("pos_c") * 1.0 / F.sum("n_c")).alias("prior"))
    return (
        li.join(F.broadcast(enc), "l_suppkey")
        .crossJoin(F.broadcast(pri))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_suppkey",
            pround(
                (F.col("pos_c") + 100.0 * F.col("prior")) / (F.col("n_c") + 100.0), 6
            ).alias("te"),
        )
    )


@query(
    "q_woe_iv",
    oracle=(
        f"WITH l AS (SELECT CAST(FLOOR((l_quantity - 1) / 10) AS BIGINT) AS qty_bin, "
        f"{_LABEL_SQL} AS label FROM lineitem), "
        "g AS (SELECT qty_bin, SUM(label) AS pos_c, COUNT(*) - SUM(label) AS neg_c "
        "FROM l GROUP BY qty_bin), "
        "t AS (SELECT qty_bin, pos_c, neg_c, "
        "SUM(pos_c) OVER () AS pos_tot, SUM(neg_c) OVER () AS neg_tot FROM g) "
        "SELECT qty_bin, CAST(pos_c AS BIGINT) AS pos_c, "
        "CAST(neg_c AS BIGINT) AS neg_c, "
        + sql_round(
            "LN((pos_c * 1.0 / pos_tot) / NULLIF(neg_c * 1.0 / neg_tot, 0))", 6
        )
        + " AS woe, "
        + sql_round(
            "(pos_c * 1.0 / pos_tot - neg_c * 1.0 / neg_tot) "
            "* LN((pos_c * 1.0 / pos_tot) / NULLIF(neg_c * 1.0 / neg_tot, 0))",
            6,
        )
        + " AS iv_term FROM t"
    ),
    tags=("ml", "feature"),
)
def q_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence + information-value terms per feature bin —
    the scorecard-modelling companion to target encoding, computed over
    equal-width quantity bins (the classic "bin a numeric, score its
    predictive power" step): WOE(b) = ln((pos_b/pos_tot)/(neg_b/neg_tot)),
    IV = Σ (pos%−neg%)·WOE. Per-bin terms emitted (order-free sum).

    One hash aggregate; totals broadcast back onto the ≤|bins| row
    table. Zero-count bins yield NULL (NULLIF guard)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor((F.col("l_quantity") - 1) / 10).cast("bigint").alias("qty_bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
    )
    g = li.groupBy("qty_bin").agg(
        F.sum("label").alias("pos_c"),
        (F.count("*") - F.sum("label")).alias("neg_c"),
    )
    tot = g.agg(F.sum("pos_c").alias("pos_tot"), F.sum("neg_c").alias("neg_tot"))
    p = F.col("pos_c") * 1.0 / F.col("pos_tot")
    q = F.col("neg_c") * 1.0 / F.col("neg_tot")
    woe = F.log(p / F.nullif(q, F.lit(0)))
    return g.crossJoin(F.broadcast(tot)).select(
        "qty_bin",
        F.col("pos_c").cast("bigint").alias("pos_c"),
        F.col("neg_c").cast("bigint").alias("neg_c"),
        pround(woe, 6).alias("woe"),
        pround((p - q) * woe, 6).alias("iv_term"),
    )


@query(
    "q_velocity",
    oracle=(
        f"WITH e AS (SELECT event_id, user_id, {_SEC_SQL} AS ts_sec, value FROM events) "
        "SELECT event_id, user_id, CAST(ts_sec AS BIGINT) AS ts_sec, "
        "CAST(COUNT(*) OVER w1 AS BIGINT) AS n_1h, "
        "CAST(COUNT(*) OVER w24 AS BIGINT) AS n_24h, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) OVER w1 AS DOUBLE) "
            "/ 10000",
            4,
        )
        + " AS amt_1h FROM e WINDOW "
        "w1 AS (PARTITION BY user_id ORDER BY ts_sec "
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), "
        "w24 AS (PARTITION BY user_id ORDER BY ts_sec "
        "RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)"
    ),
    tags=("fraud", "feature", "window"),
)
def q_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling velocity features — the signature real-time
    fraud signals (txn count / amount in the trailing 1h and 24h) that
    the reference's Time column (eda.py, generate_synthetic_data.py:12)
    exists to support but its single-row scorer (predict_single.py)
    cannot compute. Event-time RANGE windows partitioned by user_id.

    Scale posture: the window shuffles once on user_id and sorts
    within partitions only — no global sort, no unpartitioned window.
    The rolling SUM uses exact fixed-point units so frame-merge order
    cannot move the result; COUNT frames are integer-exact. This is
    also the batch twin of the streaming stateful form
    (applyInPandasWithState keyed by user_id)."""
    ev = events_with_time(spark, sf_dir)
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, 0)
    )
    w24 = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-86400, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_sec").cast("bigint").alias("ts_sec"),
        F.count(F.lit(1)).over(w1).cast("bigint").alias("n_1h"),
        F.count(F.lit(1)).over(w24).cast("bigint").alias("n_24h"),
        pround(
            F.sum(fp_units(F.col("value"), 4)).over(w1).cast("double") / 10000, 4
        ).alias("amt_1h"),
    )


@query(
    "q_ab_test",
    oracle=(
        "WITH g AS (SELECT event_type AS variant, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv "
        "FROM events WHERE event_type IN ('click', 'purchase') GROUP BY variant), "
        "w AS (SELECT variant, n, conv, "
        "SUM(n) OVER () AS n_all, SUM(conv) OVER () AS conv_all FROM g) "
        "SELECT variant, n, conv, "
        + sql_round("conv * 1.0 / n", 6) + " AS rate, "
        + sql_round(
            "(conv * 1.0 / n - conv_all * 1.0 / n_all) / "
            "SQRT((conv_all * 1.0 / n_all) * (1.0 - conv_all * 1.0 / n_all) "
            "* (1.0 / n + 1.0 / (n_all - n)))",
            6,
        )
        + " AS z FROM w"
    ),
    tags=("ml", "monitor", "stats"),
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between event variants — the experiment
    readout every model rollout needs (did the new scorer change the
    flag rate?): pooled-rate z per variant against the complement,
    conversion = value > 100.

    One filtered hash aggregate to 2 rows; the pooled totals ride a
    window over that 2-row table. All inputs to the z formula are
    integer counts, so both engines evaluate the identical float
    expression."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    g = ev.groupBy(F.col("event_type").alias("variant")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
    )
    tot = g.agg(F.sum("n").alias("n_all"), F.sum("conv").alias("conv_all"))
    p = F.col("conv") * 1.0 / F.col("n")
    p_all = F.col("conv_all") * 1.0 / F.col("n_all")
    z = (p - p_all) / F.sqrt(
        p_all * (1.0 - p_all) * (1.0 / F.col("n") + 1.0 / (F.col("n_all") - F.col("n")))
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "variant",
        "n",
        "conv",
        pround(p, 6).alias("rate"),
        pround(z, 6).alias("z"),
    )


@query(
    "q_hourly_profile",
    oracle=(
        f"WITH e AS (SELECT ({_SEC_SQL} % 86400) // 3600 AS hod, value FROM events), "
        "g AS (SELECT hod, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000 "
        "AS sum_value FROM e GROUP BY hod), "
        "w AS (SELECT hod, n, sum_value, "
        "AVG(n * 1.0) OVER () AS mu, STDDEV_SAMP(n * 1.0) OVER () AS sd, "
        "SUM(n) OVER () AS n_all FROM g) "
        "SELECT CAST(hod AS BIGINT) AS hod, n, "
        + sql_round("n * 1.0 / n_all", 6) + " AS share, "
        + sql_round("sum_value / n", 4) + " AS mean_value, "
        + sql_round("(n - mu) / sd", 6) + " AS volume_z FROM w"
    ),
    tags=("fraud", "monitor", "window"),
)
def q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile: event volume, share, mean value,
    and the volume z-score of each hour against the 24-hour baseline —
    the seasonality fingerprint that fraud monitors alert against
    ("3am volume is 4σ above its slot"). Derived from the same
    epoch-second arithmetic as the window family (timezone-proof).

    One hash aggregate folds the events table to ≤24 rows; baseline
    stats ride a window over that bounded table. Value sums are exact
    fixed-point units; n is integer; the z division is the only float
    step and is identical in both engines."""
    ev = events_with_time(spark, sf_dir)
    g = (
        ev.select(((F.col("ts_sec") % 86400) / 3600).cast("bigint").alias("hod"), "value")
        .groupBy("hod")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            (F.sum(fp_units(F.col("value"), 4)).cast("double") / 10000).alias(
                "sum_value"
            ),
        )
    )
    w_all = Window.partitionBy()
    w = g.select(
        "hod",
        "n",
        "sum_value",
        F.avg(F.col("n") * 1.0).over(w_all).alias("mu"),
        F.stddev_samp(F.col("n") * 1.0).over(w_all).alias("sd"),
        F.sum("n").over(w_all).alias("n_all"),
    )
    return w.select(
        "hod",
        "n",
        pround(F.col("n") * 1.0 / F.col("n_all"), 6).alias("share"),
        pround(F.col("sum_value") / F.col("n"), 4).alias("mean_value"),
        pround((F.col("n") - F.col("mu")) / F.col("sd"), 6).alias("volume_z"),
    )


def _pav(rates: list[float], weights: list[float]) -> list[float]:
    """Pool-adjacent-violators: weighted isotonic fit of per-band rates.

    Standard stack algorithm: walk bands in score order, merging any
    block whose mean drops below its predecessor's into one weighted
    pool, until the sequence is non-decreasing; then expand each
    pooled mean back over its member bands. O(bands)."""
    blocks: list[list[float]] = []  # [mean, weight, n_bands]
    for r, w in zip(rates, weights):
        blocks.append([r, w, 1])
        while len(blocks) > 1 and blocks[-2][0] > blocks[-1][0]:
            r2, w2, k2 = blocks.pop()
            r1, w1, k1 = blocks.pop()
            wt = w1 + w2
            blocks.append([(r1 * w1 + r2 * w2) / wt, wt, k1 + k2])
    res: list[float] = []
    for mean, _, k in blocks:
        res.extend([mean] * k)
    return res


def _isotonic_oracle() -> str:
    return (
        f"WITH s AS ({SCORED_SQL}), "
        "bands AS (SELECT CAST(FLOOR(score * 50) AS BIGINT) AS band, "
        "CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS pos, "
        "CAST(SUM(CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)) AS BIGINT)"
        " AS su FROM s GROUP BY band), "
        "c AS (SELECT band, n, pos, su, "
        "CAST(SUM(pos) OVER (ORDER BY band) AS BIGINT) AS cp, "
        "CAST(SUM(n) OVER (ORDER BY band) AS BIGINT) AS cw FROM bands), "
        # pairs (a <= b): pooled mean over bands [a..b] is a ratio of
        # integer prefix-sum differences — Σpos/Σn, no float folding
        "pairs AS (SELECT a.band AS ab, b.band AS bb, "
        "CAST(b.cp - (a.cp - a.pos) AS DOUBLE) / "
        "CAST(b.cw - (a.cw - a.n) AS DOUBLE) AS m "
        "FROM c a JOIN c b ON a.band <= b.band), "
        "m2 AS (SELECT ab, bb, MIN(m) OVER (PARTITION BY ab ORDER BY bb DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn FROM pairs), "
        "fit AS (SELECT ab, bb, MAX(mn) OVER (PARTITION BY bb ORDER BY ab "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fitted "
        "FROM m2) "
        "SELECT bands.band, bands.n, "
        + sql_round("fit.fitted", 6) + " AS rate_cal, "
        + sql_round("CAST(bands.su AS DOUBLE) / 1000000 / bands.n", 6)
        + " AS mean_score "
        "FROM bands JOIN fit ON bands.band = fit.bb AND fit.ab = fit.bb"
    )


@query(
    "q_isotonic",
    oracle=_isotonic_oracle(),
    tags=("ml", "monitor", "calibration"),
)
def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic score calibration (pool-adjacent-violators): fit a
    monotone map from raw score to observed fraud rate — the standard
    fix when a scorer ranks well (good AUC) but its probabilities are
    off (bad calibration curve, q_calibration). The reference serves
    raw sigmoid outputs (predict_single.py:30) with no calibration
    layer at all.

    Exactness (VERDICT r9 #4 — rows-only upgraded to oracle-checked):
    instead of running the sequential PAV stack driver-side, the
    fitted values use PAV's minimax characterization
    fitted_i = max_{a<=i} min_{b>=i} pooledmean(a, b), and because the
    weights ARE the band counts, every pooled mean is a ratio of
    integer prefix-sum differences (Σpos / Σn) — one correctly-rounded
    long/long double division per (a, b) pair, bit-identical on both
    engines; MIN/MAX over identical doubles are exact, so the whole
    fit hash-matches DuckDB with no iterative CTE at all.
    tests/test_model_monitor.py cross-checks the minimax fit against
    the sequential ``_pav`` stack on random inputs.

    Scale shape: ONE hash aggregate folds the 100 TB of scores into
    the <=51-band reliability table (count, positives, AND the
    mean-score units — the fact table is scanned once, where the old
    eager form paid a second scan to re-join the calibrated map); the
    O(bands^2) pair table is <=1326 rows with two GROWING-frame
    windows over it — bounded metadata, fully lazy/declarative, no
    driver collect."""
    s = scored(spark, sf_dir)
    bands = s.groupBy(
        F.floor(F.col("score") * 50).cast("bigint").alias("band")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
        F.sum(fp_units(F.col("score"), 6)).cast("bigint").alias("su"),
    )
    w_cum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    c = bands.select(
        "band",
        "n",
        "pos",
        "su",
        F.sum("pos").over(w_cum).cast("bigint").alias("cp"),
        F.sum("n").over(w_cum).cast("bigint").alias("cw"),
    )
    a = c.select(
        F.col("band").alias("ab"),
        (F.col("cp") - F.col("pos")).alias("cpm"),
        (F.col("cw") - F.col("n")).alias("cwm"),
    )
    b = c.select(F.col("band").alias("bb"), "cp", "cw")
    pairs = a.join(b, F.col("ab") <= F.col("bb")).select(
        "ab",
        "bb",
        (
            (F.col("cp") - F.col("cpm")).cast("double")
            / (F.col("cw") - F.col("cwm")).cast("double")
        ).alias("m"),
    )
    w_suf = Window.partitionBy("ab").orderBy(F.desc("bb")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    m2 = pairs.select("ab", "bb", F.min("m").over(w_suf).alias("mn"))
    w_pre = Window.partitionBy("bb").orderBy("ab").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fit = (
        m2.select("ab", "bb", F.max("mn").over(w_pre).alias("fitted"))
        .filter(F.col("ab") == F.col("bb"))
        .select(F.col("bb").alias("band"), "fitted")
    )
    return bands.join(fit, "band").select(
        "band",
        "n",
        pround(F.col("fitted"), 6).alias("rate_cal"),
        pround(F.col("su").cast("double") / 1000000 / F.col("n"), 6).alias(
            "mean_score"
        ),
    )


def _cc_oracle() -> str:
    from fraud_detection_spark.operators.feature_eng import _TREE_SCORE_SQL

    champ_sql = sql_round(
        "1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity + 9.0 * l_discount "
        "+ 0.8 * (l_extendedprice / 100000.0))))",
        6,
    )
    return (
        f"WITH s AS (SELECT {champ_sql} AS champ, {_TREE_SCORE_SQL} AS chall, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label FROM lineitem) "
        "SELECT CAST(FLOOR(champ * 10) AS BIGINT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS n_pos, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(champ * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
            " / 1000000 / COUNT(*)",
            6,
        )
        + " AS mean_champ, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(chall * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
            " / 1000000 / COUNT(*)",
            6,
        )
        + " AS mean_chall, "
        "CAST(SUM(CASE WHEN champ >= 0.5 AND chall < 0.5 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS mcnemar_b, "
        "CAST(SUM(CASE WHEN champ < 0.5 AND chall >= 0.5 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS mcnemar_c, "
        "CAST(SUM(CASE WHEN (champ >= 0.5) = (chall >= 0.5) THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_agree "
        "FROM s GROUP BY decile"
    )


@query(
    "q_champion_challenger",
    oracle=_cc_oracle(),
    tags=("ml", "monitor", "compare"),
)
def q_champion_challenger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Champion/challenger comparison: the served linear scorer vs the
    GBT ensemble (q_tree_score), evaluated on the same rows in ONE
    scan — agreement, McNemar discordant counts (champion-only vs
    challenger-only positives at the 0.5 operating point) and mean
    scores per champion decile. The registry's stage machine
    (ml/registry.py) decides WHICH model serves; this is the query
    that produces the evidence (the reference registers versions,
    train_model.py:117-163, but never compares them on data).

    Plan: both scorers are codegen'd column expressions over one scan
    (no join — they share the input row), folded by a single hash
    aggregate into ≤10 decile rows. McNemar's b/c counts are the exact
    sufficient statistics for the paired significance test, computed
    distributed; the χ² itself is one driver-side division on 10 rows.
    """
    from fraud_detection_spark.operators.feature_eng import (
        _TREE_BIAS,
        _TREES,
        _tree_col,
        _leaf_margin,
    )

    li = load_table(spark, sf_dir, "lineitem")
    logit = (
        F.lit(-2.0)
        + F.lit(0.03) * F.col("l_quantity")
        + F.lit(9.0) * F.col("l_discount")
        + F.lit(0.8) * (F.col("l_extendedprice") / 100000.0)
    )
    champ = pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    margin = F.lit(_TREE_BIAS)
    for t in _TREES:
        margin = margin + _tree_col(t, _leaf_margin)
    chall = pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), 6)
    label = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    s = li.select(
        champ.alias("champ"),
        chall.alias("chall"),
        label.alias("label"),
    )
    agg = s.groupBy(
        F.floor(F.col("champ") * 10).cast("bigint").alias("decile")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
        pround(
            F.sum(fp_units(F.col("champ"), 6)).cast("double") / 1000000 / F.count("*"),
            6,
        ).alias("mean_champ"),
        pround(
            F.sum(fp_units(F.col("chall"), 6)).cast("double") / 1000000 / F.count("*"),
            6,
        ).alias("mean_chall"),
        F.sum(
            ((F.col("champ") >= 0.5) & (F.col("chall") < 0.5)).cast("int")
        ).cast("bigint").alias("mcnemar_b"),
        F.sum(
            ((F.col("champ") < 0.5) & (F.col("chall") >= 0.5)).cast("int")
        ).cast("bigint").alias("mcnemar_c"),
        F.sum(
            ((F.col("champ") >= 0.5) == (F.col("chall") >= 0.5)).cast("int")
        ).cast("bigint").alias("n_agree"),
    )
    return agg


@query(
    "q_brier",
    oracle=(
        f"WITH s AS ({SCORED_SQL}) "
        "SELECT " + sql_round(
            "CAST(SUM(CAST(FLOOR((score - label) * (score - label) * 100000000 + 0.5)"
            " AS BIGINT)) AS DOUBLE) / 100000000 / COUNT(*)",
            8,
        )
        + " AS brier, CAST(COUNT(*) AS BIGINT) AS n FROM s"
    ),
    tags=("ml", "metric"),
)
def q_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score — mean squared error of the predicted probability
    against the outcome: the proper scoring rule that penalizes BOTH
    bad ranking and bad calibration (AUC sees only ranking; the
    reliability curve only calibration). One map-side-combinable
    aggregate; per-row squared errors go through fixed-point units so
    the mean is layout-exact."""
    s = scored(spark, sf_dir)
    sq = (F.col("score") - F.col("label")) * (F.col("score") - F.col("label"))
    return s.agg(
        pround(
            F.sum(fp_units(sq, 8)).cast("double") / 100000000 / F.count("*"), 8
        ).alias("brier"),
        F.count("*").cast("bigint").alias("n"),
    )


@query(
    "q_ece",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), b AS ("
        "SELECT CAST(FLOOR(score * 20) AS BIGINT) AS band, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 1000000 / COUNT(*) AS mean_score, "
        "SUM(label) * 1.0 / COUNT(*) AS rate FROM s GROUP BY band), "
        "t AS (SELECT SUM(n) AS n_all FROM b) "
        "SELECT " + sql_round(
            "SUM(n * ABS(mean_score - rate)) / MAX(n_all)", 6
        )
        + " AS ece, CAST(COUNT(*) AS BIGINT) AS n_bands FROM b, t"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error: the n-weighted mean |confidence −
    accuracy| gap over 20 score bands — the single-number summary of
    the reliability curve (q_calibration), and the quantity isotonic
    recalibration (q_isotonic) exists to shrink. Same bounded-band
    shape: one hash aggregate to ≤21 rows, then a tiny weighted sum."""
    s = scored(spark, sf_dir)
    b = s.groupBy(F.floor(F.col("score") * 20).cast("bigint").alias("band")).agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.sum(fp_units(F.col("score"), 6)).cast("double") / 1000000 / F.count("*")
        ).alias("mean_score"),
        (F.sum("label") * 1.0 / F.count("*")).alias("rate"),
    )
    t = b.agg(F.sum("n").alias("n_all"))
    return b.crossJoin(F.broadcast(t)).agg(
        pround(
            F.sum(F.col("n") * F.abs(F.col("mean_score") - F.col("rate")))
            / F.max("n_all"),
            6,
        ).alias("ece"),
        F.count("*").cast("bigint").alias("n_bands"),
    )


_DRIFT_FEATS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_DRIFT_QS = [i / 10 for i in range(1, 10)]


def _drift_profile_sql() -> str:
    q_list = ", ".join(str(q) for q in _DRIFT_QS)
    parts = []
    for c in _DRIFT_FEATS:
        cuts = f"(SELECT quantile_disc({c}, [{q_list}]) AS cut FROM lineitem)"
        band = " + ".join(f"CASE WHEN {c} > cut[{i + 1}] THEN 1 ELSE 0 END"
                          for i in range(len(_DRIFT_QS)))
        parts.append(
            "SELECT "
            f"'{c}' AS feature, CAST(1 + {band} AS BIGINT) AS band, "
            "CAST(SUM(CASE WHEN (l_orderkey * 2654435761 + l_linenumber) % 1000 < 800 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_expected, "
            "CAST(SUM(CASE WHEN (l_orderkey * 2654435761 + l_linenumber) % 1000 < 800 "
            "THEN 0 ELSE 1 END) AS BIGINT) AS n_actual "
            f"FROM lineitem, {cuts} GROUP BY band"
        )
    return (
        "WITH u AS (" + " UNION ALL ".join(parts) + "), "
        "t AS (SELECT feature, SUM(n_expected) AS tot_e, SUM(n_actual) AS tot_a "
        "FROM u GROUP BY feature) "
        "SELECT u.feature, u.band, u.n_expected, u.n_actual, "
        + sql_round(
            "(u.n_actual * 1.0 / t.tot_a - u.n_expected * 1.0 / t.tot_e) "
            "* LN(NULLIF(u.n_actual * 1.0 / t.tot_a, 0) / "
            "NULLIF(u.n_expected * 1.0 / t.tot_e, 0))",
            6,
        )
        + " AS psi_term FROM u JOIN t ON u.feature = t.feature"
    )


@query("q_drift_profile", oracle=_drift_profile_sql(), tags=("ml", "monitor", "drift"))
def q_drift_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FEATURE drift profile in long format (feature, decile band,
    expected/actual counts, PSI term) across the train/holdout hash
    split — q_psi watches the SCORE distribution; when it fires, this
    is the query that says WHICH input moved.

    Band edges are the feature's own deciles via PERCENTILE_DISC
    (engine-exact element selection, the q_percentiles rule), all four
    columns' cutoffs computed in ONE aggregate and broadcast back;
    band = 1 + #cutoffs_below. The per-feature binning then runs as a
    single scan: each row explodes into 4 (feature, band) pairs and
    one hash aggregate folds them (first cut ran 4 separate
    percentile jobs + 4 binning scans; the fold saves the extra scans,
    4.3 -> 3.9 s at sf0.1 — the remaining cost IS the four exact
    percentile buffers, which the production approx_percentile swap
    removes).
    No NTILE and therefore no global sort — the cutoff form is also
    the production shape, where edges are frozen artifacts of the
    training snapshot (at 100 TB: approx_percentile of that snapshot)
    rather than recomputed per run. Value ties share a band by
    construction. Output is bounded at <= 4x10 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    split = (
        (F.col("l_orderkey") * F.lit(2654435761) + F.col("l_linenumber")) % 1000 < 800
    ).cast("int")
    q_list = ", ".join(str(q) for q in _DRIFT_QS)
    cuts = li.agg(
        *[
            F.expr(
                f"percentile_disc(array({q_list})) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"cut_{c}")
            for c in _DRIFT_FEATS
        ]
    )

    def band_for(c: str):
        b = F.lit(1)
        for i in range(len(_DRIFT_QS)):
            b = b + (F.col(c) > F.col(f"cut_{c}")[i]).cast("int")
        return b.cast("bigint")

    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(c).alias("feature"), band_for(c).alias("band"))
                for c in _DRIFT_FEATS
            ]
        )
    )
    u = (
        li.crossJoin(F.broadcast(cuts))
        .select(split.alias("is_train"), pairs.alias("p"))
        .select("is_train", F.col("p.feature").alias("feature"), F.col("p.band").alias("band"))
        .groupBy("feature", "band")
        .agg(
            F.sum("is_train").cast("bigint").alias("n_expected"),
            F.sum(1 - F.col("is_train")).cast("bigint").alias("n_actual"),
        )
    )
    t = u.groupBy("feature").agg(
        F.sum("n_expected").alias("tot_e"), F.sum("n_actual").alias("tot_a")
    )
    share_a = F.col("n_actual") * 1.0 / F.col("tot_a")
    share_e = F.col("n_expected") * 1.0 / F.col("tot_e")
    return u.join(F.broadcast(t), "feature").select(
        "feature",
        "band",
        "n_expected",
        "n_actual",
        pround(
            (share_a - share_e)
            * F.log(
                F.nullif(share_a, F.lit(0.0)) / F.nullif(share_e, F.lit(0.0))
            ),
            6,
        ).alias("psi_term"),
    )



@query(
    "q_auc_by_segment",
    oracle=(
        "WITH s AS (SELECT l_linestatus AS seg, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        + sql_round(
            "1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity + 9.0 * l_discount "
            "+ 0.8 * (l_extendedprice / 100000.0))))",
            6,
        )
        + " AS score FROM lineitem), "
        "b AS (SELECT seg, CAST(FLOOR(score * 50) AS BIGINT) AS bucket, "
        "SUM(label) AS pos, COUNT(*) - SUM(label) AS neg FROM s GROUP BY seg, bucket), "
        "c AS (SELECT seg, bucket, "
        "SUM(pos) OVER (PARTITION BY seg ORDER BY bucket DESC "
        "ROWS UNBOUNDED PRECEDING) * 1.0 / SUM(pos) OVER (PARTITION BY seg) AS tpr, "
        "SUM(neg) OVER (PARTITION BY seg ORDER BY bucket DESC "
        "ROWS UNBOUNDED PRECEDING) * 1.0 / SUM(neg) OVER (PARTITION BY seg) AS fpr "
        "FROM b), "
        "d AS (SELECT seg, tpr, fpr, "
        "LAG(tpr, 1, 0.0) OVER (PARTITION BY seg ORDER BY fpr, tpr) AS ptpr, "
        "LAG(fpr, 1, 0.0) OVER (PARTITION BY seg ORDER BY fpr, tpr) AS pfpr FROM c) "
        "SELECT seg, " + sql_round("SUM((fpr - pfpr) * (tpr + ptpr) / 2.0)", 6)
        + " AS auc FROM d GROUP BY seg"
    ),
    tags=("ml", "monitor", "metric"),
)
def q_auc_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment AUC (binned trapezoid, the q_auc_binned shape
    partitioned by l_linestatus) — the disaggregated model-performance
    readout behind every "the model is worse on segment X" finding; a
    global AUC hides a segment where the scorer fails (the reference
    evaluates globally only, evaluate_model.py:26-50).

    Score, label and segment come from ONE lineitem scan (the
    q_champion_challenger no-join trick — a key join-back would
    replicate the synthetic duplicate keys); the cumulative windows
    partition BY SEGMENT over bounded <=51-bucket tables — no
    unpartitioned window, no fact-table sort."""
    li = load_table(spark, sf_dir, "lineitem")
    logit = (
        F.lit(-2.0)
        + F.lit(0.03) * F.col("l_quantity")
        + F.lit(9.0) * F.col("l_discount")
        + F.lit(0.8) * (F.col("l_extendedprice") / 100000.0)
    )
    s = li.select(
        F.col("l_linestatus").alias("seg"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )
    b = s.groupBy(
        "seg", F.floor(F.col("score") * 50).cast("bigint").alias("bucket")
    ).agg(
        F.sum("label").alias("pos"),
        (F.count("*") - F.sum("label")).alias("neg"),
    )
    w_cum = (
        Window.partitionBy("seg")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_seg = Window.partitionBy("seg")
    c = b.select(
        "seg",
        "bucket",
        (F.sum("pos").over(w_cum) * 1.0 / F.sum("pos").over(w_seg)).alias("tpr"),
        (F.sum("neg").over(w_cum) * 1.0 / F.sum("neg").over(w_seg)).alias("fpr"),
    )
    w_lag = Window.partitionBy("seg").orderBy("fpr", "tpr")
    d = c.select(
        "seg",
        "tpr",
        "fpr",
        F.lag("tpr", 1, 0.0).over(w_lag).alias("ptpr"),
        F.lag("fpr", 1, 0.0).over(w_lag).alias("pfpr"),
    )
    return d.groupBy("seg").agg(
        pround(
            F.sum((F.col("fpr") - F.col("pfpr")) * (F.col("tpr") + F.col("ptpr")) / 2.0),
            6,
        ).alias("auc")
    )


@query(
    "q_threshold_sweep",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), b AS ("
        "SELECT CAST(FLOOR(score * 50) AS BIGINT) AS bucket, "
        "SUM(label) AS pos, COUNT(*) - SUM(label) AS neg FROM s GROUP BY bucket), "
        "t AS (SELECT bucket, "
        "SUM(pos) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) AS tp, "
        "SUM(neg) OVER (ORDER BY bucket DESC ROWS UNBOUNDED PRECEDING) AS fp, "
        "SUM(pos) OVER () AS p_all, SUM(neg) OVER () AS n_all FROM b) "
        "SELECT " + sql_round("bucket / 50.0", 6) + " AS threshold, "
        "CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, "
        "CAST(p_all - tp AS BIGINT) AS fn, "
        + sql_round("tp * 1.0 / NULLIF(tp + fp, 0)", 6) + " AS precision, "
        + sql_round("tp * 1.0 / p_all", 6) + " AS recall, "
        + sql_round("2.0 * tp / NULLIF(2.0 * tp + fp + (p_all - tp), 0)", 6)
        + " AS f1, "
        + sql_round("tp * 1.0 / p_all - fp * 1.0 / n_all", 6) + " AS youden_j "
        "FROM t"
    ),
    tags=("ml", "monitor", "metric"),
)
def q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep: precision / recall / F1 / Youden's J at
    every candidate score threshold — the table a fraud desk reads to
    SET the alert threshold (the reference hardcodes 0.5,
    predict_single.py:31; the right cut depends on review capacity and
    the FP/FN cost ratio, and this sweep is the evidence). argmax(f1)
    or argmax(youden_j) is one driver-side scan of ≤51 rows.

    Same bounded-band discipline as q_roc_points: one hash aggregate
    folds the facts into 50 score buckets; the threshold-sweep
    cumulative runs over that table only. All ratios are
    integer/integer — engine-exact."""
    s = scored(spark, sf_dir)
    b = s.groupBy(F.floor(F.col("score") * 50).cast("bigint").alias("bucket")).agg(
        F.sum("label").alias("pos"),
        (F.count("*") - F.sum("label")).alias("neg"),
    )
    w_cum = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    t = b.select(
        "bucket",
        F.sum("pos").over(w_cum).alias("tp"),
        F.sum("neg").over(w_cum).alias("fp"),
        F.sum("pos").over(w_all).alias("p_all"),
        F.sum("neg").over(w_all).alias("n_all"),
    )
    fn = F.col("p_all") - F.col("tp")
    return t.select(
        pround(F.col("bucket") / 50.0, 6).alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        pround(
            F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), 6
        ).alias("precision"),
        pround(F.col("tp") * 1.0 / F.col("p_all"), 6).alias("recall"),
        pround(
            2.0 * F.col("tp")
            / F.nullif(2.0 * F.col("tp") + F.col("fp") + fn, F.lit(0)),
            6,
        ).alias("f1"),
        pround(
            F.col("tp") * 1.0 / F.col("p_all") - F.col("fp") * 1.0 / F.col("n_all"),
            6,
        ).alias("youden_j"),
    )


# ---------------------------------------------------------------------------
# q_spiegelhalter — decile calibration table with Spiegelhalter-style
# EXACT moments (round 13, VERDICT r12 #6c): per score-decile, the
# Spiegelhalter calibration z — numerator Σ(y−p)(1−2p) and its
# null variance Σ(1−2p)²p(1−p) — on top of the reliability columns
# q_calibration reports. With 6-dp scores both moments are EXACT
# fixed-point integers (1e-12 and 1e-24 units in DECIMAL(38,0)/
# HUGEINT), so the per-decile test is hash-checkable; statistic only,
# erf exclusion holds.
# ---------------------------------------------------------------------------


@query(
    "q_spiegelhalter",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT CAST(FLOOR(score * 10) AS BIGINT) AS decile, "
        "CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS u, "
        "CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY decile, u), "
        "d AS (SELECT decile, "
        "CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS events, "
        "CAST(SUM(CAST(cnt AS HUGEINT) * u) AS HUGEINT) AS su, "
        # numerator in 1e-12 units: (pos·1e6 − cnt·u)·(1e6 − 2u)
        "CAST(SUM(CAST(pos * 1000000 - cnt * u AS HUGEINT) "
        "* (1000000 - 2 * u)) AS HUGEINT) AS num, "
        # variance in 1e-24 units: cnt·(1e6−2u)²·u·(1e6−u)
        "CAST(SUM(CAST(cnt AS HUGEINT) * (1000000 - 2 * u) "
        "* (1000000 - 2 * u) * u * (1000000 - u)) AS HUGEINT) AS var "
        "FROM g GROUP BY decile) "
        "SELECT decile, n, events, "
        + sql_round("CAST(su AS DOUBLE) / 1000000 / n", 6)
        + " AS mean_pred, "
        + sql_round("CAST(events AS DOUBLE) / n", 6) + " AS obs_rate, "
        + sql_round("CAST(num AS DOUBLE) / 1000000000000", 6)
        + " AS num_spieg, "
        "CASE WHEN var = 0 THEN NULL ELSE "
        + sql_round(
            "(CAST(num AS DOUBLE) / 1000000000000) "
            "/ SQRT(CAST(var AS DOUBLE) / "
            "1000000000000000000000000.0)",
            6,
        )
        + " END AS z_spieg FROM d"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_spiegelhalter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration table with the Spiegelhalter z per decile:
    for rows binned by FLOOR(score·10), the reliability columns
    (n, events, mean predicted, observed rate) plus the Spiegelhalter
    calibration test restricted to the decile — numerator
    Σ(y_i−p_i)(1−2p_i), null variance Σ(1−2p_i)²p_i(1−p_i),
    z = num/√var. Z near 0 means the decile's predictions are
    internally well-calibrated; a signed z localizes WHERE the model
    is over/under-confident, which the single-number q_brier/q_ece
    cannot. NULL z for a degenerate decile (var = 0: every score
    exactly 0 or 1 — the q_delong var-0 discipline). Statistic only,
    erf stays outside the twin contract.

    Exactness: with 6-dp scores (u = score·1e6 exact integers), the
    numerator is an EXACT 1e-12-unit integer per distinct score —
    (pos·1e6 − cnt·u)·(1e6−2u) — and the variance an EXACT 1e-24-unit
    integer — cnt·(1e6−2u)²·u·(1e6−u) ≤ ~1e30 per group, summed in
    DECIMAL(38,0)/HUGEINT (≥1e36 headroom at 1e6 distinct scores).
    No doubles until the final 6-dp-rounded scalars, identical
    expression structure on both engines.

    Scale: ONE map-side-combinable fact fold to the bounded
    (decile, 6-dp score) table, one 10-row fold, zero windows, zero
    joins. Ref: the calibration-curve completion of
    evaluate_model.py's scalar metrics, Spiegelhalter (1986) form."""
    s = scored(spark, sf_dir)
    dec = "decimal(38,0)"
    u = F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("bigint")
    g = s.groupBy(
        F.floor(F.col("score") * 10).cast("bigint").alias("decile"),
        u.alias("u"),
    ).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    one_m_2u = F.lit(1000000) - 2 * F.col("u")
    num_row = (
        (F.col("pos") * 1000000 - F.col("cnt") * F.col("u")).cast(dec)
        * one_m_2u
    )
    var_row = (
        F.col("cnt").cast(dec)
        * one_m_2u
        * one_m_2u
        * F.col("u")
        * (F.lit(1000000) - F.col("u"))
    )
    d = g.groupBy("decile").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("events"),
        F.sum(F.col("cnt").cast(dec) * F.col("u")).alias("su"),
        F.sum(num_row).alias("num"),
        F.sum(var_row).alias("var"),
    )
    numd = F.col("num").cast("double") / 1000000000000
    vard = F.col("var").cast("double") / 1e24
    return d.select(
        "decile",
        "n",
        "events",
        pround(F.col("su").cast("double") / 1000000 / F.col("n"), 6).alias(
            "mean_pred"
        ),
        pround(F.col("events").cast("double") / F.col("n"), 6).alias(
            "obs_rate"
        ),
        pround(numd, 6).alias("num_spieg"),
        F.when(F.col("var") == 0, F.lit(None).cast("double"))
        .otherwise(pround(numd / F.sqrt(vard), 6))
        .alias("z_spieg"),
    )


# ---------------------------------------------------------------------------
# q_brier_decomp — Murphy decomposition of the Brier score over the
# q_spiegelhalter deciles (round 13): BS = REL − RES + UNC, the
# forecast-verification identity that says WHERE a score's badness
# comes from (miscalibration vs missing discrimination vs base-rate
# noise). Statistic-only scalars from the same exact decile moments.
# ---------------------------------------------------------------------------


@query(
    "q_brier_decomp",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT CAST(FLOOR(score * 10) AS BIGINT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS ev, "
        "CAST(SUM(CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)) "
        "AS HUGEINT) AS su FROM s GROUP BY decile), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(SUM(ev) AS BIGINT) AS tev FROM g), "
        # per-decile doubles from exact integers, identical text both
        # engines: pbar_k = su/1e6/n, rate_k = ev/n, rate = tev/nn
        # fold per decile row BEFORE the sum (fixed_sum rule), and keep
        # the multiply association n * (gap*gap) — both exactly as the
        # Spark side writes it (ADVICE r13 #1)
        "d AS (SELECT "
        "CAST(SUM(CAST(FLOOR(n * ((CAST(su AS DOUBLE) / 1000000 / n - CAST(ev AS DOUBLE) / n) "
        "* (CAST(su AS DOUBLE) / 1000000 / n - CAST(ev AS DOUBLE) / n)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS relu, "
        "CAST(SUM(CAST(FLOOR(n * ((CAST(ev AS DOUBLE) / n - CAST(tev AS DOUBLE) / nn) "
        "* (CAST(ev AS DOUBLE) / n - CAST(tev AS DOUBLE) / nn)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) "
        "AS resu FROM g, t) "
        "SELECT "
        + sql_round("CAST(relu AS DOUBLE) / 1000000000 / nn", 6)
        + " AS reliability, "
        + sql_round("CAST(resu AS DOUBLE) / 1000000000 / nn", 6)
        + " AS resolution, "
        + sql_round(
            "(CAST(tev AS DOUBLE) / nn) * (1.0 - CAST(tev AS DOUBLE) / nn)",
            6,
        )
        + " AS uncertainty, "
        + sql_round(
            "CAST(relu AS DOUBLE) / 1000000000 / nn "
            "- CAST(resu AS DOUBLE) / 1000000000 / nn "
            "+ (CAST(tev AS DOUBLE) / nn) "
            "* (1.0 - CAST(tev AS DOUBLE) / nn)",
            6,
        )
        + " AS brier_binned, nn AS n FROM d, t"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_brier_decomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the (decile-binned) Brier score:
    reliability Σn_k(p̄_k−r_k)²/N (calibration badness — what
    recalibration can remove), resolution Σn_k(r_k−r̄)²/N
    (discrimination — what binning preserves of the model's ranking
    power), uncertainty r̄(1−r̄) (base-rate noise floor), and their
    identity brier_binned = REL − RES + UNC. The forecast-verification
    companion to q_brier (which gives the unbinned total) and
    q_spiegelhalter (which localizes the decile z's) — together the
    full story of WHY the score is what it is. Ref: the
    evaluation-side completion of evaluate_model.py's scalar metrics,
    Murphy (1973) form.

    Exactness: per-decile means are doubles computed from exact
    integers by IDENTICAL expression text (the q_jonckheere double
    discipline); each decile's n·(gap)² term is folded to 1e-9
    fixed-point units per decile row BEFORE the 10-row sum (fixed_sum
    rule), so REL/RES are layout-exact and the displayed scalars are
    6-dp portable-rounded.

    Scale: ONE map-side-combinable fact fold to <=10 decile rows +
    one 1-row total — strictly cheaper than q_spiegelhalter's
    per-score fold; no window, no join."""
    s = scored(spark, sf_dir)
    g = s.groupBy(
        F.floor(F.col("score") * 10).cast("bigint").alias("decile")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("ev"),
        F.sum(F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("su"),
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("ev").cast("bigint").alias("tev"),
    )
    gt = g.crossJoin(F.broadcast(t))
    pbar = F.col("su").cast("double") / 1000000 / F.col("n")
    rate = F.col("ev").cast("double") / F.col("n")
    gbar = F.col("tev").cast("double") / F.col("nn")
    d = gt.agg(
        F.sum(
            F.floor(
                F.col("n") * ((pbar - rate) * (pbar - rate)) * 1000000000
                + F.lit(0.5)
            ).cast("bigint")
        ).cast("bigint").alias("relu"),
        F.sum(
            F.floor(
                F.col("n") * ((rate - gbar) * (rate - gbar)) * 1000000000
                + F.lit(0.5)
            ).cast("bigint")
        ).cast("bigint").alias("resu"),
    )
    out = d.crossJoin(F.broadcast(t))
    rel = F.col("relu").cast("double") / 1000000000 / F.col("nn")
    res = F.col("resu").cast("double") / 1000000000 / F.col("nn")
    gb = F.col("tev").cast("double") / F.col("nn")
    unc = gb * (F.lit(1.0) - gb)
    return out.select(
        pround(rel, 6).alias("reliability"),
        pround(res, 6).alias("resolution"),
        pround(unc, 6).alias("uncertainty"),
        pround(rel - res + unc, 6).alias("brier_binned"),
        F.col("nn").alias("n"),
    )


# ---------------------------------------------------------------------------
# q_hosmer_lemeshow — decile goodness-of-fit chi2 (round 14, VERDICT
# r13 #6c): the classic calibration TEST statistic over the same
# exact decile moments as q_calibration/q_spiegelhalter/q_brier_decomp.
# Statistic + df only (the chi2 p-value needs the incomplete gamma —
# the erf exclusion).
# ---------------------------------------------------------------------------


@query(
    "q_hosmer_lemeshow",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT CAST(FLOOR(score * 10) AS BIGINT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS ev, "
        "CAST(SUM(CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)) "
        "AS HUGEINT) AS su FROM s GROUP BY decile), "
        # per-decile contribution folded to 1e-9 units BEFORE the
        # <=10-row sum (fixed_sum rule); degenerate deciles (expected
        # events 0 or n) emit NULL and drop out of SUM/COUNT on both
        # engines identically
        "d AS (SELECT "
        "CAST(SUM(CASE WHEN su = 0 OR su = n * 1000000 THEN NULL ELSE "
        "CAST(FLOOR((((CAST(ev AS DOUBLE) - CAST(su AS DOUBLE) / 1000000) "
        "* (CAST(ev AS DOUBLE) - CAST(su AS DOUBLE) / 1000000)) "
        "/ (CAST(su AS DOUBLE) / 1000000) "
        "+ ((CAST(ev AS DOUBLE) - CAST(su AS DOUBLE) / 1000000) "
        "* (CAST(ev AS DOUBLE) - CAST(su AS DOUBLE) / 1000000)) "
        "/ (CAST(n AS DOUBLE) - CAST(su AS DOUBLE) / 1000000)) "
        "* 1000000000 + 0.5) AS BIGINT) END) AS BIGINT) AS hu, "
        "CAST(COUNT(CASE WHEN su = 0 OR su = n * 1000000 THEN NULL "
        "ELSE 1 END) AS BIGINT) AS n_bins, "
        "CAST(SUM(n) AS BIGINT) AS nn FROM g) "
        # < 3 usable bins -> df <= 0 and a statistic no chi-square
        # consumer can use: NULL out both, identical predicate on both
        # engines (ADVICE r14 #4, the q_delong degenerate discipline)
        "SELECT n_bins, CASE WHEN n_bins < 3 THEN NULL "
        "ELSE CAST(n_bins - 2 AS BIGINT) END AS df, nn AS n, "
        "CASE WHEN n_bins < 3 THEN NULL ELSE "
        + sql_round("CAST(hu AS DOUBLE) / 1000000000", 6)
        + " END AS hl_stat FROM d"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_hosmer_lemeshow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow goodness-of-fit statistic over the score
    deciles: HL = Σ_g (O_g−E_g)²/E_g + (O'_g−E'_g)²/E'_g with
    E_g = Σ p_i (the exact fixed-point decile score sum) and the
    primed terms the non-event mirror — algebraically
    gap²·(1/E + 1/(n−E)) per decile, the textbook grouped-chi²
    calibration TEST completing the calibration house (q_calibration
    states the curve, q_spiegelhalter localizes z per decile,
    q_brier_decomp attributes the score, this one emits the classic
    testable scalar + df = bins−2). Statistic only — the chi²
    p-value needs the incomplete gamma, outside the twin contract.

    Exactness: per-decile E comes from the exact integer su (the
    q_brier_decomp moments); each decile's contribution is a double
    on exact integers with IDENTICAL expression text, folded to 1e-9
    fixed-point units per decile row BEFORE the <=10-row sum
    (fixed_sum rule). Degenerate deciles (E = 0 or E = n) emit NULL
    and drop out of SUM and the bin COUNT identically on both
    engines; if fewer than 3 usable bins survive, df and hl_stat are
    NULLed on both engines (df <= 0 is unusable by any chi-square
    consumer — ADVICE r14 #4, the q_delong degenerate discipline).

    Scale: ONE map-side-combinable fact fold to <=10 decile rows +
    a 1-row fold — the q_brier_decomp shape exactly."""
    s = scored(spark, sf_dir)
    g = s.groupBy(
        F.floor(F.col("score") * 10).cast("bigint").alias("decile")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("ev"),
        F.sum(F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("bigint"))
        .cast("decimal(38,0)")
        .alias("su"),
    )
    e1 = F.col("su").cast("double") / 1000000
    gap = F.col("ev").cast("double") - e1
    term = (gap * gap) / e1 + (gap * gap) / (
        F.col("n").cast("double") - e1
    )
    degenerate = (F.col("su") == 0) | (
        F.col("su") == F.col("n").cast("decimal(38,0)") * 1000000
    )
    hu_row = F.when(degenerate, F.lit(None).cast("bigint")).otherwise(
        F.floor(term * 1000000000 + F.lit(0.5)).cast("bigint")
    )
    d = g.agg(
        F.sum(hu_row).cast("bigint").alias("hu"),
        F.count(
            F.when(degenerate, F.lit(None)).otherwise(F.lit(1))
        )
        .cast("bigint")
        .alias("n_bins"),
        F.sum("n").cast("bigint").alias("nn"),
    )
    return d.select(
        "n_bins",
        F.when(F.col("n_bins") < 3, F.lit(None).cast("bigint"))
        .otherwise((F.col("n_bins") - 2).cast("bigint"))
        .alias("df"),
        F.col("nn").alias("n"),
        F.when(F.col("n_bins") < 3, F.lit(None).cast("double"))
        .otherwise(
            pround(F.col("hu").cast("double") / 1000000000, 6)
        )
        .alias("hl_stat"),
    )


# ---------------------------------------------------------------------------
# q_calibration_slope — calibration slope/intercept via exact moment
# regression of the outcome on the logit score (round 14, VERDICT r13
# #6d): the weak-calibration summary (Cox 1958 recalibration line) —
# slope 1 / intercept 0 is perfect; slope < 1 is overfitting's
# signature. Closed-form 2x2 normal equations, the q_ridge
# discipline.
# ---------------------------------------------------------------------------


@query(
    "q_calibration_slope",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        # fold to the <=1e6-1 distinct-score table first (the q_delong
        # posture); logit(score) = LN(u/(1e6-u)) of exact integers,
        # folded to 1e-9 units per distinct score BEFORE any sum
        "g AS (SELECT CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS u, "
        "CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s "
        "WHERE score > 0 AND score < 1 GROUP BY u), "
        "x AS (SELECT cnt, pos, "
        "CAST(FLOOR(LN(CAST(u AS DOUBLE) / (1000000 - u)) "
        "* 1000000000 + 0.5) AS BIGINT) AS xu FROM g), "
        # the per-row products promote to HUGEINT BEFORE the SUM (the
        # sxx association): |xu| reaches ~1.39e10, so a BIGINT product
        # would overflow at cnt >~6.6e8 per distinct score — exactly
        # the scale the Spark DECIMAL(38,0) side targets (ADVICE r14 #1)
        "m AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS sy, "
        "CAST(SUM(CAST(cnt AS HUGEINT) * xu) AS HUGEINT) AS sx, "
        "CAST(SUM(CAST(pos AS HUGEINT) * xu) AS HUGEINT) AS sxy, "
        "CAST(SUM(CAST(cnt AS HUGEINT) * xu * xu) AS HUGEINT) AS sxx "
        "FROM x), "
        "f AS (SELECT n, sy, sx, "
        "CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1000000000) "
        "- (CAST(sx AS DOUBLE) / 1000000000) * CAST(sy AS DOUBLE) AS num, "
        "CAST(n AS DOUBLE) "
        "* (CAST(sxx AS DOUBLE) / 1000000000000000000) "
        "- (CAST(sx AS DOUBLE) / 1000000000) "
        "* (CAST(sx AS DOUBLE) / 1000000000) AS den FROM m), "
        "o AS (SELECT n, sy, sx, "
        "CASE WHEN den = 0 THEN NULL ELSE num / den END AS slope FROM f) "
        "SELECT n, " + sql_round("slope", 6) + " AS slope, "
        "CASE WHEN slope IS NULL THEN NULL ELSE "
        + sql_round(
            "(CAST(sy AS DOUBLE) "
            "- slope * (CAST(sx AS DOUBLE) / 1000000000)) / n",
            6,
        )
        + " END AS intercept FROM o"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_calibration_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration slope and intercept: the closed-form OLS line of
    the binary outcome on the logit of the 6-dp score (the linear-
    probability reading of Cox's 1958 recalibration line — iterating
    a logistic refit would leave the hash-exact twin contract, and
    the moment line detects the same miscalibration signatures:
    slope < 1 ⇒ predictions too extreme / overfit, intercept != 0 ⇒
    base-rate shift). One row: n, slope, intercept; a perfectly
    calibrated scorer reads (1, 0) in the linear approximation.

    Exactness: the fact table folds to the <=1e6-1 distinct-score
    table first (q_delong posture; score-0/1 rows are excluded by an
    identical predicate on both engines — logit is undefined there);
    logit = LN(u/(1e6−u)) is LN of an exact integer ratio (the
    documented LN house class, KM precedent), folded to 1e-9
    fixed-point units per DISTINCT SCORE before any accumulation, so
    all five sufficient sums are exact BIGINT/DECIMAL integers
    (sxx <= ~1e26 rides DECIMAL(38,0)/HUGEINT) and the slope/intercept
    doubles are computed from exact integers with identical text.
    Degenerate den = 0 (a single distinct score) emits NULL, the
    q_delong guard.

    Scale: ONE map-side-combinable fact fold to the domain-bounded
    distinct-score table, one bounded fold to five scalars, zero
    windows, zero joins — strictly cheaper than q_delong."""
    s = scored(spark, sf_dir)
    dec = "decimal(38,0)"
    g = (
        s.filter((F.col("score") > 0) & (F.col("score") < 1))
        .groupBy(
            F.floor(F.col("score") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("u")
        )
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
    )
    xu = F.floor(
        F.log(F.col("u").cast("double") / (F.lit(1000000) - F.col("u")))
        * 1000000000
        + F.lit(0.5)
    ).cast("bigint")
    x = g.select("cnt", "pos", xu.alias("xu"))
    m = x.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("sy"),
        # sx/sxy accumulate in DECIMAL(38,0) like sxx — a bare BIGINT
        # sum would wrap silently (non-ANSI) at ~6.6e8 fact rows where
        # the DuckDB HUGEINT twin stays exact (round-14 review fix)
        F.sum(F.col("cnt").cast(dec) * F.col("xu")).cast(dec).alias("sx"),
        F.sum(F.col("pos").cast(dec) * F.col("xu")).cast(dec).alias("sxy"),
        F.sum(F.col("cnt").cast(dec) * F.col("xu") * F.col("xu"))
        .cast(dec)
        .alias("sxx"),
    )
    num = F.col("n").cast("double") * (
        F.col("sxy").cast("double") / 1000000000
    ) - (F.col("sx").cast("double") / 1000000000) * F.col("sy").cast(
        "double"
    )
    den = F.col("n").cast("double") * (
        F.col("sxx").cast("double") / 1000000000000000000
    ) - (F.col("sx").cast("double") / 1000000000) * (
        F.col("sx").cast("double") / 1000000000
    )
    f = m.select(
        "n",
        "sy",
        "sx",
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(num / den)
        .alias("slope"),
    )
    return f.select(
        "n",
        pround(F.col("slope"), 6).alias("slope"),
        F.when(F.col("slope").isNull(), F.lit(None).cast("double"))
        .otherwise(
            pround(
                (
                    F.col("sy").cast("double")
                    - F.col("slope")
                    * (F.col("sx").cast("double") / 1000000000)
                )
                / F.col("n"),
                6,
            )
        )
        .alias("intercept"),
    )


# ---------------------------------------------------------------------------
# q_pseudo_r2 — McFadden + Nagelkerke pseudo-R² of the scorer (round
# 14, 8th widening): the goodness-of-fit summary a logistic scorer
# reports next to q_logloss (absolute) and q_hosmer_lemeshow (grouped
# test) — model log-likelihood against the base-rate-only null.
# ---------------------------------------------------------------------------


@query(
    "q_pseudo_r2",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS u, "
        "CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s "
        "WHERE score > 0 AND score < 1 GROUP BY u), "
        # per-DISTINCT-SCORE log-likelihood folded to 1e-9 units before
        # any accumulation (fixed_sum rule; LN of exact integer ratios)
        "x AS (SELECT CAST(FLOOR((CAST(pos AS DOUBLE) "
        "* LN(CAST(u AS DOUBLE) / 1000000) "
        "+ CAST(cnt - pos AS DOUBLE) "
        "* LN(CAST(1000000 - u AS DOUBLE) / 1000000)) "
        "* 1000000000 + 0.5) AS BIGINT) AS llu, cnt, pos FROM g), "
        # SUM stays HUGEINT (not narrowed to BIGINT): the 1e-9-unit LL
        # sum wraps BIGINT at ~4e9 rows — the very scale the Spark
        # DECIMAL(38,0) accumulation targets (ADVICE r14 #2)
        "m AS (SELECT CAST(SUM(llu) AS HUGEINT) AS llu, "
        "CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS sy FROM x), "
        "f AS (SELECT n, "
        "CAST(llu AS DOUBLE) / 1000000000 AS llm, "
        "CAST(n AS DOUBLE) * ((CAST(sy AS DOUBLE) / n) "
        "* LN(CAST(sy AS DOUBLE) / n) "
        "+ (1.0 - CAST(sy AS DOUBLE) / n) "
        "* LN(1.0 - CAST(sy AS DOUBLE) / n)) AS ll0 FROM m) "
        "SELECT n, " + sql_round("llm", 6) + " AS ll_model, "
        + sql_round("ll0", 6) + " AS ll_null, "
        + sql_round("1.0 - llm / ll0", 6) + " AS mcfadden, "
        + sql_round(
            "(1.0 - EXP(2.0 * (ll0 - llm) / n)) "
            "/ (1.0 - EXP(2.0 * ll0 / n))",
            6,
        )
        + " AS nagelkerke FROM f"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_pseudo_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McFadden and Nagelkerke pseudo-R² of the published scorer: the
    model's Bernoulli log-likelihood Σ y·ln(p) + (1−y)·ln(1−p) against
    the base-rate-only null LL — McFadden = 1 − LLm/LL0, Nagelkerke =
    (1 − exp(2(LL0−LLm)/n)) / (1 − exp(2·LL0/n)) (the Cox-Snell form
    normalized to a [0,1] ceiling). The fit summary a logistic scorer
    reports next to q_logloss (the same LLm to a constant, absolute
    scale) and q_hosmer_lemeshow (the grouped test); completes the
    model-fit house. Rows with score exactly 0 or 1 are excluded by an
    identical predicate on both engines (ln undefined there — the
    q_calibration_slope clip, documented).

    Exactness: the fact table folds to the <=1e6-1 distinct-score
    table (q_delong posture); each distinct score's LL term is LN of
    exact integer ratios times exact counts (LN house class, KM
    precedent), folded to 1e-9 fixed-point units per DISTINCT SCORE
    before any accumulation — LLm is an exact DECIMAL(38,0) sum; LL0 and the
    two R² scalars are 1-row closed forms on exact integers with
    identical expression text.

    Scale: ONE map-side-combinable fact fold to the domain-bounded
    distinct-score table + a 3-scalar fold, zero windows, zero joins —
    the q_calibration_slope shape exactly."""
    s = scored(spark, sf_dir)
    g = (
        s.filter((F.col("score") > 0) & (F.col("score") < 1))
        .groupBy(
            F.floor(F.col("score") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("u")
        )
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
    )
    llu = F.floor(
        (
            F.col("pos").cast("double")
            * F.log(F.col("u").cast("double") / 1000000)
            + (F.col("cnt") - F.col("pos")).cast("double")
            * F.log((F.lit(1000000) - F.col("u")).cast("double") / 1000000)
        )
        * 1000000000
        + F.lit(0.5)
    ).cast("bigint")
    m = g.select(llu.alias("llu"), "cnt", "pos").agg(
        # accumulate in DECIMAL(38,0): a bare BIGINT sum of ~2.1e9-per-
        # fact-row LL units would wrap silently at ~4e9 rows where the
        # DuckDB HUGEINT sum stays exact (round-14 review fix)
        F.sum(F.col("llu").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("llu"),
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("sy"),
    )
    r = F.col("sy").cast("double") / F.col("n")
    llm = F.col("llu").cast("double") / 1000000000
    ll0 = F.col("n").cast("double") * (
        r * F.log(r) + (F.lit(1.0) - r) * F.log(F.lit(1.0) - r)
    )
    f = m.select("n", llm.alias("llm"), ll0.alias("ll0"))
    return f.select(
        "n",
        pround(F.col("llm"), 6).alias("ll_model"),
        pround(F.col("ll0"), 6).alias("ll_null"),
        pround(F.lit(1.0) - F.col("llm") / F.col("ll0"), 6).alias(
            "mcfadden"
        ),
        pround(
            (
                F.lit(1.0)
                - F.exp(
                    F.lit(2.0) * (F.col("ll0") - F.col("llm")) / F.col("n")
                )
            )
            / (F.lit(1.0) - F.exp(F.lit(2.0) * F.col("ll0") / F.col("n"))),
            6,
        ).alias("nagelkerke"),
    )


# ---------------------------------------------------------------------------
# q_lift_gain — cumulative gains / lift table at score deciles (round
# 15, VERDICT r14 #7b): the campaign-targeting readout of the scorer —
# "contact the top k deciles, capture what fraction of the positives
# at what lift over random" — riding the exact decile moments the
# calibration house (q_hosmer_lemeshow / q_brier_decomp) already
# folds to.
# ---------------------------------------------------------------------------


@query(
    "q_lift_gain",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT CAST(FLOOR(score * 10) AS BIGINT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS ev FROM s GROUP BY decile), "
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, "
        "CAST(SUM(ev) AS BIGINT) AS tev FROM g), "
        # cumulate from the TOP decile down (targeting order); the
        # window runs over <=10 rows — the KM bounded-window precedent
        "r AS (SELECT decile, n, ev, "
        "CAST(SUM(n) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_n, "
        "CAST(SUM(ev) OVER (ORDER BY decile DESC) AS BIGINT) AS cum_ev "
        "FROM g) "
        "SELECT decile, n, ev, cum_n, cum_ev, "
        # no-positives stream -> NULL capture/lift on both engines
        # (the q_delong degenerate guard)
        "CASE WHEN tev = 0 THEN NULL ELSE "
        + sql_round("CAST(cum_ev AS DOUBLE) / tev", 6)
        + " END AS capture, "
        "CASE WHEN tev = 0 THEN NULL ELSE "
        + sql_round(
            "(CAST(cum_ev AS DOUBLE) / cum_n) "
            "/ (CAST(tev AS DOUBLE) / nn)",
            6,
        )
        + " END AS lift FROM r, t"
    ),
    tags=("ml", "monitor", "targeting"),
)
def q_lift_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift at score deciles, top decile first:
    for each decile d (descending), cum_n / cum_ev are the exact
    counts of rows / positives captured by targeting every row scored
    in decile d or higher; capture = cum_ev / total positives (the
    gains curve) and lift = precision-so-far over base rate (how many
    times better than random the cut is). THE standard
    campaign-targeting table a fraud desk reads next to the ROC
    (q_roc_points ranks; this one prices a top-k intervention
    budget). Ref: the evaluation-side completion of
    evaluate_model.py's threshold metrics at targeting cuts.

    Exactness: decile counts are exact integers (the q_brier_decomp /
    q_hosmer_lemeshow moments); the cumulative sums run over the <=10
    decile rows (bounded single-partition window — the KM precedent);
    capture and lift are doubles computed from exact integers with
    IDENTICAL expression text, 6-dp portable-rounded; an all-negative
    stream emits NULL capture/lift on both engines (the q_delong
    degenerate guard).

    Scale: ONE map-side-combinable fact fold to <=10 decile rows, a
    1-row total, one bounded window — strictly the q_hosmer_lemeshow
    shape plus a 10-row window."""
    s = scored(spark, sf_dir)
    g = s.groupBy(
        F.floor(F.col("score") * 10).cast("bigint").alias("decile")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("ev"),
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("ev").cast("bigint").alias("tev"),
    )
    w_desc = Window.orderBy(F.desc("decile")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = g.select(
        "decile",
        "n",
        "ev",
        F.sum("n").over(w_desc).cast("bigint").alias("cum_n"),
        F.sum("ev").over(w_desc).cast("bigint").alias("cum_ev"),
    )
    out = r.crossJoin(F.broadcast(t))
    capture = F.col("cum_ev").cast("double") / F.col("tev")
    lift = (F.col("cum_ev").cast("double") / F.col("cum_n")) / (
        F.col("tev").cast("double") / F.col("nn")
    )
    return out.select(
        "decile",
        "n",
        "ev",
        "cum_n",
        "cum_ev",
        F.when(F.col("tev") == 0, F.lit(None).cast("double"))
        .otherwise(pround(capture, 6))
        .alias("capture"),
        F.when(F.col("tev") == 0, F.lit(None).cast("double"))
        .otherwise(pround(lift, 6))
        .alias("lift"),
    )


# ---------------------------------------------------------------------------
# q_cal_in_large — calibration-in-the-large + the OVERALL Spiegelhalter
# z (round 16, VERDICT r15 #6d): the one-row companions to the
# q_spiegelhalter decile table and q_calibration_slope. Mean observed
# vs mean predicted, their exact gap, the O−E z on the exact Bernoulli
# null variance, and Spiegelhalter's overall calibration z — the
# whole-population summary the decile table localizes.
# ---------------------------------------------------------------------------


@query(
    "q_cal_in_large",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS u, "
        "CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY u), "
        "m AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS pos_t, "
        "CAST(SUM(CAST(cnt AS HUGEINT) * u) AS HUGEINT) AS su, "
        # O−E null variance in 1e-12 units: cnt·u·(1e6−u)
        "CAST(SUM(CAST(cnt AS HUGEINT) * u * (1000000 - u)) AS HUGEINT) "
        "AS var0, "
        # Spiegelhalter numerator in 1e-12 units (the q_spiegelhalter
        # text): (pos·1e6 − cnt·u)·(1e6 − 2u)
        "CAST(SUM(CAST(pos * 1000000 - cnt * u AS HUGEINT) "
        "* (1000000 - 2 * u)) AS HUGEINT) AS num, "
        # Spiegelhalter variance in 1e-24 units: cnt·(1e6−2u)²·u·(1e6−u)
        "CAST(SUM(CAST(cnt AS HUGEINT) * (1000000 - 2 * u) "
        "* (1000000 - 2 * u) * u * (1000000 - u)) AS HUGEINT) AS var "
        "FROM g) "
        "SELECT n, "
        + sql_round("CAST(pos_t AS DOUBLE) / n", 6) + " AS mean_obs, "
        + sql_round("CAST(su AS DOUBLE) / 1000000 / n", 6)
        + " AS mean_pred, "
        + sql_round(
            "CAST(CAST(pos_t AS HUGEINT) * 1000000 - su AS DOUBLE) "
            "/ 1000000 / n",
            6,
        )
        + " AS cal_gap, "
        "CASE WHEN var0 = 0 THEN NULL ELSE "
        + sql_round(
            "(CAST(CAST(pos_t AS HUGEINT) * 1000000 - su AS DOUBLE) "
            "/ 1000000) / SQRT(CAST(var0 AS DOUBLE) / 1000000000000)",
            6,
        )
        + " END AS z_oe, "
        + sql_round("CAST(num AS DOUBLE) / 1000000000000", 6)
        + " AS num_spieg, "
        "CASE WHEN var = 0 THEN NULL ELSE "
        + sql_round(
            "(CAST(num AS DOUBLE) / 1000000000000) "
            "/ SQRT(CAST(var AS DOUBLE) / "
            "1000000000000000000000000.0)",
            6,
        )
        + " END AS z_spieg FROM m"
    ),
    tags=("ml", "monitor", "calibration"),
)
def q_cal_in_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration-in-the-large + the overall Spiegelhalter z — the
    one-row whole-population companions to the q_spiegelhalter decile
    table (which localizes them) and q_calibration_slope (the weak/
    strong recalibration axis). One row: n, mean observed rate, mean
    predicted rate, their exact gap (the in-the-large intercept at
    slope 1), the O−E z on the exact Bernoulli null variance
    Σp(1−p) (NULL when the variance degenerates — every score exactly
    0/1), Spiegelhalter's numerator Σ(y−p)(1−2p), and his overall
    z = num/√Σ(1−2p)²p(1−p) (same NULL guard). Together with
    q_pseudo_r2/q_xgb_fit this pins WHAT the Newton rounds fix:
    the published scorer ranks well but is globally over-confident.

    Exactness: with 6-dp scores every moment is an EXACT fixed-point
    integer off the (u, cnt, pos) cell table — su in 1e-6, var0/num in
    1e-12, var in 1e-24 units, all DECIMAL(38,0)/HUGEINT (per-cell
    var ≤ ~2.5e23·cnt — ≥1e13-row headroom); cal_gap promotes
    pos_t·1e6 − su BEFORE the double cast (the ADVICE r14 #1
    discipline); doubles appear only in the final 6-dp-rounded
    scalars with IDENTICAL expression text. Statistic only, erf
    exclusion holds (the q_spiegelhalter precedent).

    Scale: ONE map-side-combinable fact fold to the bounded distinct-
    6-dp-score table (the q_pseudo_r2 shape) + one 1-row fold. Zero
    windows, zero joins. Ref: evaluate_model.py's scalar metrics
    family; Spiegelhalter (1986); calibration-in-the-large per
    Steyerberg's model-validation battery."""
    s = scored(spark, sf_dir)
    dec = "decimal(38,0)"
    g = s.groupBy(
        F.floor(F.col("score") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("u")
    ).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    one_m_2u = F.lit(1000000) - 2 * F.col("u")
    m = g.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos_t"),
        F.sum(F.col("cnt").cast(dec) * F.col("u")).alias("su"),
        F.sum(
            F.col("cnt").cast(dec)
            * F.col("u")
            * (F.lit(1000000) - F.col("u"))
        ).alias("var0"),
        F.sum(
            (F.col("pos") * 1000000 - F.col("cnt") * F.col("u")).cast(dec)
            * one_m_2u
        ).alias("num"),
        F.sum(
            F.col("cnt").cast(dec)
            * one_m_2u
            * one_m_2u
            * F.col("u")
            * (F.lit(1000000) - F.col("u"))
        ).alias("var"),
    )
    oe = (
        (F.col("pos_t").cast(dec) * 1000000 - F.col("su")).cast("double")
        / 1000000
    )
    numd = F.col("num").cast("double") / 1000000000000
    vard = F.col("var").cast("double") / 1e24
    var0d = F.col("var0").cast("double") / 1000000000000
    return m.select(
        "n",
        pround(F.col("pos_t").cast("double") / F.col("n"), 6).alias(
            "mean_obs"
        ),
        pround(F.col("su").cast("double") / 1000000 / F.col("n"), 6).alias(
            "mean_pred"
        ),
        pround(oe / F.col("n"), 6).alias("cal_gap"),
        F.when(F.col("var0") == 0, F.lit(None).cast("double"))
        .otherwise(pround(oe / F.sqrt(var0d), 6))
        .alias("z_oe"),
        pround(numd, 6).alias("num_spieg"),
        F.when(F.col("var") == 0, F.lit(None).cast("double"))
        .otherwise(pround(numd / F.sqrt(vard), 6))
        .alias("z_spieg"),
    )
