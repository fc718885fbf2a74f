"""ML feature/metric operators, SQL-expressible form.

A deterministic "published model" over lineitem lets the DuckDB oracle
replicate every scoring/metric query exactly (SURVEY.md §2f strategy:
store coefficients as literals):

    label  = 1 iff l_returnflag = 'R'          (the 'fraud' class)
    x1     = l_quantity
    x2     = l_discount
    x3     = l_extendedprice / 100000
    logit  = -2.0 + 0.03*x1 + 9.0*x2 + 0.8*x3
    score  = sigmoid(logit)

Reference parity:
- predict / predict_proba      -> evaluate_model.py:26-27, deploy.py:36-37
- standard scaling (z-score)   -> train_model.py:36-40 (fit on stats,
  transform via broadcast — no shuffle of the fact table)
- SHAP LinearExplainer         -> explain_model.py:24-27: w·(x−μ)
- simplified attribution w·x   -> xai_tasks.py:102-115
- confusion matrix             -> evaluate_model.py:31
- precision/recall/F1          -> evaluate_model.py:45
- ROC curve / AUC              -> evaluate_model.py:49-50,
  train_model.py:83 — AUC via tie-aware Mann–Whitney rank-sum; ROC via
  score-binned cumulative sums (the scale-safe two-pass form, see
  SURVEY.md §4.2)
- stratified split / K folds   -> preprocess.py:36-38, train_model.py:49
  — deterministic multiplicative-hash bucketing instead of RNG so the
  assignment is stable across retries and partitionings.

Scale posture: scoring is pure whole-stage-codegen column math; μ/σ and
rank statistics are tiny aggregates broadcast back; the only ordered
window (q_auc) ranks *rounded* scores and is documented as the
test-scale form — q_roc_points is the binned form that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fp_units, pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

# Published model coefficients (literals on both engines).
B0, W_QTY, W_DISC, W_PRICE = -2.0, 0.03, 9.0, 0.8

# SQL fragment computing (label, score) from lineitem — shared by oracles.
SCORED_SQL = (
    "SELECT l_orderkey, l_linenumber, "
    "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
    + sql_round(
        "1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity + 9.0 * l_discount "
        "+ 0.8 * (l_extendedprice / 100000.0))))",
        6,
    )
    + " AS score FROM lineitem"
)


def scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> (l_orderkey, l_linenumber, label, score).

    Score is rounded to 6 decimals *before* any ranking so tie structure
    is identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    logit = (
        F.lit(B0)
        + F.lit(W_QTY) * F.col("l_quantity")
        + F.lit(W_DISC) * F.col("l_discount")
        + F.lit(W_PRICE) * (F.col("l_extendedprice") / 100000.0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )


@query(
    "q_lr_proba",
    oracle=SCORED_SQL,
    tags=("ml", "scoring"),
)
def q_lr_proba(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict_proba: sigmoid(w·x + b). Ref: model.predict_proba(X)[:,1]
    evaluate_model.py:27 / predict_single.py:31."""
    return scored(spark, sf_dir)


@query(
    "q_lr_predict",
    oracle=(
        f"WITH s AS ({SCORED_SQL}) "
        "SELECT l_orderkey, l_linenumber, label, "
        "CASE WHEN score > 0.5 THEN 1 ELSE 0 END AS prediction FROM s"
    ),
    tags=("ml", "scoring"),
)
def q_lr_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict: class = score > 0.5. Ref: model.predict evaluate_model.py:26."""
    s = scored(spark, sf_dir)
    return s.select(
        "l_orderkey",
        "l_linenumber",
        "label",
        F.when(F.col("score") > 0.5, 1).otherwise(0).alias("prediction"),
    )


@query(
    "q_standard_scale",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        + sql_round("(l_quantity - AVG(l_quantity) OVER ()) / STDDEV_SAMP(l_quantity) OVER ()", 6)
        + " AS z_qty, "
        + sql_round("(l_extendedprice - AVG(l_extendedprice) OVER ()) / STDDEV_SAMP(l_extendedprice) OVER ()", 6)
        + " AS z_price FROM lineitem"
    ),
    tags=("ml", "feature"),
)
def q_standard_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler transform z=(x−μ)/σ. Ref: train_model.py:36-40.

    Spark plan: one tiny agg (μ,σ) -> broadcast cross-join back onto the
    fact table -> pure column math. No shuffle of lineitem itself; the
    oracle's window-over-() form is only for DuckDB equivalence."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.avg("l_quantity").alias("mu_q"),
        F.stddev_samp("l_quantity").alias("sd_q"),
        F.avg("l_extendedprice").alias("mu_p"),
        F.stddev_samp("l_extendedprice").alias("sd_p"),
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_linenumber",
            pround((F.col("l_quantity") - F.col("mu_q")) / F.col("sd_q"), 6).alias("z_qty"),
            pround((F.col("l_extendedprice") - F.col("mu_p")) / F.col("sd_p"), 6).alias("z_price"),
        )
    )


@query(
    "q_shap_linear",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        + sql_round("0.03 * (l_quantity - AVG(l_quantity) OVER ())", 6) + " AS shap_qty, "
        + sql_round("9.0 * (l_discount - AVG(l_discount) OVER ())", 6) + " AS shap_disc, "
        + sql_round("0.8 * (l_extendedprice / 100000.0 - AVG(l_extendedprice / 100000.0) OVER ())", 6)
        + " AS shap_price FROM lineitem"
    ),
    tags=("ml", "explain"),
)
def q_shap_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAP LinearExplainer (interventional): φᵢ = wᵢ·(xᵢ − μᵢ).
    Ref: explain_model.py:24-27 — for linear models SHAP is exactly
    coef ⊙ (x − μ_background); no shap library needed, pure column math
    with broadcast background means."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.avg("l_quantity").alias("mu_q"),
        F.avg("l_discount").alias("mu_d"),
        F.avg(F.col("l_extendedprice") / 100000.0).alias("mu_p"),
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select(
            "l_orderkey",
            "l_linenumber",
            pround(F.lit(W_QTY) * (F.col("l_quantity") - F.col("mu_q")), 6).alias("shap_qty"),
            pround(F.lit(W_DISC) * (F.col("l_discount") - F.col("mu_d")), 6).alias("shap_disc"),
            pround(
                F.lit(W_PRICE) * (F.col("l_extendedprice") / 100000.0 - F.col("mu_p")), 6
            ).alias("shap_price"),
        )
    )


@query(
    "q_linear_attr",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        + sql_round("0.03 * l_quantity", 6) + " AS attr_qty, "
        + sql_round("9.0 * l_discount", 6) + " AS attr_disc, "
        + sql_round("0.8 * l_extendedprice / 100000.0", 6) + " AS attr_price FROM lineitem"
    ),
    tags=("ml", "explain"),
)
def q_linear_attr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified linear attribution wᵢ·xᵢ (no centering).
    Ref: coefs * x_arr[0] xai_tasks.py:102-115."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.lit(W_QTY) * F.col("l_quantity"), 6).alias("attr_qty"),
        pround(F.lit(W_DISC) * F.col("l_discount"), 6).alias("attr_disc"),
        pround(F.lit(W_PRICE) * F.col("l_extendedprice") / 100000.0, 6).alias("attr_price"),
    )


@query(
    "q_confusion",
    oracle=(
        f"WITH s AS ({SCORED_SQL}) "
        "SELECT label, CASE WHEN score > 0.5 THEN 1 ELSE 0 END AS prediction, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY label, prediction"
    ),
    tags=("ml", "metric"),
)
def q_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix as (label, prediction, n) triples.
    Ref: confusion_matrix(y_test, y_pred) evaluate_model.py:31."""
    s = scored(spark, sf_dir)
    return (
        s.withColumn("prediction", F.when(F.col("score") > 0.5, 1).otherwise(0))
        .groupBy("label", "prediction")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_prf",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), c AS ("
        "SELECT SUM(CASE WHEN label = 1 AND score > 0.5 THEN 1 ELSE 0 END) AS tp, "
        "SUM(CASE WHEN label = 0 AND score > 0.5 THEN 1 ELSE 0 END) AS fp, "
        "SUM(CASE WHEN label = 1 AND score <= 0.5 THEN 1 ELSE 0 END) AS fn, "
        "SUM(CASE WHEN label = 0 AND score <= 0.5 THEN 1 ELSE 0 END) AS tn FROM s) "
        "SELECT " + sql_round("tp * 1.0 / NULLIF(tp + fp, 0)", 6) + " AS precision_1, "
        + sql_round("tp * 1.0 / NULLIF(tp + fn, 0)", 6) + " AS recall_1, "
        + sql_round("2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0)", 6) + " AS f1_1, "
        "CAST(tp + fn AS BIGINT) AS support_1, "
        "CAST(tn + fp AS BIGINT) AS support_0 FROM c"
    ),
    tags=("ml", "metric"),
)
def q_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1/support for the positive class.
    Ref: classification_report evaluate_model.py:45 — conditional sums,
    one aggregate pass."""
    s = scored(spark, sf_dir)
    pred = F.col("score") > 0.5
    lab = F.col("label") == 1
    agg = s.agg(
        F.sum(F.when(lab & pred, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~lab & pred, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(lab & ~pred, 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~lab & ~pred, 1).otherwise(0)).alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    return agg.select(
        pround(tp * 1.0 / F.nullif(tp + fp, F.lit(0)), 6).alias("precision_1"),
        pround(tp * 1.0 / F.nullif(tp + fn, F.lit(0)), 6).alias("recall_1"),
        pround(2.0 * tp / F.nullif(2.0 * tp + fp + fn, F.lit(0)), 6).alias("f1_1"),
        (tp + fn).cast("bigint").alias("support_1"),
        (tn + fp).cast("bigint").alias("support_0"),
    )


@query(
    "q_auc",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), r AS ("
        "SELECT label, "
        "RANK() OVER (ORDER BY score) + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0 AS arank "
        "FROM s) "
        "SELECT " + sql_round(
            "(SUM(CASE WHEN label = 1 THEN arank ELSE 0 END) "
            "- SUM(label) * (SUM(label) + 1) / 2.0) "
            "/ (SUM(label) * (COUNT(*) - SUM(label)))", 6)
        + " AS auc FROM r"
    ),
    tags=("ml", "metric"),
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via tie-aware Mann–Whitney rank-sum:
    AUC = (Σ rank⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻), with average ranks over
    score ties (scores pre-rounded so tie structure matches the oracle).
    Ref: roc_auc_score train_model.py:83 / evaluate_model.py:50.

    Scale-safe exact form (no single-partition window anywhere):
    scores are pre-rounded to 6 dp, so the distinct-score table is
    bounded at ~10⁶ rows regardless of input size. Ranks come from a
    distributed prefix sum over that table:

      1. one shuffle agg: (score -> pos, cnt);
      2. coarse buckets (floor(score·1000), ≤1001 rows): cross-bucket
         offsets via a tiny broadcast self-join — no window at all;
      3. within-bucket running count via a PARTITIONED window
         (partitionBy bucket), so no "move all data to one partition".

    arank(score) = rows_below + (cnt+1)/2, and Σ over positive rows of
    arank = Σ_groups pos·arank — identical math to the global RANK()
    oracle, exact in IEEE double (all terms integer or half-integer)."""
    s = scored(spark, sf_dir)
    # NOT cached, deliberately (round 4 A/B): the distinct-score table
    # feeds both the bucket-offset branch and the ranked join with no
    # ReusedExchange, so the scoring scan + score agg do run twice —
    # but in a run-once query the duplicated map work overlaps across
    # cores, while cache() serializes a 347k-row materialization onto
    # the critical path (measured consistently slower end-to-end).
    per = (
        s.groupBy("score")
        .agg(F.sum("label").alias("pos"), F.count("*").alias("cnt"))
        .withColumn("bucket", F.floor(F.col("score") * 1000).cast("bigint"))
    )
    btot = per.groupBy("bucket").agg(F.sum("cnt").alias("bcnt"))
    lower = btot.select(F.col("bucket").alias("lb"), F.col("bcnt").alias("lcnt"))
    offs = (
        btot.join(F.broadcast(lower), F.col("lb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(F.coalesce(F.sum("lcnt"), F.lit(0)).alias("offset"))
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = (
        per.join(F.broadcast(offs), "bucket")
        .withColumn(
            "arank",
            F.col("offset")
            + F.coalesce(F.sum("cnt").over(w_in), F.lit(0))
            + (F.col("cnt") + 1) / 2.0,
        )
    )
    n_pos = F.sum("pos")
    n_all = F.sum("cnt")
    return ranked.agg(
        pround(
            (F.sum(F.col("pos") * F.col("arank")) - n_pos * (n_pos + 1) / 2.0)
            / (n_pos * (n_all - n_pos)),
            6,
        ).alias("auc")
    )


@query(
    "q_roc_points",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), b AS ("
        "SELECT CAST(FLOOR(score * 50) AS BIGINT) AS bucket, "
        "SUM(label) AS pos, COUNT(*) - SUM(label) AS neg FROM s GROUP BY bucket), "
        "c AS (SELECT bucket, "
        "SUM(pos) OVER (ORDER BY bucket DESC) AS cum_pos, "
        "SUM(neg) OVER (ORDER BY bucket DESC) AS cum_neg, "
        "SUM(pos) OVER () AS tot_pos, SUM(neg) OVER () AS tot_neg FROM b) "
        "SELECT bucket, " + sql_round("cum_pos * 1.0 / tot_pos", 6) + " AS tpr, "
        + sql_round("cum_neg * 1.0 / tot_neg", 6) + " AS fpr FROM c"
    ),
    tags=("ml", "metric"),
)
def q_roc_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned ROC curve — the scale-safe two-pass form: histogram scores
    into 50 buckets (one aggregate), then a cumulative window over the
    ~50-row bucket table only. Ref: roc_curve evaluate_model.py:49."""
    s = scored(spark, sf_dir)
    b = (
        s.groupBy(F.floor(F.col("score") * 50).cast("bigint").alias("bucket"))
        .agg(
            F.sum("label").alias("pos"),
            (F.count("*") - F.sum("label")).alias("neg"),
        )
    )
    w_cum = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = b.select(
        "bucket",
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("neg").over(w_cum).alias("cum_neg"),
        F.sum("pos").over(w_all).alias("tot_pos"),
        F.sum("neg").over(w_all).alias("tot_neg"),
    )
    return c.select(
        "bucket",
        pround(F.col("cum_pos") * 1.0 / F.col("tot_pos"), 6).alias("tpr"),
        pround(F.col("cum_neg") * 1.0 / F.col("tot_neg"), 6).alias("fpr"),
    )


@query(
    "q_fold_assign",
    oracle=(
        "SELECT (l_orderkey * 9973 + l_linenumber) % 5 AS fold, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY fold, label"
    ),
    tags=("ml", "split"),
)
def q_fold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold assignment via multiplicative hash of the
    row key — stable across retries/partitionings (SURVEY.md §4.3),
    unlike RNG folds. Ref: StratifiedKFold(n_splits=5, random_state=42)
    train_model.py:49."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            ((F.col("l_orderkey") * 9973 + F.col("l_linenumber")) % 5).alias("fold"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        )
        .groupBy("fold", "label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_split",
    oracle=(
        "SELECT CASE WHEN (l_orderkey * 2654435761 + l_linenumber) % 1000 < 800 "
        "THEN 1 ELSE 0 END AS is_train, "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem GROUP BY is_train, label"
    ),
    tags=("ml", "split"),
)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/20 train/test split via Knuth multiplicative
    hash of the row key. Ref: train_test_split(test_size=0.2,
    stratify=y, random_state=42) preprocess.py:36-38 — hash bucketing
    replaces RNG so the split is reproducible on any cluster layout."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.when(
                (F.col("l_orderkey") * F.lit(2654435761) + F.col("l_linenumber")) % 1000 < 800, 1
            ).otherwise(0).alias("is_train"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        )
        .groupBy("is_train", "label")
        .agg(F.count("*").alias("n"))
    )


# --- PR curve / average precision / MCC-kappa / log-loss --------------
#
# Completes the evaluation surface next to q_confusion / q_prf /
# q_auc / q_roc_points: the PR view (the one that matters at fraud's
# class imbalance — ROC flatters a 0.2% positive rate), its scalar
# summary (average precision), the chance-corrected agreement scalars
# (MCC, Cohen's kappa, balanced accuracy), and the proper scoring rule
# the reference's logloss eval_metric names (train_model.py:74) but
# never reports.

_PR_SQL = (
    f"WITH s AS ({SCORED_SQL}), b AS ("
    "SELECT CAST(FLOOR(score * 50) AS BIGINT) AS bucket, "
    "SUM(label) AS pos, COUNT(*) - SUM(label) AS neg FROM s GROUP BY bucket), "
    "c AS (SELECT bucket, "
    "SUM(pos) OVER (ORDER BY bucket DESC) AS cum_pos, "
    "SUM(neg) OVER (ORDER BY bucket DESC) AS cum_neg, "
    "SUM(pos) OVER () AS tot_pos FROM b)"
)


@query(
    "q_pr_points",
    oracle=(
        _PR_SQL + " SELECT bucket, "
        + sql_round("cum_pos * 1.0 / (cum_pos + cum_neg)", 6) + " AS precision, "
        + sql_round("cum_pos * 1.0 / tot_pos", 6) + " AS recall FROM c"
    ),
    tags=("ml", "metric"),
)
def q_pr_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned precision-recall curve: precision and recall at each
    descending score threshold — the curve fraud teams read instead of
    ROC once positives are rare (q_roc_points' FPR axis hides a 100×
    false-alarm blowup at 0.2% prevalence; precision shows it).

    Scale shape: identical to q_roc_points — one histogram aggregate
    (map-side combinable), cumulative windows over the ≤51-row bucket
    table only."""
    s = scored(spark, sf_dir)
    b = s.groupBy(F.floor(F.col("score") * 50).cast("bigint").alias("bucket")).agg(
        F.sum("label").alias("pos"),
        (F.count("*") - F.sum("label")).alias("neg"),
    )
    # bounded: ≤51 buckets by construction
    w_cum = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = b.select(
        "bucket",
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("neg").over(w_cum).alias("cum_neg"),
        F.sum("pos").over(w_all).alias("tot_pos"),
    )
    return c.select(
        "bucket",
        pround(F.col("cum_pos") * 1.0 / (F.col("cum_pos") + F.col("cum_neg")), 6).alias(
            "precision"
        ),
        pround(F.col("cum_pos") * 1.0 / F.col("tot_pos"), 6).alias("recall"),
    )


@query(
    "q_avg_precision",
    oracle=(
        _PR_SQL + ", r AS (SELECT bucket, "
        "cum_pos * 1.0 / (cum_pos + cum_neg) AS prec, "
        "cum_pos * 1.0 / tot_pos AS rec, "
        "COALESCE(LAG(cum_pos * 1.0 / tot_pos) OVER (ORDER BY bucket DESC), 0)"
        " AS rec_prev FROM c) "
        "SELECT " + sql_round(
            "CAST(SUM(CAST(FLOOR((rec - rec_prev) * prec * 1000000000 + 0.5) "
            "AS BIGINT)) AS DOUBLE) / 1000000000",
            6,
        ) + " AS ap FROM r"
    ),
    tags=("ml", "metric"),
)
def q_avg_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (AP): Σ (R_i − R_{i−1})·P_i over descending
    thresholds — sklearn's average_precision_score on the binned
    curve; the scalar PR summary that, unlike trapezoidal PR-AUC,
    never optimistically interpolates. Same bounded bucket-table plan
    as q_pr_points; each ΔR·P step folds to 1e-9 fixed-point units so
    the final sum over the ≤51 rows is an exact integer sum."""
    s = scored(spark, sf_dir)
    b = s.groupBy(F.floor(F.col("score") * 50).cast("bigint").alias("bucket")).agg(
        F.sum("label").alias("pos"),
        (F.count("*") - F.sum("label")).alias("neg"),
    )
    w_cum = Window.orderBy(F.desc("bucket")).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = b.select(
        "bucket",
        F.sum("pos").over(w_cum).alias("cum_pos"),
        F.sum("neg").over(w_cum).alias("cum_neg"),
        F.sum("pos").over(w_all).alias("tot_pos"),
    )
    w_lag = Window.orderBy(F.desc("bucket"))
    r = c.select(
        (F.col("cum_pos") * 1.0 / (F.col("cum_pos") + F.col("cum_neg"))).alias("prec"),
        (F.col("cum_pos") * 1.0 / F.col("tot_pos")).alias("rec"),
        F.coalesce(
            F.lag(F.col("cum_pos") * 1.0 / F.col("tot_pos")).over(w_lag), F.lit(0.0)
        ).alias("rec_prev"),
    )
    # per-step fixed-point units before the sum (layout-proof; the
    # q_chi2 discipline — round-7 self-review)
    step_units = F.floor(
        (F.col("rec") - F.col("rec_prev")) * F.col("prec") * 1000000000
        + F.lit(0.5)
    ).cast("bigint")
    return r.agg(
        pround(F.sum(step_units).cast("double") / 1000000000, 6).alias("ap")
    )


@query(
    "q_mcc",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), c AS ("
        "SELECT CAST(SUM(CASE WHEN label = 1 AND score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
        "CAST(SUM(CASE WHEN label = 0 AND score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
        "CAST(SUM(CASE WHEN label = 1 AND score <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn, "
        "CAST(SUM(CASE WHEN label = 0 AND score <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn FROM s) "
        "SELECT " + sql_round("(tp + tn) * 1.0 / (tp + fp + fn + tn)", 6)
        + " AS accuracy, "
        + sql_round(
            "(tp * 1.0 / NULLIF(tp + fn, 0) + tn * 1.0 / NULLIF(tn + fp, 0)) / 2",
            6,
        )
        + " AS balanced_accuracy, "
        + sql_round(
            "(CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) "
            "/ NULLIF(SQRT(CAST(tp + fp AS DOUBLE)) "
            "* SQRT(CAST(tp + fn AS DOUBLE)) * SQRT(CAST(tn + fp AS DOUBLE)) "
            "* SQRT(CAST(tn + fn AS DOUBLE)), 0)",
            6,
        )
        + " AS mcc, "
        + sql_round(
            "2.0 * (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn) / NULLIF("
            "CAST(tp + fp AS DOUBLE) * (fp + tn) "
            "+ CAST(tp + fn AS DOUBLE) * (fn + tn), 0)",
            6,
        )
        + " AS kappa FROM c"
    ),
    tags=("ml", "metric"),
)
def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement scalars from one confusion pass:
    accuracy, balanced accuracy, Matthews correlation coefficient, and
    Cohen's kappa — the metrics that stay honest at fraud's class
    imbalance (accuracy at 0.2% prevalence is 99.8% for the
    always-predict-0 model; MCC and kappa are ~0 for it). MCC's denominator multiplies
    FOUR marginals (can overflow 64-bit at ~10⁹ rows), so each takes
    its own SQRT as a double first — a fixed multiplication order both
    engines share; kappa's products stay within BIGINT by pairing.
    One aggregate over the scored scan — no shuffle beyond the
    4-counter fold."""
    s = scored(spark, sf_dir)
    pred = F.col("score") > 0.5
    lab = F.col("label") == 1
    c = s.agg(
        F.sum(F.when(lab & pred, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(~lab & pred, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(lab & ~pred, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~lab & ~pred, 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    num = tp.cast("double") * tn - fp.cast("double") * fn
    mcc_den = (
        F.sqrt((tp + fp).cast("double"))
        * F.sqrt((tp + fn).cast("double"))
        * F.sqrt((tn + fp).cast("double"))
        * F.sqrt((tn + fn).cast("double"))
    )
    kap_den = (tp + fp).cast("double") * (fp + tn) + (tp + fn).cast("double") * (
        fn + tn
    )
    return c.select(
        pround((tp + tn) * 1.0 / (tp + fp + fn + tn), 6).alias("accuracy"),
        pround(
            (
                tp * 1.0 / F.nullif(tp + fn, F.lit(0))
                + tn * 1.0 / F.nullif(tn + fp, F.lit(0))
            )
            / 2,
            6,
        ).alias("balanced_accuracy"),
        pround(num / F.nullif(mcc_den, F.lit(0.0)), 6).alias("mcc"),
        pround(2.0 * num / F.nullif(kap_den, F.lit(0.0)), 6).alias("kappa"),
    )


@query(
    "q_logloss",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), t AS ("
        "SELECT CAST(FLOOR(-(CASE WHEN label = 1 THEN LN(score) "
        "ELSE LN(1.0 - score) END) * 1000000000 + 0.5) AS BIGINT) AS u FROM s) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        + sql_round("CAST(SUM(u) AS DOUBLE) / 1000000000 / COUNT(*)", 6)
        + " AS logloss FROM t"
    ),
    tags=("ml", "metric"),
)
def q_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary cross-entropy (log-loss) of the published scorer — the
    eval_metric the reference trains against (train_model.py:74,
    'logloss') but never reports, and the proper scoring rule that
    q_brier complements. Scores here live in ~[0.12, 0.77] (bounded
    logit), so no clamping epsilon is needed; each row's −ln term
    folds to 1e-9 fixed-point units (exact per-row op) and the total
    is an exact integer sum — layout-proof, the functions.fixed_sum
    discipline. One map-side-combinable aggregate over the scored
    scan."""
    s = scored(spark, sf_dir)
    term = -F.when(F.col("label") == 1, F.log("score")).otherwise(
        F.log(F.lit(1.0) - F.col("score"))
    )
    u = F.floor(term * 1000000000 + F.lit(0.5)).cast("bigint")
    t = s.select(u.alias("u"))
    return t.agg(
        F.count("*").cast("bigint").alias("n"),
        pround(F.sum("u").cast("double") / 1000000000 / F.count("*"), 6).alias(
            "logloss"
        ),
    )


@query(
    "q_parity_gap",
    oracle=(
        "WITH s AS (" + SCORED_SQL + "), "
        "seg AS (SELECT c.c_mktsegment AS segment, "
        "CASE WHEN s.score > 0.5 THEN 1 ELSE 0 END AS pred, s.label "
        "FROM s JOIN orders o ON s.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey), "
        "g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n, "
        "SUM(pred) AS np, SUM(label) AS nl, "
        "SUM(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) AS tp, "
        "SUM(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END) AS fp "
        "FROM seg GROUP BY segment), "
        "t AS (SELECT SUM(n) AS n, SUM(np) AS np, SUM(nl) AS nl, "
        "SUM(tp) AS tp, SUM(fp) AS fp FROM g) "
        "SELECT g.segment, g.n, "
        + sql_round("g.np * 1.0 / g.n", 6) + " AS flag_rate, "
        + sql_round("g.tp * 1.0 / g.nl", 6) + " AS tpr, "
        + sql_round("g.fp * 1.0 / (g.n - g.nl)", 6) + " AS fpr, "
        + sql_round("g.np * 1.0 / g.n - t.np * 1.0 / t.n", 6)
        + " AS flag_rate_gap, "
        + sql_round("g.tp * 1.0 / g.nl - t.tp * 1.0 / t.nl", 6) + " AS tpr_gap "
        "FROM g CROSS JOIN t"
    ),
    tags=("ml", "fairness", "monitor"),
)
def q_parity_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment fairness audit of the published fraud model:
    flag rate (demographic parity), TPR (equal opportunity) and FPR
    per customer market segment, each with its gap against the
    overall book — the screen a model-risk review runs before a
    fraud model ships, because a flag-rate or missed-fraud rate that
    differs by segment is both a compliance finding and a fraud-ops
    blind spot. Extends q_auc_by_segment's discrimination view with
    the threshold-level rates regulators actually quote.

    Exactness: every rate is an integer/integer ratio from exact
    counts (the q_confusion discipline), gaps are one subtraction of
    two such ratios — identical IEEE on both engines, then 6-dp
    fixed-point.

    Scale: score the fact scan once (codegen'd sigmoid), one
    co-partitioned join chain to the customer dimension, one
    map-side-combinable count aggregate per segment (|segments| ≤ 5
    rows out), overall totals broadcast back."""
    s = scored(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        s.join(o, s.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            (F.col("score") > 0.5).cast("int").alias("pred"),
            "label",
        )
    )
    g = seg.groupBy("segment").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pred").alias("np"),
        F.sum("label").alias("nl"),
        F.sum(((F.col("pred") == 1) & (F.col("label") == 1)).cast("int")).alias("tp"),
        F.sum(((F.col("pred") == 1) & (F.col("label") == 0)).cast("int")).alias("fp"),
    )
    t = g.agg(
        F.sum("n").alias("tn_"),
        F.sum("np").alias("tnp"),
        F.sum("nl").alias("tnl"),
        F.sum("tp").alias("ttp"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "segment",
            "n",
            pround(F.col("np") * 1.0 / F.col("n"), 6).alias("flag_rate"),
            pround(F.col("tp") * 1.0 / F.col("nl"), 6).alias("tpr"),
            pround(F.col("fp") * 1.0 / (F.col("n") - F.col("nl")), 6).alias("fpr"),
            pround(
                F.col("np") * 1.0 / F.col("n") - F.col("tnp") * 1.0 / F.col("tn_"),
                6,
            ).alias("flag_rate_gap"),
            pround(
                F.col("tp") * 1.0 / F.col("nl") - F.col("ttp") * 1.0 / F.col("tnl"),
                6,
            ).alias("tpr_gap"),
        )
    )


@query(
    "q_cohen_kappa",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), c AS ("
        "SELECT CAST(SUM(CASE WHEN label = 1 AND score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
        "CAST(SUM(CASE WHEN label = 0 AND score > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
        "CAST(SUM(CASE WHEN label = 1 AND score <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn, "
        "CAST(SUM(CASE WHEN label = 0 AND score <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn FROM s), "
        "k AS (SELECT tp + fp + fn + tn AS n, "
        "CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS po, "
        "(CAST(tp + fp AS DOUBLE) * (tp + fn) + CAST(fn + tn AS DOUBLE) * (fp + tn)) "
        "/ (CAST(tp + fp + fn + tn AS DOUBLE) * (tp + fp + fn + tn)) AS pe FROM c) "
        "SELECT CAST(n AS BIGINT) AS n, "
        + sql_round("po", 6) + " AS accuracy, "
        + sql_round("pe", 6) + " AS expected_accuracy, "
        + sql_round("(po - pe) / (1 - pe)", 6) + " AS kappa FROM k"
    ),
    tags=("ml", "metric"),
)
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the 0.5-threshold classifier: chance-corrected
    agreement κ = (p_o − p_e)/(1 − p_e) between predictions and
    labels, with the observed and chance-expected accuracies — the
    imbalance-honest companion to raw accuracy (a 99%-negative fraud
    table gives a constant-0 model p_o ≈ 0.99 but κ ≈ 0) next to
    q_mcc's correlation view of the same confusion matrix.

    Exactness: one conditional-sum confusion pass (exact integers);
    κ/p_o/p_e are scalar IEEE formulas on those integers — identical
    on both engines. The pairwise products sit far inside double's
    exact-integer range until n ~ 9e7 per cell pair, and p_e's ratio
    form keeps the scalars in [0, 1] at any n.

    Scale: identical single map-side-combinable aggregate as q_prf —
    no extra shuffle, no new scan."""
    s = scored(spark, sf_dir)
    pred = F.col("score") > 0.5
    lab = F.col("label") == 1
    agg = s.agg(
        F.sum(F.when(lab & pred, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(~lab & pred, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(lab & ~pred, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~lab & ~pred, 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = F.col("tp"), F.col("fp"), F.col("fn"), F.col("tn")
    n = tp + fp + fn + tn
    po = (tp + tn).cast("double") / n
    pe = (
        (tp + fp).cast("double") * (tp + fn) + (fn + tn).cast("double") * (fp + tn)
    ) / (n.cast("double") * n)
    return agg.select(
        n.cast("bigint").alias("n"),
        pround(po, 6).alias("accuracy"),
        pround(pe, 6).alias("expected_accuracy"),
        pround((po - pe) / (1 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Decision-stump training (round 9 batch 4): EXACT optimal Gini split
# on the published model score — the one training operator with a full
# DuckDB oracle (every other training op is rows-only by nature; a
# stump's split search is a deterministic aggregate, so it hashes).
# ---------------------------------------------------------------------------


@query(
    "q_stump",
    oracle=(
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY score), "
        "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS p FROM g), "
        "c AS (SELECT score, "
        "CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum_n, "
        "CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cum_p FROM g), "
        "e AS (SELECT score, cum_n, cum_p, n, p, "
        "CAST(cum_n AS DOUBLE) AS nl, CAST(cum_p AS DOUBLE) AS pl, "
        "CAST(n - cum_n AS DOUBLE) AS nr, CAST(p - cum_p AS DOUBLE) AS pr "
        "FROM c, t WHERE cum_n < n), "
        "k AS (SELECT score, cum_n, cum_p, n, p, "
        "(nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) "
        "+ (nr - (pr * pr + (nr - pr) * (nr - pr)) / nr) AS key FROM e), "
        "b AS (SELECT * FROM k ORDER BY key, score LIMIT 1) "
        "SELECT score AS threshold, cum_n AS n_left, cum_p AS pos_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        "CAST(p - cum_p AS BIGINT) AS pos_right, "
        + sql_round("key / n", 6) + " AS gini_split, "
        + sql_round(
            "1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n) "
            "- (CAST(n - p AS DOUBLE) / n) * (CAST(n - p AS DOUBLE) / n)",
            6,
        )
        + " AS gini_base, "
        + sql_round(
            "(1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n) "
            "- (CAST(n - p AS DOUBLE) / n) * (CAST(n - p AS DOUBLE) / n)) "
            "- key / n",
            6,
        )
        + " AS gain FROM b"
    ),
    tags=("ml", "train", "split"),
)
def q_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-1 decision tree (stump) on the published model
    score by EXACT Gini split search: for every candidate threshold t
    (left leaf: score ≤ t), the weighted Gini impurity of the induced
    partition, minimized with a (impurity, threshold) deterministic
    tiebreak. The one TRAINING operator with a full DuckDB oracle —
    split search is a deterministic aggregate over exact counts, so it
    hash-verifies where fit()-style ops (q_train_auc, q_smote) are
    rows-only by nature. Doubles as exact operating-point selection:
    the threshold that best separates the classes in Gini terms.
    Ref: the reference tunes its RandomForest stumps upward from this
    primitive (train_model.py:57-66); sklearn's best-split scan is
    this exact computation per feature.

    Exactness: scores are pre-rounded to 6 dp (the scored() contract),
    so candidate thresholds are the ≤1e6-row distinct-score table;
    per-threshold (n≤, pos≤) are exact integer prefix sums, and the
    split key N·G(t) = Σ_side [n_s − (p_s² + (n_s−p_s)²)/n_s] is the
    same IEEE-double expression on both engines over those exact
    integers (identical bits, so the ORDER BY key, score argmin is
    engine-identical; dividing by the constant N is order-preserving
    and deferred to display). p_s² exceeds double's exact-integer
    range only past n ≈ 9.4e7 positives — beyond that both engines
    still compute identical doubles (same inputs, same ops), so the
    argmin stays parity-safe; document-scale drift of the DISPLAYED
    6-dp gini would need n ≈ 1e9+.

    Scale: the q_auc machinery verbatim — one map-side-combinable
    (score → cnt, pos) fold bounded by the 6-dp score domain (NOT row
    count), coarse-bucket offsets via a ≤1001-row broadcast self-join,
    within-bucket running sums under a PARTITIONED window (no global
    single-partition sort anywhere), and a top-1 ordered take. One
    shuffle agg + bounded-table ops."""
    s = scored(spark, sf_dir)
    per = (
        s.groupBy("score")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .withColumn("bucket", F.floor(F.col("score") * 1000).cast("bigint"))
    )
    btot = per.groupBy("bucket").agg(
        F.sum("cnt").alias("bcnt"), F.sum("pos").alias("bpos")
    )
    lower = btot.select(
        F.col("bucket").alias("lb"),
        F.col("bcnt").alias("lcnt"),
        F.col("bpos").alias("lpos"),
    )
    offs = (
        btot.join(F.broadcast(lower), F.col("lb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("lcnt"), F.lit(0)).alias("off_n"),
            F.coalesce(F.sum("lpos"), F.lit(0)).alias("off_p"),
        )
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.agg(
        F.sum("cnt").cast("bigint").alias("n"), F.sum("pos").cast("bigint").alias("p")
    )
    c = (
        per.join(F.broadcast(offs), "bucket")
        .select(
            "score",
            (F.col("off_n") + F.sum("cnt").over(w_in)).cast("bigint").alias("cum_n"),
            (F.col("off_p") + F.sum("pos").over(w_in)).cast("bigint").alias("cum_p"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum_n") < F.col("n"))
    )
    nl = F.col("cum_n").cast("double")
    pl = F.col("cum_p").cast("double")
    nr = (F.col("n") - F.col("cum_n")).cast("double")
    pr = (F.col("p") - F.col("cum_p")).cast("double")
    key = (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
        nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
    )
    best = (
        c.withColumn("key", key)
        .orderBy("key", "score")
        .limit(1)
    )
    nd = F.col("n").cast("double")
    pd_ = F.col("p").cast("double")
    base = 1.0 - (pd_ / nd) * (pd_ / nd) - ((nd - pd_) / nd) * ((nd - pd_) / nd)
    return best.select(
        F.col("score").alias("threshold"),
        F.col("cum_n").alias("n_left"),
        F.col("cum_p").alias("pos_left"),
        (F.col("n") - F.col("cum_n")).cast("bigint").alias("n_right"),
        (F.col("p") - F.col("cum_p")).cast("bigint").alias("pos_right"),
        pround(F.col("key") / nd, 6).alias("gini_split"),
        pround(base, 6).alias("gini_base"),
        pround(base - F.col("key") / nd, 6).alias("gain"),
    )


# ---------------------------------------------------------------------------
# Boosted stumps (round 10, VERDICT r9 #5a): 3 rounds of EXACT
# AdaBoost over q_stump's bounded distinct-score machinery — the
# oracle-checked TRAINING frontier q_stump opened, extended to the
# reference's actual shape (an additive ensemble of axis splits,
# train_model.py:69-80), still hash-verifiable because every weighted
# error is an exact integer.
# ---------------------------------------------------------------------------

_BOOST_ROUNDS = 3


def _boost_oracle() -> str:
    """DuckDB twin of the fixed-3-round exact AdaBoost. The key trick:
    AdaBoost's reweighting w <- w * exp(+-alpha) / Z is RATIONAL when
    tracked as integer numerators — after round j a point's weight
    numerator multiplies by (d_j - e_j) if misclassified else e_j
    (e_j = round-j weighted error units, d_j = that round's
    denominator), so every candidate stump's weighted error is an
    exact HUGEINT and the per-round argmin is engine-identical. Floats
    appear only in the displayed error/alpha/accuracy scalars and the
    ensemble margin sign (the margin sums alpha·h terms with
    alpha = 0.5·LN(...), so the sign inherits the LN house 1-ulp
    risk — see the query docstring)."""
    R = _BOOST_ROUNDS
    parts = [
        f"WITH s AS ({SCORED_SQL}), ",
        "per AS MATERIALIZED (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY score), ",
        "t AS MATERIALIZED (SELECT MAX(score) AS smax FROM per), ",
    ]
    for r in range(1, R + 1):
        if r == 1:
            parts.append(
                "w1 AS MATERIALIZED (SELECT score, "
                "CAST(pos AS HUGEINT) AS wp, "
                "CAST(cnt - pos AS HUGEINT) AS wn FROM per), "
            )
        else:
            fp = " * ".join(
                f"(CASE WHEN (pol{j} = 1) = (p.score <= t{j}) "
                f"THEN d{j} - e{j} ELSE e{j} END)"
                for j in range(1, r)
            )
            fn = " * ".join(
                f"(CASE WHEN (pol{j} = 1) = (p.score > t{j}) "
                f"THEN d{j} - e{j} ELSE e{j} END)"
                for j in range(1, r)
            )
            srcs = ", ".join(f"b{j}" for j in range(1, r))
            parts.append(
                f"w{r} AS MATERIALIZED (SELECT p.score, "
                f"CAST(p.pos AS HUGEINT) * {fp} AS wp, "
                f"CAST(p.cnt - p.pos AS HUGEINT) * {fn} AS wn "
                f"FROM per p, {srcs}), "
            )
        parts.append(
            f"c{r} AS (SELECT score, "
            f"SUM(wp) OVER (ORDER BY score) AS cwp, "
            f"SUM(wn) OVER (ORDER BY score) AS cwn FROM w{r}), "
            f"tw{r} AS (SELECT CAST(SUM(wp) AS HUGEINT) AS wpt, "
            f"CAST(SUM(wn) AS HUGEINT) AS wnt FROM w{r}), "
            f"b{r} AS MATERIALIZED (SELECT score AS t{r}, "
            "CASE WHEN cwp + (wnt - cwn) <= (wpt + wnt) - (cwp + (wnt - cwn)) "
            f"THEN 1 ELSE -1 END AS pol{r}, "
            "LEAST(cwp + (wnt - cwn), (wpt + wnt) - (cwp + (wnt - cwn))) "
            f"AS e{r}, wpt + wnt AS d{r} "
            f"FROM c{r}, tw{r}, t WHERE score < smax "
            f"ORDER BY e{r}, t{r} LIMIT 1), "
        )

    def alpha(j: int) -> str:
        return f"(0.5 * LN(CAST(d{j} - e{j} AS DOUBLE) / CAST(e{j} AS DOUBLE)))"

    def h(j: int) -> str:
        return f"(CASE WHEN p.score > t{j} THEN pol{j} ELSE -pol{j} END)"

    accs = ", ".join(
        "CAST(SUM(CASE WHEN "
        + " + ".join(f"{alpha(j)} * {h(j)}" for j in range(1, r + 1))
        + " > 0 THEN p.pos ELSE p.cnt - p.pos END) AS HUGEINT) AS u" + str(r)
        for r in range(1, R + 1)
    )
    allb = ", ".join(f"b{j}" for j in range(1, R + 1))
    parts.append(
        f"acc AS (SELECT CAST(SUM(cnt) AS HUGEINT) AS nn, {accs} "
        f"FROM per p, {allb}) "
    )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, t{r} AS threshold, "
        f"CAST(pol{r} AS BIGINT) AS polarity, "
        + sql_round(f"CAST(e{r} AS DOUBLE) / CAST(d{r} AS DOUBLE)", 6)
        + " AS w_err, "
        + sql_round(alpha(r), 6)
        + " AS alpha, "
        + sql_round(f"CAST(u{r} AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + f" AS acc FROM {allb}, acc"
        for r in range(1, R + 1)
    )
    return "".join(parts) + selects


@query(
    "q_boosted_stumps",
    oracle=_boost_oracle(),
    tags=("ml", "train", "boost"),
    eager=True,
)
def q_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 3-round AdaBoost ensemble of decision stumps on the
    published model score by EXACT weighted split search — the
    additive-ensemble extension of q_stump and the closest
    oracle-checked analog of the reference's tree-ensemble training
    loop (train_model.py:69-80). Each round emits (threshold,
    polarity, weighted error, alpha, ensemble train accuracy).

    Exactness: AdaBoost's multiplicative reweighting stays RATIONAL —
    after round j every point's weight numerator multiplies by
    (d_j − e_j) if misclassified else e_j, so round-r candidate
    errors are exact DECIMAL(38,0)/HUGEINT integers (numerators grow
    like n^(2r-1): within 38 digits through round 3 for n up to
    ~1.5e9 rows; PAST that the engines diverge in failure mode —
    DuckDB's HUGEINT overflow raises while non-ANSI Spark would
    silently NULL the products, so _pick_stump NULL-propagates an
    overflowed candidate's e: ascending ORDER BY puts NULLS FIRST so
    that candidate is guaranteed to be the picked row, and a
    raise_error on the picked 1-ROW table fails loudly on the Spark
    side too — without re-evaluating the u/d product-sum trees per
    candidate, which the r12 per-candidate guard did at a measured
    2x wall cost, VERDICT r12 #1). The per-round
    argmin ORDER BY (e, score) compares exact integers; floats appear
    in the displayed scalars AND the ensemble-margin sign — the
    margin is Σ alpha_j·h_j with alpha = 0.5·LN(...), so its sign
    inherits the q_lr/q_chi2 LN house 1-ulp library risk (a score
    group whose margin lands within ~1 ulp of 0 could flip acc by
    cnt/nn between engines; displayed scalars round at 6 dp).

    Scale: ONE fact fold to the distinct-score table (bounded by the
    6-dp score domain, the q_auc/q_stump discipline) and ONE raw
    prefix-count pass over it (coarse 1e-3-bucket offsets via a
    <=1001-row broadcast self-join plus a PARTITIONED within-bucket
    window — never a global single-partition sort), checkpointed once.
    Every round's WEIGHTED prefix sums are then CLOSED FORMS over the
    raw counts: the weight of a point after round j is piecewise
    constant with a breakpoint at t_j, so cum_w(t) is a linear
    combination of cp(t)/cn(t) and the scalars cp(t_j)/cn(t_j) carried
    on the chosen-stump row — each round costs one scan of the
    checkpointed cum table + a TakeOrdered(1), zero additional
    shuffles (the first cut re-ran the bucket-offset window machinery
    per round: 7.9 s warm at sf0.1; this form reads 3.0-4.4 s warm
    isolated — the residual is the fact fold + the one checkpointed
    cum pass, not per-round work). One more
    scan folds the three ensemble accuracies. Eager by construction
    (the checkpointed stump chain); the registry eager contract
    applies."""
    s = scored(spark, sf_dir)
    per = s.groupBy("score").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )

    # raw prefix counts over score — computed ONCE, bucket-offset form
    b = per.withColumn("bucket", F.floor(F.col("score") * 1000).cast("bigint"))
    btot = b.groupBy("bucket").agg(
        F.sum("cnt").alias("bc"), F.sum("pos").alias("bp")
    )
    lower = btot.select(
        F.col("bucket").alias("lb"),
        F.col("bc").alias("lc"),
        F.col("bp").alias("lp"),
    )
    offs = (
        btot.join(F.broadcast(lower), F.col("lb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("lc"), F.lit(0)).alias("oc"),
            F.coalesce(F.sum("lp"), F.lit(0)).alias("op"),
        )
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum0 = (
        b.join(F.broadcast(offs), "bucket")
        .select(
            "score",
            "cnt",
            "pos",
            (F.col("op") + F.sum("pos").over(w_in)).cast("bigint").alias("cp"),
            (
                F.col("oc")
                - F.col("op")
                + F.sum(F.col("cnt") - F.col("pos")).over(w_in)
            )
            .cast("bigint")
            .alias("cn"),
        )
        .localCheckpoint()
    )
    tot = cum0.agg(
        F.max("score").alias("smax"),
        F.max("cp").alias("tp"),
        F.max("cn").alias("tn"),
    ).localCheckpoint()
    cand0 = cum0.crossJoin(F.broadcast(tot)).filter(F.col("score") < F.col("smax"))
    dec = "decimal(38,0)"

    def _pick_stump(cands, u, d, r: int):
        # fail LOUDLY if the DECIMAL(38,0) weight numerators overflow
        # (non-ANSI Spark silently NULLs them, and DuckDB's HUGEINT
        # overflow raises; ADVICE r10 #2). Guard the INPUTS, not the
        # least() result: least() skips NULL operands, so a NULLed d
        # with a representable u would otherwise fall through as e = u
        # and pol = -1 silently (ADVICE r11 #1). Cost discipline
        # (VERDICT r12 #1): the r12 form wrapped every candidate's
        # e/pol in F.when(bad, raise_error(...)), which re-evaluated
        # the full u/d product-sum trees ~4x per candidate row and
        # doubled the query's wall (5.3 -> 10.1 s driver). Instead:
        # (1) materialize u/d ONCE per candidate behind an alias
        # boundary (CollapseProject won't inline a non-cheap alias
        # referenced multiple times, so each evaluates once);
        # (2) NULL-PROPAGATE e on any overflow — ascending ORDER BY
        # puts NULLS FIRST, so an overflowed candidate is guaranteed
        # to BE the picked row; (3) raise_error fires on the picked
        # 1-row table only — equally loud, zero per-candidate cost.
        # Inside the documented n^(2r-1) < 10^38 headroom the NULL
        # branch never materializes.
        pre = cands.select(
            F.col("score"),
            F.col("cp"),
            F.col("cn"),
            u.cast(dec).alias("_u"),
            d.cast(dec).alias("_d"),
        )
        uu, dd = F.col("_u"), F.col("_d")
        bad = uu.isNull() | dd.isNull()
        e = F.when(bad, F.lit(None).cast(dec)).otherwise(
            F.least(uu, dd - uu)
        )
        pol_pos = uu <= dd - uu
        picked = (
            pre.select(
                F.col("score").alias(f"t{r}"),
                F.when(pol_pos, F.lit(1)).otherwise(F.lit(-1)).alias(f"pol{r}"),
                e.alias(f"e{r}"),
                dd.alias(f"d{r}"),
                F.col("cp").alias(f"cp{r}"),
                F.col("cn").alias(f"cn{r}"),
            )
            # explicit NULLS FIRST: the loud-failure invariant (an
            # overflowed NULL-e candidate must BE the picked row, so
            # the raise_error below fires) is stated in code rather
            # than inherited from ascending-order defaults
            # (ADVICE r13 #4)
            .orderBy(F.asc_nulls_first(f"e{r}"), F.asc(f"t{r}"))
            .limit(1)
        )
        overflow = F.raise_error(
            F.lit(
                "q_boosted_stumps: DECIMAL(38,0) weight-numerator "
                "overflow — exactness headroom exhausted"
            )
        ).cast(dec)
        guarded = picked.withColumn(
            f"e{r}",
            F.when(F.col(f"e{r}").isNull(), overflow).otherwise(
                F.col(f"e{r}")
            ),
        )
        return guarded.localCheckpoint()

    def ab(j: int):
        up = F.col(f"d{j}") - F.col(f"e{j}")
        A = F.when(F.col(f"pol{j}") == 1, up).otherwise(F.col(f"e{j}"))
        B = F.when(F.col(f"pol{j}") == 1, F.col(f"e{j}")).otherwise(up)
        return A, B

    # round 1: uniform weights — the raw counts ARE the weighted cums
    u1 = (F.col("cp") + (F.col("tn") - F.col("cn"))).cast(dec)
    d1 = (F.col("tp") + F.col("tn")).cast(dec)
    b1 = _pick_stump(cand0, u1, d1, 1)

    # round 2: one breakpoint t1 — cum_w(t) is linear in cp(t)/cn(t)
    # with the scalars cp(t1)/cn(t1) carried on b1
    c2 = cand0.crossJoin(F.broadcast(b1))
    A1, B1 = ab(1)
    le1 = F.col("score") <= F.col("t1")
    cpm1 = F.when(le1, F.col("cp")).otherwise(F.col("cp1"))
    cnm1 = F.when(le1, F.col("cn")).otherwise(F.col("cn1"))
    cwp2 = A1 * cpm1 + B1 * (F.col("cp") - cpm1)
    cwn2 = B1 * cnm1 + A1 * (F.col("cn") - cnm1)
    WP2 = A1 * F.col("cp1") + B1 * (F.col("tp") - F.col("cp1"))
    WN2 = B1 * F.col("cn1") + A1 * (F.col("tn") - F.col("cn1"))
    u2 = (cwp2 + (WN2 - cwn2)).cast(dec)
    d2 = (WP2 + WN2).cast(dec)
    b2 = _pick_stump(c2, u2, d2, 2)

    # round 3: two breakpoints — inclusion-exclusion over the
    # (s<=t1, s<=t2) quadrants, coefficients A/B products
    c3 = cand0.crossJoin(F.broadcast(b1)).crossJoin(F.broadcast(b2))
    A2, B2 = ab(2)
    le2 = F.col("score") <= F.col("t2")
    t1le2 = F.col("t1") <= F.col("t2")
    cpm2 = F.when(le2, F.col("cp")).otherwise(F.col("cp2"))
    cnm2 = F.when(le2, F.col("cn")).otherwise(F.col("cn2"))
    cp12 = F.when(t1le2, F.col("cp1")).otherwise(F.col("cp2"))
    cn12 = F.when(t1le2, F.col("cn1")).otherwise(F.col("cn2"))
    cpm12 = F.when(le1 & le2, F.col("cp")).otherwise(cp12)
    cnm12 = F.when(le1 & le2, F.col("cn")).otherwise(cn12)
    cwp3 = (
        A1 * A2 * cpm12
        + A1 * B2 * (cpm1 - cpm12)
        + B1 * A2 * (cpm2 - cpm12)
        + B1 * B2 * (F.col("cp") - cpm1 - cpm2 + cpm12)
    )
    cwn3 = (
        B1 * B2 * cnm12
        + B1 * A2 * (cnm1 - cnm12)
        + A1 * B2 * (cnm2 - cnm12)
        + A1 * A2 * (F.col("cn") - cnm1 - cnm2 + cnm12)
    )
    WP3 = (
        A1 * A2 * cp12
        + A1 * B2 * (F.col("cp1") - cp12)
        + B1 * A2 * (F.col("cp2") - cp12)
        + B1 * B2 * (F.col("tp") - F.col("cp1") - F.col("cp2") + cp12)
    )
    WN3 = (
        B1 * B2 * cn12
        + B1 * A2 * (F.col("cn1") - cn12)
        + A1 * B2 * (F.col("cn2") - cn12)
        + A1 * A2 * (F.col("tn") - F.col("cn1") - F.col("cn2") + cn12)
    )
    u3 = (cwp3 + (WN3 - cwn3)).cast(dec)
    d3 = (WP3 + WN3).cast(dec)
    b3 = _pick_stump(c3, u3, d3, 3)

    bests = [b1, b2, b3]
    wide = cum0
    for bb in bests:
        wide = wide.crossJoin(F.broadcast(bb))

    def alpha(j: int):
        return F.lit(0.5) * F.log(
            (F.col(f"d{j}") - F.col(f"e{j}")).cast("double")
            / F.col(f"e{j}").cast("double")
        )

    def hj(j: int):
        return F.when(
            F.col("score") > F.col(f"t{j}"), F.col(f"pol{j}")
        ).otherwise(-F.col(f"pol{j}"))

    acc_aggs = [F.sum("cnt").cast("bigint").alias("nn")]
    for r in range(1, _BOOST_ROUNDS + 1):
        margin = alpha(1) * hj(1)
        for j in range(2, r + 1):
            margin = margin + alpha(j) * hj(j)
        acc_aggs.append(
            F.sum(
                F.when(margin > 0, F.col("pos")).otherwise(
                    F.col("cnt") - F.col("pos")
                )
            )
            .cast("bigint")
            .alias(f"u{r}")
        )
    accrow = wide.agg(*acc_aggs)

    out = accrow
    for bb in bests:
        out = out.crossJoin(F.broadcast(bb))
    cols = []
    for r in range(1, _BOOST_ROUNDS + 1):
        cols += [
            pround(
                F.col(f"e{r}").cast("double") / F.col(f"d{r}").cast("double"), 6
            ).alias(f"werr{r}"),
            pround(alpha(r), 6).alias(f"alpha{r}"),
            pround(
                F.col(f"u{r}").cast("double") / F.col("nn").cast("double"), 6
            ).alias(f"acc{r}"),
        ]
    wide2 = out.select(
        *[F.col(f"t{r}") for r in range(1, _BOOST_ROUNDS + 1)],
        *[F.col(f"pol{r}") for r in range(1, _BOOST_ROUNDS + 1)],
        *cols,
    )
    stack_args = ", ".join(
        f"cast({r} as int), t{r}, cast(pol{r} as bigint), "
        f"werr{r}, alpha{r}, acc{r}"
        for r in range(1, _BOOST_ROUNDS + 1)
    )
    return wide2.select(
        F.expr(
            f"stack({_BOOST_ROUNDS}, {stack_args}) "
            "AS (round, threshold, polarity, w_err, alpha, acc)"
        )
    )


# ---------------------------------------------------------------------------
# Closed-form ridge regression (round 10 batch 4): the second
# oracle-checked TRAINING operator family next to the stump/boosting
# split search — an actual fitted linear model (weights + training
# RMSE), hash-exact because the normal equations are a fixed Cramer
# expression over exact integer moments and BOTH engines evaluate the
# SAME expression text.
# ---------------------------------------------------------------------------

_RIDGE_LAMBDA = 1.0


def _ridge_exprs() -> dict[str, str]:
    """Shared expression text for the 3x3 ridge solve — used verbatim
    by Spark (selectExpr) and DuckDB (oracle SQL), so every double op
    is the identical IEEE expression tree on both engines. Inputs are
    the integer moment columns (n, squ, sdu, syc, squ2, squdu, sdu2,
    squy, sduy) in 1e-4 fixed-point regressor units / cent response
    units; the design variables are x1 = quantity, x2 = discount,
    y = extendedprice / 1e5 (the scored() feature scaling)."""
    lam = repr(_RIDGE_LAMBDA)
    a = {
        "A11": "CAST(n AS DOUBLE)",
        "A12": "CAST(squ AS DOUBLE) / 10000",
        "A13": "CAST(sdu AS DOUBLE) / 10000",
        "A22": f"(CAST(squ2 AS DOUBLE) / 100000000 + {lam})",
        "A23": "CAST(squdu AS DOUBLE) / 100000000",
        "A33": f"(CAST(sdu2 AS DOUBLE) / 100000000 + {lam})",
        "b1": "CAST(syc AS DOUBLE) / 10000000",
        "b2": "CAST(squy AS DOUBLE) / 100000000000",
        "b3": "CAST(sduy AS DOUBLE) / 100000000000",
    }

    def det(c1, c2, c3):
        # 3x3 determinant of columns c1,c2,c3 (each a (r1,r2,r3) tuple
        # of expression names), expanded along the first row — fixed
        # association order on both engines
        return (
            f"({a[c1[0]]} * ({a[c2[1]]} * {a[c3[2]]} - {a[c2[2]]} * {a[c3[1]]}) "
            f"- {a[c2[0]]} * ({a[c1[1]]} * {a[c3[2]]} - {a[c1[2]]} * {a[c3[1]]}) "
            f"+ {a[c3[0]]} * ({a[c1[1]]} * {a[c2[2]]} - {a[c1[2]]} * {a[c2[1]]}))"
        )

    A1 = ("A11", "A12", "A13")  # symmetric matrix columns
    A2 = ("A12", "A22", "A23")
    A3 = ("A13", "A23", "A33")
    B = ("b1", "b2", "b3")
    d = det(A1, A2, A3)
    return {
        "w0": f"{det(B, A2, A3)} / {d}",
        "w1": f"{det(A1, B, A3)} / {d}",
        "w2": f"{det(A1, A2, B)} / {d}",
    }


def _ridge_oracle() -> str:
    e = _ridge_exprs()
    u = "CAST(FLOOR({c} * 10000 + 0.5) AS BIGINT)"
    qu, du = u.format(c="l_quantity"), u.format(c="l_discount")
    yc = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
    return (
        "WITH m AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({qu}) AS HUGEINT) AS squ, "
        f"CAST(SUM({du}) AS HUGEINT) AS sdu, "
        f"CAST(SUM({yc}) AS HUGEINT) AS syc, "
        f"CAST(SUM(CAST({qu} AS HUGEINT) * {qu}) AS HUGEINT) AS squ2, "
        f"CAST(SUM(CAST({qu} AS HUGEINT) * {du}) AS HUGEINT) AS squdu, "
        f"CAST(SUM(CAST({du} AS HUGEINT) * {du}) AS HUGEINT) AS sdu2, "
        f"CAST(SUM(CAST({qu} AS HUGEINT) * {yc}) AS HUGEINT) AS squy, "
        f"CAST(SUM(CAST({du} AS HUGEINT) * {yc}) AS HUGEINT) AS sduy "
        "FROM lineitem), "
        f"w AS MATERIALIZED (SELECT n, {e['w0']} AS w0, {e['w1']} AS w1, "
        f"{e['w2']} AS w2 FROM m), "
        "r AS (SELECT w.n, w.w0, w.w1, w.w2, "
        "CAST(SUM(CAST(FLOOR("
        "(l_extendedprice / 100000.0 - (w.w0 + w.w1 * l_quantity + w.w2 * l_discount)) "
        "* (l_extendedprice / 100000.0 - (w.w0 + w.w1 * l_quantity + w.w2 * l_discount)) "
        "* 1000000 + 0.5) AS BIGINT)) AS HUGEINT) AS ssr "
        "FROM lineitem, w GROUP BY w.n, w.w0, w.w1, w.w2) "
        "SELECT n, "
        + sql_round("w0", 6) + " AS w0, "
        + sql_round("w1", 6) + " AS w_qty, "
        + sql_round("w2", 6) + " AS w_disc, "
        + sql_round("SQRT(CAST(ssr AS DOUBLE) / 1000000 / n)", 6)
        + " AS rmse FROM r"
    )


@query(
    "q_ridge",
    oracle=_ridge_oracle(),
    tags=("ml", "train", "regression"),
)
def q_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (lambda=1, intercept unpenalized):
    fit extendedprice/1e5 ~ quantity + discount by solving the 3x3
    normal equations exactly, and report the fitted weights plus the
    training RMSE — a real TRAINED model with a full DuckDB oracle,
    extending the oracle-checked training frontier (q_stump,
    q_boosted_stumps) from split search to continuous-response
    fitting. Ref: the reference's sklearn models fit on exactly these
    engineered columns (train_model.py:31-33).

    Exactness: every moment (n, Σx, Σx², Σxy, ...) is an exact integer
    sum of 1e-4 fixed-point regressor units / cent response units in
    DECIMAL(38,0)/HUGEINT; the Cramer solve is ONE shared expression
    TEXT (_ridge_exprs) evaluated by Spark selectExpr and DuckDB
    alike, so every double op is the identical IEEE tree and the
    weights are bit-equal; the RMSE pass folds per-row squared
    residuals (identical doubles) to 1e-6 fixed point before the sum.

    Scale: two map-side-combinable fact folds — one for the moment
    matrix, one for residuals against the broadcast 1-row solution.
    No shuffle beyond the two 1-row aggregates, no window, no UDF;
    the solve itself is driver-free column arithmetic on a single
    row. The classic scale story for linear training: the data never
    moves, only the 3x3 moment matrix does."""
    li = load_table(spark, sf_dir, "lineitem")
    qu = fp_units(F.col("l_quantity"), 4)
    du = fp_units(F.col("l_discount"), 4)
    yc = fp_units(F.col("l_extendedprice"), 2)
    dec = "decimal(38,0)"
    m = li.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(qu.cast(dec)).alias("squ"),
        F.sum(du.cast(dec)).alias("sdu"),
        F.sum(yc.cast(dec)).alias("syc"),
        F.sum(qu.cast(dec) * qu).alias("squ2"),
        F.sum(qu.cast(dec) * du).alias("squdu"),
        F.sum(du.cast(dec) * du).alias("sdu2"),
        F.sum(qu.cast(dec) * yc).alias("squy"),
        F.sum(du.cast(dec) * yc).alias("sduy"),
    )
    e = _ridge_exprs()
    w = m.selectExpr(
        "n", f"{e['w0']} AS w0", f"{e['w1']} AS w1", f"{e['w2']} AS w2"
    )
    resid = (
        F.col("l_extendedprice") / 100000.0
        - (
            F.col("w0")
            + F.col("w1") * F.col("l_quantity")
            + F.col("w2") * F.col("l_discount")
        )
    )
    r = (
        li.crossJoin(F.broadcast(w))
        .groupBy("n", "w0", "w1", "w2")
        .agg(
            # resid*resid, NOT pow(resid, 2): POWER is not guaranteed
            # correctly rounded and could drift 1 ulp between engines
            # at a fixed-point floor boundary (the ADVICE r9 #1 class)
            F.sum(
                F.floor(resid * resid * 1000000 + F.lit(0.5)).cast(dec)
            ).alias("ssr")
        )
    )
    return r.select(
        "n",
        pround(F.col("w0"), 6).alias("w0"),
        pround(F.col("w1"), 6).alias("w_qty"),
        pround(F.col("w2"), 6).alias("w_disc"),
        pround(
            F.sqrt(F.col("ssr").cast("double") / 1000000 / F.col("n")), 6
        ).alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Depth-2 greedy tree (round 11, VERDICT r10 #5b): root split + the
# best split inside EACH branch, all on q_stump's exact Gini machinery
# over the bounded distinct-score table — the next rung on the
# oracle-checked training ladder toward the reference's depth-5 trees
# (train_model.py:69-80).
# ---------------------------------------------------------------------------


def _tree_cum_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE fact fold to the distinct-score table (bounded by the 6-dp
    score domain) + ONE prefix-count pass over it (coarse 1e-3-bucket
    offsets via a <=1001-row broadcast self-join + PARTITIONED
    within-bucket windows — never a global single-partition sort),
    checkpointed once. Shared by the q_tree2/q_tree3 training ladder:
    every node argmin at any depth is a bounded scan of this table."""
    return tree_cum_table(scored(spark, sf_dir))


def tree_cum_table(s: DataFrame) -> DataFrame:
    """The _tree_cum_table kernel on a (label, score) DataFrame —
    module-level so the env-gated 10x scale smoke
    (tests/test_unit_table_scale.py) can drive it on a replicated fact
    set and assert the distinct-score table stays FIXED while fact
    rows grow (the q_auc bucket-offset prefix's 100 TB claim)."""
    per = (
        s.groupBy("score")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .withColumn("bucket", F.floor(F.col("score") * 1000).cast("bigint"))
    )
    btot = per.groupBy("bucket").agg(
        F.sum("cnt").alias("bcnt"), F.sum("pos").alias("bpos")
    )
    lower = btot.select(
        F.col("bucket").alias("lb"),
        F.col("bcnt").alias("lcnt"),
        F.col("bpos").alias("lpos"),
    )
    offs = (
        btot.join(F.broadcast(lower), F.col("lb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("lcnt"), F.lit(0)).alias("off_n"),
            F.coalesce(F.sum("lpos"), F.lit(0)).alias("off_p"),
        )
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    return (
        per.join(F.broadcast(offs), "bucket")
        .select(
            "score",
            # per-score counts ride along for consumers that fold over
            # score groups (q_boosted_tree2's accuracy pass); Catalyst
            # prunes them everywhere else
            "cnt",
            "pos",
            (F.col("off_n") + F.sum("cnt").over(w_in)).cast("bigint").alias("cum_n"),
            (F.col("off_p") + F.sum("pos").over(w_in)).cast("bigint").alias("cum_p"),
        )
        .crossJoin(F.broadcast(tot))
        .localCheckpoint()
    )


def _tree_key(n0, p0, nb, pb):
    """Branch-offset Gini split key (Spark twin of _gini_key_sql)."""
    nl = (F.col("cum_n") - n0).cast("double")
    pl = (F.col("cum_p") - p0).cast("double")
    nr = (nb - (F.col("cum_n") - n0)).cast("double")
    pr = (pb - (F.col("cum_p") - p0)).cast("double")
    return (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
        nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
    )


def _tree_node(tag: str, cands, n0, p0, nb, pb):
    """Best split inside one branch: TakeOrdered(1) over the bounded
    candidate scan by the exact (key, score) order (Spark twin of
    _gini_node_sql)."""
    nbd = nb.cast("double")
    pbd = pb.cast("double")
    base = (
        F.lit(1.0)
        - (pbd / nbd) * (pbd / nbd)
        - ((nbd - pbd) / nbd) * ((nbd - pbd) / nbd)
    )
    k = F.col("key")
    return (
        cands.withColumn("key", _tree_key(n0, p0, nb, pb))
        .orderBy("key", "score")
        .limit(1)
        .select(
            F.lit(tag).alias("node"),
            F.col("score").alias("threshold"),
            (F.col("cum_n") - n0).cast("bigint").alias("n_left"),
            (F.col("cum_p") - p0).cast("bigint").alias("pos_left"),
            (nb - (F.col("cum_n") - n0)).cast("bigint").alias("n_right"),
            (pb - (F.col("cum_p") - p0)).cast("bigint").alias("pos_right"),
            pround(k / nbd, 6).alias("gini_split"),
            pround(base, 6).alias("gini_base"),
            pround(base - k / nbd, 6).alias("gain"),
        )
    )


def _gini_key_sql(n0: str, p0: str, nb: str, pb: str) -> str:
    """Branch-offset Gini split key at a candidate threshold (exact
    integer counts cast once to DOUBLE — identical IEEE expression on
    both engines). Shared by the q_tree2/q_tree3 oracles."""
    nl = f"CAST(cum_n - {n0} AS DOUBLE)"
    pl = f"CAST(cum_p - {p0} AS DOUBLE)"
    nr = f"CAST({nb} - (cum_n - {n0}) AS DOUBLE)"
    pr = f"CAST({pb} - (cum_p - {p0}) AS DOUBLE)"
    return (
        f"({nl} - ({pl} * {pl} + ({nl} - {pl}) * ({nl} - {pl})) / {nl}) "
        f"+ ({nr} - ({pr} * {pr} + ({nr} - {pr}) * ({nr} - {pr})) / {nr})"
    )


def _gini_base_sql(nb: str, pb: str) -> str:
    p_ = f"(CAST({pb} AS DOUBLE) / {nb})"
    q_ = f"(CAST({nb} - {pb} AS DOUBLE) / {nb})"
    return f"(1.0 - {p_} * {p_} - {q_} * {q_})"


def _gini_node_sql(
    tag: str, src: str, n0: str, p0: str, nb: str, pb: str
) -> str:
    k = _gini_key_sql(n0, p0, nb, pb)
    base = _gini_base_sql(nb, pb)
    return (
        f"SELECT '{tag}' AS node, score AS threshold, "
        f"CAST(cum_n - {n0} AS BIGINT) AS n_left, "
        f"CAST(cum_p - {p0} AS BIGINT) AS pos_left, "
        f"CAST({nb} - (cum_n - {n0}) AS BIGINT) AS n_right, "
        f"CAST({pb} - (cum_p - {p0}) AS BIGINT) AS pos_right, "
        + sql_round(f"({k}) / {nb}", 6) + " AS gini_split, "
        + sql_round(base, 6) + " AS gini_base, "
        + sql_round(f"{base} - ({k}) / {nb}", 6) + " AS gain "
        f"FROM {src} ORDER BY {k}, score LIMIT 1"
    )


def _tree2_oracle() -> str:
    """DuckDB twin of the depth-2 greedy Gini tree. Branch splits are
    CLOSED FORMS over the one materialized prefix-count table: with
    branch base offsets (n0, p0) and branch totals (nb, pb), a split
    at t inside the branch has left counts (cum_n(t)-n0, cum_p(t)-p0)
    — so each branch argmin is one scan of `c`, no re-aggregation."""
    node = _gini_node_sql

    return (
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY score), "
        "t AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS p FROM g), "
        "c AS MATERIALIZED (SELECT score, "
        "CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum_n, "
        "CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cum_p, "
        "n, p FROM g, t), "
        "root AS MATERIALIZED ("
        + node("root", "c WHERE cum_n < n", "0", "0", "n", "p")
        + "), "
        # left branch: thresholds strictly below the root threshold;
        # branch totals = root's left counts
        "lc AS (SELECT c.*, root.n_left AS nb, root.pos_left AS pb "
        "FROM c, root WHERE c.score < root.threshold), "
        "lpick AS MATERIALIZED ("
        + node("left", "lc WHERE cum_n < nb", "0", "0", "nb", "pb")
        + "), "
        # right branch: thresholds strictly above the root threshold
        # and below the branch max; base offsets = root's left counts
        "rc AS (SELECT c.*, root.n_left AS n0, root.pos_left AS p0, "
        "root.n_right AS nb, root.pos_right AS pb "
        "FROM c, root WHERE c.score > root.threshold), "
        "rpick AS MATERIALIZED ("
        + node("right", "rc WHERE cum_n - n0 < nb", "n0", "p0", "nb", "pb")
        + ") "
        "SELECT * FROM root UNION ALL SELECT * FROM lpick "
        "UNION ALL SELECT * FROM rpick"
    )


@query(
    "q_tree2",
    oracle=_tree2_oracle(),
    tags=("ml", "train", "split"),
    eager=True,
)
def q_tree2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-2 greedy decision tree on the published model
    score by EXACT Gini split search: q_stump's root split, then the
    best split INSIDE each branch (left: score <= t_root, right:
    score > t_root), each with its own branch-conditional impurity and
    gain. Emits up to 3 rows (node = root/left/right; a pure or
    single-valued branch emits none) — the next rung on the
    oracle-checked training ladder toward the reference's depth-5
    trees (train_model.py:69-80), still hash-verifiable because every
    candidate's branch-conditional counts are exact integers.

    Exactness: branch split keys are the q_stump expression on
    BRANCH-OFFSET exact integers — with branch base (n0, p0) and
    totals (nb, pb), the candidate at t has left counts
    (cum_n(t)-n0, cum_p(t)-p0) — the same IEEE doubles on both
    engines, so each ORDER BY (key, score) argmin is engine-identical;
    display values round at 6 dp.

    Scale: the q_stump/q_boosted_stumps discipline — ONE fact fold to
    the distinct-score table (bounded by the 6-dp score domain), ONE
    prefix-count pass over it (coarse 1e-3-bucket offsets via a
    <=1001-row broadcast self-join + PARTITIONED within-bucket
    windows, never a global single-partition sort), checkpointed once;
    the root and both branch argmins are then three scans of that
    bounded checkpointed table + TakeOrdered(1) each, with the root
    row broadcast into the branch scans. Depth d costs 2^d bounded
    scans, never a fact re-shuffle. Eager by construction (the
    checkpointed cum table); the registry eager contract applies."""
    c = _tree_cum_table(spark, sf_dir)
    _node = _tree_node
    zero = F.lit(0)
    root = _node(
        "root",
        c.filter(F.col("cum_n") < F.col("n")),
        zero,
        zero,
        F.col("n"),
        F.col("p"),
    ).localCheckpoint()
    cb = c.crossJoin(F.broadcast(root.select(
        F.col("threshold").alias("t0"),
        F.col("n_left").alias("bn0"),
        F.col("pos_left").alias("bp0"),
        F.col("n_right").alias("bn1"),
        F.col("pos_right").alias("bp1"),
    )))
    left = _node(
        "left",
        cb.filter(
            (F.col("score") < F.col("t0")) & (F.col("cum_n") < F.col("bn0"))
        ),
        zero,
        zero,
        F.col("bn0"),
        F.col("bp0"),
    )
    right = _node(
        "right",
        cb.filter(
            (F.col("score") > F.col("t0"))
            & (F.col("cum_n") - F.col("bn0") < F.col("bn1"))
        ),
        F.col("bn0"),
        F.col("bp0"),
        F.col("bn1"),
        F.col("bp1"),
    )
    return root.unionAll(left).unionAll(right)


# ---------------------------------------------------------------------------
# q_tree3 — depth-3 greedy Gini tree (VERDICT r11 #4): root + both
# depth-1 branch splits + all four depth-2 leaf splits, every argmin a
# CLOSED FORM over the one checkpointed prefix-count table — the next
# rung toward the reference's depth-5 trees (train_model.py:69-80).
# ---------------------------------------------------------------------------


def _tree3_oracle() -> str:
    """DuckDB twin of the depth-3 greedy Gini tree. Level-2 leaves
    reuse the level-1 picks exactly as q_tree2's branches reuse the
    root: with parent base offsets (o_n, o_p) and parent-branch totals
    (nb2, pb2) attached as columns, each leaf argmin is one more scan
    of the materialized `c`. An empty parent pick (pure or
    single-valued branch) makes the leaf's cross join empty, so the
    leaf emits nothing — same semantics as the Spark side's crossJoin
    of the 0-or-1-row pick."""
    node = _gini_node_sql

    return (
        f"WITH s AS ({SCORED_SQL}), "
        "g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY score), "
        "t AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS p FROM g), "
        "c AS MATERIALIZED (SELECT score, "
        "CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum_n, "
        "CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cum_p, "
        "n, p FROM g, t), "
        "root AS MATERIALIZED ("
        + node("root", "c WHERE cum_n < n", "0", "0", "n", "p")
        + "), "
        "lc AS (SELECT c.*, root.n_left AS nb, root.pos_left AS pb "
        "FROM c, root WHERE c.score < root.threshold), "
        "lpick AS MATERIALIZED ("
        + node("left", "lc WHERE cum_n < nb", "0", "0", "nb", "pb")
        + "), "
        "rc AS (SELECT c.*, root.n_left AS n0, root.pos_left AS p0, "
        "root.n_right AS nb, root.pos_right AS pb "
        "FROM c, root WHERE c.score > root.threshold), "
        "rpick AS MATERIALIZED ("
        + node("right", "rc WHERE cum_n - n0 < nb", "n0", "p0", "nb", "pb")
        + "), "
        # depth-2 leaves: parent pick's counts attached as columns,
        # candidate set bounded strictly inside the parent interval
        "llc AS (SELECT c.*, lpick.n_left AS nb2, lpick.pos_left AS pb2 "
        "FROM c, lpick WHERE c.score < lpick.threshold), "
        "llpick AS ("
        + node("ll", "llc WHERE cum_n < nb2", "0", "0", "nb2", "pb2")
        + "), "
        "lrc AS (SELECT c.*, lpick.n_left AS o_n, lpick.pos_left AS o_p, "
        "lpick.n_right AS nb2, lpick.pos_right AS pb2 "
        "FROM c, root, lpick "
        "WHERE c.score > lpick.threshold AND c.score < root.threshold), "
        "lrpick AS ("
        + node("lr", "lrc WHERE cum_n - o_n < nb2", "o_n", "o_p", "nb2", "pb2")
        + "), "
        "rlc AS (SELECT c.*, root.n_left AS o_n, root.pos_left AS o_p, "
        "rpick.n_left AS nb2, rpick.pos_left AS pb2 "
        "FROM c, root, rpick "
        "WHERE c.score > root.threshold AND c.score < rpick.threshold), "
        "rlpick AS ("
        + node("rl", "rlc WHERE cum_n - o_n < nb2", "o_n", "o_p", "nb2", "pb2")
        + "), "
        "rrc AS (SELECT c.*, root.n_left + rpick.n_left AS o_n, "
        "root.pos_left + rpick.pos_left AS o_p, "
        "rpick.n_right AS nb2, rpick.pos_right AS pb2 "
        "FROM c, root, rpick WHERE c.score > rpick.threshold), "
        "rrpick AS ("
        + node("rr", "rrc WHERE cum_n - o_n < nb2", "o_n", "o_p", "nb2", "pb2")
        + ") "
        "SELECT * FROM root UNION ALL SELECT * FROM lpick "
        "UNION ALL SELECT * FROM rpick UNION ALL SELECT * FROM llpick "
        "UNION ALL SELECT * FROM lrpick UNION ALL SELECT * FROM rlpick "
        "UNION ALL SELECT * FROM rrpick"
    )


@query(
    "q_tree3",
    oracle=_tree3_oracle(),
    tags=("ml", "train", "split"),
    eager=True,
)
def q_tree3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-3 greedy decision tree on the published model
    score by EXACT Gini split search: q_tree2's root + branch picks,
    then the best split inside each of the four depth-2 leaves
    (ll: score < t_left; lr: t_left < score < t_root;
    rl: t_root < score < t_right; rr: score > t_right). Emits up to 7
    rows (node = root/left/right/ll/lr/rl/rr; a pure or single-valued
    branch emits none, and its children then emit none too) — the
    third rung on the oracle-checked training ladder toward the
    reference's depth-5 trees (train_model.py:69-80).

    Exactness: identical to q_tree2 one level down — every leaf
    candidate's branch-conditional counts are (cum_n - o_n,
    cum_p - o_p) on exact integers, where the leaf base offset o_n is
    the parent pick's absolute cumulative position (for rr:
    root.n_left + right.n_left = cum_n(t_right)); the argmin key is
    the same IEEE double expression on both engines, ORDER BY
    (key, score) ties broken identically.

    Scale (VERDICT r11 #4 cost budget): NO new fact passes — the one
    fact fold + ONE checkpointed prefix-count pass of q_tree2
    (_tree_cum_table), then SEVEN bounded scans of that checkpointed
    table + TakeOrdered(1) each (2^d - 1 at depth d), with the root
    and level-1 pick rows broadcast into the deeper scans. Three tiny
    localCheckpoints (root, left, right picks — <=1 row each) keep
    every level's offsets exact constants instead of re-derived
    subplans. An empty pick propagates emptiness to its children via
    the crossJoin, matching the oracle's `FROM c, parent` semantics."""
    c = _tree_cum_table(spark, sf_dir)
    _node = _tree_node
    zero = F.lit(0)
    root = _node(
        "root",
        c.filter(F.col("cum_n") < F.col("n")),
        zero,
        zero,
        F.col("n"),
        F.col("p"),
    ).localCheckpoint()
    cb = c.crossJoin(F.broadcast(root.select(
        F.col("threshold").alias("t0"),
        F.col("n_left").alias("bn0"),
        F.col("pos_left").alias("bp0"),
        F.col("n_right").alias("bn1"),
        F.col("pos_right").alias("bp1"),
    )))
    left = _node(
        "left",
        cb.filter(
            (F.col("score") < F.col("t0")) & (F.col("cum_n") < F.col("bn0"))
        ),
        zero,
        zero,
        F.col("bn0"),
        F.col("bp0"),
    ).localCheckpoint()
    right = _node(
        "right",
        cb.filter(
            (F.col("score") > F.col("t0"))
            & (F.col("cum_n") - F.col("bn0") < F.col("bn1"))
        ),
        F.col("bn0"),
        F.col("bp0"),
        F.col("bn1"),
        F.col("bp1"),
    ).localCheckpoint()
    cl = cb.crossJoin(F.broadcast(left.select(
        F.col("threshold").alias("t1"),
        F.col("n_left").alias("ln0"),
        F.col("pos_left").alias("lq0"),
        F.col("n_right").alias("ln1"),
        F.col("pos_right").alias("lq1"),
    )))
    ll = _node(
        "ll",
        cl.filter(
            (F.col("score") < F.col("t1")) & (F.col("cum_n") < F.col("ln0"))
        ),
        zero,
        zero,
        F.col("ln0"),
        F.col("lq0"),
    )
    lr = _node(
        "lr",
        cl.filter(
            (F.col("score") > F.col("t1"))
            & (F.col("score") < F.col("t0"))
            & (F.col("cum_n") - F.col("ln0") < F.col("ln1"))
        ),
        F.col("ln0"),
        F.col("lq0"),
        F.col("ln1"),
        F.col("lq1"),
    )
    cr = cb.crossJoin(F.broadcast(right.select(
        F.col("threshold").alias("t2"),
        F.col("n_left").alias("rn0"),
        F.col("pos_left").alias("rq0"),
        F.col("n_right").alias("rn1"),
        F.col("pos_right").alias("rq1"),
    )))
    rl = _node(
        "rl",
        cr.filter(
            (F.col("score") > F.col("t0"))
            & (F.col("score") < F.col("t2"))
            & (F.col("cum_n") - F.col("bn0") < F.col("rn0"))
        ),
        F.col("bn0"),
        F.col("bp0"),
        F.col("rn0"),
        F.col("rq0"),
    )
    rr = _node(
        "rr",
        cr.filter(
            (F.col("score") > F.col("t2"))
            & (
                F.col("cum_n") - F.col("bn0") - F.col("rn0") < F.col("rn1")
            )
        ),
        F.col("bn0") + F.col("rn0"),
        F.col("bp0") + F.col("rq0"),
        F.col("rn1"),
        F.col("rq1"),
    )
    return (
        root.unionAll(left)
        .unionAll(right)
        .unionAll(ll)
        .unionAll(lr)
        .unionAll(rl)
        .unionAll(rr)
    )


# ---------------------------------------------------------------------------
# q_delong — paired DeLong comparison of two scorers (VERDICT r11 #6a):
# the paired counterpart to q_auc, completing the paired battery
# q_mcnemar opened. Statistic only (z) — erf/p-values stay excluded
# from twin contracts (the q_cochran_armitage precedent).
# ---------------------------------------------------------------------------

# Challenger model coefficients (literals on both engines) — a weaker
# scorer to compare against the published model on the SAME rows.
B0_B, W_QTY_B, W_DISC_B, W_PRICE_B = -1.0, 0.05, 5.0, 0.3

_SCORED2_SQL = (
    "SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
    + sql_round(
        "1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity + 9.0 * l_discount "
        "+ 0.8 * (l_extendedprice / 100000.0))))",
        6,
    )
    + " AS sa, "
    + sql_round(
        "1.0 / (1.0 + EXP(-(-1.0 + 0.05 * l_quantity + 5.0 * l_discount "
        "+ 0.3 * (l_extendedprice / 100000.0))))",
        6,
    )
    + " AS sb FROM lineitem"
)


def _delong_final_sql() -> dict[str, str]:
    """The DeLong scalar formulas as ONE shared expression text per
    output column, evaluated verbatim by BOTH engines over the 1-row
    exact-integer aggregate (np, nn, sua..svab) — the q_ridge
    shared-Cramer-text discipline, so every double op has identical
    structure and the results are bit-identical."""
    d = {c: f"CAST({c} AS DOUBLE)" for c in (
        "np", "nn", "sua", "suaa", "sub", "subb", "suab",
        "sva", "svaa", "svb", "svbb", "svab",
    )}
    auc_a = f"({d['sua']} / (2.0 * {d['nn']} * {d['np']}))"
    auc_b = f"({d['sub']} / (2.0 * {d['nn']} * {d['np']}))"
    # sample-covariance combination S_AA + S_BB - 2*S_AB per class,
    # numerators as (n*Sxy - Sx*Sy) over exact integer sums
    d10 = (
        f"(({d['np']} * {d['suaa']} - {d['sua']} * {d['sua']} "
        f"+ {d['np']} * {d['subb']} - {d['sub']} * {d['sub']} "
        f"- 2.0 * ({d['np']} * {d['suab']} - {d['sua']} * {d['sub']})) "
        f"/ ({d['np']} * {d['np']} * ({d['np']} - 1.0) "
        f"* (2.0 * {d['nn']}) * (2.0 * {d['nn']})))"
    )
    d01 = (
        f"(({d['nn']} * {d['svaa']} - {d['sva']} * {d['sva']} "
        f"+ {d['nn']} * {d['svbb']} - {d['svb']} * {d['svb']} "
        f"- 2.0 * ({d['nn']} * {d['svab']} - {d['sva']} * {d['svb']})) "
        f"/ ({d['nn']} * {d['nn']} * ({d['nn']} - 1.0) "
        f"* (2.0 * {d['np']}) * (2.0 * {d['np']})))"
    )
    # GREATEST guards the tiny-negative cancellation case so SQRT
    # never sees a negative (DuckDB errors where Spark returns NaN);
    # the var = 0 degenerate case (identical scorers / degenerate
    # class counts) emits NULL z explicitly so both engines agree —
    # bare division yields inf whose 6-dp rounding diverges across
    # engines (ADVICE r12 #3)
    var = f"GREATEST({d10} + {d01}, 0.0)"
    return {
        "auc_a": auc_a,
        "auc_b": auc_b,
        "delta": f"({auc_a} - {auc_b})",
        "se": f"SQRT({var})",
        "z": (
            f"(CASE WHEN {var} = 0.0 THEN NULL "
            f"ELSE (({auc_a} - {auc_b}) / SQRT({var})) END)"
        ),
    }


def _delong_oracle() -> str:
    fin = _delong_final_sql()
    units = (
        "SELECT s, 2 * cumneg - neg AS uval, "
        "2 * (tp - cumpos) + pos AS vval FROM ("
        "SELECT {col} AS s, SUM(label) AS pos, "
        "COUNT(*) - SUM(label) AS neg, "
        "SUM(SUM(label)) OVER (ORDER BY {col}) AS cumpos, "
        "SUM(COUNT(*) - SUM(label)) OVER (ORDER BY {col}) AS cumneg "
        "FROM r GROUP BY {col}), tot"
    )
    return (
        f"WITH r AS MATERIALIZED ({_SCORED2_SQL}), "
        "tot AS MATERIALIZED (SELECT CAST(SUM(label) AS BIGINT) AS tp "
        "FROM r), "
        f"ta AS MATERIALIZED ({units.format(col='sa')}), "
        f"tb AS MATERIALIZED ({units.format(col='sb')}), "
        "j AS (SELECT r.label, ta.uval AS ua, ta.vval AS va, "
        "tb.uval AS ub, tb.vval AS vb "
        "FROM r JOIN ta ON r.sa = ta.s JOIN tb ON r.sb = tb.s), "
        "agg AS MATERIALIZED (SELECT "
        "CAST(SUM(label) AS BIGINT) AS np, "
        "CAST(COUNT(*) - SUM(label) AS BIGINT) AS nn, "
        "SUM(CASE WHEN label = 1 THEN ua ELSE 0 END) AS sua, "
        "SUM(CASE WHEN label = 1 THEN ua * ua ELSE 0 END) AS suaa, "
        "SUM(CASE WHEN label = 1 THEN ub ELSE 0 END) AS sub, "
        "SUM(CASE WHEN label = 1 THEN ub * ub ELSE 0 END) AS subb, "
        "SUM(CASE WHEN label = 1 THEN ua * ub ELSE 0 END) AS suab, "
        "SUM(CASE WHEN label = 0 THEN va ELSE 0 END) AS sva, "
        "SUM(CASE WHEN label = 0 THEN va * va ELSE 0 END) AS svaa, "
        "SUM(CASE WHEN label = 0 THEN vb ELSE 0 END) AS svb, "
        "SUM(CASE WHEN label = 0 THEN vb * vb ELSE 0 END) AS svbb, "
        "SUM(CASE WHEN label = 0 THEN va * vb ELSE 0 END) AS svab "
        "FROM j) "
        "SELECT np AS n_pos, nn AS n_neg, "
        + ", ".join(
            sql_round(fin[c], 6) + f" AS {c}"
            for c in ("auc_a", "auc_b", "delta", "se", "z")
        )
        + " FROM agg"
    )


def _rank_units(rows: DataFrame, scol: str) -> DataFrame:
    """Per distinct score of ``scol``: doubled DeLong structural-
    component units — uval = 2·(negatives strictly below) + (negative
    ties) for positive rows at that score, vval = 2·(positives
    strictly above) + (positive ties) for negative rows. Prefix sums
    via the q_auc bucket-offset machinery (<=1001-row broadcast
    self-join + PARTITIONED within-bucket windows — no global
    single-partition sort; the distinct-score table is bounded by the
    6-dp domain regardless of input size)."""
    per = rows.groupBy(scol).agg(
        F.sum("label").cast("bigint").alias("pos"),
        (F.count("*") - F.sum("label")).cast("bigint").alias("neg"),
    ).withColumn("bucket", F.floor(F.col(scol) * 1000).cast("bigint"))
    btot = per.groupBy("bucket").agg(
        F.sum("pos").alias("bpos"), F.sum("neg").alias("bneg")
    )
    lower = btot.select(
        F.col("bucket").alias("lb"),
        F.col("bpos").alias("lpos"),
        F.col("bneg").alias("lneg"),
    )
    offs = (
        btot.join(F.broadcast(lower), F.col("lb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.sum("lpos"), F.lit(0)).alias("off_pos"),
            F.coalesce(F.sum("lneg"), F.lit(0)).alias("off_neg"),
        )
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(scol)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = per.agg(F.sum("pos").cast("bigint").alias("tp"))
    return (
        per.join(F.broadcast(offs), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(scol).alias("s"),
            (
                2 * (F.col("off_neg") + F.sum("neg").over(w_in)) - F.col("neg")
            ).cast("bigint").alias("uval"),
            (
                2 * (F.col("tp") - (F.col("off_pos") + F.sum("pos").over(w_in)))
                + F.col("pos")
            ).cast("bigint").alias("vval"),
        )
    )


@query(
    "q_delong",
    oracle=_delong_oracle(),
    tags=("ml", "stats", "eval"),
)
def q_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong paired comparison of two ROC-AUCs on the SAME rows: the
    published model (q_auc's scorer) vs a literal-coefficient
    challenger. Emits both AUCs, their difference, the DeLong standard
    error of the difference, and the z statistic — the test a model
    bake-off actually needs (two AUCs on the same eval set are highly
    correlated; unpaired comparison wildly overstates the variance).
    Statistic only, no p-value — erf stays outside the twin contract
    (q_cochran_armitage precedent). Ref: the reference's single-model
    roc_auc_score at train_model.py:83 / evaluate_model.py:50 has no
    challenger comparison; this is the evaluation-side completion of
    that metric, DeLong/Sun-Xu fast form.

    Exactness: with 6-dp scores, each positive row's structural
    component V10(i) = (#neg below + #neg ties/2)/nn is carried
    DOUBLED as the exact integer uval = 2·neg_below + neg_ties
    (likewise vval per negative row); all five per-class sums
    (Σu_A, Σu_A², Σu_B, Σu_B², Σu_A·u_B and the v twins) accumulate in
    DECIMAL(38,0)/HUGEINT, and the final AUC/variance/z scalars are
    ONE shared expression text evaluated over those exact integers on
    both engines (_delong_final_sql — the q_ridge discipline), so the
    z statistic is bit-identical. Per-row products fit BIGINT while
    2·max(nn,np) < 3e9 (true at every test SF; the Spark side is
    exact to DECIMAL(38,0) — the (2·n·N)² < 10³⁸ headroom holds to
    ~4-billion-row eval sets, far beyond any single eval split).

    Scale: two bounded distinct-score tables (6-dp domain, the q_auc
    bucket-offset prefix — no global sort), two shuffle joins of the
    fact rows against those <=1e6-row tables on the score key, ONE
    map-side-combinable 12-expression aggregate. No window over fact
    rows, no driver collection."""
    li = load_table(spark, sf_dir, "lineitem")
    logit_a = (
        F.lit(B0)
        + F.lit(W_QTY) * F.col("l_quantity")
        + F.lit(W_DISC) * F.col("l_discount")
        + F.lit(W_PRICE) * (F.col("l_extendedprice") / 100000.0)
    )
    logit_b = (
        F.lit(B0_B)
        + F.lit(W_QTY_B) * F.col("l_quantity")
        + F.lit(W_DISC_B) * F.col("l_discount")
        + F.lit(W_PRICE_B) * (F.col("l_extendedprice") / 100000.0)
    )
    r = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_a)), 6).alias("sa"),
        pround(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit_b)), 6).alias("sb"),
    )
    ta = _rank_units(r, "sa").select(
        F.col("s").alias("sa"), F.col("uval").alias("ua"), F.col("vval").alias("va")
    )
    tb = _rank_units(r, "sb").select(
        F.col("s").alias("sb"), F.col("uval").alias("ub"), F.col("vval").alias("vb")
    )
    # the unit tables are bounded by the 6-dp score domain (<=1e6+1
    # rows each, ~24 MB) REGARDLESS of fact size — broadcast them so
    # the fact rows are never shuffled at all: scan -> two broadcast
    # hash joins -> one map-side-combinable aggregate
    j = r.join(F.broadcast(ta), "sa").join(F.broadcast(tb), "sb")
    dec = "decimal(38,0)"
    pos = F.col("label") == 1

    def csum(cond, expr, name):
        return F.sum(F.when(cond, expr).otherwise(F.lit(0).cast(dec))).alias(name)

    agg = j.agg(
        F.sum("label").cast("bigint").alias("np"),
        (F.count("*") - F.sum("label")).cast("bigint").alias("nn"),
        csum(pos, F.col("ua").cast(dec), "sua"),
        csum(pos, F.col("ua").cast(dec) * F.col("ua"), "suaa"),
        csum(pos, F.col("ub").cast(dec), "sub"),
        csum(pos, F.col("ub").cast(dec) * F.col("ub"), "subb"),
        csum(pos, F.col("ua").cast(dec) * F.col("ub"), "suab"),
        csum(~pos, F.col("va").cast(dec), "sva"),
        csum(~pos, F.col("va").cast(dec) * F.col("va"), "svaa"),
        csum(~pos, F.col("vb").cast(dec), "svb"),
        csum(~pos, F.col("vb").cast(dec) * F.col("vb"), "svbb"),
        csum(~pos, F.col("va").cast(dec) * F.col("vb"), "svab"),
    )
    fin = _delong_final_sql()
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        *[
            pround(F.expr(fin[c]), 6).alias(c)
            for c in ("auc_a", "auc_b", "delta", "se", "z")
        ],
    )


# ---------------------------------------------------------------------------
# q_tree5 — depth-5 exact Gini tree, PER-LEVEL form (round 12): the
# reference's actual model depth (train_model.py:69-80 — XGBClassifier
# depth-5) reached on the oracle-checked training ladder. Unlike
# q_tree2/q_tree3's per-node TakeOrdered scans (2^d - 1 jobs), each
# LEVEL here is ONE broadcast interval-join of the checkpointed prefix
# table against the <=2^k live-branch rows + ONE per-branch argmin
# aggregate — depth d costs d bounded jobs, the form that extends to
# any depth without job-count blow-up.
# ---------------------------------------------------------------------------

_TREE5_DEPTH = 5


def _tree5_chain_sql(
    depth: int = _TREE5_DEPTH, with_final_children: bool = False
) -> str:
    """The shared WITH-chain of the depth-5 ladder oracles: scored ->
    distinct-score cum table -> per level k, cand_k = c x branches_k
    (interval containment), pick_k = per-branch (key, score) argmin
    via ROW_NUMBER, branches_{k+1} = the two children of every pick.
    Branch ids are bit paths (left=2b, right=2b+1); an empty branch
    emits no pick and therefore no children."""
    key = _gini_key_sql("b.n0", "b.p0", "b.nb", "b.pb")
    parts = [
        "WITH s AS (" + SCORED_SQL + "), "
        "g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY score), "
        "t AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(pos) AS BIGINT) AS p FROM g), "
        "c AS MATERIALIZED (SELECT score, "
        "CAST(SUM(cnt) OVER (ORDER BY score) AS BIGINT) AS cum_n, "
        "CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cum_p FROM g), "
        "b0 AS (SELECT CAST(0 AS BIGINT) AS branch, -1.0 AS lo, 2.0 AS hi, "
        "CAST(0 AS BIGINT) AS n0, CAST(0 AS BIGINT) AS p0, "
        "n AS nb, p AS pb FROM t)"
    ]
    for k in range(depth):
        parts.append(
            f", cand{k} AS (SELECT b.branch, b.lo, b.hi, b.n0, b.p0, "
            "b.nb, b.pb, c.score, c.cum_n, c.cum_p, "
            f"({key}) AS key FROM c, b{k} b "
            "WHERE c.score > b.lo AND c.score < b.hi "
            "AND c.cum_n - b.n0 < b.nb), "
            f"pick{k} AS MATERIALIZED (SELECT * FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY branch "
            f"ORDER BY key, score) AS rn FROM cand{k}) WHERE rn = 1)"
        )
        if k + 1 < depth or with_final_children:
            parts.append(
                f", b{k + 1} AS ("
                f"SELECT branch * 2 AS branch, lo, score AS hi, n0, p0, "
                f"CAST(cum_n - n0 AS BIGINT) AS nb, "
                f"CAST(cum_p - p0 AS BIGINT) AS pb FROM pick{k} "
                f"UNION ALL "
                f"SELECT branch * 2 + 1, score, hi, cum_n, cum_p, "
                f"CAST(nb - (cum_n - n0) AS BIGINT), "
                f"CAST(pb - (cum_p - p0) AS BIGINT) FROM pick{k})"
            )
    return "".join(parts)


def _tree5_oracle() -> str:
    """DuckDB twin of q_tree5: the shared ladder chain + the per-level
    pick projections."""
    gb = _gini_base_sql("nb", "pb")
    gk = "key"
    sel = (
        "SELECT {k} AS level, CAST(branch AS BIGINT) AS branch, "
        "score AS threshold, "
        "CAST(cum_n - n0 AS BIGINT) AS n_left, "
        "CAST(cum_p - p0 AS BIGINT) AS pos_left, "
        "CAST(nb - (cum_n - n0) AS BIGINT) AS n_right, "
        "CAST(pb - (cum_p - p0) AS BIGINT) AS pos_right, "
        + sql_round(f"({gk}) / nb", 6) + " AS gini_split, "
        + sql_round(gb, 6) + " AS gini_base, "
        + sql_round(f"{gb} - ({gk}) / nb", 6) + " AS gain "
        "FROM pick{k}"
    )
    return _tree5_chain_sql() + (
        " " + " UNION ALL ".join(sel.format(k=k) for k in range(_TREE5_DEPTH))
    )


def _tree5_ladder(spark: SparkSession, sf_dir: str):
    """Runs the per-level depth-5 ladder once and returns
    (level_display_frames, leaves): the ≤2^k-row pick of every level
    projected to the q_tree5 output columns, plus the LAZY leaf
    partition of the trained tree — every branch row that produced no
    pick (pure / single-valued) at its level, union the children of
    the last level's picks, each carrying (lo, hi, nb, pb) and the
    exact majority vote 2·pb > nb. Leaves cost nothing unless
    materialized (they are set algebra over the already-checkpointed
    picks)."""
    c = _tree_cum_table(spark, sf_dir)
    tot = c.select("n", "p").limit(1)
    branches = tot.select(
        F.lit(0).cast("bigint").alias("branch"),
        F.lit(-1.0).alias("lo"),
        F.lit(2.0).alias("hi"),
        F.lit(0).cast("bigint").alias("n0"),
        F.lit(0).cast("bigint").alias("p0"),
        F.col("n").alias("nb"),
        F.col("p").alias("pb"),
    )
    levels = []
    leaf_parts = []
    for k in range(_TREE5_DEPTH):
        cand = (
            c.crossJoin(F.broadcast(branches))
            .filter(
                (F.col("score") > F.col("lo"))
                & (F.col("score") < F.col("hi"))
                & (F.col("cum_n") - F.col("n0") < F.col("nb"))
            )
            .withColumn(
                "key",
                _tree_key(F.col("n0"), F.col("p0"), F.col("nb"), F.col("pb")),
            )
        )
        payload = F.struct(
            "key", "score", "cum_n", "cum_p", "lo", "hi", "n0", "p0", "nb", "pb"
        )
        pick = (
            cand.groupBy("branch")
            .agg(F.min(payload).alias("s"))
            .select("branch", "s.*")
            .localCheckpoint()
        )
        leaf_parts.append(
            branches.join(pick.select("branch"), "branch", "left_anti").select(
                "lo", "hi", "nb", "pb"
            )
        )
        nbd = F.col("nb").cast("double")
        pbd = F.col("pb").cast("double")
        gbase = (
            F.lit(1.0)
            - (pbd / nbd) * (pbd / nbd)
            - ((nbd - pbd) / nbd) * ((nbd - pbd) / nbd)
        )
        levels.append(
            pick.select(
                F.lit(k).cast("int").alias("level"),
                F.col("branch").cast("bigint").alias("branch"),
                F.col("score").alias("threshold"),
                (F.col("cum_n") - F.col("n0")).cast("bigint").alias("n_left"),
                (F.col("cum_p") - F.col("p0")).cast("bigint").alias("pos_left"),
                (F.col("nb") - (F.col("cum_n") - F.col("n0")))
                .cast("bigint")
                .alias("n_right"),
                (F.col("pb") - (F.col("cum_p") - F.col("p0")))
                .cast("bigint")
                .alias("pos_right"),
                pround(F.col("key") / nbd, 6).alias("gini_split"),
                pround(gbase, 6).alias("gini_base"),
                pround(gbase - F.col("key") / nbd, 6).alias("gain"),
            )
        )
        left = pick.select(
            (F.col("branch") * 2).alias("branch"),
            "lo",
            F.col("score").alias("hi"),
            "n0",
            "p0",
            (F.col("cum_n") - F.col("n0")).cast("bigint").alias("nb"),
            (F.col("cum_p") - F.col("p0")).cast("bigint").alias("pb"),
        )
        right = pick.select(
            (F.col("branch") * 2 + 1).alias("branch"),
            F.col("score").alias("lo"),
            "hi",
            F.col("cum_n").alias("n0"),
            F.col("cum_p").alias("p0"),
            (F.col("nb") - (F.col("cum_n") - F.col("n0")))
            .cast("bigint")
            .alias("nb"),
            (F.col("pb") - (F.col("cum_p") - F.col("p0")))
            .cast("bigint")
            .alias("pb"),
        )
        branches = left.unionAll(right)
    leaf_parts.append(branches.select("lo", "hi", "nb", "pb"))
    leaves = leaf_parts[0]
    for lp in leaf_parts[1:]:
        leaves = leaves.unionAll(lp)
    leaves = leaves.select(
        "lo",
        "hi",
        "nb",
        "pb",
        (F.lit(2) * F.col("pb") > F.col("nb")).cast("int").alias("pred"),
    )
    return levels, leaves


@query(
    "q_tree5",
    oracle=_tree5_oracle(),
    tags=("ml", "train", "split"),
    eager=True,
)
def q_tree5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-5 greedy decision tree on the published model
    score by EXACT Gini split search — the reference's actual model
    depth (train_model.py:69-80, XGBClassifier max_depth=5), reached
    on the oracle-checked ladder q_stump -> q_tree2 -> q_tree3 opened.
    Emits up to 31 rows keyed (level, branch): branch is the bit path
    from the root (left = 2b, right = 2b+1), so (0,0) is the root and
    (1,0)/(1,1) are q_tree2's left/right — pinned equal in tests.

    Per-LEVEL plan (the any-depth form): level k is ONE broadcast
    interval-join of the checkpointed prefix-count table against the
    <=2^k live-branch rows (each candidate row lands in exactly one
    branch interval) + ONE per-branch argmin — min over the orderable
    (key, score, payload) struct, exact because (key, score) is unique
    within a branch (distinct scores, disjoint intervals) and Spark
    struct comparison is lexicographic, the same total order as the
    oracle's ROW_NUMBER. Depth d costs d bounded jobs + d tiny
    checkpoints — vs 2^d - 1 TakeOrdered jobs if q_tree3's per-node
    form were extended — and ZERO new fact passes beyond
    _tree_cum_table's single fold.

    Exactness: identical branch-offset integer counts as
    q_tree2/q_tree3 (children carry (n0, p0) = the parent pick's
    absolute cumulative position); the argmin key is the same IEEE
    expression on both engines; a pure/single-valued branch emits no
    pick and no children on either engine (empty join)."""
    levels, _leaves = _tree5_ladder(spark, sf_dir)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    return out


def _tree5_confusion_oracle() -> str:
    """Leaf partition = every branch row with no pick at its level,
    union the level-5 children; routing interval is (lo, hi] (left
    child keeps score <= threshold, matching the cumulative counts);
    majority vote by the exact integer comparison 2*pb > nb."""
    anti = " UNION ALL ".join(
        f"SELECT lo, hi, nb, pb FROM b{k} WHERE branch NOT IN "
        f"(SELECT branch FROM pick{k})"
        for k in range(_TREE5_DEPTH)
    )
    return (
        _tree5_chain_sql(with_final_children=True)
        + f", leaves AS MATERIALIZED ({anti} UNION ALL "
        f"SELECT lo, hi, nb, pb FROM b{_TREE5_DEPTH}) "
        "SELECT CAST(CASE WHEN 2 * l.pb > l.nb THEN 1 ELSE 0 END AS INT) "
        "AS prediction, s.label AS label, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM s JOIN leaves l ON s.score > l.lo AND s.score <= l.hi "
        "GROUP BY 1, 2"
    )


@query(
    "q_tree5_confusion",
    oracle=_tree5_confusion_oracle(),
    tags=("ml", "train", "eval"),
    eager=True,
)
def q_tree5_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained depth-5 Gini tree back to every scored row
    and emit the confusion matrix — the train-then-SERVE completion of
    the ladder (the reference trains depth-5 then scores the eval
    split, train_model.py:69-83): prediction = the majority class of
    the leaf the row routes to, by the EXACT integer vote 2·pos > n,
    so no float enters the decision.

    Leaf partition: every ladder branch that produced no split at its
    level (pure or single-valued — it keeps its interval) union the
    children of the level-5 picks; intervals are (lo, hi] so a row at
    a threshold routes LEFT, exactly matching the training counts
    (n_left = cum_n(t)). The leaf table is <=63 rows and carries its
    own (n, pos) — the per-leaf class counts need NO scoring pass;
    only the confusion matrix touches the fact rows.

    Scale (the serving shape): the <=63-row leaf table is collected to
    the driver (a bounded-scalar collect, the established
    pbucket/threshold-list pattern) and COMPILED into a per-row CASE
    chain over the contiguous intervals sorted by upper bound — the
    first `score <= hi_k` match IS the routing leaf, so scoring is
    pure whole-stage codegen on the single fact scan + one 4-cell
    aggregate, exactly how a 100 TB tree scorer ships its model. (The
    declarative BroadcastNestedLoop interval-join form was measured
    ~4 s slower at sf0.1: 63x600k filtered pairs vs <=63 sequential
    comparisons per row.) The ladder itself adds zero fact passes
    beyond _tree_cum_table's fold; leaves are set algebra over the
    checkpointed picks."""
    _levels, leaves = _tree5_ladder(spark, sf_dir)
    # bounded collect: <=2^5 * 2 - 1 rows, the compiled model
    leaf_rows = sorted(leaves.collect(), key=lambda r: r["hi"])
    pred_col = None
    for r in leaf_rows:
        cond = F.col("score") <= F.lit(float(r["hi"]))
        branch = F.lit(int(r["pred"]))
        pred_col = (
            F.when(cond, branch)
            if pred_col is None
            else pred_col.when(cond, branch)
        )
    s = scored(spark, sf_dir)
    return (
        s.groupBy(
            pred_col.otherwise(F.lit(-1)).cast("int").alias("prediction"),
            F.col("label").alias("label"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# q_tree_multifeat — multi-FEATURE exact Gini split search (VERDICT
# r12 #4): the reference's XGB trees search all feature columns per
# node (train_model.py:69-80), where the q_stump..q_tree5 ladder
# splits on the single published score. This closes that delta at
# the root + one child level over the three published model features.
# ---------------------------------------------------------------------------

# (name, 6-dp-rounded value expression) — names sorted so the
# (key, feat, val) argmin tie-break is engine-identical
_MF_FEATS = ("disc", "price", "qty")

_MF_VAL_SQL = {
    "disc": "CAST(l_discount AS DOUBLE)",
    "price": "(CAST(l_extendedprice AS DOUBLE) / 100000.0)",
    "qty": "CAST(l_quantity AS DOUBLE)",
}


def _mf_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> (label, disc, price, qty): the reference model's
    three raw feature columns, 6-dp-rounded BEFORE any grouping so
    distinct-value/tie structure is identical across engines (the
    scored() discipline applied to inputs instead of the score)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        pround(F.col("l_discount").cast("double"), 6).alias("disc"),
        pround(F.col("l_extendedprice").cast("double") / 100000.0, 6).alias(
            "price"
        ),
        pround(F.col("l_quantity").cast("double"), 6).alias("qty"),
    )


def _mf_unpivot(base: DataFrame, extra: list[str]) -> DataFrame:
    """(.., disc, price, qty, label) -> (.., feat, val, label): one
    pass, stack-style explode — the per-(feat,val) fold after it is
    map-side-combinable so the tripled row count never shuffles raw."""
    return base.select(
        *extra,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("feat"), F.col(f).alias("val")
                    )
                    for f in _MF_FEATS
                ]
            )
        ).alias("fv"),
        "label",
    ).select(*extra, F.col("fv.feat").alias("feat"),
             F.col("fv.val").alias("val"), "label")


def _mf_cum(
    grouped: DataFrame,
    keys: list[str],
    out_cast: str = "bigint",
    measures: tuple[tuple[str, str], ...] = (
        ("cnt", "cum_n"),
        ("pos", "cum_p"),
    ),
) -> DataFrame:
    """Per-key prefix sums over the bounded distinct-(feat,val)
    table — the _tree_cum_table bucket-offset machinery generalized to
    composite keys: coarse floor(val*1000) buckets, offsets via a
    broadcast self-join of the <=~1.5k-row bucket-total table,
    PARTITIONED within-bucket windows; never a global single-partition
    sort even when one feature (price) has ~1e5 distinct values.
    ``out_cast`` lets q_boosted_multifeat's DECIMAL(38,0) weighted
    counts ride the same machinery without narrowing to bigint;
    ``measures`` generalizes the (cnt, pos) pair so q_xgb_round's
    Newton (cnt, g, h) sufficient statistics ride it too — the
    generated plan is measure-count-parametric but node-shape
    identical (same groupBys, same broadcast joins, same window)."""
    b = grouped.withColumn(
        "bucket", F.floor(F.col("val") * 1000).cast("bigint")
    )
    btot = b.groupBy(*keys, "bucket").agg(
        *[F.sum(src).alias(f"b_{src}") for src, _ in measures]
    )
    lower = btot.select(
        *[F.col(k).alias(f"l_{k}") for k in keys],
        F.col("bucket").alias("lb"),
        *[F.col(f"b_{src}").alias(f"lo_{src}") for src, _ in measures],
    )
    cond = F.col("lb") < F.col("bucket")
    for k in keys:
        cond = cond & (F.col(f"l_{k}") == F.col(k))
    offs = (
        btot.join(F.broadcast(lower), cond, "left")
        .groupBy(*keys, "bucket")
        .agg(
            *[
                F.coalesce(F.sum(f"lo_{src}"), F.lit(0)).alias(f"off_{src}")
                for src, _ in measures
            ]
        )
    )
    w_in = (
        Window.partitionBy(*keys, "bucket")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return b.join(F.broadcast(offs), [*keys, "bucket"]).select(
        *keys,
        "val",
        *[
            (F.col(f"off_{src}") + F.sum(src).over(w_in))
            .cast(out_cast)
            .alias(out)
            for src, out in measures
        ],
    )


def _mf_node(tag: str, cands: DataFrame, nb, pb) -> DataFrame:
    """Best (feature, threshold) inside one branch: TakeOrdered(1) by
    the exact (key, feat, val) order — branch-internal prefix counts
    mean zero base offsets (_tree_key with n0 = p0 = 0)."""
    zero = F.lit(0)
    nbd = nb.cast("double")
    pbd = pb.cast("double")
    base = (
        F.lit(1.0)
        - (pbd / nbd) * (pbd / nbd)
        - ((nbd - pbd) / nbd) * ((nbd - pbd) / nbd)
    )
    k = F.col("key")
    return (
        cands.withColumn("key", _tree_key(zero, zero, nb, pb))
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            F.lit(tag).alias("node"),
            F.col("feat"),
            F.col("val").alias("threshold"),
            F.col("cum_n").cast("bigint").alias("n_left"),
            F.col("cum_p").cast("bigint").alias("pos_left"),
            (nb - F.col("cum_n")).cast("bigint").alias("n_right"),
            (pb - F.col("cum_p")).cast("bigint").alias("pos_right"),
            pround(k / nbd, 6).alias("gini_split"),
            pround(base, 6).alias("gini_base"),
            pround(base - k / nbd, 6).alias("gain"),
        )
    )


def _gini_node_mf_sql(tag: str, src: str, nb: str, pb: str) -> str:
    k = _gini_key_sql("0", "0", nb, pb)
    base = _gini_base_sql(nb, pb)
    return (
        f"SELECT '{tag}' AS node, feat, val AS threshold, "
        f"CAST(cum_n AS BIGINT) AS n_left, "
        f"CAST(cum_p AS BIGINT) AS pos_left, "
        f"CAST({nb} - cum_n AS BIGINT) AS n_right, "
        f"CAST({pb} - cum_p AS BIGINT) AS pos_right, "
        + sql_round(f"({k}) / {nb}", 6) + " AS gini_split, "
        + sql_round(base, 6) + " AS gini_base, "
        + sql_round(f"{base} - ({k}) / {nb}", 6) + " AS gain "
        f"FROM {src} ORDER BY {k}, feat, val LIMIT 1"
    )


def _tree_mf_oracle() -> str:
    """DuckDB twin: same unpivot, same per-(branch, feature) prefix
    counts, same (key, feat, val) argmin text."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, label FROM f" for f in _MF_FEATS
    )
    u2 = " UNION ALL ".join(
        f"SELECT br, '{f}' AS feat, {f} AS val, label FROM f2"
        for f in _MF_FEATS
    )
    return (
        "WITH f AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        f"AS label, {fsel} FROM lineitem), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u GROUP BY feat, val), "
        "t AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS p FROM f), "
        "c AS MATERIALIZED (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) "
        "AS cum_n, "
        "CAST(SUM(pos) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) "
        "AS cum_p, n, p FROM g, t), "
        "root AS MATERIALIZED ("
        + _gini_node_mf_sql("root", "c WHERE cum_n < n", "n", "p")
        + "), "
        "f2 AS (SELECT f.*, CASE WHEN (CASE root.feat "
        "WHEN 'disc' THEN f.disc WHEN 'price' THEN f.price ELSE f.qty END) "
        "<= root.threshold THEN 0 ELSE 1 END AS br FROM f, root), "
        f"u2 AS ({u2}), "
        "g2 AS (SELECT br, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u2 GROUP BY br, feat, val), "
        "c2 AS MATERIALIZED (SELECT br, feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY br, feat ORDER BY val) AS BIGINT) "
        "AS cum_n, "
        "CAST(SUM(pos) OVER (PARTITION BY br, feat ORDER BY val) AS BIGINT) "
        "AS cum_p FROM g2), "
        "lc AS (SELECT c2.*, root.n_left AS nb, root.pos_left AS pb "
        "FROM c2, root WHERE br = 0), "
        "lpick AS MATERIALIZED ("
        + _gini_node_mf_sql("left", "lc WHERE cum_n < nb", "nb", "pb")
        + "), "
        "rc AS (SELECT c2.*, root.n_right AS nb, root.pos_right AS pb "
        "FROM c2, root WHERE br = 1), "
        "rpick AS MATERIALIZED ("
        + _gini_node_mf_sql("right", "rc WHERE cum_n < nb", "nb", "pb")
        + ") "
        "SELECT * FROM root UNION ALL SELECT * FROM lpick "
        "UNION ALL SELECT * FROM rpick"
    )


@query(
    "q_tree_multifeat",
    oracle=_tree_mf_oracle(),
    tags=("ml", "train", "split"),
    eager=True,
)
def q_tree_multifeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini split search across ALL THREE published feature
    columns (discount, scaled price, quantity) at the root and inside
    both root branches — the multi-feature per-node search the
    reference's XGBClassifier performs (train_model.py:69-80), which
    the single-score q_stump..q_tree5 ladder could not express. Emits
    up to 3 rows (root/left/right), each carrying the WINNING feature
    name, threshold, exact branch counts, and impurity scalars.

    Exactness: per-(branch, feature) prefix counts are exact integers;
    the split key is the q_tree2 branch-offset Gini expression with
    zero offsets (branch tables are folded WITHIN the branch), and the
    argmin ORDER BY (key, feat, val) compares exact doubles then
    strings — engine-identical. Feature values are 6-dp pround-ed
    BEFORE grouping so distinct/tie structure matches DuckDB's.

    Scale: TWO fact passes total (the honest multi-feature cost — the
    child search conditions every feature's distribution on the root
    branch, so branch folds cannot be closed forms over root-level
    prefix tables). Each pass is one stack-explode (3x rows,
    map-side-combined before the only shuffle on (br, feat, val)),
    then the bucket-offset prefix machinery per (branch, feature) —
    broadcast <=~1.5k-row offset tables + partitioned windows, never a
    global sort. Argmins are TakeOrdered(1) over the bounded
    distinct-value tables; the 1-row root pick is broadcast into the
    second pass. At depth d this costs d+1 fact passes — the
    level-synchronous multi-feature trainer shape (each level's branch
    assignment rides ONE pass), exactly how a distributed tree trainer
    scales to 100 TB. Eager by construction (the checkpointed root
    pick); the registry eager contract applies."""
    base = _mf_base(spark, sf_dir)
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("p"),
    )
    g1 = _mf_unpivot(base, []).groupBy("feat", "val").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    c1 = _mf_cum(g1, ["feat"]).crossJoin(F.broadcast(tot))
    root = _mf_node(
        "root",
        c1.filter(F.col("cum_n") < F.col("n")),
        F.col("n"),
        F.col("p"),
    ).localCheckpoint()

    rinfo = root.select(
        F.col("feat").alias("rfeat"),
        F.col("threshold").alias("rt"),
        F.col("n_left").alias("bln"),
        F.col("pos_left").alias("blp"),
        F.col("n_right").alias("brn"),
        F.col("pos_right").alias("brp"),
    )
    rootval = (
        F.when(F.col("rfeat") == "disc", F.col("disc"))
        .when(F.col("rfeat") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    f2 = base.crossJoin(F.broadcast(rinfo)).withColumn(
        "br", F.when(rootval <= F.col("rt"), F.lit(0)).otherwise(F.lit(1))
    )
    g2 = _mf_unpivot(f2, ["br"]).groupBy("br", "feat", "val").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    c2 = _mf_cum(g2, ["br", "feat"]).crossJoin(F.broadcast(rinfo))
    left = _mf_node(
        "left",
        c2.filter((F.col("br") == 0) & (F.col("cum_n") < F.col("bln"))),
        F.col("bln"),
        F.col("blp"),
    )
    right = _mf_node(
        "right",
        c2.filter((F.col("br") == 1) & (F.col("cum_n") < F.col("brn"))),
        F.col("brn"),
        F.col("brp"),
    )
    return root.unionAll(left).unionAll(right)


# ---------------------------------------------------------------------------
# q_boosted_tree2 — 2-round exact AdaBoost of DEPTH-2 Gini trees
# (round 13, VERDICT r12 #6d): q_boosted_stumps' closed-form rational
# reweighting composed with q_tree2's greedy branch picks — the
# genuine gradient-boosted-ensemble shape at the reference's design
# (train_model.py:69-80 boosts depth-5 trees; this is the
# hash-checkable 2-round/depth-2 form of that loop).
# ---------------------------------------------------------------------------


def _wgini_sql(lp: str, ln: str, P: str, N: str) -> str:
    """Weighted Gini split key: left weighted (pos, neg) = (lp, ln)
    against branch weighted totals (P, N). Exact integer arithmetic up
    to ONE cast per factor, then a fixed double expression — identical
    text on both engines (the _gini_key_sql discipline)."""
    nl = f"CAST({lp} + {ln} AS DOUBLE)"
    pl = f"CAST({lp} AS DOUBLE)"
    nr = f"CAST(({P} + {N}) - (({lp}) + ({ln})) AS DOUBLE)"
    pr = f"CAST(({P}) - ({lp}) AS DOUBLE)"
    return (
        f"({nl} - ({pl} * {pl} + ({nl} - {pl}) * ({nl} - {pl})) / {nl}) "
        f"+ ({nr} - ({pr} * {pr} + ({nr} - {pr}) * ({nr} - {pr})) / {nr})"
    )


def _wgini(lp, ln, P, N):
    """Spark twin of _wgini_sql: same integer-then-one-cast shape."""
    nl = (lp + ln).cast("double")
    pl = lp.cast("double")
    nr = ((P + N) - (lp + ln)).cast("double")
    pr = (P - lp).cast("double")
    return (nl - (pl * pl + (nl - pl) * (nl - pl)) / nl) + (
        nr - (pr * pr + (nr - pr) * (nr - pr)) / nr
    )


def _btree2_oracle() -> str:
    """DuckDB twin. The oracle recomputes each round's weighted
    per-score table directly (region-CASE multipliers x raw counts,
    then plain cumulative windows) — the readable form; the Spark side
    computes the SAME integers as clamp closed forms over the one
    checkpointed prefix table. Leaf index k(s) = 1..4 over the sorted
    thresholds tl < t0 < tr; AdaBoost multiplier for a correct row is
    e, for a misclassified row d - e (the q_boosted_stumps rational
    trick), so round-2 weighted counts are exact HUGEINTs."""
    key_root1 = _wgini_sql("cp", "cn", "tp", "tn")
    key_l1 = _wgini_sql("cp", "cn", "cp0", "cn0")
    key_r1 = _wgini_sql("(cp - cp0)", "(cn - cn0)", "(tp - cp0)", "(tn - cn0)")
    key_root2 = _wgini_sql("cwp", "cwn", "wpt", "wnt")
    key_l2 = _wgini_sql("cwp", "cwn", "wp0", "wn0")
    key_r2 = _wgini_sql(
        "(cwp - wp0)", "(cwn - wn0)", "(wpt - wp0)", "(wnt - wn0)"
    )

    def leaf_cases(val1, val2, val3, val4):
        return (
            f"CASE WHEN p.score <= tl THEN {val1} "
            f"WHEN p.score <= t0 THEN {val2} "
            f"WHEN p.score <= tr THEN {val3} ELSE {val4} END"
        )

    mp = leaf_cases(
        "(CASE WHEN pr1 = 1 THEN e1 ELSE d1 - e1 END)",
        "(CASE WHEN pr2 = 1 THEN e1 ELSE d1 - e1 END)",
        "(CASE WHEN pr3 = 1 THEN e1 ELSE d1 - e1 END)",
        "(CASE WHEN pr4 = 1 THEN e1 ELSE d1 - e1 END)",
    )
    mn = leaf_cases(
        "(CASE WHEN pr1 = -1 THEN e1 ELSE d1 - e1 END)",
        "(CASE WHEN pr2 = -1 THEN e1 ELSE d1 - e1 END)",
        "(CASE WHEN pr3 = -1 THEN e1 ELSE d1 - e1 END)",
        "(CASE WHEN pr4 = -1 THEN e1 ELSE d1 - e1 END)",
    )
    h1 = leaf_cases("pr1", "pr2", "pr3", "pr4")
    h2 = (
        "CASE WHEN p.score <= ul THEN qr1 WHEN p.score <= u0 THEN qr2 "
        "WHEN p.score <= ur THEN qr3 ELSE qr4 END"
    )
    a1 = "(0.5 * LN(CAST(d1 - e1 AS DOUBLE) / CAST(e1 AS DOUBLE)))"
    a2 = "(0.5 * LN(CAST(d2 - e2 AS DOUBLE) / CAST(e2 AS DOUBLE)))"

    def m_block(tag, rootv, lv, rv, P, N):
        # leaf weighted counts from the three carried absolute cums
        return (
            f"SELECT t{rootv}, {lv}, {rv}, "
            f"cp{lv} AS lp1, cn{lv} AS ln1, "
            f"cp{rootv} - cp{lv} AS lp2, cn{rootv} - cn{lv} AS ln2, "
            f"cp{rv} - cp{rootv} AS lp3, cn{rv} - cn{rootv} AS ln3, "
            f"{P} - cp{rv} AS lp4, {N} - cn{rv} AS ln4 "
        )

    return (
        f"WITH s AS ({SCORED_SQL}), "
        "per AS MATERIALIZED (SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM s GROUP BY score), "
        "t AS MATERIALIZED (SELECT CAST(SUM(pos) AS BIGINT) AS tp, "
        "CAST(SUM(cnt - pos) AS BIGINT) AS tn, MAX(score) AS smax FROM per), "
        "c AS MATERIALIZED (SELECT score, cnt, pos, "
        "CAST(SUM(pos) OVER (ORDER BY score) AS BIGINT) AS cp, "
        "CAST(SUM(cnt - pos) OVER (ORDER BY score) AS BIGINT) AS cn "
        "FROM per), "
        "root1 AS MATERIALIZED (SELECT score AS t0, cp AS cp0, cn AS cn0 "
        f"FROM c, t WHERE cp + cn < tp + tn ORDER BY {key_root1}, score "
        "LIMIT 1), "
        "l1 AS MATERIALIZED (SELECT score AS tl, cp AS cpl, cn AS cnl "
        f"FROM c, root1 WHERE score < t0 ORDER BY {key_l1}, score LIMIT 1), "
        "r1 AS MATERIALIZED (SELECT score AS tr, cp AS cpr, cn AS cnr "
        "FROM c, root1, t WHERE score > t0 AND cp + cn < tp + tn "
        f"ORDER BY {key_r1}, score LIMIT 1), "
        "m1 AS MATERIALIZED (SELECT t0, tl, tr, "
        "CASE WHEN cpl > cnl THEN 1 ELSE -1 END AS pr1, "
        "CASE WHEN cp0 - cpl > cn0 - cnl THEN 1 ELSE -1 END AS pr2, "
        "CASE WHEN cpr - cp0 > cnr - cn0 THEN 1 ELSE -1 END AS pr3, "
        "CASE WHEN tp - cpr > tn - cnr THEN 1 ELSE -1 END AS pr4, "
        "CAST(CASE WHEN cpl > cnl THEN cnl ELSE cpl END "
        "+ CASE WHEN cp0 - cpl > cn0 - cnl THEN cn0 - cnl "
        "ELSE cp0 - cpl END "
        "+ CASE WHEN cpr - cp0 > cnr - cn0 THEN cnr - cn0 "
        "ELSE cpr - cp0 END "
        "+ CASE WHEN tp - cpr > tn - cnr THEN tn - cnr "
        "ELSE tp - cpr END AS BIGINT) AS e1, "
        "CAST(tp + tn AS BIGINT) AS d1 "
        "FROM root1, l1, r1, t), "
        "w2 AS MATERIALIZED (SELECT p.score, p.cnt, p.pos, "
        f"CAST(p.pos AS HUGEINT) * ({mp}) AS wp, "
        f"CAST(p.cnt - p.pos AS HUGEINT) * ({mn}) AS wn "
        "FROM per p, m1), "
        "c2 AS (SELECT score, "
        "CAST(SUM(wp) OVER (ORDER BY score) AS HUGEINT) AS cwp, "
        "CAST(SUM(wn) OVER (ORDER BY score) AS HUGEINT) AS cwn FROM w2), "
        "tw2 AS MATERIALIZED (SELECT CAST(SUM(wp) AS HUGEINT) AS wpt, "
        "CAST(SUM(wn) AS HUGEINT) AS wnt FROM w2), "
        "root2 AS MATERIALIZED (SELECT score AS u0, cwp AS wp0, "
        "cwn AS wn0 FROM c2, tw2, t WHERE score < smax "
        f"ORDER BY {key_root2}, score LIMIT 1), "
        "l2 AS MATERIALIZED (SELECT score AS ul, cwp AS wpl, cwn AS wnl "
        f"FROM c2, root2 WHERE score < u0 ORDER BY {key_l2}, score LIMIT 1), "
        "r2 AS MATERIALIZED (SELECT score AS ur, cwp AS wpr, cwn AS wnr "
        "FROM c2, root2, tw2, t WHERE score > u0 AND score < smax "
        f"ORDER BY {key_r2}, score LIMIT 1), "
        "m2 AS MATERIALIZED (SELECT u0, ul, ur, "
        "CASE WHEN wpl > wnl THEN 1 ELSE -1 END AS qr1, "
        "CASE WHEN wp0 - wpl > wn0 - wnl THEN 1 ELSE -1 END AS qr2, "
        "CASE WHEN wpr - wp0 > wnr - wn0 THEN 1 ELSE -1 END AS qr3, "
        "CASE WHEN wpt - wpr > wnt - wnr THEN 1 ELSE -1 END AS qr4, "
        "CAST(CASE WHEN wpl > wnl THEN wnl ELSE wpl END "
        "+ CASE WHEN wp0 - wpl > wn0 - wnl THEN wn0 - wnl "
        "ELSE wp0 - wpl END "
        "+ CASE WHEN wpr - wp0 > wnr - wn0 THEN wnr - wn0 "
        "ELSE wpr - wp0 END "
        "+ CASE WHEN wpt - wpr > wnt - wnr THEN wnt - wnr "
        "ELSE wpt - wpr END AS HUGEINT) AS e2, "
        "CAST(wpt + wnt AS HUGEINT) AS d2 "
        "FROM root2, l2, r2, tw2), "
        "acc AS MATERIALIZED (SELECT "
        "CAST(SUM(p.cnt) AS HUGEINT) AS nn, "
        f"CAST(SUM(CASE WHEN {a1} * ({h1}) > 0 THEN p.pos "
        "ELSE p.cnt - p.pos END) AS HUGEINT) AS u1, "
        f"CAST(SUM(CASE WHEN {a1} * ({h1}) + {a2} * ({h2}) > 0 "
        "THEN p.pos ELSE p.cnt - p.pos END) AS HUGEINT) AS u2 "
        "FROM per p, m1, m2) "
        "SELECT CAST(1 AS INT) AS round, t0 AS t_root, tl AS t_left, "
        "tr AS t_right, CAST(pr1 AS BIGINT) AS pred_l1, "
        "CAST(pr2 AS BIGINT) AS pred_l2, CAST(pr3 AS BIGINT) AS pred_l3, "
        "CAST(pr4 AS BIGINT) AS pred_l4, "
        + sql_round("CAST(e1 AS DOUBLE) / CAST(d1 AS DOUBLE)", 6)
        + " AS w_err, " + sql_round(a1, 6) + " AS alpha, "
        + sql_round("CAST(u1 AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + " AS acc FROM m1, acc "
        "UNION ALL "
        "SELECT CAST(2 AS INT), u0, ul, ur, "
        "CAST(qr1 AS BIGINT), CAST(qr2 AS BIGINT), "
        "CAST(qr3 AS BIGINT), CAST(qr4 AS BIGINT), "
        + sql_round("CAST(e2 AS DOUBLE) / CAST(d2 AS DOUBLE)", 6) + ", "
        + sql_round(a2, 6) + ", "
        + sql_round("CAST(u2 AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + " FROM m2, acc"
    )


@query(
    "q_boosted_tree2",
    oracle=_btree2_oracle(),
    tags=("ml", "train", "boost"),
    eager=True,
)
def q_boosted_tree2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 2-round AdaBoost ensemble whose weak learner is a
    DEPTH-2 greedy Gini tree on the published model score — 
    q_boosted_stumps' closed-form rational reweighting composed with
    q_tree2's branch picks: the hash-checkable form of the reference's
    boosted-tree training loop (train_model.py:69-80 — XGB boosts
    depth-5 trees; round 1 here IS q_tree2's exact tree, test-pinned).
    Emits one row per round: thresholds (root/left/right), the four
    leaf sign predictions (weighted majority), weighted error, alpha,
    and ensemble train accuracy.

    Exactness: round-1 weighted counts ARE the raw prefix counts;
    round-2 weights multiply by (d1−e1) if tree-1 misclassified the
    row else e1 (the q_boosted_stumps rational trick), so every
    round-2 candidate's weighted (pos, neg) cums are exact
    DECIMAL(38,0)/HUGEINT integers. Split keys are the weighted Gini
    expression on exact integers with ONE cast per factor
    (_wgini/_wgini_sql — identical text both engines); argmins ORDER
    BY (key, score). Assumes the weak learner is imperfect and better
    than chance (1 <= e < d — true on any non-separable stream; a
    perfect tree would make alpha infinite in ANY AdaBoost).

    Scale: zero fact passes beyond the shared tree_cum_table fold —
    round-2 weighted cums are CLAMP CLOSED FORMS over the ONE
    checkpointed prefix table: cum weight at t = Σ_regions
    M_k·(clamp(cp(t), lo_k, hi_k) − lo_k) with the region boundaries
    carried as scalars on the broadcast round-1 model row (the oracle
    recomputes them as plain windows — same integers, readable form).
    Six bounded scans + TakeOrdered(1) each (2 rounds x 3 picks), one
    accuracy fold; at R rounds the closed form costs R·3 bounded scans
    and never re-windows. Eager by construction (the checkpointed
    model chain); the registry eager contract applies."""
    c = tree_cum_table(scored(spark, sf_dir))
    cc = c.select(
        "score",
        "cnt",
        "pos",
        F.col("cum_p").alias("cp"),
        (F.col("cum_n") - F.col("cum_p")).alias("cn"),
        F.col("p").alias("tp"),
        (F.col("n") - F.col("p")).alias("tn"),
    )

    def _bt2_pick(cands, xp, xn, bp, bn, BP, BN, names):
        key = _wgini(xp - bp, xn - bn, BP, BN)
        return (
            cands.withColumn("key", key)
            .orderBy("key", "score")
            .limit(1)
            .select(
                F.col("score").alias(names[0]),
                xp.alias(names[1]),
                xn.alias(names[2]),
                *names[3:],
            )
            .localCheckpoint()
        )

    def _bt2_branch_picks(cands, xp, xn, bp, bn, BP, BN, names):
        """BOTH branch argmins in ONE job (the q_tree5 per-level
        struct-argmin: groupBy branch + min(struct(key, score, ...))
        is the (key, score) order because key/score lead and score is
        unique per branch) — vs two sequential TakeOrdered jobs."""
        key = _wgini(xp - bp, xn - bn, BP, BN)
        payload = F.struct(
            key.alias("key"),
            F.col("score"),
            xp.alias("_xp"),
            xn.alias("_xn"),
        )
        pick = (
            cands.groupBy("br")
            .agg(F.min(payload).alias("s"))
            .select("br", "s.*")
            .localCheckpoint()
        )

        def side(b, nm):
            return pick.filter(F.col("br") == b).select(
                F.col("score").alias(nm[0]),
                F.col("_xp").alias(nm[1]),
                F.col("_xn").alias(nm[2]),
            )

        return side(0, names[0]), side(1, names[1])

    zero = F.lit(0)
    cp, cn = F.col("cp"), F.col("cn")
    cands1 = cc.filter(cp + cn < F.col("tp") + F.col("tn"))
    root1 = _bt2_pick(
        cands1, cp, cn, zero, zero, F.col("tp"), F.col("tn"),
        ("t0", "cp0", "cn0"),
    )
    b1 = (
        cc.crossJoin(F.broadcast(root1))
        .filter(
            (F.col("score") < F.col("t0"))
            | (
                (F.col("score") > F.col("t0"))
                & (cp + cn < F.col("tp") + F.col("tn"))
            )
        )
        .withColumn(
            "br",
            F.when(F.col("score") < F.col("t0"), F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
    )
    is_l = F.col("br") == 0
    l1, r1 = _bt2_branch_picks(
        b1,
        cp,
        cn,
        F.when(is_l, zero).otherwise(F.col("cp0")),
        F.when(is_l, zero).otherwise(F.col("cn0")),
        F.when(is_l, F.col("cp0")).otherwise(F.col("tp") - F.col("cp0")),
        F.when(is_l, F.col("cn0")).otherwise(F.col("tn") - F.col("cn0")),
        (("tl", "cpl", "cnl"), ("tr", "cpr", "cnr")),
    )
    tot = c.select(
        F.col("p").alias("tp"), (F.col("n") - F.col("p")).alias("tn")
    ).limit(1)

    def sgn(pk, nk):
        return F.when(pk > nk, F.lit(1)).otherwise(F.lit(-1))

    def err_term(pk, nk):
        return F.when(pk > nk, nk).otherwise(pk)

    lv = [
        (F.col("cpl"), F.col("cnl")),
        (F.col("cp0") - F.col("cpl"), F.col("cn0") - F.col("cnl")),
        (F.col("cpr") - F.col("cp0"), F.col("cnr") - F.col("cn0")),
        (F.col("tp") - F.col("cpr"), F.col("tn") - F.col("cnr")),
    ]
    m1 = (
        root1.crossJoin(F.broadcast(l1))
        .crossJoin(F.broadcast(r1))
        .crossJoin(F.broadcast(tot))
        .select(
            # tp/tn are NOT carried out: cc already has them, and the
            # round-2 crossJoin would make the reference ambiguous
            "t0", "tl", "tr",
            "cp0", "cn0", "cpl", "cnl", "cpr", "cnr",
            *[sgn(pk, nk).alias(f"pr{i + 1}") for i, (pk, nk) in enumerate(lv)],
            (
                err_term(*lv[0]) + err_term(*lv[1])
                + err_term(*lv[2]) + err_term(*lv[3])
            ).cast("bigint").alias("e1"),
            (F.col("tp") + F.col("tn")).cast("bigint").alias("d1"),
        )
    )

    # pre-fold the per-region multipliers and the weighted TOTALS onto
    # the 1-row model table: they are scalars, and leaving them as
    # per-row when()/product expressions tripled the c2 expression
    # tree (measured on the first cut — cold plan compile dominated).
    # m1 is NOT separately checkpointed: m1w chains its select and ONE
    # materialization covers both — one fewer sequential job.
    dec = "decimal(38,0)"
    e1c = F.col("e1").cast(dec)
    rem = (F.col("d1") - F.col("e1")).cast(dec)

    def mp_s(k):
        return F.when(F.col(f"pr{k + 1}") == 1, e1c).otherwise(rem)

    def mn_s(k):
        return F.when(F.col(f"pr{k + 1}") == -1, e1c).otherwise(rem)

    loP_m = [F.lit(0), F.col("cpl"), F.col("cp0"), F.col("cpr")]
    hiP_m = [F.col("cpl"), F.col("cp0"), F.col("cpr"), F.col("tp")]
    loN_m = [F.lit(0), F.col("cnl"), F.col("cn0"), F.col("cnr")]
    hiN_m = [F.col("cnl"), F.col("cn0"), F.col("cnr"), F.col("tn")]
    m1w = m1.crossJoin(F.broadcast(tot)).select(
        "*",
        *[mp_s(k).alias(f"mp{k + 1}") for k in range(4)],
        *[mn_s(k).alias(f"mn{k + 1}") for k in range(4)],
        sum(
            mp_s(k) * (hiP_m[k] - loP_m[k]).cast(dec) for k in range(4)
        ).alias("wpt"),
        sum(
            mn_s(k) * (hiN_m[k] - loN_m[k]).cast(dec) for k in range(4)
        ).alias("wnt"),
    ).localCheckpoint()

    cand2 = cc.crossJoin(F.broadcast(m1w.drop("wpt", "wnt", "tp", "tn")))
    loP = [F.lit(0), F.col("cpl"), F.col("cp0"), F.col("cpr")]
    hiP = [F.col("cpl"), F.col("cp0"), F.col("cpr"), F.col("tp")]
    loN = [F.lit(0), F.col("cnl"), F.col("cn0"), F.col("cnr")]
    hiN = [F.col("cnl"), F.col("cn0"), F.col("cnr"), F.col("tn")]

    def clamp(x, lo, hi):
        return F.least(F.greatest(x, lo), hi)

    cwp = sum(
        F.col(f"mp{k + 1}") * (clamp(cp, loP[k], hiP[k]) - loP[k]).cast(dec)
        for k in range(4)
    )
    cwn = sum(
        F.col(f"mn{k + 1}") * (clamp(cn, loN[k], hiN[k]) - loN[k]).cast(dec)
        for k in range(4)
    )
    wtot = m1w.select("wpt", "wnt")
    # materialize the weighted cum table ONCE: the three round-2 picks
    # each scan it, and without the checkpoint every pick would
    # re-evaluate the 8 clamp/DECIMAL products per row (measured ~3x
    # the wall)
    c2 = (
        cand2.filter(cp + cn < F.col("tp") + F.col("tn"))
        .crossJoin(F.broadcast(wtot))
        .select(
            "score",
            cwp.alias("cwp"),
            cwn.alias("cwn"),
            "wpt",
            "wnt",
        )
        .localCheckpoint()
    )
    xwp, xwn = F.col("cwp"), F.col("cwn")
    dzero = F.lit(0).cast(dec)
    root2 = _bt2_pick(
        c2, xwp, xwn, dzero, dzero, F.col("wpt"), F.col("wnt"),
        ("u0", "wp0", "wn0", "wpt", "wnt"),
    )
    b2 = (
        c2.drop("wpt", "wnt")
        .crossJoin(F.broadcast(root2))
        .filter(F.col("score") != F.col("u0"))
        .withColumn(
            "br",
            F.when(F.col("score") < F.col("u0"), F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
    )
    is_l2 = F.col("br") == 0
    l2, r2 = _bt2_branch_picks(
        b2,
        xwp,
        xwn,
        F.when(is_l2, dzero).otherwise(F.col("wp0")),
        F.when(is_l2, dzero).otherwise(F.col("wn0")),
        F.when(is_l2, F.col("wp0")).otherwise(
            F.col("wpt") - F.col("wp0")
        ),
        F.when(is_l2, F.col("wn0")).otherwise(
            F.col("wnt") - F.col("wn0")
        ),
        (("ul", "wpl", "wnl"), ("ur", "wpr", "wnr")),
    )
    wv = [
        (F.col("wpl"), F.col("wnl")),
        (F.col("wp0") - F.col("wpl"), F.col("wn0") - F.col("wnl")),
        (F.col("wpr") - F.col("wp0"), F.col("wnr") - F.col("wn0")),
        (F.col("wpt") - F.col("wpr"), F.col("wnt") - F.col("wnr")),
    ]
    m2 = (
        root2.crossJoin(F.broadcast(l2))
        .crossJoin(F.broadcast(r2))
        .select(
            "u0", "ul", "ur",
            *[sgn(pk, nk).alias(f"qr{i + 1}") for i, (pk, nk) in enumerate(wv)],
            (
                err_term(*wv[0]) + err_term(*wv[1])
                + err_term(*wv[2]) + err_term(*wv[3])
            ).cast(dec).alias("e2"),
            (F.col("wpt") + F.col("wnt")).cast(dec).alias("d2"),
        )
        .localCheckpoint()
    )

    # consume the MATERIALIZED m1w (m1's columns ride on it) so the
    # residual plan references only checkpointed tables
    m1s = m1w.drop(
        "tp", "tn", "wpt", "wnt",
        "mp1", "mp2", "mp3", "mp4", "mn1", "mn2", "mn3", "mn4",
    )
    w = cc.crossJoin(F.broadcast(m1s)).crossJoin(F.broadcast(m2))
    h1 = (
        F.when(F.col("score") <= F.col("tl"), F.col("pr1"))
        .when(F.col("score") <= F.col("t0"), F.col("pr2"))
        .when(F.col("score") <= F.col("tr"), F.col("pr3"))
        .otherwise(F.col("pr4"))
    )
    h2 = (
        F.when(F.col("score") <= F.col("ul"), F.col("qr1"))
        .when(F.col("score") <= F.col("u0"), F.col("qr2"))
        .when(F.col("score") <= F.col("ur"), F.col("qr3"))
        .otherwise(F.col("qr4"))
    )
    a1 = F.lit(0.5) * F.log(
        (F.col("d1") - F.col("e1")).cast("double")
        / F.col("e1").cast("double")
    )
    a2 = F.lit(0.5) * F.log(
        (F.col("d2") - F.col("e2")).cast("double")
        / F.col("e2").cast("double")
    )
    hit = F.col("pos")
    miss = F.col("cnt") - F.col("pos")
    accrow = w.agg(
        F.sum("cnt").cast("bigint").alias("nn"),
        F.sum(F.when(a1 * h1 > 0, hit).otherwise(miss))
        .cast("bigint")
        .alias("u1"),
        F.sum(F.when(a1 * h1 + a2 * h2 > 0, hit).otherwise(miss))
        .cast("bigint")
        .alias("u2"),
    )
    wide = accrow.crossJoin(F.broadcast(m1s)).crossJoin(F.broadcast(m2))
    row1 = wide.select(
        F.lit(1).cast("int").alias("round"),
        F.col("t0").alias("t_root"),
        F.col("tl").alias("t_left"),
        F.col("tr").alias("t_right"),
        *[F.col(f"pr{k}").cast("bigint").alias(f"pred_l{k}") for k in (1, 2, 3, 4)],
        pround(
            F.col("e1").cast("double") / F.col("d1").cast("double"), 6
        ).alias("w_err"),
        pround(a1, 6).alias("alpha"),
        pround(
            F.col("u1").cast("double") / F.col("nn").cast("double"), 6
        ).alias("acc"),
    )
    row2 = wide.select(
        F.lit(2).cast("int").alias("round"),
        F.col("u0").alias("t_root"),
        F.col("ul").alias("t_left"),
        F.col("ur").alias("t_right"),
        *[F.col(f"qr{k}").cast("bigint").alias(f"pred_l{k}") for k in (1, 2, 3, 4)],
        pround(
            F.col("e2").cast("double") / F.col("d2").cast("double"), 6
        ).alias("w_err"),
        pround(a2, 6).alias("alpha"),
        pround(
            F.col("u2").cast("double") / F.col("nn").cast("double"), 6
        ).alias("acc"),
    )
    return row1.unionAll(row2)


# ---------------------------------------------------------------------------
# q_boosted_multifeat — 2-round exact AdaBoost of MULTI-FEATURE
# depth-1 stumps (round 14, VERDICT r13 #4): the composition of the
# two round-13 trainer pieces. q_tree_multifeat proved the per-node
# multi-FEATURE split search; q_boosted_tree2 proved the boosting
# loop; this boosts weak learners that each search ALL THREE published
# feature columns — the last structural step to the reference's
# XGBClassifier loop (train_model.py:69-80: boosted rounds over
# multi-feature trees).
# ---------------------------------------------------------------------------


def _bmf_oracle() -> str:
    """DuckDB twin of q_boosted_multifeat. The weighted per-(feat,val)
    table is recomputed readably (branch-CASE multipliers x raw counts
    folded over br, then plain per-feat cumulative windows); the Spark
    side computes the SAME integers through the bucket-offset _mf_cum
    machinery. HUGEINT mirrors DECIMAL(38,0)."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, label FROM f" for f in _MF_FEATS
    )
    u2 = " UNION ALL ".join(
        f"SELECT br, '{f}' AS feat, {f} AS val, label FROM f2"
        for f in _MF_FEATS
    )
    key1 = _gini_key_sql("0", "0", "n", "p")
    key2 = _wgini_sql("cwp", "cwn", "wpt", "wnt")
    pick_f = "CASE f1 WHEN 'disc' THEN f.disc WHEN 'price' THEN f.price ELSE f.qty END"
    pick_g = "CASE ff WHEN 'disc' THEN f.disc WHEN 'price' THEN f.price ELSE f.qty END"
    a1 = "(0.5 * LN(CAST(d1 - e1 AS DOUBLE) / CAST(e1 AS DOUBLE)))"
    a2 = "(0.5 * LN(CAST(d2 - e2 AS DOUBLE) / CAST(e2 AS DOUBLE)))"
    h1 = "(CASE WHEN b1 = 0 THEN pr_l ELSE pr_r END)"
    h2 = "(CASE WHEN b2 = 0 THEN qr_l ELSE qr_r END)"
    return (
        "WITH f AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        f"AS label, {fsel} FROM lineitem), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u GROUP BY feat, val), "
        "t AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS p FROM f), "
        "c AS MATERIALIZED (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) "
        "AS cum_n, "
        "CAST(SUM(pos) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) "
        "AS cum_p, n, p FROM g, t), "
        "pick1 AS MATERIALIZED (SELECT feat AS f1, val AS t1, "
        "CAST(cum_p AS BIGINT) AS pl, CAST(cum_n - cum_p AS BIGINT) AS nl, "
        f"n, p FROM c WHERE cum_n < n ORDER BY {key1}, feat, val LIMIT 1), "
        "m1 AS MATERIALIZED (SELECT f1, t1, pl, nl, p, n, "
        "CASE WHEN pl > nl THEN 1 ELSE -1 END AS pr_l, "
        "CASE WHEN p - pl > (n - p) - nl THEN 1 ELSE -1 END AS pr_r, "
        "CAST(CASE WHEN pl > nl THEN nl ELSE pl END "
        "+ CASE WHEN p - pl > (n - p) - nl THEN (n - p) - nl "
        "ELSE p - pl END AS BIGINT) AS e1, "
        "CAST(n AS BIGINT) AS d1 FROM pick1), "
        "mw AS MATERIALIZED (SELECT m1.*, "
        "CAST(CASE WHEN pr_l = 1 THEN e1 ELSE d1 - e1 END AS HUGEINT) "
        "AS mp_l, "
        "CAST(CASE WHEN pr_r = 1 THEN e1 ELSE d1 - e1 END AS HUGEINT) "
        "AS mp_r, "
        "CAST(CASE WHEN pr_l = -1 THEN e1 ELSE d1 - e1 END AS HUGEINT) "
        "AS mn_l, "
        "CAST(CASE WHEN pr_r = -1 THEN e1 ELSE d1 - e1 END AS HUGEINT) "
        "AS mn_r FROM m1), "
        "mt AS MATERIALIZED (SELECT mw.*, "
        "CAST(pl AS HUGEINT) * mp_l + CAST(p - pl AS HUGEINT) * mp_r "
        "AS wpt, "
        "CAST(nl AS HUGEINT) * mn_l + CAST((n - p) - nl AS HUGEINT) * mn_r "
        "AS wnt FROM mw), "
        f"f2 AS (SELECT f.*, CASE WHEN ({pick_f}) <= t1 THEN 0 ELSE 1 END "
        "AS br FROM f, mt), "
        f"u2 AS ({u2}), "
        "g2 AS (SELECT br, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u2 GROUP BY br, feat, val), "
        "w2 AS (SELECT feat, val, "
        "CAST(SUM(CAST(pos AS HUGEINT) "
        "* (CASE WHEN br = 0 THEN mp_l ELSE mp_r END)) AS HUGEINT) AS wp, "
        "CAST(SUM(CAST(cnt - pos AS HUGEINT) "
        "* (CASE WHEN br = 0 THEN mn_l ELSE mn_r END)) AS HUGEINT) AS wn "
        "FROM g2, mt GROUP BY feat, val), "
        "c2 AS MATERIALIZED (SELECT feat, val, "
        "CAST(SUM(wp) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cwp, "
        "CAST(SUM(wn) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cwn FROM w2), "
        "pick2 AS MATERIALIZED (SELECT feat AS ff, val AS t2, "
        "cwp AS wpl, cwn AS wnl FROM c2, mt "
        f"WHERE cwp + cwn < wpt + wnt ORDER BY {key2}, feat, val LIMIT 1), "
        "m2 AS MATERIALIZED (SELECT ff, t2, "
        "CASE WHEN wpl > wnl THEN 1 ELSE -1 END AS qr_l, "
        "CASE WHEN wpt - wpl > wnt - wnl THEN 1 ELSE -1 END AS qr_r, "
        "CAST(CASE WHEN wpl > wnl THEN wnl ELSE wpl END "
        "+ CASE WHEN wpt - wpl > wnt - wnl THEN wnt - wnl "
        "ELSE wpt - wpl END AS HUGEINT) AS e2, "
        "CAST(wpt + wnt AS HUGEINT) AS d2 FROM pick2, mt), "
        f"cells AS (SELECT CASE WHEN ({pick_f}) <= t1 THEN 0 ELSE 1 END "
        "AS b1, "
        f"CASE WHEN ({pick_g}) <= t2 THEN 0 ELSE 1 END AS b2, "
        "CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(label) AS BIGINT) AS pos "
        "FROM f, mt, m2 GROUP BY b1, b2), "
        "acc AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS nn, "
        f"CAST(SUM(CASE WHEN {a1} * {h1} > 0 THEN pos "
        "ELSE cnt - pos END) AS BIGINT) AS u1, "
        f"CAST(SUM(CASE WHEN {a1} * {h1} + {a2} * {h2} > 0 THEN pos "
        "ELSE cnt - pos END) AS BIGINT) AS u2 "
        "FROM cells, mt, m2) "
        "SELECT CAST(1 AS INT) AS round, f1 AS feat, t1 AS threshold, "
        "CAST(pr_l AS BIGINT) AS pred_left, "
        "CAST(pr_r AS BIGINT) AS pred_right, "
        + sql_round("CAST(e1 AS DOUBLE) / CAST(d1 AS DOUBLE)", 6)
        + " AS w_err, " + sql_round(a1, 6) + " AS alpha, "
        + sql_round("CAST(u1 AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + " AS acc FROM mt, acc "
        "UNION ALL "
        "SELECT CAST(2 AS INT), ff, t2, "
        "CAST(qr_l AS BIGINT), CAST(qr_r AS BIGINT), "
        + sql_round("CAST(e2 AS DOUBLE) / CAST(d2 AS DOUBLE)", 6) + ", "
        + sql_round(a2, 6) + ", "
        + sql_round("CAST(u2 AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + " FROM m2, mt, acc"
    )


@query(
    "q_boosted_multifeat",
    oracle=_bmf_oracle(),
    tags=("ml", "train", "boost"),
    eager=True,
)
def q_boosted_multifeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 2-round AdaBoost ensemble whose weak learner is a
    MULTI-FEATURE depth-1 stump: each round runs q_tree_multifeat's
    root split search (exact Gini argmin across all three published
    feature columns), and rounds are chained by q_boosted_tree2's
    closed-form rational reweighting — the composition VERDICT r13 #4
    asked for, and the last structural step to the reference's
    XGBClassifier loop (train_model.py:69-80: boosted rounds over
    multi-feature trees; round 1 here IS q_tree_multifeat's root,
    test-pinned). Emits one row per round: winning feature, threshold,
    leaf sign predictions, weighted error, alpha, ensemble accuracy.

    Exactness: round-1 counts are the raw per-(feat,val) prefix
    integers; round-2 weights multiply each (branch, label) class by
    e1 (correct) or d1-e1 (misclassified) — the q_boosted_stumps
    rational trick — so every weighted cell, cum, total, and error is
    an exact DECIMAL(38,0)/HUGEINT integer (max magnitude d1^2 = n^2:
    headroom to n ~ 1e19). Split keys are the shared _wgini/_wgini_sql
    text; argmins ORDER BY (key, feat, val); alphas are the documented
    LN house class (rounded, never compared to a threshold across
    engines except through the sign tests both engines evaluate on the
    same doubles). Assumes the weak learner is imperfect and better
    than chance (1 <= e < d, the q_boosted_tree2 contract).

    Scale: TWO fact passes — the honest R-pass shape for R boosting
    rounds over multi-feature learners (pass r's per-(feat,val) fold
    must condition on the previous stumps' branch bits, which no
    closed form over round-1 prefix tables can express for feat !=
    f1). Each pass is one stack-explode map-side-combined fold;
    prefix cums ride the bucket-offset _mf_cum machinery
    (DECIMAL-preserving overload) — broadcast <=~1.5k-row offset
    tables + partitioned windows, never a global sort; picks are
    TakeOrdered(1) over bounded distinct-value tables; all model
    state moves as broadcast 1-row tables. The ensemble-accuracy fold
    costs NO extra fact scan: the (b1, b2) joint is read off the
    checkpointed pass-2 cell table restricted to the round-2 winning
    feature (the oracle recomputes it from raw rows — same integers,
    readable form). Eager by construction (the checkpointed model
    chain)."""
    base = _mf_base(spark, sf_dir)
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("p"),
    )
    g1 = _mf_unpivot(base, []).groupBy("feat", "val").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    c1 = _mf_cum(g1, ["feat"]).crossJoin(F.broadcast(tot))
    zero = F.lit(0)
    pick1 = (
        c1.filter(F.col("cum_n") < F.col("n"))
        .withColumn("key", _tree_key(zero, zero, F.col("n"), F.col("p")))
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            F.col("feat").alias("f1"),
            F.col("val").alias("t1"),
            F.col("cum_p").cast("bigint").alias("pl"),
            (F.col("cum_n") - F.col("cum_p")).cast("bigint").alias("nl"),
            "n",
            "p",
        )
    )

    def sgn(pk, nk):
        return F.when(pk > nk, F.lit(1)).otherwise(F.lit(-1))

    def err_term(pk, nk):
        return F.when(pk > nk, nk).otherwise(pk)

    pl, nl = F.col("pl"), F.col("nl")
    prp = F.col("p") - pl
    prn = (F.col("n") - F.col("p")) - nl
    m1 = pick1.select(
        "f1", "t1", "pl", "nl", "p", "n",
        sgn(pl, nl).alias("pr_l"),
        sgn(prp, prn).alias("pr_r"),
        (err_term(pl, nl) + err_term(prp, prn)).cast("bigint").alias("e1"),
        F.col("n").cast("bigint").alias("d1"),
    )
    # pre-fold the per-branch multipliers and weighted TOTALS as
    # scalars on the ONE checkpointed model row (the q_boosted_tree2
    # discipline — m1 is not separately materialized)
    dec = "decimal(38,0)"
    e1c = F.col("e1").cast(dec)
    rem = (F.col("d1") - F.col("e1")).cast(dec)
    mp_l = F.when(F.col("pr_l") == 1, e1c).otherwise(rem)
    mp_r = F.when(F.col("pr_r") == 1, e1c).otherwise(rem)
    mn_l = F.when(F.col("pr_l") == -1, e1c).otherwise(rem)
    mn_r = F.when(F.col("pr_r") == -1, e1c).otherwise(rem)
    m1w = m1.select(
        "*",
        mp_l.alias("mp_l"),
        mp_r.alias("mp_r"),
        mn_l.alias("mn_l"),
        mn_r.alias("mn_r"),
        (
            pl.cast(dec) * mp_l + prp.cast(dec) * mp_r
        ).alias("wpt"),
        (
            nl.cast(dec) * mn_l + prn.cast(dec) * mn_r
        ).alias("wnt"),
    ).localCheckpoint()

    featval = {
        "disc": F.col("disc"),
        "price": F.col("price"),
        "qty": F.col("qty"),
    }

    def branch_of(fcol, tcol):
        v = (
            F.when(fcol == "disc", featval["disc"])
            .when(fcol == "price", featval["price"])
            .otherwise(featval["qty"])
        )
        return F.when(v <= tcol, F.lit(0)).otherwise(F.lit(1))

    f2 = base.crossJoin(F.broadcast(m1w.select("f1", "t1"))).withColumn(
        "br", branch_of(F.col("f1"), F.col("t1"))
    )
    # materialized ONCE: the round-2 cum table derives from it AND the
    # accuracy fold below reads the (b1, b2) joint off it (restricted
    # to the winning round-2 feature, every row appears exactly once),
    # so the ensemble-accuracy pass costs NO extra fact scan — R fact
    # passes total for R rounds, not R+1
    g2 = (
        _mf_unpivot(f2, ["br"])
        .groupBy("br", "feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .localCheckpoint()
    )
    mults = m1w.select("mp_l", "mp_r", "mn_l", "mn_r")
    w2 = (
        g2.crossJoin(F.broadcast(mults))
        .select(
            "feat",
            "val",
            (
                F.col("pos").cast(dec)
                * F.when(F.col("br") == 0, F.col("mp_l")).otherwise(
                    F.col("mp_r")
                )
            ).alias("wp"),
            (
                (F.col("cnt") - F.col("pos")).cast(dec)
                * F.when(F.col("br") == 0, F.col("mn_l")).otherwise(
                    F.col("mn_r")
                )
            ).alias("wn"),
        )
        .groupBy("feat", "val")
        .agg(F.sum("wp").cast(dec).alias("wp"), F.sum("wn").cast(dec).alias("wn"))
    )
    c2 = _mf_cum(
        w2.select(
            "feat", "val", F.col("wn").alias("cnt"), F.col("wp").alias("pos")
        ),
        ["feat"],
        out_cast=dec,
    ).select(
        "feat",
        "val",
        F.col("cum_p").alias("cwp"),
        F.col("cum_n").alias("cwn"),
    )
    tw = m1w.select("wpt", "wnt")
    cwp, cwn = F.col("cwp"), F.col("cwn")
    pick2 = (
        c2.crossJoin(F.broadcast(tw))
        .filter(cwp + cwn < F.col("wpt") + F.col("wnt"))
        .withColumn("key", _wgini(cwp, cwn, F.col("wpt"), F.col("wnt")))
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            F.col("feat").alias("ff"),
            F.col("val").alias("t2"),
            cwp.alias("wpl"),
            cwn.alias("wnl"),
            "wpt",
            "wnt",
        )
    )
    wpl, wnl = F.col("wpl"), F.col("wnl")
    qrp = F.col("wpt") - wpl
    qrn = F.col("wnt") - wnl
    m2 = pick2.select(
        "ff",
        "t2",
        sgn(wpl, wnl).alias("qr_l"),
        sgn(qrp, qrn).alias("qr_r"),
        (err_term(wpl, wnl) + err_term(qrp, qrn)).cast(dec).alias("e2"),
        (F.col("wpt") + F.col("wnt")).cast(dec).alias("d2"),
    ).localCheckpoint()

    m1s = m1w.select("f1", "t1", "pr_l", "pr_r", "e1", "d1")
    # (b1, b2) joint off the checkpointed pass-2 cells: rows with
    # feat == ff partition the fact table exactly once, b1 IS the
    # carried br, b2 is the round-2 threshold test on val
    cells = (
        g2.crossJoin(F.broadcast(m2.select("ff", "t2")))
        .filter(F.col("feat") == F.col("ff"))
        .groupBy(
            F.col("br").alias("b1"),
            F.when(F.col("val") <= F.col("t2"), F.lit(0))
            .otherwise(F.lit(1))
            .alias("b2"),
        )
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("pos").cast("bigint").alias("pos"),
        )
    )
    a1 = F.lit(0.5) * F.log(
        (F.col("d1") - F.col("e1")).cast("double")
        / F.col("e1").cast("double")
    )
    a2 = F.lit(0.5) * F.log(
        (F.col("d2") - F.col("e2")).cast("double")
        / F.col("e2").cast("double")
    )
    h1 = F.when(F.col("b1") == 0, F.col("pr_l")).otherwise(F.col("pr_r"))
    h2 = F.when(F.col("b2") == 0, F.col("qr_l")).otherwise(F.col("qr_r"))
    acc = (
        cells.crossJoin(F.broadcast(m1s))
        .crossJoin(F.broadcast(m2))
        .agg(
            F.sum("cnt").cast("bigint").alias("nn"),
            F.sum(
                F.when(a1 * h1 > 0, F.col("pos")).otherwise(
                    F.col("cnt") - F.col("pos")
                )
            )
            .cast("bigint")
            .alias("u1"),
            F.sum(
                F.when(a1 * h1 + a2 * h2 > 0, F.col("pos")).otherwise(
                    F.col("cnt") - F.col("pos")
                )
            )
            .cast("bigint")
            .alias("u2"),
        )
    )
    wide = acc.crossJoin(F.broadcast(m1s)).crossJoin(F.broadcast(m2))
    row1 = wide.select(
        F.lit(1).cast("int").alias("round"),
        F.col("f1").alias("feat"),
        F.col("t1").alias("threshold"),
        F.col("pr_l").cast("bigint").alias("pred_left"),
        F.col("pr_r").cast("bigint").alias("pred_right"),
        pround(
            F.col("e1").cast("double") / F.col("d1").cast("double"), 6
        ).alias("w_err"),
        pround(a1, 6).alias("alpha"),
        pround(
            F.col("u1").cast("double") / F.col("nn").cast("double"), 6
        ).alias("acc"),
    )
    row2 = wide.select(
        F.lit(2).cast("int").alias("round"),
        F.col("ff").alias("feat"),
        F.col("t2").alias("threshold"),
        F.col("qr_l").cast("bigint").alias("pred_left"),
        F.col("qr_r").cast("bigint").alias("pred_right"),
        pround(
            F.col("e2").cast("double") / F.col("d2").cast("double"), 6
        ).alias("w_err"),
        pround(a2, 6).alias("alpha"),
        pround(
            F.col("u2").cast("double") / F.col("nn").cast("double"), 6
        ).alias("acc"),
    )
    return row1.unionAll(row2)


# ---------------------------------------------------------------------------
# q_boosted_mf_tree2 — 2-round exact AdaBoost of DEPTH-2 MULTI-FEATURE
# Gini trees (round 14): the FULL composition of the trainer ladder —
# q_tree_multifeat's per-node multi-feature split search at BOTH
# levels of each weak learner, chained by q_boosted_tree2's rational
# reweighting. Round 1 IS q_tree_multifeat's exact tree (test-pinned);
# this is the hash-checkable structural form of the reference's
# XGBClassifier loop (train_model.py:69-80: boosted rounds over
# multi-feature depth-5 trees) at the 2-round/depth-2 scale.
# ---------------------------------------------------------------------------

_MF_PICK_SQL = {
    "disc": "f.disc",
    "price": "f.price",
    "qty": "f.qty",
}


def _mf_val_case(fcol: str) -> str:
    """CASE <fcol> WHEN 'disc' ... — the branch-routing expression."""
    return (
        f"CASE {fcol} WHEN 'disc' THEN f.disc "
        "WHEN 'price' THEN f.price ELSE f.qty END"
    )


def _bmf2_oracle() -> str:
    """DuckDB twin of q_boosted_mf_tree2: the same integers through
    readable CTEs — raw per-(leaf/branch, feat, val) folds, plain
    per-key cumulative windows, two picks per level, HUGEINT weighted
    counts mirroring DECIMAL(38,0)."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, label FROM f" for f in _MF_FEATS
    )
    u2 = " UNION ALL ".join(
        f"SELECT br, '{f}' AS feat, {f} AS val, label FROM f2"
        for f in _MF_FEATS
    )
    u3 = " UNION ALL ".join(
        f"SELECT lf, '{f}' AS feat, {f} AS val, label FROM f3"
        for f in _MF_FEATS
    )
    u4 = " UNION ALL ".join(
        f"SELECT lf, b2, '{f}' AS feat, {f} AS val, label FROM f4"
        for f in _MF_FEATS
    )
    key1 = _gini_key_sql("0", "0", "n", "p")
    key1l = _gini_key_sql("0", "0", "bln", "blp")
    key1r = _gini_key_sql("0", "0", "brn", "brp")
    key2 = _wgini_sql("cwp", "cwn", "wpt", "wnt")
    key2l = _wgini_sql("cwp", "cwn", "wp0", "wn0")
    key2r = _wgini_sql("cwp", "cwn", "(wpt - wp0)", "(wnt - wn0)")
    a1 = "(0.5 * LN(CAST(d1 - e1 AS DOUBLE) / CAST(e1 AS DOUBLE)))"
    a2 = "(0.5 * LN(CAST(d2 - e2 AS DOUBLE) / CAST(e2 AS DOUBLE)))"
    h1 = (
        "(CASE k1 WHEN 1 THEN pr1 WHEN 2 THEN pr2 "
        "WHEN 3 THEN pr3 ELSE pr4 END)"
    )
    h2 = (
        "(CASE k2 WHEN 1 THEN qr1 WHEN 2 THEN qr2 "
        "WHEN 3 THEN qr3 ELSE qr4 END)"
    )
    leaf1 = (
        "CASE WHEN (" + _mf_val_case("rf1") + ") <= rt1 THEN "
        "(CASE WHEN (" + _mf_val_case("lf1") + ") <= lt1 "
        "THEN 1 ELSE 2 END) ELSE "
        "(CASE WHEN (" + _mf_val_case("rf1b") + ") <= rt1b "
        "THEN 3 ELSE 4 END) END"
    )
    # per-leaf AdaBoost multipliers (positive- and negative-label rows)
    mp = (
        "(CASE lf WHEN 1 THEN (CASE WHEN pr1 = 1 THEN e1 ELSE d1 - e1 END) "
        "WHEN 2 THEN (CASE WHEN pr2 = 1 THEN e1 ELSE d1 - e1 END) "
        "WHEN 3 THEN (CASE WHEN pr3 = 1 THEN e1 ELSE d1 - e1 END) "
        "ELSE (CASE WHEN pr4 = 1 THEN e1 ELSE d1 - e1 END) END)"
    )
    mn = (
        "(CASE lf WHEN 1 THEN (CASE WHEN pr1 = -1 THEN e1 ELSE d1 - e1 END) "
        "WHEN 2 THEN (CASE WHEN pr2 = -1 THEN e1 ELSE d1 - e1 END) "
        "WHEN 3 THEN (CASE WHEN pr3 = -1 THEN e1 ELSE d1 - e1 END) "
        "ELSE (CASE WHEN pr4 = -1 THEN e1 ELSE d1 - e1 END) END)"
    )
    return (
        "WITH f AS (SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END "
        f"AS label, {fsel} FROM lineitem), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u GROUP BY feat, val), "
        "t AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(label) AS BIGINT) AS p FROM f), "
        "c AS MATERIALIZED (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) "
        "AS cum_n, "
        "CAST(SUM(pos) OVER (PARTITION BY feat ORDER BY val) AS BIGINT) "
        "AS cum_p, n, p FROM g, t), "
        # ---- round 1, level 1: q_tree_multifeat's root
        "root1 AS MATERIALIZED (SELECT feat AS rf1, val AS rt1, "
        "CAST(cum_n AS BIGINT) AS bln, CAST(cum_p AS BIGINT) AS blp, "
        "CAST(n - cum_n AS BIGINT) AS brn, CAST(p - cum_p AS BIGINT) "
        f"AS brp, n, p FROM c WHERE cum_n < n ORDER BY {key1}, feat, val "
        "LIMIT 1), "
        # ---- round 1, level 2: both child picks
        "f2 AS (SELECT f.*, CASE WHEN (" + _mf_val_case("rf1") + ") <= rt1 "
        "THEN 0 ELSE 1 END AS br FROM f, root1), "
        f"u2 AS ({u2}), "
        "g2 AS (SELECT br, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u2 GROUP BY br, feat, val), "
        "c2 AS MATERIALIZED (SELECT br, feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY br, feat ORDER BY val) AS BIGINT) "
        "AS cum_n, "
        "CAST(SUM(pos) OVER (PARTITION BY br, feat ORDER BY val) AS BIGINT) "
        "AS cum_p FROM g2), "
        "l1 AS MATERIALIZED (SELECT feat AS lf1, val AS lt1, "
        "CAST(cum_p AS BIGINT) AS llp, CAST(cum_n - cum_p AS BIGINT) AS llq "
        "FROM c2, root1 WHERE br = 0 AND cum_n < bln "
        f"ORDER BY {key1l}, feat, val LIMIT 1), "
        "r1 AS MATERIALIZED (SELECT feat AS rf1b, val AS rt1b, "
        "CAST(cum_p AS BIGINT) AS rlp, CAST(cum_n - cum_p AS BIGINT) AS rlq "
        "FROM c2, root1 WHERE br = 1 AND cum_n < brn "
        f"ORDER BY {key1r}, feat, val LIMIT 1), "
        # ---- round-1 model row: leaf stats, preds, error, multipliers
        "m1 AS MATERIALIZED (SELECT rf1, rt1, lf1, lt1, rf1b, rt1b, "
        "llp AS p1, llq AS q1, "
        "blp - llp AS p2, (bln - blp) - llq AS q2, "
        "rlp AS p3, rlq AS q3, "
        "brp - rlp AS p4, (brn - brp) - rlq AS q4, "
        "CASE WHEN llp > llq THEN 1 ELSE -1 END AS pr1, "
        "CASE WHEN blp - llp > (bln - blp) - llq THEN 1 ELSE -1 END AS pr2, "
        "CASE WHEN rlp > rlq THEN 1 ELSE -1 END AS pr3, "
        "CASE WHEN brp - rlp > (brn - brp) - rlq THEN 1 ELSE -1 END AS pr4, "
        "CAST(CASE WHEN llp > llq THEN llq ELSE llp END "
        "+ CASE WHEN blp - llp > (bln - blp) - llq "
        "THEN (bln - blp) - llq ELSE blp - llp END "
        "+ CASE WHEN rlp > rlq THEN rlq ELSE rlp END "
        "+ CASE WHEN brp - rlp > (brn - brp) - rlq "
        "THEN (brn - brp) - rlq ELSE brp - rlp END AS BIGINT) AS e1, "
        "CAST(n AS BIGINT) AS d1 FROM root1, l1, r1), "
        "mw AS MATERIALIZED (SELECT m1.*, "
        "CAST(CASE WHEN pr1 = 1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mp1, "
        "CAST(CASE WHEN pr2 = 1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mp2, "
        "CAST(CASE WHEN pr3 = 1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mp3, "
        "CAST(CASE WHEN pr4 = 1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mp4, "
        "CAST(CASE WHEN pr1 = -1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mn1, "
        "CAST(CASE WHEN pr2 = -1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mn2, "
        "CAST(CASE WHEN pr3 = -1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mn3, "
        "CAST(CASE WHEN pr4 = -1 THEN e1 ELSE d1 - e1 END AS HUGEINT) AS mn4 "
        "FROM m1), "
        "mt AS MATERIALIZED (SELECT mw.*, "
        "CAST(p1 AS HUGEINT) * mp1 + CAST(p2 AS HUGEINT) * mp2 "
        "+ CAST(p3 AS HUGEINT) * mp3 + CAST(p4 AS HUGEINT) * mp4 AS wpt, "
        "CAST(q1 AS HUGEINT) * mn1 + CAST(q2 AS HUGEINT) * mn2 "
        "+ CAST(q3 AS HUGEINT) * mn3 + CAST(q4 AS HUGEINT) * mn4 AS wnt "
        "FROM mw), "
        # ---- round 2, level 1: weighted multi-feature root
        f"f3 AS (SELECT f.*, {leaf1} AS lf FROM f, mt), "
        f"u3 AS ({u3}), "
        "g3 AS (SELECT lf, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u3 GROUP BY lf, feat, val), "
        "w3 AS (SELECT feat, val, "
        f"CAST(SUM(CAST(pos AS HUGEINT) * {mp}) AS HUGEINT) AS wp, "
        f"CAST(SUM(CAST(cnt - pos AS HUGEINT) * {mn}) AS HUGEINT) AS wn "
        "FROM g3, mt GROUP BY feat, val), "
        "c3 AS MATERIALIZED (SELECT feat, val, "
        "CAST(SUM(wp) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cwp, "
        "CAST(SUM(wn) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cwn FROM w3), "
        "root2 AS MATERIALIZED (SELECT feat AS rf2, val AS rt2, "
        "cwp AS wp0, cwn AS wn0 FROM c3, mt "
        f"WHERE cwp + cwn < wpt + wnt ORDER BY {key2}, feat, val LIMIT 1), "
        # ---- round 2, level 2: weighted child picks (fold carries the
        # round-1 leaf for the weights AND the accuracy joint below)
        "f4 AS (SELECT f.*, CASE WHEN (" + _mf_val_case("rf2")
        + ") <= rt2 THEN 0 ELSE 1 END AS b2 FROM f3 f, root2), "
        f"u4 AS ({u4}), "
        "g4 AS (SELECT lf, b2, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM u4 "
        "GROUP BY lf, b2, feat, val), "
        "w4 AS (SELECT b2, feat, val, "
        f"CAST(SUM(CAST(pos AS HUGEINT) * {mp}) AS HUGEINT) AS wp, "
        f"CAST(SUM(CAST(cnt - pos AS HUGEINT) * {mn}) AS HUGEINT) AS wn "
        "FROM g4, mt GROUP BY b2, feat, val), "
        "c4 AS MATERIALIZED (SELECT b2, feat, val, "
        "CAST(SUM(wp) OVER (PARTITION BY b2, feat ORDER BY val) AS HUGEINT) "
        "AS cwp, "
        "CAST(SUM(wn) OVER (PARTITION BY b2, feat ORDER BY val) AS HUGEINT) "
        "AS cwn FROM w4), "
        "l2 AS MATERIALIZED (SELECT feat AS lf2, val AS lt2, "
        "cwp AS wpl, cwn AS wnl FROM c4, root2 "
        "WHERE b2 = 0 AND cwp + cwn < wp0 + wn0 "
        f"ORDER BY {key2l}, feat, val LIMIT 1), "
        "r2 AS MATERIALIZED (SELECT feat AS rf2b, val AS rt2b, "
        "cwp AS wpr, cwn AS wnr FROM c4, root2, mt "
        "WHERE b2 = 1 AND cwp + cwn < (wpt - wp0) + (wnt - wn0) "
        f"ORDER BY {key2r}, feat, val LIMIT 1), "
        "m2 AS MATERIALIZED (SELECT rf2, rt2, lf2, lt2, rf2b, rt2b, "
        "CASE WHEN wpl > wnl THEN 1 ELSE -1 END AS qr1, "
        "CASE WHEN wp0 - wpl > wn0 - wnl THEN 1 ELSE -1 END AS qr2, "
        "CASE WHEN wpr > wnr THEN 1 ELSE -1 END AS qr3, "
        "CASE WHEN (wpt - wp0) - wpr > (wnt - wn0) - wnr "
        "THEN 1 ELSE -1 END AS qr4, "
        "CAST(CASE WHEN wpl > wnl THEN wnl ELSE wpl END "
        "+ CASE WHEN wp0 - wpl > wn0 - wnl THEN wn0 - wnl "
        "ELSE wp0 - wpl END "
        "+ CASE WHEN wpr > wnr THEN wnr ELSE wpr END "
        "+ CASE WHEN (wpt - wp0) - wpr > (wnt - wn0) - wnr "
        "THEN (wnt - wn0) - wnr ELSE (wpt - wp0) - wpr END AS HUGEINT) "
        "AS e2, "
        "CAST(wpt + wnt AS HUGEINT) AS d2 FROM root2, l2, r2, mt), "
        # ---- accuracy: (leaf1, leaf2) joint off the g4 fold restricted
        # to each branch's winning child feature
        "cells AS (SELECT lf AS k1, "
        "CAST(b2 * 2 + CASE WHEN val <= "
        "(CASE b2 WHEN 0 THEN lt2 ELSE rt2b END) THEN 1 ELSE 2 END "
        "AS BIGINT) AS k2, "
        "CAST(SUM(cnt) AS BIGINT) AS cnt, CAST(SUM(pos) AS BIGINT) AS pos "
        "FROM g4, m2 WHERE feat = (CASE b2 WHEN 0 THEN lf2 ELSE rf2b END) "
        "GROUP BY k1, k2), "
        "acc AS MATERIALIZED (SELECT CAST(SUM(cnt) AS BIGINT) AS nn, "
        f"CAST(SUM(CASE WHEN {a1} * {h1} > 0 THEN pos "
        "ELSE cnt - pos END) AS BIGINT) AS u1, "
        f"CAST(SUM(CASE WHEN {a1} * {h1} + {a2} * {h2} > 0 THEN pos "
        "ELSE cnt - pos END) AS BIGINT) AS u2 "
        "FROM cells, mt, m2) "
        "SELECT CAST(1 AS INT) AS round, rf1 AS feat_root, "
        "rt1 AS t_root, lf1 AS feat_left, lt1 AS t_left, "
        "rf1b AS feat_right, rt1b AS t_right, "
        "CAST(pr1 AS BIGINT) AS pred_l1, CAST(pr2 AS BIGINT) AS pred_l2, "
        "CAST(pr3 AS BIGINT) AS pred_l3, CAST(pr4 AS BIGINT) AS pred_l4, "
        + sql_round("CAST(e1 AS DOUBLE) / CAST(d1 AS DOUBLE)", 6)
        + " AS w_err, " + sql_round(a1, 6) + " AS alpha, "
        + sql_round("CAST(u1 AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + " AS acc FROM mt, acc "
        "UNION ALL "
        "SELECT CAST(2 AS INT), rf2, rt2, lf2, lt2, rf2b, rt2b, "
        "CAST(qr1 AS BIGINT), CAST(qr2 AS BIGINT), "
        "CAST(qr3 AS BIGINT), CAST(qr4 AS BIGINT), "
        + sql_round("CAST(e2 AS DOUBLE) / CAST(d2 AS DOUBLE)", 6) + ", "
        + sql_round(a2, 6) + ", "
        + sql_round("CAST(u2 AS DOUBLE) / CAST(nn AS DOUBLE)", 6)
        + " FROM m2, mt, acc"
    )


@query(
    "q_boosted_mf_tree2",
    oracle=_bmf2_oracle(),
    tags=("ml", "train", "boost"),
    eager=True,
)
def q_boosted_mf_tree2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 2-round AdaBoost ensemble whose weak learner is a
    DEPTH-2 MULTI-FEATURE greedy Gini tree — the FULL composition of
    the trainer ladder: every node of every round searches all three
    published feature columns exactly (q_tree_multifeat's per-node
    machinery), and rounds chain by q_boosted_tree2's closed-form
    rational reweighting per round-1 LEAF (correct rows x e1,
    misclassified x d1−e1). Round 1 IS q_tree_multifeat's exact tree
    (test-pinned). This is the reference XGBClassifier loop's
    structure (train_model.py:69-80: boosted rounds over multi-feature
    trees) at the hash-checkable 2-round/depth-2 scale. Emits one row
    per round: the three (feature, threshold) splits, four leaf sign
    predictions, weighted error, alpha, ensemble accuracy.

    Exactness: round-1 counts are raw per-(branch, feat, val) prefix
    integers; round-2 weights are one of eight per-(leaf, class)
    integer multipliers, so every weighted cell, cum, total and error
    is an exact DECIMAL(38,0)/HUGEINT integer (magnitudes <= d1² = n²,
    headroom to n ~ 1e19). Split keys are the shared
    _tree_key/_wgini text; argmins ORDER BY (key, feat, val); alphas
    are the LN house class (q_boosted_tree2 precedent). Assumes
    1 <= e < d per round (the boosting contract).

    Scale: FOUR fact passes — R·depth for R rounds of depth-d
    multi-feature learners, the level-synchronous distributed-trainer
    schedule (each pass one stack-explode map-side-combined fold; no
    closed form can cross a feature boundary, so every (round, level)
    pair honestly costs one pass). Prefix cums ride the bucket-offset
    _mf_cum machinery (DECIMAL-preserving); both child picks per level
    run in ONE per-branch struct-argmin job (the q_tree5 discipline);
    model state moves as broadcast 1-row tables; the ensemble-accuracy
    (leaf1, leaf2) joint reads off the checkpointed pass-4 fold
    restricted to each branch's winning child feature — no extra fact
    scan. Off-HEADLINE with a recorded BASELINE floor (the
    q_dedup_funnel double-charging precedent: its member costs are
    already benched via q_tree_multifeat / q_boosted_multifeat /
    q_boosted_tree2). Eager by construction."""
    base = _mf_base(spark, sf_dir)
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("p"),
    )
    dec = "decimal(38,0)"
    zero = F.lit(0)

    def sgn(pk, nk):
        return F.when(pk > nk, F.lit(1)).otherwise(F.lit(-1))

    def err_term(pk, nk):
        return F.when(pk > nk, nk).otherwise(pk)

    def val_of(fcol):
        return (
            F.when(fcol == "disc", F.col("disc"))
            .when(fcol == "price", F.col("price"))
            .otherwise(F.col("qty"))
        )

    # ---- round 1, level 1 (fact pass 1): q_tree_multifeat's root
    g1 = _mf_unpivot(base, []).groupBy("feat", "val").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    c1 = _mf_cum(g1, ["feat"]).crossJoin(F.broadcast(tot))
    root1 = (
        c1.filter(F.col("cum_n") < F.col("n"))
        .withColumn("key", _tree_key(zero, zero, F.col("n"), F.col("p")))
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            F.col("feat").alias("rf1"),
            F.col("val").alias("rt1"),
            F.col("cum_n").cast("bigint").alias("bln"),
            F.col("cum_p").cast("bigint").alias("blp"),
            (F.col("n") - F.col("cum_n")).cast("bigint").alias("brn"),
            (F.col("p") - F.col("cum_p")).cast("bigint").alias("brp"),
            "n",
            "p",
        )
        .localCheckpoint()
    )

    # ---- round 1, level 2 (fact pass 2): both child picks, one job
    f2 = base.crossJoin(F.broadcast(root1.select("rf1", "rt1"))).withColumn(
        "br",
        F.when(val_of(F.col("rf1")) <= F.col("rt1"), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    g2 = _mf_unpivot(f2, ["br"]).groupBy("br", "feat", "val").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    c2 = _mf_cum(g2, ["br", "feat"]).crossJoin(F.broadcast(root1))
    is_l = F.col("br") == 0
    nb1 = F.when(is_l, F.col("bln")).otherwise(F.col("brn"))
    pb1 = F.when(is_l, F.col("blp")).otherwise(F.col("brp"))
    cands2 = c2.filter(F.col("cum_n") < nb1).withColumn(
        "key", _tree_key(zero, zero, nb1, pb1)
    )
    picks1 = (
        cands2.groupBy("br")
        .agg(
            F.min(
                F.struct(
                    F.col("key"),
                    F.col("feat"),
                    F.col("val"),
                    F.col("cum_p").alias("_cp"),
                    (F.col("cum_n") - F.col("cum_p")).alias("_cq"),
                )
            ).alias("s")
        )
        .select("br", "s.*")
        .localCheckpoint()
    )
    l1 = picks1.filter(F.col("br") == 0).select(
        F.col("feat").alias("lf1"),
        F.col("val").alias("lt1"),
        F.col("_cp").alias("llp"),
        F.col("_cq").alias("llq"),
    )
    r1 = picks1.filter(F.col("br") == 1).select(
        F.col("feat").alias("rf1b"),
        F.col("val").alias("rt1b"),
        F.col("_cp").alias("rlp"),
        F.col("_cq").alias("rlq"),
    )

    # ---- round-1 model row: leaf stats, preds, error, multipliers,
    # weighted totals — ONE materialization
    lv = [
        (F.col("llp"), F.col("llq")),
        (F.col("blp") - F.col("llp"), (F.col("bln") - F.col("blp")) - F.col("llq")),
        (F.col("rlp"), F.col("rlq")),
        (F.col("brp") - F.col("rlp"), (F.col("brn") - F.col("brp")) - F.col("rlq")),
    ]
    m1 = (
        root1.crossJoin(F.broadcast(l1))
        .crossJoin(F.broadcast(r1))
        .select(
            "rf1", "rt1", "lf1", "lt1", "rf1b", "rt1b",
            *[pk.cast("bigint").alias(f"p{i + 1}") for i, (pk, _) in enumerate(lv)],
            *[qk.cast("bigint").alias(f"q{i + 1}") for i, (_, qk) in enumerate(lv)],
            *[sgn(pk, qk).alias(f"pr{i + 1}") for i, (pk, qk) in enumerate(lv)],
            sum(err_term(pk, qk) for pk, qk in lv)
            .cast("bigint")
            .alias("e1"),
            F.col("n").cast("bigint").alias("d1"),
        )
    )
    e1c = F.col("e1").cast(dec)
    rem = (F.col("d1") - F.col("e1")).cast(dec)

    def mp_k(k):
        return F.when(F.col(f"pr{k}") == 1, e1c).otherwise(rem)

    def mn_k(k):
        return F.when(F.col(f"pr{k}") == -1, e1c).otherwise(rem)

    m1w = m1.select(
        "*",
        *[mp_k(k).alias(f"mp{k}") for k in (1, 2, 3, 4)],
        *[mn_k(k).alias(f"mn{k}") for k in (1, 2, 3, 4)],
        sum(
            F.col(f"p{k}").cast(dec) * mp_k(k) for k in (1, 2, 3, 4)
        ).alias("wpt"),
        sum(
            F.col(f"q{k}").cast(dec) * mn_k(k) for k in (1, 2, 3, 4)
        ).alias("wnt"),
    ).localCheckpoint()

    splits1 = m1w.select("rf1", "rt1", "lf1", "lt1", "rf1b", "rt1b")
    leaf1 = F.when(
        val_of(F.col("rf1")) <= F.col("rt1"),
        F.when(val_of(F.col("lf1")) <= F.col("lt1"), F.lit(1)).otherwise(
            F.lit(2)
        ),
    ).otherwise(
        F.when(val_of(F.col("rf1b")) <= F.col("rt1b"), F.lit(3)).otherwise(
            F.lit(4)
        )
    )
    mults = m1w.select(
        *[F.col(f"mp{k}") for k in (1, 2, 3, 4)],
        *[F.col(f"mn{k}") for k in (1, 2, 3, 4)],
    )

    def mp_of(lf):
        return (
            F.when(lf == 1, F.col("mp1"))
            .when(lf == 2, F.col("mp2"))
            .when(lf == 3, F.col("mp3"))
            .otherwise(F.col("mp4"))
        )

    def mn_of(lf):
        return (
            F.when(lf == 1, F.col("mn1"))
            .when(lf == 2, F.col("mn2"))
            .when(lf == 3, F.col("mn3"))
            .otherwise(F.col("mn4"))
        )

    # ---- round 2, level 1 (fact pass 3): weighted multi-feature root
    f3 = base.crossJoin(F.broadcast(splits1)).withColumn("lf", leaf1)
    g3 = _mf_unpivot(f3, ["lf"]).groupBy("lf", "feat", "val").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    w3 = (
        g3.crossJoin(F.broadcast(mults))
        .select(
            "feat",
            "val",
            (F.col("pos").cast(dec) * mp_of(F.col("lf"))).alias("wp"),
            ((F.col("cnt") - F.col("pos")).cast(dec) * mn_of(F.col("lf"))).alias(
                "wn"
            ),
        )
        .groupBy("feat", "val")
        .agg(
            F.sum("wp").cast(dec).alias("wp"),
            F.sum("wn").cast(dec).alias("wn"),
        )
    )
    c3 = _mf_cum(
        w3.select("feat", "val", F.col("wn").alias("cnt"), F.col("wp").alias("pos")),
        ["feat"],
        out_cast=dec,
    ).select(
        "feat", "val", F.col("cum_p").alias("cwp"), F.col("cum_n").alias("cwn")
    )
    wtot = m1w.select("wpt", "wnt")
    root2 = (
        c3.crossJoin(F.broadcast(wtot))
        .filter(F.col("cwp") + F.col("cwn") < F.col("wpt") + F.col("wnt"))
        .withColumn(
            "key", _wgini(F.col("cwp"), F.col("cwn"), F.col("wpt"), F.col("wnt"))
        )
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            F.col("feat").alias("rf2"),
            F.col("val").alias("rt2"),
            F.col("cwp").alias("wp0"),
            F.col("cwn").alias("wn0"),
        )
        .localCheckpoint()
    )

    # ---- round 2, level 2 (fact pass 4): weighted child picks; the
    # fold carries the round-1 leaf for weights AND the accuracy joint
    f4 = f3.crossJoin(F.broadcast(root2.select("rf2", "rt2"))).withColumn(
        "b2",
        F.when(val_of(F.col("rf2")) <= F.col("rt2"), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    g4 = (
        _mf_unpivot(f4, ["lf", "b2"])
        .groupBy("lf", "b2", "feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .localCheckpoint()
    )
    w4 = (
        g4.crossJoin(F.broadcast(mults))
        .select(
            "b2",
            "feat",
            "val",
            (F.col("pos").cast(dec) * mp_of(F.col("lf"))).alias("wp"),
            ((F.col("cnt") - F.col("pos")).cast(dec) * mn_of(F.col("lf"))).alias(
                "wn"
            ),
        )
        .groupBy("b2", "feat", "val")
        .agg(
            F.sum("wp").cast(dec).alias("wp"),
            F.sum("wn").cast(dec).alias("wn"),
        )
    )
    c4 = _mf_cum(
        w4.select(
            "b2", "feat", "val", F.col("wn").alias("cnt"), F.col("wp").alias("pos")
        ),
        ["b2", "feat"],
        out_cast=dec,
    ).select(
        "b2",
        "feat",
        "val",
        F.col("cum_p").alias("cwp"),
        F.col("cum_n").alias("cwn"),
    )
    c4j = c4.crossJoin(F.broadcast(root2.select("wp0", "wn0"))).crossJoin(
        F.broadcast(wtot)
    )
    is_l2 = F.col("b2") == 0
    WPb = F.when(is_l2, F.col("wp0")).otherwise(F.col("wpt") - F.col("wp0"))
    WNb = F.when(is_l2, F.col("wn0")).otherwise(F.col("wnt") - F.col("wn0"))
    cands4 = c4j.filter(F.col("cwp") + F.col("cwn") < WPb + WNb).withColumn(
        "key", _wgini(F.col("cwp"), F.col("cwn"), WPb, WNb)
    )
    picks2 = (
        cands4.groupBy("b2")
        .agg(
            F.min(
                F.struct(
                    F.col("key"),
                    F.col("feat"),
                    F.col("val"),
                    F.col("cwp").alias("_wp"),
                    F.col("cwn").alias("_wn"),
                )
            ).alias("s")
        )
        .select("b2", "s.*")
        .localCheckpoint()
    )
    l2 = picks2.filter(F.col("b2") == 0).select(
        F.col("feat").alias("lf2"),
        F.col("val").alias("lt2"),
        F.col("_wp").alias("wpl"),
        F.col("_wn").alias("wnl"),
    )
    r2 = picks2.filter(F.col("b2") == 1).select(
        F.col("feat").alias("rf2b"),
        F.col("val").alias("rt2b"),
        F.col("_wp").alias("wpr"),
        F.col("_wn").alias("wnr"),
    )
    wv = [
        (F.col("wpl"), F.col("wnl")),
        (F.col("wp0") - F.col("wpl"), F.col("wn0") - F.col("wnl")),
        (F.col("wpr"), F.col("wnr")),
        (
            (F.col("wpt") - F.col("wp0")) - F.col("wpr"),
            (F.col("wnt") - F.col("wn0")) - F.col("wnr"),
        ),
    ]
    m2 = (
        root2.crossJoin(F.broadcast(l2))
        .crossJoin(F.broadcast(r2))
        .crossJoin(F.broadcast(wtot))
        .select(
            "rf2", "rt2", "lf2", "lt2", "rf2b", "rt2b",
            *[sgn(pk, qk).alias(f"qr{i + 1}") for i, (pk, qk) in enumerate(wv)],
            sum(err_term(pk, qk) for pk, qk in wv).cast(dec).alias("e2"),
            (F.col("wpt") + F.col("wnt")).cast(dec).alias("d2"),
        )
        .localCheckpoint()
    )

    # ---- accuracy: (leaf1, leaf2) joint off the checkpointed g4 fold
    childf = F.when(F.col("b2") == 0, F.col("lf2")).otherwise(F.col("rf2b"))
    childt = F.when(F.col("b2") == 0, F.col("lt2")).otherwise(F.col("rt2b"))
    cells = (
        g4.crossJoin(F.broadcast(m2.select("lf2", "lt2", "rf2b", "rt2b")))
        .filter(F.col("feat") == childf)
        .groupBy(
            F.col("lf").alias("k1"),
            (
                F.col("b2") * 2
                + F.when(F.col("val") <= childt, F.lit(1)).otherwise(F.lit(2))
            )
            .cast("bigint")
            .alias("k2"),
        )
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("pos").cast("bigint").alias("pos"),
        )
    )
    m1s = m1w.select(
        "rf1", "rt1", "lf1", "lt1", "rf1b", "rt1b",
        "pr1", "pr2", "pr3", "pr4", "e1", "d1",
    )
    a1 = F.lit(0.5) * F.log(
        (F.col("d1") - F.col("e1")).cast("double")
        / F.col("e1").cast("double")
    )
    a2 = F.lit(0.5) * F.log(
        (F.col("d2") - F.col("e2")).cast("double")
        / F.col("e2").cast("double")
    )

    def pred_case(kcol, names):
        return (
            F.when(kcol == 1, F.col(names[0]))
            .when(kcol == 2, F.col(names[1]))
            .when(kcol == 3, F.col(names[2]))
            .otherwise(F.col(names[3]))
        )

    h1 = pred_case(F.col("k1"), ["pr1", "pr2", "pr3", "pr4"])
    h2 = pred_case(F.col("k2"), ["qr1", "qr2", "qr3", "qr4"])
    acc = (
        cells.crossJoin(F.broadcast(m1s))
        .crossJoin(F.broadcast(m2))
        .agg(
            F.sum("cnt").cast("bigint").alias("nn"),
            F.sum(
                F.when(a1 * h1 > 0, F.col("pos")).otherwise(
                    F.col("cnt") - F.col("pos")
                )
            )
            .cast("bigint")
            .alias("u1"),
            F.sum(
                F.when(a1 * h1 + a2 * h2 > 0, F.col("pos")).otherwise(
                    F.col("cnt") - F.col("pos")
                )
            )
            .cast("bigint")
            .alias("u2"),
        )
    )
    wide = acc.crossJoin(F.broadcast(m1s)).crossJoin(F.broadcast(m2))
    row1 = wide.select(
        F.lit(1).cast("int").alias("round"),
        F.col("rf1").alias("feat_root"),
        F.col("rt1").alias("t_root"),
        F.col("lf1").alias("feat_left"),
        F.col("lt1").alias("t_left"),
        F.col("rf1b").alias("feat_right"),
        F.col("rt1b").alias("t_right"),
        *[F.col(f"pr{k}").cast("bigint").alias(f"pred_l{k}") for k in (1, 2, 3, 4)],
        pround(
            F.col("e1").cast("double") / F.col("d1").cast("double"), 6
        ).alias("w_err"),
        pround(a1, 6).alias("alpha"),
        pround(
            F.col("u1").cast("double") / F.col("nn").cast("double"), 6
        ).alias("acc"),
    )
    row2 = wide.select(
        F.lit(2).cast("int").alias("round"),
        F.col("rf2").alias("feat_root"),
        F.col("rt2").alias("t_root"),
        F.col("lf2").alias("feat_left"),
        F.col("lt2").alias("t_left"),
        F.col("rf2b").alias("feat_right"),
        F.col("rt2b").alias("t_right"),
        *[F.col(f"qr{k}").cast("bigint").alias(f"pred_l{k}") for k in (1, 2, 3, 4)],
        pround(
            F.col("e2").cast("double") / F.col("d2").cast("double"), 6
        ).alias("w_err"),
        pround(a2, 6).alias("alpha"),
        pround(
            F.col("u2").cast("double") / F.col("nn").cast("double"), 6
        ).alias("acc"),
    )
    return row1.unionAll(row2)


# ---------------------------------------------------------------------------
# q_xgb_round — ONE exact second-order (Newton) boosting round on the
# logistic objective (round 15, VERDICT r14 #1): the last algorithmic
# piece of the reference XGBClassifier loop (train_model.py:69-80,
# objective='binary:logistic', learning_rate=0.1, reg_lambda=1) not
# mirrored by the AdaBoost ladder. Starting from the published
# scorer's logit as the base margin (so p_i IS the 6-dp score), one
# round computes per-row gradients g = p - y and hessians h = p(1-p),
# searches all three features for the split maximizing the XGBoost
# gain G_L^2/(H_L+lambda) + G_R^2/(H_R+lambda) - G^2/(H+lambda), and
# emits the Newton leaf weights w = -G/(H+lambda) with shrinkage eta.
# ---------------------------------------------------------------------------

# XGBoost defaults mirrored from the reference config: reg_lambda = 1.0,
# learning_rate = 0.1 (train_model.py:69-80). Literals on both engines.
_XGB_SIG_SQL = (
    "1.0 / (1.0 + EXP(-(-2.0 + 0.03 * l_quantity + 9.0 * l_discount "
    "+ 0.8 * (l_extendedprice / 100000.0))))"
)


def _xgb_round_oracle() -> str:
    """DuckDB twin: same 6-dp feature/score grid, same exact integer
    g/h sufficient statistics, same gain argmin text."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM r" for f in _MF_FEATS
    )
    gl = "CAST(cum_g AS DOUBLE) / 1000000"
    hl = "CAST(cum_h AS DOUBLE) / 1000000000000"
    gr = "CAST(gt - cum_g AS DOUBLE) / 1000000"
    hr = "CAST(ht - cum_h AS DOUBLE) / 1000000000000"
    gt = "CAST(gt AS DOUBLE) / 1000000"
    ht = "CAST(ht AS DOUBLE) / 1000000000000"
    kl = f"(({gl}) * ({gl}) / (({hl}) + 1.0))"
    kr = f"(({gr}) * ({gr}) / (({hr}) + 1.0))"
    key = f"(0.0 - ({kl} + {kr}))"
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        # g_i = p_i - y_i in exact 1e-6 units; h_i = p_i(1-p_i) in
        # exact 1e-12 units — NO rounding anywhere: both are integer
        # functions of the 6-dp score integer u
        "r AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM u GROUP BY feat, val), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gu) AS HUGEINT) AS gt, "
        "CAST(SUM(hu) AS HUGEINT) AS ht FROM r), "
        "c AS (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_h, n, gt, ht FROM g, t) "
        "SELECT feat, val AS threshold, "
        "CAST(cum_n AS BIGINT) AS n_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        + sql_round(gl, 6) + " AS g_left, "
        + sql_round(hl, 6) + " AS h_left, "
        + sql_round(gr, 6) + " AS g_right, "
        + sql_round(hr, 6) + " AS h_right, "
        + sql_round(
            f"0.5 * (({kl} + {kr}) - ({gt}) * ({gt}) / (({ht}) + 1.0))", 6
        )
        + " AS gain, "
        + sql_round(f"0.0 - 0.1 * ({gl}) / (({hl}) + 1.0)", 6)
        + " AS w_left, "
        + sql_round(f"0.0 - 0.1 * ({gr}) / (({hr}) + 1.0)", 6)
        + " AS w_right "
        f"FROM c WHERE cum_n < n ORDER BY {key}, feat, val LIMIT 1"
    )


# Exact integer g/h sums WITHOUT Decimal aggregation (round 17,
# VERDICT r16 #6 — the bounded-width integer encoding, with the
# overflow-safety proof at the 100 TB row count N <= 1e12):
#
# * gu = u - label*1e6, so |gu| <= 1e6 per row and |SUM(gu)| <=
#   1e6 * N = 1e18 < 2^63-1 = 9.22e18 — BIGINT-safe through
#   N = 9.2e12 rows with >9x headroom at 1e12. The bound holds for
#   every partial sum too (a partial sums a subset), so it is
#   task-layout independent.
# * hu = u*(1e6-u) <= 2.5e11 per row — BIGINT sums overflow past
#   3.7e7 rows, which is why round 15 used DECIMAL(38,0). Instead,
#   split per ROW: hi = hu div 2^18 (<= 953675), lo = hu mod 2^18
#   (< 262144). SUM(hi) <= 9.54e17 and SUM(lo) <= 2.62e17 at
#   N = 1e12 — both BIGINT-safe with >9x headroom, every partial
#   included — and SUM(hu) = SUM(hi)*2^18 + SUM(lo) EXACTLY
#   (per-row integer identity, summed). The recombination runs in
#   DECIMAL(38,0) on the bounded aggregate table (one multiply-add
#   per group), so the emitted column is the same DECIMAL(38,0)
#   value and type as before — every downstream consumer
#   (prefix cums, the integer cover/monotone gates, the oracle
#   comparison) is bit-identical.
#
# Measured (r17, interleaved A/B at sf0.1): the (feat,val) histogram
# pass drops ~25-30% (1.4-1.8 s -> 1.0-1.3 s warm) because the hash
# aggregate runs on BIGINT instead of Decimal128 buffers; the shuffle
# also narrows (3 BIGINTs = 24 B vs 2 Decimals = 32 B per cell).
# The DuckDB oracles are untouched (they always summed in HUGEINT).

_HU_SPLIT = 262144  # 2^18


def _sum_gu_dec(col: str) -> F.Column:
    """Exact SUM of the 1e-6-unit gradient integers as DECIMAL(38,0),
    aggregated in BIGINT (proof above: safe through 9.2e12 rows)."""
    return F.sum(col).cast("decimal(38,0)")


def _sum_hu_dec(col: str) -> F.Column:
    """Exact SUM of the 1e-12-unit hessian integers as DECIMAL(38,0),
    via the two-column BIGINT hi/lo split (proof above)."""
    return (
        F.sum(F.expr(f"{col} div {_HU_SPLIT}")).cast("decimal(38,0)")
        * _HU_SPLIT
        + F.sum(F.expr(f"{col} % {_HU_SPLIT}"))
    ).cast("decimal(38,0)")


def _xgb_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> (label, disc, price, qty, u): the _mf_base feature
    grid plus the 6-dp published-score integer u = round(score*1e6) —
    the shared input of the Newton boosting rounds."""
    li = load_table(spark, sf_dir, "lineitem")
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
    return li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("label"),
        pround(F.col("l_discount").cast("double"), 6).alias("disc"),
        pround(F.col("l_extendedprice").cast("double") / 100000.0, 6).alias(
            "price"
        ),
        pround(F.col("l_quantity").cast("double"), 6).alias("qty"),
        u_int.alias("u"),
    )


def _xgb_gh(base: DataFrame, ucol: str = "u") -> DataFrame:
    """(label, feats, u*) -> (label, feats, gu, hu): the exact integer
    gradient/hessian encodings off the 6-dp margin integer."""
    return base.select(
        "label",
        "disc",
        "price",
        "qty",
        (F.col(ucol) - F.col("label") * 1000000).alias("gu"),
        (F.col(ucol) * (F.lit(1000000) - F.col(ucol))).alias("hu"),
    )


def _xgb_newton_pick(base: DataFrame, rnd: int | None = None) -> DataFrame:
    """One exact Newton split pick over (label, feats, gu, hu): totals
    fold + stack-explode (feat,val) g/h histogram + _mf_cum prefix
    sums + the gain-key TakeOrdered(1). ``rnd`` prepends a round
    column (q_xgb_round2's 2-row output); None emits q_xgb_round's
    1-row shape."""
    dec = "decimal(38,0)"
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        _sum_gu_dec("gu").alias("gt"),
        _sum_hu_dec("hu").alias("ht"),
    )
    g1 = (
        _mf_unpivot(base, ["gu", "hu"])
        .groupBy("feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    c = _mf_cum(
        g1,
        ["feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).crossJoin(F.broadcast(tot))
    gl = F.col("cum_g").cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    gr = (F.col("gt") - F.col("cum_g")).cast("double") / 1000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    gtd = F.col("gt").cast("double") / 1000000
    htd = F.col("ht").cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    head = [] if rnd is None else [F.lit(rnd).cast("int").alias("round")]
    return (
        c.filter(F.col("cum_n") < F.col("n"))
        .withColumn("key", key)
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            *head,
            "feat",
            F.col("val").alias("threshold"),
            F.col("cum_n").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("cum_n")).cast("bigint").alias("n_right"),
            pround(gl, 6).alias("g_left"),
            pround(hl, 6).alias("h_left"),
            pround(gr, 6).alias("g_right"),
            pround(hr, 6).alias("h_right"),
            pround(
                F.lit(0.5)
                * ((kl + kr) - (gtd * gtd) / (htd + F.lit(1.0))),
                6,
            ).alias("gain"),
            pround(F.lit(0.0) - F.lit(0.1) * gl / (hl + F.lit(1.0)), 6).alias(
                "w_left"
            ),
            pround(F.lit(0.0) - F.lit(0.1) * gr / (hr + F.lit(1.0)), 6).alias(
                "w_right"
            ),
        )
    )


@query(
    "q_xgb_round",
    oracle=_xgb_round_oracle(),
    tags=("ml", "train", "boosting"),
)
def q_xgb_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Newton (second-order) boosting round on the logistic
    objective — the algorithmic core of the reference's
    XGBClassifier(objective='binary:logistic', learning_rate=0.1)
    (train_model.py:69-80) that AdaBoost reweighting does not express.
    The published scorer's logit is the base margin, so p_i is exactly
    the 6-dp score: per-row gradient g_i = p_i - y_i and hessian
    h_i = p_i(1-p_i) are INTEGER functions of the score integer
    u = round(score*1e6) — g in 1e-6 units (u - y*1e6), h in 1e-12
    units (u*(1e6-u)) — with no rounding anywhere. The split search
    maximizes the XGBoost structure-score gain
    G_L^2/(H_L+lambda) + G_R^2/(H_R+lambda) - G^2/(H+lambda) over all
    three published feature columns (the q_tree_multifeat candidate
    grid), lambda = 1 (the library default the reference inherits);
    leaf weights are the Newton step w = -G/(H+lambda) scaled by the
    reference's learning_rate 0.1. One row out: winning (feat,
    threshold), exact branch counts, the G/H sums, gain, and both
    shrunken leaf weights.

    Exactness: all sufficient statistics (per-(feat,val) counts and
    g/h sums, their prefix cums, and the totals) are EXACT integers —
    DECIMAL(38,0) on Spark, HUGEINT on DuckDB (per-row |gu| <= 1e6 and
    hu <= 2.5e11, so sums stay exact past 1e12 rows on both engines);
    the gain key and all emitted doubles are computed from those
    integers with IDENTICAL expression text, and the argmin ORDER BY
    (key, feat, val) is the q_tree_multifeat tie-break. Feature values
    and the score are 6-dp pround-ed BEFORE grouping so distinct/tie
    structure matches DuckDB's.

    Scale: ONE stack-explode fact pass (3x rows, map-side-combined
    before the only shuffle on (feat, val)) + one 3-scalar fact fold
    for the totals; prefix cums ride the bucket-offset _mf_cum
    machinery (broadcast <=~1.5k-row offset tables + partitioned
    windows, never a global sort); the pick is TakeOrdered(1) over the
    bounded distinct-value table. Adding rounds costs one such pass
    each with the margin updated by the compiled leaf CASE — the exact
    distributed-XGBoost histogram shape at 100 TB."""
    return _xgb_newton_pick(_xgb_gh(_xgb_base(spark, sf_dir)))


# ---------------------------------------------------------------------------
# q_xgb_round2 — TWO shrinkage-chained Newton rounds (round 15,
# VERDICT r14 #7d): round 1 is exactly q_xgb_round's pick
# (test-pinned); the margin is then updated by the compiled leaf CASE
# (logit(p) + the picked 6-dp leaf weight) and round 2 re-derives
# g/h off the new 6-dp margin integer and searches again — the
# reference XGBoost loop's actual iteration, one level-synchronous
# histogram pass per round.
# ---------------------------------------------------------------------------


def _xgb_pick_sql(
    rnd: int | None, src: str, extra_cols: str = "", node: str | None = None
) -> str:
    """One Newton pick as SQL over a cum CTE ``src`` carrying
    (feat, val, cum_n, cum_g, cum_h, n, gt, ht). ``rnd`` labels the
    boosting-round outputs (q_xgb_round2/q_xgb_fit); ``node`` labels
    the tree-node outputs (q_xgb_tree2) instead."""
    if node is not None:
        extra_cols = f"'{node}' AS node, " + extra_cols
    gl = "CAST(cum_g AS DOUBLE) / 1000000"
    hl = "CAST(cum_h AS DOUBLE) / 1000000000000"
    gr = "CAST(gt - cum_g AS DOUBLE) / 1000000"
    hr = "CAST(ht - cum_h AS DOUBLE) / 1000000000000"
    gt = "CAST(gt AS DOUBLE) / 1000000"
    ht = "CAST(ht AS DOUBLE) / 1000000000000"
    kl = f"(({gl}) * ({gl}) / (({hl}) + 1.0))"
    kr = f"(({gr}) * ({gr}) / (({hr}) + 1.0))"
    key = f"(0.0 - ({kl} + {kr}))"
    return (
        f"SELECT {extra_cols}"
        + (f"CAST({rnd} AS INT) AS round, " if rnd is not None else "")
        + "feat, "
        "val AS threshold, "
        "CAST(cum_n AS BIGINT) AS n_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        + sql_round(gl, 6) + " AS g_left, "
        + sql_round(hl, 6) + " AS h_left, "
        + sql_round(gr, 6) + " AS g_right, "
        + sql_round(hr, 6) + " AS h_right, "
        + sql_round(
            f"0.5 * (({kl} + {kr}) - ({gt}) * ({gt}) / (({ht}) + 1.0))", 6
        )
        + " AS gain, "
        + sql_round(f"0.0 - 0.1 * ({gl}) / (({hl}) + 1.0)", 6)
        + " AS w_left, "
        + sql_round(f"0.0 - 0.1 * ({gr}) / (({hr}) + 1.0)", 6)
        + " AS w_right "
        f"FROM {src} WHERE cum_n < n ORDER BY {key}, feat, val LIMIT 1"
    )


def _xgb_round2_oracle() -> str:
    """DuckDB twin of the 2-round chain: round-1 CTEs are the
    q_xgb_round oracle's verbatim; the MATERIALIZED pick drives the
    margin update; round-2 repeats the fold on u2."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )

    def unpivot(src):
        return " UNION ALL ".join(
            f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM {src}"
            for f in _MF_FEATS
        )

    def fold(src, up, g, t, c):
        return (
            f"{up} AS ({unpivot(src)}), "
            f"{g} AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(gu) AS HUGEINT) AS g, "
            f"CAST(SUM(hu) AS HUGEINT) AS h FROM {up} GROUP BY feat, val), "
            f"{t} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(gu) AS HUGEINT) AS gt, "
            f"CAST(SUM(hu) AS HUGEINT) AS ht FROM {src}), "
            f"{c} AS (SELECT feat, val, "
            "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            "AS cum_n, "
            "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            "AS cum_g, "
            "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            f"AS cum_h, n, gt, ht FROM {g}, {t}) "
        )

    # the new 6-dp margin integer: sigmoid(logit(u/1e6) + picked leaf
    # weight), saturated rows (u = 0 or 1e6) stay saturated
    leaf_w = (
        "CASE WHEN (CASE p1.feat WHEN 'disc' THEN f.disc "
        "WHEN 'price' THEN f.price ELSE f.qty END) <= p1.threshold "
        "THEN p1.w_left ELSE p1.w_right END"
    )
    u2 = (
        "CASE WHEN u = 0 OR u = 1000000 THEN u ELSE "
        "CAST(FLOOR((1.0 / (1.0 + EXP(-(LN(CAST(u AS DOUBLE) "
        f"/ (1000000 - u)) + ({leaf_w}))))) * 1000000 + 0.5) AS BIGINT) "
        "END"
    )
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r1 AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        + fold("r1", "up1", "g1", "t1", "c1")
        + ", p1 AS MATERIALIZED (" + _xgb_pick_sql(1, "c1") + "), "
        f"f2 AS (SELECT f.label, f.disc, f.price, f.qty, {u2} AS u2 "
        "FROM f, p1), "
        "r2 AS (SELECT label, disc, price, qty, "
        "u2 - label * 1000000 AS gu, u2 * (1000000 - u2) AS hu FROM f2), "
        + fold("r2", "up2", "g2", "t2", "c2")
        + ", p2 AS (" + _xgb_pick_sql(2, "c2") + ") "
        "SELECT * FROM p1 UNION ALL SELECT * FROM p2"
    )


@query(
    "q_xgb_round2",
    oracle=_xgb_round2_oracle(),
    tags=("ml", "train", "boosting"),
    eager=True,
)
def q_xgb_round2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO shrinkage-chained exact Newton boosting rounds — the
    reference XGBoost loop's actual iteration
    (train_model.py:69-80: each tree fits g/h of the CURRENT margin,
    margins chain with learning_rate 0.1). Round 1 is exactly
    q_xgb_round's pick (test-pinned equal); the margin then updates by
    the compiled leaf CASE — logit(p) + the picked 6-dp leaf weight,
    i.e. m2 = LN(u/(1e6-u)) + w with the score integer u — and round 2
    re-derives the g/h integers off the new 6-dp margin integer
    u2 = round(sigmoid(m2)*1e6) and searches all three features again.
    Two rows out (round, feat, threshold, counts, G/H, gain, both leaf
    weights).

    Exactness: the round-1 machinery is q_xgb_round's verbatim
    (shared _xgb_newton_pick); the margin update uses LN/EXP of exact
    integer ratios plus the 6-dp picked weight with IDENTICAL
    expression text on both engines (the documented LN/EXP house
    class — mitigated by the 6-dp re-rounding of u2 and swept at
    sf0.001/0.01/0.1); saturated rows (u = 0 or 1e6, impossible for
    the published scorer whose logit spans ±2 but guarded anyway)
    stay saturated on both engines. All round-2 sufficient statistics
    are again exact DECIMAL(38,0)/HUGEINT integers.

    Scale: TWO stack-explode fact passes + two 3-scalar totals folds —
    one level-synchronous histogram pass per round, the honest R-pass
    boosting cost (the q_boosted_multifeat precedent); the round-1
    pick is a localCheckpoint'd 1-row broadcast (eager by
    construction, the registry eager contract). R more rounds cost
    one pass each."""
    base = _xgb_base(spark, sf_dir)
    p1 = _xgb_newton_pick(_xgb_gh(base), rnd=1).localCheckpoint()
    pick = p1.select(
        F.col("feat").alias("bfeat"),
        F.col("threshold").alias("bt"),
        F.col("w_left").alias("bwl"),
        F.col("w_right").alias("bwr"),
    )
    fv = (
        F.when(F.col("bfeat") == "disc", F.col("disc"))
        .when(F.col("bfeat") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    leaf_w = F.when(fv <= F.col("bt"), F.col("bwl")).otherwise(F.col("bwr"))
    u2 = F.when(
        (F.col("u") == 0) | (F.col("u") == 1000000), F.col("u")
    ).otherwise(
        F.floor(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.log(
                                F.col("u").cast("double")
                                / (F.lit(1000000) - F.col("u"))
                            )
                            + leaf_w
                        )
                    )
                )
            )
            * 1000000
            + F.lit(0.5)
        ).cast("bigint")
    )
    f2 = base.crossJoin(F.broadcast(pick)).select(
        "label", "disc", "price", "qty", u2.alias("u2")
    )
    p2 = _xgb_newton_pick(_xgb_gh(f2, ucol="u2"), rnd=2)
    return p1.unionAll(p2)


# ---------------------------------------------------------------------------
# q_xgb_fit — log-likelihood improvement of the Newton rounds (round
# 15, 6th widening): q_pseudo_r2 found the published scorer's raw
# likelihood fits WORSE than the base-rate null (McFadden ~ -0.08 —
# it ranks well but is over-confident); the Newton rounds exist to
# fix exactly that. This query MEASURES the fix: the Bernoulli LL of
# the base margin, after round 1, and after round 2, over one common
# row subset — the trainer's objective read back as a metric.
# ---------------------------------------------------------------------------


def _xgb_fit_oracle() -> str:
    """DuckDB twin: the q_xgb_round2 pick chain (p1, p2 MATERIALIZED),
    then ONE fact fold to the bounded (u, b1, b2) cell table; u2/u3
    and the three LL terms are closed forms per cell."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )

    def unpivot(src):
        return " UNION ALL ".join(
            f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM {src}"
            for f in _MF_FEATS
        )

    def fold(src, up, g, t, c):
        return (
            f"{up} AS ({unpivot(src)}), "
            f"{g} AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(gu) AS HUGEINT) AS g, "
            f"CAST(SUM(hu) AS HUGEINT) AS h FROM {up} GROUP BY feat, val), "
            f"{t} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(gu) AS HUGEINT) AS gt, "
            f"CAST(SUM(hu) AS HUGEINT) AS ht FROM {src}), "
            f"{c} AS (SELECT feat, val, "
            "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            "AS cum_n, "
            "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            "AS cum_g, "
            "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            f"AS cum_h, n, gt, ht FROM {g}, {t}) "
        )

    leaf_w1 = (
        "CASE WHEN (CASE p1.feat WHEN 'disc' THEN f.disc "
        "WHEN 'price' THEN f.price ELSE f.qty END) <= p1.threshold "
        "THEN p1.w_left ELSE p1.w_right END"
    )
    u2 = (
        "CASE WHEN u = 0 OR u = 1000000 THEN u ELSE "
        "CAST(FLOOR((1.0 / (1.0 + EXP(-(LN(CAST(u AS DOUBLE) "
        f"/ (1000000 - u)) + ({leaf_w1}))))) * 1000000 + 0.5) AS BIGINT) "
        "END"
    )
    # per-cell closed forms off the (u, b1, b2) cell table
    step = (
        "CAST(FLOOR((1.0 / (1.0 + EXP(-(LN(CAST({src} AS DOUBLE) "
        "/ (1000000 - {src})) + (CASE WHEN {b} = 1 THEN {wl} ELSE {wr} "
        "END))))) * 1000000 + 0.5) AS BIGINT)"
    )
    u2c = step.format(src="u", b="b1", wl="p1.w_left", wr="p1.w_right")
    u3c = step.format(src="u2", b="b2", wl="p2.w_left", wr="p2.w_right")

    def ll(ucol):
        return (
            "CAST(FLOOR((CAST(pos AS DOUBLE) "
            f"* LN(CAST({ucol} AS DOUBLE) / 1000000) "
            "+ CAST(cnt - pos AS DOUBLE) "
            f"* LN(CAST(1000000 - {ucol} AS DOUBLE) / 1000000)) "
            "* 1000000000 + 0.5) AS BIGINT)"
        )

    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r1 AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        + fold("r1", "up1", "g1", "t1", "c1")
        + ", p1 AS MATERIALIZED (" + _xgb_pick_sql(1, "c1") + "), "
        f"f2 AS (SELECT f.label, f.disc, f.price, f.qty, {u2} AS u2 "
        "FROM f, p1), "
        "r2 AS (SELECT label, disc, price, qty, "
        "u2 - label * 1000000 AS gu, u2 * (1000000 - u2) AS hu FROM f2), "
        + fold("r2", "up2", "g2", "t2", "c2")
        + ", p2 AS MATERIALIZED (" + _xgb_pick_sql(2, "c2") + "), "
        # ONE fact fold to the bounded (u, b1, b2) cell table; branch
        # bits evaluated on the original features (trees split on
        # features); u must be LN-safe before anything downstream
        "v AS (SELECT CAST(f.u AS BIGINT) AS u, "
        "CASE WHEN (CASE p1.feat WHEN 'disc' THEN f.disc "
        "WHEN 'price' THEN f.price ELSE f.qty END) <= p1.threshold "
        "THEN 1 ELSE 0 END AS b1, "
        "CASE WHEN (CASE p2.feat WHEN 'disc' THEN f.disc "
        "WHEN 'price' THEN f.price ELSE f.qty END) <= p2.threshold "
        "THEN 1 ELSE 0 END AS b2, label FROM f, p1, p2 "
        "WHERE f.u > 0 AND f.u < 1000000), "
        "cells AS (SELECT u, b1, b2, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(label) AS BIGINT) AS pos FROM v GROUP BY u, b1, b2), "
        f"s2 AS (SELECT cells.*, {u2c} AS u2 FROM cells, p1 "
        "WHERE TRUE), "
        "s2v AS (SELECT * FROM s2 WHERE u2 > 0 AND u2 < 1000000), "
        f"s3 AS (SELECT s2v.*, {u3c} AS u3 FROM s2v AS s2v, p2), "
        "s3v AS (SELECT * FROM s3 WHERE u3 > 0 AND u3 < 1000000), "
        "m AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(" + ll("u") + ") AS HUGEINT) AS llb, "
        "CAST(SUM(" + ll("u2") + ") AS HUGEINT) AS ll1, "
        "CAST(SUM(" + ll("u3") + ") AS HUGEINT) AS ll2 FROM s3v) "
        "SELECT n, "
        + sql_round("CAST(llb AS DOUBLE) / 1000000000", 6) + " AS ll_base, "
        + sql_round("CAST(ll1 AS DOUBLE) / 1000000000", 6) + " AS ll_round1, "
        + sql_round("CAST(ll2 AS DOUBLE) / 1000000000", 6) + " AS ll_round2, "
        + sql_round(
            "CAST(ll1 AS DOUBLE) / 1000000000 "
            "- CAST(llb AS DOUBLE) / 1000000000",
            6,
        )
        + " AS delta_round1, "
        + sql_round(
            "CAST(ll2 AS DOUBLE) / 1000000000 "
            "- CAST(ll1 AS DOUBLE) / 1000000000",
            6,
        )
        + " AS delta_round2 FROM m"
    )


@query(
    "q_xgb_fit",
    oracle=_xgb_fit_oracle(),
    tags=("ml", "train", "boosting", "calibration"),
    eager=True,
)
def q_xgb_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood improvement of the Newton boosting rounds — the
    trainer's objective read back as a metric. q_pseudo_r2 surfaced
    the round-14 finding that the published scorer's raw likelihood
    fits WORSE than the base-rate null (McFadden ~ -0.08: ranks well,
    over-confident); second-order boosting on the logistic objective
    is the reference loop's mechanism for fixing exactly that. One
    row: the Bernoulli LL of the base margin, after round 1, and
    after round 2 (both picks the exact q_xgb_round2 chain), plus the
    per-round deltas — each round MUST increase LL (it Newton-steps
    the same objective), and the deltas quantify by how much.

    Exactness: both picks are the shared _xgb_newton_pick machinery
    (hash-exact); the fact table folds ONCE to the bounded
    (u, b1, b2) cell table (<=4x the 6-dp score domain — b1/b2 are
    the two branch bits, evaluated on the original features), and
    u2/u3/all three LL terms are closed forms per cell: LN of exact
    integer ratios (the LN house class), folded to 1e-9 units per
    cell BEFORE the sums (fixed_sum rule), DECIMAL(38,0)/HUGEINT
    accumulation. Rows whose margin saturates at any stage (u, u2 or
    u3 in {0, 1e6} — impossible for the published scorer, guarded
    anyway) are excluded by identical staged predicates on both
    engines, so all three LLs cover ONE common subset.

    Scale: the q_xgb_round2 cost (two histogram passes) + ONE more
    map-side-combinable fact fold to the bounded cell table + a
    4-scalar fold. No fact-scale window, no join beyond broadcast
    1-row model tables."""
    base = _xgb_base(spark, sf_dir)
    dec = "decimal(38,0)"
    p1 = _xgb_newton_pick(_xgb_gh(base), rnd=1).localCheckpoint()
    pk1 = p1.select(
        F.col("feat").alias("f1"),
        F.col("threshold").alias("t1"),
        F.col("w_left").alias("wl1"),
        F.col("w_right").alias("wr1"),
    )
    fv1 = (
        F.when(F.col("f1") == "disc", F.col("disc"))
        .when(F.col("f1") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    leaf_w1 = F.when(fv1 <= F.col("t1"), F.col("wl1")).otherwise(
        F.col("wr1")
    )
    u2row = F.when(
        (F.col("u") == 0) | (F.col("u") == 1000000), F.col("u")
    ).otherwise(
        F.floor(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.log(
                                F.col("u").cast("double")
                                / (F.lit(1000000) - F.col("u"))
                            )
                            + leaf_w1
                        )
                    )
                )
            )
            * 1000000
            + F.lit(0.5)
        ).cast("bigint")
    )
    f2 = base.crossJoin(F.broadcast(pk1)).select(
        "label", "disc", "price", "qty", u2row.alias("u2")
    )
    p2 = _xgb_newton_pick(_xgb_gh(f2, ucol="u2"), rnd=2).localCheckpoint()
    pk2 = p2.select(
        F.col("feat").alias("f2c"),
        F.col("threshold").alias("t2"),
        F.col("w_left").alias("wl2"),
        F.col("w_right").alias("wr2"),
    )
    fv2 = (
        F.when(F.col("f2c") == "disc", F.col("disc"))
        .when(F.col("f2c") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    v = (
        base.crossJoin(F.broadcast(pk1))
        .crossJoin(F.broadcast(pk2))
        .filter((F.col("u") > 0) & (F.col("u") < 1000000))
        .select(
            F.col("u").cast("bigint").alias("u"),
            F.when(fv1 <= F.col("t1"), 1).otherwise(0).alias("b1"),
            F.when(fv2 <= F.col("t2"), 1).otherwise(0).alias("b2"),
            "label",
        )
    )
    cells = v.groupBy("u", "b1", "b2").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )

    def stepcol(src, b, wl, wr):
        return F.floor(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.log(
                                F.col(src).cast("double")
                                / (F.lit(1000000) - F.col(src))
                            )
                            + F.when(F.col(b) == 1, F.col(wl)).otherwise(
                                F.col(wr)
                            )
                        )
                    )
                )
            )
            * 1000000
            + F.lit(0.5)
        ).cast("bigint")

    s2 = cells.crossJoin(F.broadcast(pk1)).select(
        "u", "b1", "b2", "cnt", "pos",
        stepcol("u", "b1", "wl1", "wr1").alias("u2"),
    )
    s2v = s2.filter((F.col("u2") > 0) & (F.col("u2") < 1000000))
    s3 = s2v.crossJoin(F.broadcast(pk2)).select(
        "u", "b1", "b2", "cnt", "pos", "u2",
        stepcol("u2", "b2", "wl2", "wr2").alias("u3"),
    )
    s3v = s3.filter((F.col("u3") > 0) & (F.col("u3") < 1000000))

    def llcol(ucol):
        return F.floor(
            (
                F.col("pos").cast("double")
                * F.log(F.col(ucol).cast("double") / 1000000)
                + (F.col("cnt") - F.col("pos")).cast("double")
                * F.log(
                    (F.lit(1000000) - F.col(ucol)).cast("double") / 1000000
                )
            )
            * 1000000000
            + F.lit(0.5)
        ).cast("bigint")

    m = s3v.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(llcol("u").cast(dec)).cast(dec).alias("llb"),
        F.sum(llcol("u2").cast(dec)).cast(dec).alias("ll1"),
        F.sum(llcol("u3").cast(dec)).cast(dec).alias("ll2"),
    )
    llb = F.col("llb").cast("double") / 1000000000
    ll1 = F.col("ll1").cast("double") / 1000000000
    ll2 = F.col("ll2").cast("double") / 1000000000
    return m.select(
        "n",
        pround(llb, 6).alias("ll_base"),
        pround(ll1, 6).alias("ll_round1"),
        pround(ll2, 6).alias("ll_round2"),
        pround(ll1 - llb, 6).alias("delta_round1"),
        pround(ll2 - ll1, 6).alias("delta_round2"),
    )


# ---------------------------------------------------------------------------
# q_xgb_tree2 — exact Newton DEPTH-2 tree (round 15, 8th widening):
# q_tree_multifeat grows a depth-2 tree by GINI; the reference's
# XGBClassifier grows its depth-5 trees by the second-order GAIN.
# This is that growth rule at hash-checkable depth: the q_xgb_round
# root pick, then per-branch gain searches over all three features,
# four Newton leaf weights.
# ---------------------------------------------------------------------------


def _xgb_tree2_oracle() -> str:
    """DuckDB twin: root fold + pick (the q_xgb_round text), branch
    assignment on the original features, per-(branch, feature) fold,
    per-branch picks with branch totals recomputed exactly from the
    cell table (feat='disc' slice — same closed form as Spark)."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM r1"
        for f in _MF_FEATS
    )
    u2 = " UNION ALL ".join(
        f"SELECT br, '{f}' AS feat, {f} AS val, gu, hu FROM r2"
        for f in _MF_FEATS
    )
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r1 AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        f"up1 AS ({u1}), "
        "g1 AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM up1 GROUP BY feat, val), "
        "t1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gu) AS HUGEINT) AS gt, "
        "CAST(SUM(hu) AS HUGEINT) AS ht FROM r1), "
        "c1 AS (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_h, n, gt, ht FROM g1, t1), "
        "p1 AS MATERIALIZED (" + _xgb_pick_sql(None, "c1", node="root") + "), "
        "r2 AS (SELECT r1.*, CASE WHEN (CASE p1.feat "
        "WHEN 'disc' THEN r1.disc WHEN 'price' THEN r1.price "
        "ELSE r1.qty END) <= p1.threshold THEN 0 ELSE 1 END AS br "
        "FROM r1, p1), "
        f"up2 AS ({u2}), "
        "g2 AS (SELECT br, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM up2 GROUP BY br, feat, val), "
        # exact branch totals off the cell table's 'disc' slice — the
        # same closed form the Spark side uses (no rounded carry-over)
        "bt AS (SELECT br, CAST(SUM(cnt) AS BIGINT) AS n, "
        "CAST(SUM(g) AS HUGEINT) AS gt, "
        "CAST(SUM(h) AS HUGEINT) AS ht FROM g2 WHERE feat = 'disc' "
        "GROUP BY br), "
        "c2 AS (SELECT g2.br, feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY g2.br, feat ORDER BY val) "
        "AS HUGEINT) AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY g2.br, feat ORDER BY val) "
        "AS HUGEINT) AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY g2.br, feat ORDER BY val) "
        "AS HUGEINT) AS cum_h, bt.n, bt.gt, bt.ht "
        "FROM g2 JOIN bt ON g2.br = bt.br), "
        "lc AS (SELECT * FROM c2 WHERE br = 0), "
        "rc AS (SELECT * FROM c2 WHERE br = 1), "
        "lp AS MATERIALIZED ("
        + _xgb_pick_sql(None, "lc", node="left")
        + "), "
        "rp AS MATERIALIZED ("
        + _xgb_pick_sql(None, "rc", node="right")
        + ") "
        "SELECT * FROM p1 UNION ALL SELECT * FROM lp "
        "UNION ALL SELECT * FROM rp"
    )


@query(
    "q_xgb_tree2",
    oracle=_xgb_tree2_oracle(),
    tags=("ml", "train", "boosting", "split"),
    eager=True,
)
def q_xgb_tree2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Newton DEPTH-2 tree — the reference XGBClassifier's tree
    GROWTH RULE (max gain of GL²/(HL+λ)+GR²/(HR+λ)−GB²/(HB+λ) at every
    node, leaf weights −G/(H+λ)·η) at hash-checkable depth, closing
    the Gini-vs-gain delta q_tree_multifeat left: same two-pass
    level-synchronous schedule, second-order split criterion. Root =
    exactly q_xgb_round's pick (test-pinned); both children search all
    three features WITHIN their branch with branch totals as the
    parent terms. Up to 3 rows (root/left/right), each with exact
    branch counts, rounded G/H sums, the node's structure gain, and
    both shrunken Newton leaf weights (the children's four w's are the
    depth-2 tree's leaf values).

    Exactness: all sufficient statistics are exact DECIMAL(38,0)/
    HUGEINT integers; branch totals are recomputed from the
    per-(branch, feature) cell table's 'disc' slice (an exact closed
    form — never the rounded root-row doubles); gain keys and emitted
    doubles use IDENTICAL expression text; per-branch argmins are the
    (key, feat, val) tie-break; a branch with no splittable candidate
    emits no row on both engines.

    Scale: TWO stack-explode fact passes (root + children — the
    q_tree_multifeat d+1 schedule with Newton statistics) + one
    3-scalar totals fold; per-(branch, feature) prefix cums on the
    bucket-offset machinery; both child picks ride ONE per-branch
    struct-argmin job (the q_boosted_mf_tree2 pattern). Depth d costs
    d+1 passes — the distributed XGBoost histogram schedule."""
    base = _xgb_base(spark, sf_dir)
    gh = _xgb_gh(base)
    dec = "decimal(38,0)"
    root = _xgb_newton_pick(gh, ).localCheckpoint()
    root_row = root.select(F.lit("root").alias("node"), "*")
    rinfo = root.select(
        F.col("feat").alias("rfeat"), F.col("threshold").alias("rt")
    )
    rootval = (
        F.when(F.col("rfeat") == "disc", F.col("disc"))
        .when(F.col("rfeat") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    f2 = (
        base.crossJoin(F.broadcast(rinfo))
        .withColumn(
            "br", F.when(rootval <= F.col("rt"), F.lit(0)).otherwise(F.lit(1))
        )
        .select(
            "label",
            "disc",
            "price",
            "qty",
            "br",
            (F.col("u") - F.col("label") * 1000000).alias("gu"),
            (F.col("u") * (F.lit(1000000) - F.col("u"))).alias("hu"),
        )
    )
    g2 = (
        _mf_unpivot(f2, ["br", "gu", "hu"])
        .groupBy("br", "feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    bt = (
        g2.filter(F.col("feat") == "disc")
        .groupBy("br")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum("g").cast(dec).alias("gt"),
            F.sum("h").cast(dec).alias("ht"),
        )
    )
    c2 = _mf_cum(
        g2,
        ["br", "feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).join(F.broadcast(bt), "br")
    gl = F.col("cum_g").cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    gr = (F.col("gt") - F.col("cum_g")).cast("double") / 1000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    picks = (
        c2.filter(F.col("cum_n") < F.col("n"))
        .groupBy("br")
        .agg(
            F.min(
                F.struct(
                    key.alias("key"),
                    F.col("feat"),
                    F.col("val"),
                    F.col("cum_n").alias("cn"),
                    F.col("cum_g").alias("cg"),
                    F.col("cum_h").alias("ch"),
                    F.col("n").alias("nb"),
                    F.col("gt").alias("gb"),
                    F.col("ht").alias("hb"),
                )
            ).alias("s")
        )
        .select("br", "s.*")
    )
    pgl = F.col("cg").cast("double") / 1000000
    phl = F.col("ch").cast("double") / 1000000000000
    pgr = (F.col("gb") - F.col("cg")).cast("double") / 1000000
    phr = (F.col("hb") - F.col("ch")).cast("double") / 1000000000000
    pgb = F.col("gb").cast("double") / 1000000
    phb = F.col("hb").cast("double") / 1000000000000
    pkl = (pgl * pgl) / (phl + F.lit(1.0))
    pkr = (pgr * pgr) / (phr + F.lit(1.0))
    children = picks.select(
        F.when(F.col("br") == 0, F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("node"),
        "feat",
        F.col("val").alias("threshold"),
        F.col("cn").cast("bigint").alias("n_left"),
        (F.col("nb") - F.col("cn")).cast("bigint").alias("n_right"),
        pround(pgl, 6).alias("g_left"),
        pround(phl, 6).alias("h_left"),
        pround(pgr, 6).alias("g_right"),
        pround(phr, 6).alias("h_right"),
        pround(
            F.lit(0.5) * ((pkl + pkr) - (pgb * pgb) / (phb + F.lit(1.0))),
            6,
        ).alias("gain"),
        pround(F.lit(0.0) - F.lit(0.1) * pgl / (phl + F.lit(1.0)), 6).alias(
            "w_left"
        ),
        pround(F.lit(0.0) - F.lit(0.1) * pgr / (phr + F.lit(1.0)), 6).alias(
            "w_right"
        ),
    )
    return root_row.unionAll(children)


# ---------------------------------------------------------------------------
# q_xgb_boosted_tree2 — TWO shrinkage-chained Newton rounds of DEPTH-2
# trees (round 16, VERDICT r15 #1): the reference XGBClassifier's
# actual iteration — boosted TREES, not stumps
# (/root/reference/train_model.py:69-80) — at the next hash-checkable
# rung. Round 1 is exactly q_xgb_tree2's tree (test-pinned); margins
# update by the compiled 4-leaf CASE (with the branch's own Newton
# weight as the no-split fallback — totality, never hit on shipped
# data); round 2 re-derives exact g/h integers off the new 6-dp margin
# and grows a second depth-2 tree. R*(d+1) = 4 stack-explode fact
# passes — the distributed-XGBoost histogram schedule.
# ---------------------------------------------------------------------------


def _xgbt_tree(base: DataFrame, ucol: str, rnd: int):
    """Grow ONE exact Newton depth-2 tree over ``base`` (label, feats,
    6-dp margin integer ``ucol``). Returns (tree rows labeled with
    (round, node), broadcastable 1-row root info, 2-row per-branch
    child picks, 2-row per-branch fallback Newton weights). The body
    is q_xgb_tree2's pass parameterized by margin column and round
    label; q_xgb_tree2 itself is untouched and the round-1 identity is
    pinned behaviorally by tests/test_round16_ops.py. The bounded pick
    tables (<=2 rows) are localCheckpoint'd so the round-2 pass can
    chain off them without replaying round 1."""
    dec = "decimal(38,0)"
    root = _xgb_newton_pick(_xgb_gh(base, ucol=ucol)).localCheckpoint()
    root_row = root.select(
        F.lit(rnd).cast("int").alias("round"),
        F.lit("root").alias("node"),
        "*",
    )
    rinfo = root.select(
        F.col("feat").alias("rfeat"), F.col("threshold").alias("rt")
    )
    rootval = (
        F.when(F.col("rfeat") == "disc", F.col("disc"))
        .when(F.col("rfeat") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    f2 = (
        base.crossJoin(F.broadcast(rinfo))
        .withColumn(
            "br", F.when(rootval <= F.col("rt"), F.lit(0)).otherwise(F.lit(1))
        )
        .select(
            "label",
            "disc",
            "price",
            "qty",
            "br",
            (F.col(ucol) - F.col("label") * 1000000).alias("gu"),
            (F.col(ucol) * (F.lit(1000000) - F.col(ucol))).alias("hu"),
        )
    )
    g2 = (
        _mf_unpivot(f2, ["br", "gu", "hu"])
        .groupBy("br", "feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    bt = (
        g2.filter(F.col("feat") == "disc")
        .groupBy("br")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum("g").cast(dec).alias("gt"),
            F.sum("h").cast(dec).alias("ht"),
        )
        .localCheckpoint()
    )
    c2 = _mf_cum(
        g2,
        ["br", "feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).join(F.broadcast(bt), "br")
    gl = F.col("cum_g").cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    gr = (F.col("gt") - F.col("cum_g")).cast("double") / 1000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    picks = (
        c2.filter(F.col("cum_n") < F.col("n"))
        .groupBy("br")
        .agg(
            F.min(
                F.struct(
                    key.alias("key"),
                    F.col("feat"),
                    F.col("val"),
                    F.col("cum_n").alias("cn"),
                    F.col("cum_g").alias("cg"),
                    F.col("cum_h").alias("ch"),
                    F.col("n").alias("nb"),
                    F.col("gt").alias("gb"),
                    F.col("ht").alias("hb"),
                )
            ).alias("s")
        )
        .select("br", "s.*")
        .localCheckpoint()
    )
    pgl = F.col("cg").cast("double") / 1000000
    phl = F.col("ch").cast("double") / 1000000000000
    pgr = (F.col("gb") - F.col("cg")).cast("double") / 1000000
    phr = (F.col("hb") - F.col("ch")).cast("double") / 1000000000000
    pgb = F.col("gb").cast("double") / 1000000
    phb = F.col("hb").cast("double") / 1000000000000
    pkl = (pgl * pgl) / (phl + F.lit(1.0))
    pkr = (pgr * pgr) / (phr + F.lit(1.0))
    children = picks.select(
        F.lit(rnd).cast("int").alias("round"),
        F.when(F.col("br") == 0, F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("node"),
        "feat",
        F.col("val").alias("threshold"),
        F.col("cn").cast("bigint").alias("n_left"),
        (F.col("nb") - F.col("cn")).cast("bigint").alias("n_right"),
        pround(pgl, 6).alias("g_left"),
        pround(phl, 6).alias("h_left"),
        pround(pgr, 6).alias("g_right"),
        pround(phr, 6).alias("h_right"),
        pround(
            F.lit(0.5) * ((pkl + pkr) - (pgb * pgb) / (phb + F.lit(1.0))),
            6,
        ).alias("gain"),
        pround(F.lit(0.0) - F.lit(0.1) * pgl / (phl + F.lit(1.0)), 6).alias(
            "w_left"
        ),
        pround(F.lit(0.0) - F.lit(0.1) * pgr / (phr + F.lit(1.0)), 6).alias(
            "w_right"
        ),
    )
    cp = picks.select(
        "br",
        F.col("feat").alias("cfeat"),
        F.col("val").alias("ct"),
        pround(F.lit(0.0) - F.lit(0.1) * pgl / (phl + F.lit(1.0)), 6).alias(
            "cwl"
        ),
        pround(F.lit(0.0) - F.lit(0.1) * pgr / (phr + F.lit(1.0)), 6).alias(
            "cwr"
        ),
    )
    fbw = bt.select(
        "br",
        pround(
            F.lit(0.0)
            - F.lit(0.1)
            * (F.col("gt").cast("double") / 1000000)
            / ((F.col("ht").cast("double") / 1000000000000) + F.lit(1.0)),
            6,
        ).alias("wb"),
    )
    return root_row.unionAll(children), rinfo, cp, fbw


def _xgbt_update(
    base: DataFrame, ucol: str, rinfo: DataFrame, cp: DataFrame, fbw: DataFrame
) -> DataFrame:
    """Apply one depth-2 tree's compiled 4-leaf CASE to the margin:
    route each row through the broadcast root split and its branch's
    broadcast child pick (fallback: the branch's own Newton weight),
    then u' = round(sigmoid(logit(u/1e6) + w)*1e6), saturation-guarded
    — the q_xgb_round2 margin-update text with the tree's leaf CASE."""
    rootval = (
        F.when(F.col("rfeat") == "disc", F.col("disc"))
        .when(F.col("rfeat") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    fx = (
        base.crossJoin(F.broadcast(rinfo))
        .withColumn(
            "br", F.when(rootval <= F.col("rt"), F.lit(0)).otherwise(F.lit(1))
        )
        .join(F.broadcast(cp), "br", "left")
        .join(F.broadcast(fbw), "br", "left")
    )
    fv = (
        F.when(F.col("cfeat") == "disc", F.col("disc"))
        .when(F.col("cfeat") == "price", F.col("price"))
        .otherwise(F.col("qty"))
    )
    w = F.when(F.col("cfeat").isNull(), F.col("wb")).otherwise(
        F.when(fv <= F.col("ct"), F.col("cwl")).otherwise(F.col("cwr"))
    )
    u2 = F.when(
        (F.col(ucol) == 0) | (F.col(ucol) == 1000000), F.col(ucol)
    ).otherwise(
        F.floor(
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.log(
                                F.col(ucol).cast("double")
                                / (F.lit(1000000) - F.col(ucol))
                            )
                            + w
                        )
                    )
                )
            )
            * 1000000
            + F.lit(0.5)
        ).cast("bigint")
    )
    return fx.select("label", "disc", "price", "qty", u2.alias("u2"))


def _xgb_boosted_tree2_oracle() -> str:
    """DuckDB twin of the 2-round depth-2 chain: tree-1 CTEs are the
    q_xgb_tree2 oracle's text (round/node-labeled picks MATERIALIZED),
    the margin update is the q_xgb_round2 text with the 4-leaf CASE
    (LEFT JOIN on the branch pick, branch-weight fallback), tree 2
    repeats the fold on u2."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )

    def tree(r, p, rnd):
        """CTE text growing one depth-2 Newton tree over fact CTE
        ``r`` carrying (label, disc, price, qty, gu, hu); all CTE
        names suffixed with ``p``."""
        u1 = " UNION ALL ".join(
            f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM {r}"
            for f in _MF_FEATS
        )
        u2 = " UNION ALL ".join(
            f"SELECT br, '{f}' AS feat, {f} AS val, gu, hu FROM rb{p}"
            for f in _MF_FEATS
        )
        return (
            f"u1{p} AS ({u1}), "
            f"ga{p} AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(gu) AS HUGEINT) AS g, "
            f"CAST(SUM(hu) AS HUGEINT) AS h FROM u1{p} GROUP BY feat, val), "
            f"ta{p} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(gu) AS HUGEINT) AS gt, "
            f"CAST(SUM(hu) AS HUGEINT) AS ht FROM {r}), "
            f"ca{p} AS (SELECT feat, val, "
            "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            "AS cum_n, "
            "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            "AS cum_g, "
            "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
            f"AS cum_h, n, gt, ht FROM ga{p}, ta{p}), "
            f"pr{p} AS MATERIALIZED ("
            + _xgb_pick_sql(rnd, f"ca{p}", node="root")
            + "), "
            f"rb{p} AS (SELECT {r}.*, CASE WHEN (CASE pr{p}.feat "
            f"WHEN 'disc' THEN {r}.disc WHEN 'price' THEN {r}.price "
            f"ELSE {r}.qty END) <= pr{p}.threshold THEN 0 ELSE 1 END AS br "
            f"FROM {r}, pr{p}), "
            f"u2{p} AS ({u2}), "
            f"gb{p} AS (SELECT br, feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
            "CAST(SUM(gu) AS HUGEINT) AS g, "
            f"CAST(SUM(hu) AS HUGEINT) AS h FROM u2{p} GROUP BY br, feat, val), "
            f"bt{p} AS (SELECT br, CAST(SUM(cnt) AS BIGINT) AS n, "
            "CAST(SUM(g) AS HUGEINT) AS gt, "
            f"CAST(SUM(h) AS HUGEINT) AS ht FROM gb{p} WHERE feat = 'disc' "
            "GROUP BY br), "
            f"cb{p} AS (SELECT gb{p}.br, feat, val, "
            f"CAST(SUM(cnt) OVER (PARTITION BY gb{p}.br, feat ORDER BY val) "
            "AS HUGEINT) AS cum_n, "
            f"CAST(SUM(g) OVER (PARTITION BY gb{p}.br, feat ORDER BY val) "
            "AS HUGEINT) AS cum_g, "
            f"CAST(SUM(h) OVER (PARTITION BY gb{p}.br, feat ORDER BY val) "
            f"AS HUGEINT) AS cum_h, bt{p}.n, bt{p}.gt, bt{p}.ht "
            f"FROM gb{p} JOIN bt{p} ON gb{p}.br = bt{p}.br), "
            f"lc{p} AS (SELECT * FROM cb{p} WHERE br = 0), "
            f"rc{p} AS (SELECT * FROM cb{p} WHERE br = 1), "
            f"lp{p} AS MATERIALIZED ("
            + _xgb_pick_sql(rnd, f"lc{p}", node="left")
            + "), "
            f"rp{p} AS MATERIALIZED ("
            + _xgb_pick_sql(rnd, f"rc{p}", node="right")
            + ")"
        )

    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r1 AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        + tree("r1", "a", 1)
        + ", "
        # compiled 4-leaf CASE: broadcast root + per-branch child pick
        # (LEFT JOIN; fallback = the branch's own shrunken Newton
        # weight off the exact branch totals)
        "cpa AS (SELECT 0 AS br, feat, threshold, w_left, w_right FROM lpa "
        "UNION ALL SELECT 1 AS br, feat, threshold, w_left, w_right "
        "FROM rpa), "
        "fba AS (SELECT br, "
        + sql_round(
            "0.0 - 0.1 * (CAST(gt AS DOUBLE) / 1000000) "
            "/ ((CAST(ht AS DOUBLE) / 1000000000000) + 1.0)",
            6,
        )
        + " AS wb FROM bta), "
        "fxa AS (SELECT f.label, f.disc, f.price, f.qty, f.u, "
        "CASE WHEN (CASE pra.feat WHEN 'disc' THEN f.disc "
        "WHEN 'price' THEN f.price ELSE f.qty END) <= pra.threshold "
        "THEN 0 ELSE 1 END AS br FROM f, pra), "
        "fwa AS (SELECT fxa.*, CASE WHEN cpa.br IS NULL THEN fba.wb "
        "ELSE CASE WHEN (CASE cpa.feat WHEN 'disc' THEN fxa.disc "
        "WHEN 'price' THEN fxa.price ELSE fxa.qty END) <= cpa.threshold "
        "THEN cpa.w_left ELSE cpa.w_right END END AS w "
        "FROM fxa LEFT JOIN cpa ON fxa.br = cpa.br "
        "LEFT JOIN fba ON fxa.br = fba.br), "
        "f2 AS (SELECT label, disc, price, qty, "
        "CASE WHEN u = 0 OR u = 1000000 THEN u ELSE "
        "CAST(FLOOR((1.0 / (1.0 + EXP(-(LN(CAST(u AS DOUBLE) "
        "/ (1000000 - u)) + w)))) * 1000000 + 0.5) AS BIGINT) "
        "END AS u2 FROM fwa), "
        "r2 AS (SELECT label, disc, price, qty, "
        "u2 - label * 1000000 AS gu, u2 * (1000000 - u2) AS hu FROM f2), "
        + tree("r2", "b", 2)
        + " SELECT * FROM pra UNION ALL SELECT * FROM lpa "
        "UNION ALL SELECT * FROM rpa "
        "UNION ALL SELECT * FROM prb UNION ALL SELECT * FROM lpb "
        "UNION ALL SELECT * FROM rpb"
    )


@query(
    "q_xgb_boosted_tree2",
    oracle=_xgb_boosted_tree2_oracle(),
    tags=("ml", "train", "boosting", "split"),
    eager=True,
)
def q_xgb_boosted_tree2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO shrinkage-chained Newton rounds of DEPTH-2 trees — the
    reference XGBClassifier's genuine iteration (boosted TREES on the
    logistic objective, train_model.py:69-80) composed from the
    round-15 ladder: q_xgb_tree2's exact tree as round 1 (test-pinned
    equal), margins updated by the compiled 4-leaf CASE
    (logit(u/1e6) + the row's 6-dp leaf weight, saturation-guarded;
    a branch with no splittable candidate falls back to its own
    shrunken Newton weight −G_b/(H_b+λ)·η — totality, never hit on
    shipped data), then a SECOND depth-2 tree grown by the same
    second-order gain rule off the new 6-dp margin integer. Six rows
    out: (round, node) ∈ {1,2}×{root,left,right} with exact branch
    counts, rounded G/H sums, structure gain, and both shrunken Newton
    leaf weights. Remaining delta to the reference trainer is SIZE
    only (depth 2 vs 5, rounds 2 vs 100), not shape.

    Exactness: all sufficient statistics are exact DECIMAL(38,0)/
    HUGEINT integers; branch totals recomputed from the cell table's
    'disc' slice (exact closed form); the margin update is LN/EXP of
    exact integer ratios plus 6-dp picked weights with IDENTICAL
    expression text on both engines (the documented LN/EXP house
    class — mitigated by 6-dp re-rounding of u2 and swept at
    sf0.001/0.01/0.1); per-node argmins are the (key, feat, val)
    tie-break; the 4-leaf CASE routes by LEFT JOIN on the branch pick
    on both engines.

    Scale: R·(d+1) = 4 stack-explode fact passes (map-side-combined
    before the only shuffles, on (feat,val) and (br,feat,val)) + two
    3-scalar totals folds + one margin-update fact pass fused into
    round 2's scan; the bounded pick tables (<=2 rows) are
    localCheckpoint'd and broadcast. 100 rounds × depth 5 is 600 such
    passes — the honest distributed-XGBoost histogram schedule, each
    pass one shuffle of a bounded histogram, no fact-scale joins
    anywhere."""
    base = _xgb_base(spark, sf_dir)
    t1, rinfo, cp, fbw = _xgbt_tree(base, "u", 1)
    b2 = _xgbt_update(base, "u", rinfo, cp, fbw)
    t2, _, _, _ = _xgbt_tree(b2, "u2", 2)
    return t1.unionAll(t2)


# ---------------------------------------------------------------------------
# q_xgb_gamma — gamma (min split loss) + min_child_weight (hessian
# cover) gates on the Newton pick (round 16, VERDICT r15 #6a): the
# actual XGBoost regularizers (train_model.py:69-80 inherits the
# library defaults gamma=0, min_child_weight=1; literal NON-default
# values 50.0 / 100.0 here so both gates BIND on the shipped data).
# Closed forms over the existing candidate cell table — the cover gate
# is an exact INTEGER comparison, the gamma gate reads the 6-dp gain.
# ---------------------------------------------------------------------------

_XGB_GAMMA = 50.0
_XGB_MCW_UNITS = 100 * 1000000000000  # min_child_weight 100.0 in 1e-12 units


def _xgb_gamma_oracle() -> str:
    """DuckDB twin: the q_xgb_round fold, candidate counts before/after
    the cover gate, the cover-constrained argmin, and the gamma flag
    off the identical 6-dp-rounded gain."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM r" for f in _MF_FEATS
    )
    gl = "CAST(cum_g AS DOUBLE) / 1000000"
    hl = "CAST(cum_h AS DOUBLE) / 1000000000000"
    gr = "CAST(gt - cum_g AS DOUBLE) / 1000000"
    hr = "CAST(ht - cum_h AS DOUBLE) / 1000000000000"
    gt = "CAST(gt AS DOUBLE) / 1000000"
    ht = "CAST(ht AS DOUBLE) / 1000000000000"
    kl = f"(({gl}) * ({gl}) / (({hl}) + 1.0))"
    kr = f"(({gr}) * ({gr}) / (({hr}) + 1.0))"
    key = f"(0.0 - ({kl} + {kr}))"
    gain6 = sql_round(
        f"0.5 * (({kl} + {kr}) - ({gt}) * ({gt}) / (({ht}) + 1.0))", 6
    )
    cover = (
        f"cum_h >= {_XGB_MCW_UNITS} AND ht - cum_h >= {_XGB_MCW_UNITS}"
    )
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM u GROUP BY feat, val), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gu) AS HUGEINT) AS gt, "
        "CAST(SUM(hu) AS HUGEINT) AS ht FROM r), "
        "c AS (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_h, n, gt, ht FROM g, t), "
        "cand AS (SELECT * FROM c WHERE cum_n < n), "
        "cnts AS (SELECT CAST(COUNT(*) AS BIGINT) AS cand_total, "
        f"CAST(SUM(CASE WHEN {cover} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS cand_cover FROM cand), "
        "p AS (SELECT feat, val AS threshold, "
        "CAST(cum_n AS BIGINT) AS n_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        + sql_round(gl, 6) + " AS g_left, "
        + sql_round(hl, 6) + " AS h_left, "
        + sql_round(gr, 6) + " AS g_right, "
        + sql_round(hr, 6) + " AS h_right, "
        + gain6 + " AS gain, "
        + sql_round(f"0.0 - 0.1 * ({gl}) / (({hl}) + 1.0)", 6)
        + " AS w_left, "
        + sql_round(f"0.0 - 0.1 * ({gr}) / (({hr}) + 1.0)", 6)
        + " AS w_right "
        f"FROM cand WHERE {cover} ORDER BY {key}, feat, val LIMIT 1) "
        "SELECT p.*, "
        f"CASE WHEN p.gain > {_XGB_GAMMA!r} THEN 1 ELSE 0 END AS gamma_pass, "
        "cand_total, cand_cover FROM p, cnts"
    )


@query(
    "q_xgb_gamma",
    oracle=_xgb_gamma_oracle(),
    tags=("ml", "train", "boosting", "regularization"),
)
def q_xgb_gamma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XGBoost split REGULARIZERS on the exact Newton pick —
    min_child_weight (hessian cover: both children must carry
    Σh ≥ 100.0) and gamma (min split loss: the split only stands if
    gain > 50.0) — the two gates the reference's XGBClassifier
    applies to every split it grows (train_model.py:69-80; library
    defaults 0/1 are inert, so literal NON-default values are used
    here to make both gates bind on the shipped data). One row: the
    cover-constrained argmin pick (q_xgb_round's schema), gamma_pass
    off the identical 6-dp gain, and the candidate counts before/after
    the cover gate (cand_cover < cand_total — the gate visibly binds
    at every SF; pinned by tests).

    Exactness: the cover gate is an exact INTEGER comparison
    (cum_h ≥ 100e12 in 1e-12 hessian units on DECIMAL(38,0)/HUGEINT —
    no doubles in the predicate, so the candidate SET is bit-identical
    across engines); the gamma flag reads the 6-dp-rounded gain both
    engines already agree on; everything else is q_xgb_round's pinned
    machinery (same fold text, same (key, feat, val) tie-break). If no
    candidate passes cover, both engines emit zero rows (vacuous on
    shipped data — asserted non-vacuous in tests).

    Scale: identical to q_xgb_round — ONE stack-explode fact pass +
    one 3-scalar totals fold; the counts ride the same bounded
    candidate table (one extra 2-scalar fold over <=~1.5k rows). The
    gates are WHERE clauses on the bounded cell table, free at any
    scale — exactly how distributed XGBoost evaluates them."""
    base = _xgb_gh(_xgb_base(spark, sf_dir))
    dec = "decimal(38,0)"
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        _sum_gu_dec("gu").alias("gt"),
        _sum_hu_dec("hu").alias("ht"),
    )
    g1 = (
        _mf_unpivot(base, ["gu", "hu"])
        .groupBy("feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    c = _mf_cum(
        g1,
        ["feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).crossJoin(F.broadcast(tot))
    cand = c.filter(F.col("cum_n") < F.col("n"))
    mcw = F.lit(_XGB_MCW_UNITS).cast(dec)
    cover = (F.col("cum_h") >= mcw) & (
        (F.col("ht") - F.col("cum_h")) >= mcw
    )
    cnts = cand.agg(
        F.count("*").cast("bigint").alias("cand_total"),
        F.sum(F.when(cover, 1).otherwise(0)).cast("bigint").alias(
            "cand_cover"
        ),
    )
    gl = F.col("cum_g").cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    gr = (F.col("gt") - F.col("cum_g")).cast("double") / 1000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    gtd = F.col("gt").cast("double") / 1000000
    htd = F.col("ht").cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    gain6 = pround(
        F.lit(0.5) * ((kl + kr) - (gtd * gtd) / (htd + F.lit(1.0))), 6
    )
    p = (
        cand.filter(cover)
        .withColumn("key", key)
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            "feat",
            F.col("val").alias("threshold"),
            F.col("cum_n").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("cum_n")).cast("bigint").alias("n_right"),
            pround(gl, 6).alias("g_left"),
            pround(hl, 6).alias("h_left"),
            pround(gr, 6).alias("g_right"),
            pround(hr, 6).alias("h_right"),
            gain6.alias("gain"),
            pround(F.lit(0.0) - F.lit(0.1) * gl / (hl + F.lit(1.0)), 6).alias(
                "w_left"
            ),
            pround(F.lit(0.0) - F.lit(0.1) * gr / (hr + F.lit(1.0)), 6).alias(
                "w_right"
            ),
        )
    )
    return p.crossJoin(F.broadcast(cnts)).select(
        "feat",
        "threshold",
        "n_left",
        "n_right",
        "g_left",
        "h_left",
        "g_right",
        "h_right",
        "gain",
        "w_left",
        "w_right",
        F.when(F.col("gain") > F.lit(_XGB_GAMMA), 1)
        .otherwise(0)
        .cast("int")
        .alias("gamma_pass"),
        "cand_total",
        "cand_cover",
    )


# ---------------------------------------------------------------------------
# q_xgb_monotone — monotone-constraint Newton pick (round 16, VERDICT
# r15 #6c): XGBoost's monotone_constraints gate at the split level — a
# candidate split on a +1 (increasing) feature is admissible only if
# w_left <= w_right, on a -1 feature only if w_left >= w_right.
# Constraint vector here: qty +1, disc -1, price 0 — literal
# non-trivial values chosen so the gate BINDS on the shipped data (it
# excludes the unconstrained q_xgb_round winner at every SF: the best
# qty split is decreasing, so the constrained argmin moves to disc).
# The weight comparison is cross-multiplied into EXACT integer
# arithmetic — no doubles in the predicate.
# ---------------------------------------------------------------------------

# w_l <= w_r  <=>  -G_L/(H_L+l) <= -G_R/(H_R+l)
#             <=>  G_L*(H_R+l) >= G_R*(H_L+l)   (denominators > 0)
# with G in 1e-6 and H in 1e-12 units the scale factors cancel, so the
# gate is the integer comparison below; lambda = 1 is 1e12 h-units.
_MONO_GATE_SQL = (
    "((feat = 'price') OR "
    "(feat = 'qty' AND cum_g * (ht - cum_h + 1000000000000) "
    ">= (gt - cum_g) * (cum_h + 1000000000000)) OR "
    "(feat = 'disc' AND cum_g * (ht - cum_h + 1000000000000) "
    "<= (gt - cum_g) * (cum_h + 1000000000000)))"
)


def _xgb_monotone_oracle() -> str:
    """DuckDB twin: the q_xgb_round fold with the integer monotone
    gate in the candidate WHERE, plus before/after candidate counts."""
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM r" for f in _MF_FEATS
    )
    gl = "CAST(cum_g AS DOUBLE) / 1000000"
    hl = "CAST(cum_h AS DOUBLE) / 1000000000000"
    gr = "CAST(gt - cum_g AS DOUBLE) / 1000000"
    hr = "CAST(ht - cum_h AS DOUBLE) / 1000000000000"
    gt = "CAST(gt AS DOUBLE) / 1000000"
    ht = "CAST(ht AS DOUBLE) / 1000000000000"
    kl = f"(({gl}) * ({gl}) / (({hl}) + 1.0))"
    kr = f"(({gr}) * ({gr}) / (({hr}) + 1.0))"
    key = f"(0.0 - ({kl} + {kr}))"
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM u GROUP BY feat, val), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gu) AS HUGEINT) AS gt, "
        "CAST(SUM(hu) AS HUGEINT) AS ht FROM r), "
        "c AS (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_h, n, gt, ht FROM g, t), "
        "cand AS (SELECT * FROM c WHERE cum_n < n), "
        "cnts AS (SELECT CAST(COUNT(*) AS BIGINT) AS cand_total, "
        f"CAST(SUM(CASE WHEN {_MONO_GATE_SQL} THEN 1 ELSE 0 END) AS BIGINT) "
        "AS cand_allowed FROM cand), "
        "p AS (SELECT feat, val AS threshold, "
        "CAST(cum_n AS BIGINT) AS n_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        + sql_round(gl, 6) + " AS g_left, "
        + sql_round(hl, 6) + " AS h_left, "
        + sql_round(gr, 6) + " AS g_right, "
        + sql_round(hr, 6) + " AS h_right, "
        + sql_round(
            f"0.5 * (({kl} + {kr}) - ({gt}) * ({gt}) / (({ht}) + 1.0))", 6
        )
        + " AS gain, "
        + sql_round(f"0.0 - 0.1 * ({gl}) / (({hl}) + 1.0)", 6)
        + " AS w_left, "
        + sql_round(f"0.0 - 0.1 * ({gr}) / (({hr}) + 1.0)", 6)
        + " AS w_right "
        f"FROM cand WHERE {_MONO_GATE_SQL} ORDER BY {key}, feat, val "
        "LIMIT 1) "
        "SELECT p.*, cand_total, cand_allowed FROM p, cnts"
    )


@query(
    "q_xgb_monotone",
    oracle=_xgb_monotone_oracle(),
    tags=("ml", "train", "boosting", "regularization"),
)
def q_xgb_monotone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone-constraint Newton split pick — XGBoost's
    monotone_constraints applied to the exact second-order split
    search (the split-level admissibility rule: a +1/increasing
    feature may only split with w_left <= w_right, a -1/decreasing
    feature only with w_left >= w_right; the reference's
    XGBClassifier exposes exactly this knob). Constraint vector
    (qty +1, disc -1, price 0) — non-trivial literals that BIND on
    the shipped data: the unconstrained q_xgb_round winner (a
    decreasing qty split) is excluded at every SF and the constrained
    argmin moves to disc (pinned by tests). One row: the constrained
    pick in q_xgb_round's schema + candidate counts before/after the
    gate.

    Exactness: the admissibility predicate is cross-multiplied into
    EXACT integer arithmetic — w_l <= w_r iff
    cum_g·(ht−cum_h+1e12) >= (gt−cum_g)·(cum_h+1e12) (the 1e-6/1e-12
    unit factors cancel; denominators H+λ > 0 preserve the
    inequality; products ≤ ~2.5e17·n² stay inside DECIMAL(38,0)/
    HUGEINT past 1e10 rows — the q_schoenfeld_trend headroom
    discipline). No doubles in the gate, so the candidate set is
    bit-identical across engines; everything else is q_xgb_round's
    pinned machinery.

    Scale: identical to q_xgb_round — ONE stack-explode fact pass +
    one totals fold; the gate is a WHERE on the bounded candidate
    table (plus one 2-scalar fold over it), free at any scale —
    exactly how distributed XGBoost enforces the constraint during
    split enumeration."""
    base = _xgb_gh(_xgb_base(spark, sf_dir))
    dec = "decimal(38,0)"
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        _sum_gu_dec("gu").alias("gt"),
        _sum_hu_dec("hu").alias("ht"),
    )
    g1 = (
        _mf_unpivot(base, ["gu", "hu"])
        .groupBy("feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    c = _mf_cum(
        g1,
        ["feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).crossJoin(F.broadcast(tot))
    cand = c.filter(F.col("cum_n") < F.col("n"))
    lam = F.lit(1000000000000).cast(dec)
    lhs = F.col("cum_g") * (F.col("ht") - F.col("cum_h") + lam)
    rhs = (F.col("gt") - F.col("cum_g")) * (F.col("cum_h") + lam)
    allowed = (
        (F.col("feat") == "price")
        | ((F.col("feat") == "qty") & (lhs >= rhs))
        | ((F.col("feat") == "disc") & (lhs <= rhs))
    )
    cnts = cand.agg(
        F.count("*").cast("bigint").alias("cand_total"),
        F.sum(F.when(allowed, 1).otherwise(0)).cast("bigint").alias(
            "cand_allowed"
        ),
    )
    gl = F.col("cum_g").cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    gr = (F.col("gt") - F.col("cum_g")).cast("double") / 1000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    gtd = F.col("gt").cast("double") / 1000000
    htd = F.col("ht").cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    p = (
        cand.filter(allowed)
        .withColumn("key", key)
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            "feat",
            F.col("val").alias("threshold"),
            F.col("cum_n").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("cum_n")).cast("bigint").alias("n_right"),
            pround(gl, 6).alias("g_left"),
            pround(hl, 6).alias("h_left"),
            pround(gr, 6).alias("g_right"),
            pround(hr, 6).alias("h_right"),
            pround(
                F.lit(0.5)
                * ((kl + kr) - (gtd * gtd) / (htd + F.lit(1.0))),
                6,
            ).alias("gain"),
            pround(F.lit(0.0) - F.lit(0.1) * gl / (hl + F.lit(1.0)), 6).alias(
                "w_left"
            ),
            pround(F.lit(0.0) - F.lit(0.1) * gr / (hr + F.lit(1.0)), 6).alias(
                "w_right"
            ),
        )
    )
    return p.crossJoin(F.broadcast(cnts))


# ---------------------------------------------------------------------------
# q_xgb_alpha — L1 (reg_alpha) soft-thresholded Newton pick (round 16,
# widening #6): the LAST of XGBoost's three split regularizers
# (lambda=1 has been in the house gain since q_xgb_round; gamma +
# min_child_weight landed as q_xgb_gamma) — reg_alpha soft-thresholds
# every branch gradient before both the structure score and the leaf
# weight: T(G) = G−α if G>α, G+α if G<−α, else 0;
# w = −T(G)/(H+λ)·η; gain terms T(G)²/(H+λ). Literal non-default
# α = 20.0 (library default 0 is inert): it ZEROES the left leaf at
# sf0.001 (|G_L| = 8.99 < α) and strictly shrinks every weight at all
# SFs — the gate binds on values (the pick itself is α-stable on this
# data, pinned by tests).
# ---------------------------------------------------------------------------

_XGB_ALPHA_UNITS = 20 * 1000000  # alpha = 20.0 in 1e-6 gradient units


def _xgb_alpha_oracle() -> str:
    """DuckDB twin: the q_xgb_round fold with both branch gradients
    soft-thresholded by the EXACT integer alpha before the gain key,
    the emitted weights, and the gain."""
    A = _XGB_ALPHA_UNITS
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM r" for f in _MF_FEATS
    )
    tgl = (
        f"(CASE WHEN cum_g > {A} THEN cum_g - {A} "
        f"WHEN cum_g < -{A} THEN cum_g + {A} ELSE 0 END)"
    )
    tgr = (
        f"(CASE WHEN gt - cum_g > {A} THEN gt - cum_g - {A} "
        f"WHEN gt - cum_g < -{A} THEN gt - cum_g + {A} ELSE 0 END)"
    )
    tgt = (
        f"(CASE WHEN gt > {A} THEN gt - {A} "
        f"WHEN gt < -{A} THEN gt + {A} ELSE 0 END)"
    )
    gl = f"CAST({tgl} AS DOUBLE) / 1000000"
    gr = f"CAST({tgr} AS DOUBLE) / 1000000"
    gt = f"CAST({tgt} AS DOUBLE) / 1000000"
    hl = "CAST(cum_h AS DOUBLE) / 1000000000000"
    hr = "CAST(ht - cum_h AS DOUBLE) / 1000000000000"
    ht = "CAST(ht AS DOUBLE) / 1000000000000"
    kl = f"(({gl}) * ({gl}) / (({hl}) + 1.0))"
    kr = f"(({gr}) * ({gr}) / (({hr}) + 1.0))"
    key = f"(0.0 - ({kl} + {kr}))"
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM u GROUP BY feat, val), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gu) AS HUGEINT) AS gt, "
        "CAST(SUM(hu) AS HUGEINT) AS ht FROM r), "
        "c AS (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_h, n, gt, ht FROM g, t) "
        "SELECT feat, val AS threshold, "
        "CAST(cum_n AS BIGINT) AS n_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        + sql_round(gl, 6) + " AS tg_left, "
        + sql_round("CAST(cum_h AS DOUBLE) / 1000000000000", 6)
        + " AS h_left, "
        + sql_round(gr, 6) + " AS tg_right, "
        + sql_round("CAST(ht - cum_h AS DOUBLE) / 1000000000000", 6)
        + " AS h_right, "
        + sql_round(
            f"0.5 * (({kl} + {kr}) - ({gt}) * ({gt}) / (({ht}) + 1.0))", 6
        )
        + " AS gain, "
        + sql_round(f"0.0 - 0.1 * ({gl}) / (({hl}) + 1.0)", 6)
        + " AS w_left, "
        + sql_round(f"0.0 - 0.1 * ({gr}) / (({hr}) + 1.0)", 6)
        + " AS w_right "
        f"FROM c WHERE cum_n < n ORDER BY {key}, feat, val LIMIT 1"
    )


@query(
    "q_xgb_alpha",
    oracle=_xgb_alpha_oracle(),
    tags=("ml", "train", "boosting", "regularization"),
)
def q_xgb_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1-regularized (reg_alpha) exact Newton split pick — the last
    of the three XGBoost split regularizers (λ has been in the house
    gain since q_xgb_round; γ/min_child_weight are q_xgb_gamma):
    every branch gradient is soft-thresholded BEFORE the structure
    score and the leaf weight — T(G) = G∓α inside the |G| > α cone,
    else 0 — so w = −T(G)/(H+λ)·η and the gain terms are T(G)²/(H+λ),
    exactly the xgboost CalcWeight/CalcGain closed forms with
    reg_alpha set. Literal non-default α = 20.0: it ZEROES the left
    leaf at sf0.001 (|G_L| = 8.99 < α → w_left = 0 exactly — the L1
    sparsity effect) and strictly shrinks every weight toward 0 at
    all SFs (pinned by tests); the argmin itself is α-stable on this
    data (also pinned). One row, q_xgb_round's schema with the
    THRESHOLDED gradients (tg_left/tg_right) published.

    Exactness: the soft-threshold is EXACT integer CASE arithmetic on
    the DECIMAL(38,0)/HUGEINT gradient sums (α in 1e-6 units =
    20000000 — no doubles in the threshold), so T(G) is bit-identical
    across engines; the gain key and emitted doubles are computed
    from those integers with IDENTICAL expression text; argmin
    tie-break (key, feat, val) as always.

    Scale: identical to q_xgb_round — ONE stack-explode fact pass +
    one 3-scalar totals fold; the soft-threshold is per-candidate
    column math on the bounded cell table. α at 100 TB costs
    nothing — it is a CASE on already-exact histogram sums, exactly
    where distributed XGBoost applies it."""
    A = _XGB_ALPHA_UNITS
    base = _xgb_gh(_xgb_base(spark, sf_dir))
    dec = "decimal(38,0)"
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        _sum_gu_dec("gu").alias("gt"),
        _sum_hu_dec("hu").alias("ht"),
    )
    g1 = (
        _mf_unpivot(base, ["gu", "hu"])
        .groupBy("feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    c = _mf_cum(
        g1,
        ["feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).crossJoin(F.broadcast(tot))

    def soft(col):
        return (
            F.when(col > A, col - A)
            .when(col < -A, col + A)
            .otherwise(F.lit(0).cast("decimal(38,0)"))
        )

    tgl = soft(F.col("cum_g"))
    tgr = soft(F.col("gt") - F.col("cum_g"))
    tgt = soft(F.col("gt"))
    gl = tgl.cast("double") / 1000000
    gr = tgr.cast("double") / 1000000
    gtd = tgt.cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    htd = F.col("ht").cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    return (
        c.filter(F.col("cum_n") < F.col("n"))
        .withColumn("key", key)
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            "feat",
            F.col("val").alias("threshold"),
            F.col("cum_n").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("cum_n")).cast("bigint").alias("n_right"),
            pround(gl, 6).alias("tg_left"),
            pround(F.col("cum_h").cast("double") / 1000000000000, 6).alias(
                "h_left"
            ),
            pround(gr, 6).alias("tg_right"),
            pround(
                (F.col("ht") - F.col("cum_h")).cast("double")
                / 1000000000000,
                6,
            ).alias("h_right"),
            pround(
                F.lit(0.5)
                * ((kl + kr) - (gtd * gtd) / (htd + F.lit(1.0))),
                6,
            ).alias("gain"),
            pround(F.lit(0.0) - F.lit(0.1) * gl / (hl + F.lit(1.0)), 6).alias(
                "w_left"
            ),
            pround(F.lit(0.0) - F.lit(0.1) * gr / (hr + F.lit(1.0)), 6).alias(
                "w_right"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q_xgb_hist — histogram (binned) Newton split finding (round 16,
# widening #8): the reference trainer's ACTUAL split algorithm at
# scale — tree_method='hist' (XGBoost paper §3.3 approximate/quantile
# split finding; also LightGBM's core): candidate thresholds are
# restricted to ~256 equal-mass quantile boundaries per feature and
# g/h histograms are accumulated per bin. Here the binning is the
# deterministic count-quantile rule bin = ((cum_n−1)·256) div n over
# the exact per-(feat,val) cum table — a bin's boundary row IS its
# last distinct value, carrying exact inclusive cums, so the binned
# search is a restriction of the exact q_xgb_round candidate set to
# the 256-quantile boundary subset. No RNG, no sketch approximation
# to pin: the quantile sketch is EXACT count quantiles.
# ---------------------------------------------------------------------------

_XGB_HIST_BINS = 256


def _xgb_hist_oracle() -> str:
    """DuckDB twin: q_xgb_round's fold + the integer bin assignment,
    per-(feat, bin) boundary rows via MAX(val) + self-join on the
    bounded cum table, candidate count, and the gain argmin."""
    B = _XGB_HIST_BINS
    fsel = ", ".join(
        sql_round(_MF_VAL_SQL[f], 6) + f" AS {f}" for f in _MF_FEATS
    )
    u1 = " UNION ALL ".join(
        f"SELECT '{f}' AS feat, {f} AS val, gu, hu FROM r" for f in _MF_FEATS
    )
    gl = "CAST(cum_g AS DOUBLE) / 1000000"
    hl = "CAST(cum_h AS DOUBLE) / 1000000000000"
    gr = "CAST(gt - cum_g AS DOUBLE) / 1000000"
    hr = "CAST(ht - cum_h AS DOUBLE) / 1000000000000"
    gt = "CAST(gt AS DOUBLE) / 1000000"
    ht = "CAST(ht AS DOUBLE) / 1000000000000"
    kl = f"(({gl}) * ({gl}) / (({hl}) + 1.0))"
    kr = f"(({gr}) * ({gr}) / (({hr}) + 1.0))"
    key = f"(0.0 - ({kl} + {kr}))"
    return (
        "WITH f AS (SELECT "
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label, "
        f"{fsel}, "
        "CAST(FLOOR((" + sql_round(_XGB_SIG_SQL, 6) + ") "
        "* 1000000 + 0.5) AS BIGINT) AS u FROM lineitem), "
        "r AS (SELECT f.*, u - label * 1000000 AS gu, "
        "u * (1000000 - u) AS hu FROM f), "
        f"u AS ({u1}), "
        "g AS (SELECT feat, val, CAST(COUNT(*) AS BIGINT) AS cnt, "
        "CAST(SUM(gu) AS HUGEINT) AS g, "
        "CAST(SUM(hu) AS HUGEINT) AS h FROM u GROUP BY feat, val), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gu) AS HUGEINT) AS gt, "
        "CAST(SUM(hu) AS HUGEINT) AS ht FROM r), "
        "c AS (SELECT feat, val, "
        "CAST(SUM(cnt) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_n, "
        "CAST(SUM(g) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_g, "
        "CAST(SUM(h) OVER (PARTITION BY feat ORDER BY val) AS HUGEINT) "
        "AS cum_h, n, gt, ht FROM g, t), "
        "cb AS (SELECT feat, val, cum_n, cum_g, cum_h, n, gt, ht, "
        f"((CAST(cum_n AS BIGINT) - 1) * {B}) // n AS bin FROM c), "
        "bb AS (SELECT feat, bin, MAX(val) AS bval FROM cb "
        "GROUP BY feat, bin), "
        "cand AS (SELECT cb.* , cb.bin AS bin_id FROM cb JOIN bb "
        "ON cb.feat = bb.feat AND cb.bin = bb.bin AND cb.val = bb.bval "
        "WHERE cb.cum_n < cb.n), "
        "cnts AS (SELECT CAST(COUNT(*) AS BIGINT) AS cand_bins FROM cand), "
        "p AS (SELECT feat, CAST(bin_id AS BIGINT) AS bin, "
        "val AS threshold, "
        "CAST(cum_n AS BIGINT) AS n_left, "
        "CAST(n - cum_n AS BIGINT) AS n_right, "
        + sql_round(gl, 6) + " AS g_left, "
        + sql_round(hl, 6) + " AS h_left, "
        + sql_round(gr, 6) + " AS g_right, "
        + sql_round(hr, 6) + " AS h_right, "
        + sql_round(
            f"0.5 * (({kl} + {kr}) - ({gt}) * ({gt}) / (({ht}) + 1.0))", 6
        )
        + " AS gain, "
        + sql_round(f"0.0 - 0.1 * ({gl}) / (({hl}) + 1.0)", 6)
        + " AS w_left, "
        + sql_round(f"0.0 - 0.1 * ({gr}) / (({hr}) + 1.0)", 6)
        + " AS w_right "
        f"FROM cand ORDER BY {key}, feat, val LIMIT 1) "
        "SELECT p.*, cand_bins FROM p, cnts"
    )


@query(
    "q_xgb_hist",
    oracle=_xgb_hist_oracle(),
    tags=("ml", "train", "boosting", "split"),
)
def q_xgb_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram (binned) Newton split finding — the split algorithm
    the reference's XGBClassifier actually runs at scale
    (tree_method='hist'; XGBoost paper §3.3 approximate split finding
    with a quantile sketch; the LightGBM core): candidate thresholds
    restricted to 256 equal-mass count-quantile boundaries per
    feature, g/h accumulated per bin. The binning is the DETERMINISTIC
    integer rule bin = ((cum_n−1)·256) div n over the exact
    per-(feat,val) cum table; a bin's candidate row is its LAST
    distinct value, which carries exact inclusive cum statistics — so
    the binned search is exactly the q_xgb_round argmin restricted to
    the ≤256·|feats| boundary subset (no RNG, no approximation to
    hand-wave: the quantile sketch is exact count quantiles). One
    row: the binned pick (feat, bin id, boundary threshold,
    q_xgb_round's stat columns) + the candidate-boundary count.

    The q_xgb_round/q_xgb_hist PAIR is the exact-vs-approx
    split-finding comparison of the XGBoost paper: on this data the
    256-bin pick recovers the exact pick's split (or a neighbor with
    near-identical gain — pinned by tests: binned gain is within the
    exact pick's, and equals it when the exact threshold lands on a
    boundary).

    Exactness: the bin id is pure BIGINT arithmetic ((cum_n−1)·256
    fits BIGINT past 3.6e16 rows); the boundary row per (feat, bin)
    is MAX(val) over identical 6-dp doubles (struct-max on Spark,
    MAX+equi-join on DuckDB — same row, values are distinct within a
    feature); all stats are the exact DECIMAL(38,0)/HUGEINT cums;
    gain text identical; tie-break (key, feat, val).

    Scale: q_xgb_round's ONE stack-explode fact pass + totals fold,
    plus one bounded group-by over the cell table (≤ distinct values)
    to the ≤768-row boundary table. At 100 TB this is the WHOLE
    point of hist: the pick runs on 768 rows no matter how many
    distinct feature values the data carries — the exact shape
    distributed XGBoost/LightGBM ship."""
    B = _XGB_HIST_BINS
    base = _xgb_gh(_xgb_base(spark, sf_dir))
    dec = "decimal(38,0)"
    tot = base.agg(
        F.count("*").cast("bigint").alias("n"),
        _sum_gu_dec("gu").alias("gt"),
        _sum_hu_dec("hu").alias("ht"),
    )
    g1 = (
        _mf_unpivot(base, ["gu", "hu"])
        .groupBy("feat", "val")
        .agg(
            F.count("*").cast("bigint").alias("cnt"),
            _sum_gu_dec("gu").alias("g"),
            _sum_hu_dec("hu").alias("h"),
        )
    )
    c = _mf_cum(
        g1,
        ["feat"],
        out_cast=dec,
        measures=(("cnt", "cum_n"), ("g", "cum_g"), ("h", "cum_h")),
    ).crossJoin(F.broadcast(tot))
    cb = c.withColumn(
        "bin",
        F.expr(f"((CAST(cum_n AS BIGINT) - 1) * {B}) DIV n"),
    )
    cand = (
        cb.groupBy("feat", "bin")
        .agg(
            F.max(
                F.struct(
                    F.col("val"),
                    F.col("cum_n"),
                    F.col("cum_g"),
                    F.col("cum_h"),
                )
            ).alias("s")
        )
        .select("feat", "bin", "s.*")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum_n") < F.col("n"))
    )
    cnts = cand.agg(F.count("*").cast("bigint").alias("cand_bins"))
    gl = F.col("cum_g").cast("double") / 1000000
    hl = F.col("cum_h").cast("double") / 1000000000000
    gr = (F.col("gt") - F.col("cum_g")).cast("double") / 1000000
    hr = (F.col("ht") - F.col("cum_h")).cast("double") / 1000000000000
    gtd = F.col("gt").cast("double") / 1000000
    htd = F.col("ht").cast("double") / 1000000000000
    kl = (gl * gl) / (hl + F.lit(1.0))
    kr = (gr * gr) / (hr + F.lit(1.0))
    key = F.lit(0.0) - (kl + kr)
    p = (
        cand.withColumn("key", key)
        .orderBy("key", "feat", "val")
        .limit(1)
        .select(
            "feat",
            F.col("bin").cast("bigint").alias("bin"),
            F.col("val").alias("threshold"),
            F.col("cum_n").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("cum_n")).cast("bigint").alias("n_right"),
            pround(gl, 6).alias("g_left"),
            pround(hl, 6).alias("h_left"),
            pround(gr, 6).alias("g_right"),
            pround(hr, 6).alias("h_right"),
            pround(
                F.lit(0.5)
                * ((kl + kr) - (gtd * gtd) / (htd + F.lit(1.0))),
                6,
            ).alias("gain"),
            pround(F.lit(0.0) - F.lit(0.1) * gl / (hl + F.lit(1.0)), 6).alias(
                "w_left"
            ),
            pround(F.lit(0.0) - F.lit(0.1) * gr / (hr + F.lit(1.0)), 6).alias(
                "w_right"
            ),
        )
    )
    return p.crossJoin(F.broadcast(cnts))
