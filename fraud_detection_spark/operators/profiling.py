"""Data-profiling operator — the data-quality summary every pipeline
runs before trusting an input drop.

Reference parity: the reference's audit is three ad-hoc pandas calls
(df.isnull().sum() preprocess.py:24, df.shape load_data.py:7,
df['Class'].value_counts() load_data.py:15); this operator is the
engine-native generalization: one long-format profile row per numeric
column with row/null/distinct counts, min/max, and an exact
fixed-point mean.

Scale posture: the wide-to-long explode is a codegen'd generator over
ONE scan of the fact table (not one scan per column); the profile
aggregate is map-side combinable except the exact distinct count,
which shuffles (column, value) pairs — the documented exact form, with
approx_count_distinct as the beyond-100 TB twin (the
q_distinct_count ↔ q_approx_distinct pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import fp_units, pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import load_table

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    legs = " UNION ALL ".join(
        f"SELECT '{c}' AS col, CAST({c} AS DOUBLE) AS v FROM lineitem"
        for c in _PROFILE_COLS
    )
    return (
        f"WITH long AS ({legs}) "
        "SELECT col, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct, "
        "MIN(v) AS min_v, MAX(v) AS max_v, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(v * 10000 + 0.5) AS BIGINT)) AS DOUBLE) "
            "/ 10000 / COUNT(v)",
            6,
        )
        + " AS mean_v FROM long GROUP BY col"
    )


@query("q_data_profile", oracle=_profile_oracle(), tags=("quality", "profile"))
def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-format numeric profile of lineitem: per column, row count,
    null count, exact distinct count, min/max, fixed-point mean.

    Spark plan: explode an array<struct<col,v>> built in one projection
    — a single scan feeds all columns' profile rows (the oracle's
    UNION-ALL form would scan once per column); min/max are raw stored
    doubles (no arithmetic, hash-safe), the mean is exact fixed-point
    units."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"), F.col(c).cast("double").alias("v")
            )
            for c in _PROFILE_COLS
        ]
    )
    long = li.select(F.explode(pairs).alias("p")).select("p.col", "p.v")
    return long.groupBy("col").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("bigint").alias("n_null"),
        F.count_distinct("v").cast("bigint").alias("n_distinct"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        pround(
            F.sum(fp_units(F.col("v"), 4)).cast("double") / 10000 / F.count("v"), 6
        ).alias("mean_v"),
    )


_GAP_BUCKET = 1000  # ids per completeness bucket


@query(
    "q_sequence_gaps",
    oracle=(
        "WITH b AS (SELECT event_id // 1000 AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_present, "
        "CAST(MIN(event_id) AS BIGINT) AS id_min, "
        "CAST(MAX(event_id) AS BIGINT) AS id_max "
        "FROM events GROUP BY bucket), "
        "g AS (SELECT MIN(event_id) AS lo, MAX(event_id) AS hi FROM events) "
        "SELECT CAST(bucket AS BIGINT) AS bucket, n_present, "
        "CAST(CASE "
        "WHEN bucket = lo // 1000 AND bucket = hi // 1000 THEN hi - lo + 1 "
        "WHEN bucket = lo // 1000 THEN (bucket + 1) * 1000 - lo "
        "WHEN bucket = hi // 1000 THEN hi - bucket * 1000 + 1 "
        "ELSE 1000 END AS BIGINT) AS n_expected, "
        "CAST(CASE "
        "WHEN bucket = lo // 1000 AND bucket = hi // 1000 THEN hi - lo + 1 "
        "WHEN bucket = lo // 1000 THEN (bucket + 1) * 1000 - lo "
        "WHEN bucket = hi // 1000 THEN hi - bucket * 1000 + 1 "
        "ELSE 1000 END - n_present AS BIGINT) AS n_missing "
        "FROM b, g"
    ),
    tags=("quality", "profile", "agg"),
)
def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit: per 1000-id bucket, how many ids of
    a supposedly gap-free sequence are present vs expected — missing
    ledger/invoice numbers are a first-class audit red flag, and in a
    pipeline the same check catches silently dropped partitions.

    The scalable shape: NOT a global lag-over-everything (that is one
    sorted partition of the whole table) but a two-phase audit — one
    hash aggregate folds the ids into |range|/1000 bucket rows with
    present-counts, and expected-counts come from the range bounds
    (edge buckets pro-rated); a second pass over FLAGGED buckets only
    (n_missing > 0, a tiny set) can then enumerate exact missing ids.
    This query is phase one, which is the whole scan cost."""
    ev = load_table(spark, sf_dir, "events").select("event_id")
    b = ev.groupBy(F.expr(f"event_id div {_GAP_BUCKET}").alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.min("event_id").cast("bigint").alias("id_min"),
        F.max("event_id").cast("bigint").alias("id_max"),
    )
    g = ev.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    j = b.crossJoin(F.broadcast(g))
    lo_b = F.expr(f"lo div {_GAP_BUCKET}")
    hi_b = F.expr(f"hi div {_GAP_BUCKET}")
    expected = (
        F.when(
            (F.col("bucket") == lo_b) & (F.col("bucket") == hi_b),
            F.col("hi") - F.col("lo") + 1,
        )
        .when(F.col("bucket") == lo_b, (F.col("bucket") + 1) * _GAP_BUCKET - F.col("lo"))
        .when(F.col("bucket") == hi_b, F.col("hi") - F.col("bucket") * _GAP_BUCKET + 1)
        .otherwise(F.lit(_GAP_BUCKET))
    )
    return j.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "n_present",
        expected.cast("bigint").alias("n_expected"),
        (expected - F.col("n_present")).cast("bigint").alias("n_missing"),
    )


# --- correlation matrix ------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_CORR_FP = 10**4  # per-value fixed-point units


def _corr_pairs() -> list[tuple[str, str]]:
    return [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]


@query(
    "q_corr_matrix",
    oracle=(
        "WITH u AS (SELECT "
        + ", ".join(
            f"CAST(FLOOR({c} * {_CORR_FP} + 0.5) AS BIGINT) AS u_{c}"
            for c in _CORR_COLS
        )
        + " FROM lineitem), "
        "a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        # DuckDB SUM(BIGINT) is HUGEINT — exact; cast to DOUBLE only
        # for the final ratio (mirrors Spark's DECIMAL(38,0) sums)
        + ", ".join(
            f"CAST(SUM(u_{c}) AS DOUBLE) AS s_{c}, "
            f"CAST(SUM(u_{c} * u_{c}) AS DOUBLE) AS ss_{c}"
            for c in _CORR_COLS
        )
        + ", "
        + ", ".join(
            f"CAST(SUM(u_{a} * u_{b}) AS DOUBLE) AS sp_{a}_{b}"
            for a, b in _corr_pairs()
        )
        + " FROM u) "
        + " UNION ALL ".join(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            + sql_round(
                f"(n * sp_{a}_{b} - s_{a} * s_{b}) / "
                f"(SQRT(n * ss_{a} - s_{a} * s_{a}) * "
                f"SQRT(n * ss_{b} - s_{b} * s_{b}))",
                6,
            )
            + " AS corr FROM a"
            for a, b in _corr_pairs()
        )
    ),
    tags=("profile", "stats", "agg"),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the numeric fact columns (long
    format, upper triangle) — the first chart of every feature audit
    and the multicollinearity screen before a linear scorer (the
    reference standardizes features, preprocess.py:32, but never
    checks whether any are near-duplicates).

    Determinism: every value folds to 1e-4 fixed-point units ONCE;
    per-row products fit BIGINT (≤ ~1.2e18) and the sums accumulate in
    DECIMAL(38,0) — Spark's exact twin of DuckDB's HUGEINT SUM, good
    to 38 digits, so no fact-scale overflow — making the matrix a
    scalar IEEE expression on exact integer statistics, layout-proof.
    ONE map-side combinable aggregate over the fact scan; the 6 output
    rows project from the single aggregate row via stack."""
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        *[
            F.floor(F.col(c) * _CORR_FP + F.lit(0.5)).cast("bigint").alias(f"u_{c}")
            for c in _CORR_COLS
        ]
    )
    # per-row products fit BIGINT (units <= ~1.1e9, squares <= 1.2e18);
    # the SUMS would overflow it at fact scale, so they accumulate in
    # DECIMAL(38,0) — exact to 38 digits, the Spark twin of DuckDB's
    # HUGEINT SUM — and cast to double only for the final ratio
    dec = "decimal(38,0)"
    aggs = [F.count("*").cast("bigint").alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            F.sum(F.col(f"u_{c}").cast(dec)).cast("double").alias(f"s_{c}")
        )
        aggs.append(
            F.sum((F.col(f"u_{c}") * F.col(f"u_{c}")).cast(dec))
            .cast("double")
            .alias(f"ss_{c}")
        )
    for a, b in _corr_pairs():
        aggs.append(
            F.sum((F.col(f"u_{a}") * F.col(f"u_{b}")).cast(dec))
            .cast("double")
            .alias(f"sp_{a}_{b}")
        )
    agg = u.agg(*aggs)
    corr_cols = []
    for a, b in _corr_pairs():
        n = F.col("n")
        num = n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        ) * F.sqrt(
            n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        )
        corr_cols.append(pround(num / den, 6).alias(f"c_{a}_{b}"))
    wide = agg.select(*corr_cols)
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{a}_{b}" for a, b in _corr_pairs()
    )
    return wide.select(
        F.expr(
            f"stack({len(_corr_pairs())}, {stack_args}) AS (col_a, col_b, corr)"
        )
    )


# --- HBOS anomaly score ------------------------------------------------

_HBOS_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
_HBOS_BINS = 20


def _hbos_bin_sql(c: str) -> str:
    # LEAST guards x == max into the last bin; width spans [min, max]
    return (
        f"LEAST(CAST(FLOOR(({c} - min_{c}) * {_HBOS_BINS} "
        f"/ (max_{c} - min_{c})) AS BIGINT), {_HBOS_BINS - 1})"
    )


@query(
    "q_hbos",
    oracle=(
        "WITH st AS (SELECT "
        + ", ".join(
            f"MIN({c}) AS min_{c}, MAX({c}) AS max_{c}" for c in _HBOS_COLS
        )
        + ", CAST(COUNT(*) AS BIGINT) AS n FROM lineitem), "
        "r AS (SELECT l_orderkey, l_linenumber, n, "
        + ", ".join(
            f"{_hbos_bin_sql(c)} AS b_{c}" for c in _HBOS_COLS
        )
        + " FROM lineitem, st), "
        + ", ".join(
            f"h_{c} AS (SELECT b_{c} AS b, CAST(COUNT(*) AS BIGINT) AS cnt "
            f"FROM r GROUP BY b)"
            for c in _HBOS_COLS
        )
        + " SELECT r.l_orderkey, r.l_linenumber, "
        + sql_round(
            " + ".join(f"-LOG10(h_{c}.cnt * 1.0 / r.n)" for c in _HBOS_COLS),
            6,
        )
        + " AS hbos FROM r "
        + " ".join(
            f"JOIN h_{c} ON h_{c}.b = r.b_{c}" for c in _HBOS_COLS
        )
    ),
    tags=("profile", "outlier", "agg"),
)
def q_hbos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-Based Outlier Score (Goldstein & Dengel 2012) over
    the numeric fact columns: per row, HBOS = Σ_f −log10 p(bin_f) —
    the linear-time, fully-unsupervised anomaly score that needs no
    model object, no distance matrix and no iteration, which is why
    it is the standard first-pass screen at data scale (isolation
    forests and kNN-based scores do not survive 100 TB; histograms
    do). Assumes feature independence — exactly the naive-Bayes-style
    trade that makes it shuffle-free.

    Plan: one broadcast min/max stats row, per-row bin ids (codegen
    floor math, LEAST-guarded at the max edge), three ≤20-row bin
    histograms broadcast back, score = fixed per-row log arithmetic
    on exact integer counts. The fact table never shuffles; every
    p(bin) > 0 by construction (each row sits in its own bin)."""
    li = load_table(spark, sf_dir, "lineitem")
    st = li.agg(
        *[
            s
            for c in _HBOS_COLS
            for s in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
        ],
        F.count("*").cast("bigint").alias("n"),
    )

    def bin_col(c: str):
        return F.least(
            F.floor(
                (F.col(c) - F.col(f"min_{c}"))
                * _HBOS_BINS
                / (F.col(f"max_{c}") - F.col(f"min_{c}"))
            ).cast("bigint"),
            F.lit(_HBOS_BINS - 1),
        )

    r = li.crossJoin(F.broadcast(st)).select(
        "l_orderkey",
        "l_linenumber",
        "n",
        *[bin_col(c).alias(f"b_{c}") for c in _HBOS_COLS],
    )
    out = r
    for c in _HBOS_COLS:
        h = r.groupBy(F.col(f"b_{c}").alias("b")).agg(
            F.count("*").cast("bigint").alias(f"cnt_{c}")
        )
        out = out.join(
            F.broadcast(h), out[f"b_{c}"] == h["b"]
        ).drop("b")
    score = None
    for c in _HBOS_COLS:
        term = -F.log10(F.col(f"cnt_{c}") * 1.0 / F.col("n"))
        score = term if score is None else score + term
    return out.select(
        "l_orderkey", "l_linenumber", pround(score, 6).alias("hbos")
    )
