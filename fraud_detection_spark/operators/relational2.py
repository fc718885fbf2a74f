"""Relational surface, batch 2: string/date scalar functions, outer
joins, set operations, richer SQL windows, pivot, quantiles,
correlation, scalar subqueries, HAVING.

These complete the engine's relational inventory (SURVEY.md §2d/§2e):
all built-in Catalyst operators, each with a DuckDB oracle. Dialect
notes are inline where Spark and DuckDB disagree (dayofweek origin,
pivot null-vs-zero, percentile vs quantile_cont).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fixed_avg, fp_units, pround
from fraud_detection_spark.registry import query, sql_fixed_avg, sql_round
from fraud_detection_spark.sources import load_table


@query(
    "q_string_funcs",
    oracle=(
        "SELECT c_custkey, upper(c_name) AS name_upper, lower(c_mktsegment) AS seg_lower, "
        "substr(c_name, 1, 8) AS name_head, CAST(length(c_name) AS INT) AS name_len, "
        "concat_ws('|', c_mktsegment, c_name) AS tagged, "
        "replace(c_name, '#', '-') AS name_dash, trim(c_name) AS name_trim "
        "FROM customer"
    ),
    tags=("scalar", "string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: upper/lower/substr/length/concat_ws/
    replace/trim — all codegen'd, 1-based substr in both engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.trim(F.col("c_name")).alias("name_trim"),
    )


@query(
    "q_date_funcs",
    oracle=(
        "SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y, "
        "CAST(month(o_orderdate) AS INT) AS m, "
        "CAST(day(o_orderdate) AS INT) AS d, "
        "CAST(quarter(o_orderdate) AS INT) AS q, "
        "CAST(dayofweek(o_orderdate) AS INT) AS dow "
        "FROM orders"
    ),
    tags=("scalar", "date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction. Dialect note: Spark dayofweek is 1..7 with
    Sunday=1, DuckDB is 0..6 with Sunday=0 — normalized here to the
    DuckDB convention (dow = spark_dayofweek - 1)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
    )


@query(
    "q_distinct_count",
    oracle=(
        "SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts, "
        "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    tags=("agg",),
)
def q_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per group (expand + two-phase aggregate in
    Spark; the approx_count_distinct variant is the 100 TB fallback but
    is banned from oracle-checked queries)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "q_quantiles",
    oracle=(
        "SELECT " + sql_round("quantile_cont(o_totalprice, 0.25)", 4) + " AS p25, "
        + sql_round("quantile_cont(o_totalprice, 0.5)", 4) + " AS p50, "
        + sql_round("quantile_cont(o_totalprice, 0.75)", 4) + " AS p75 FROM orders"
    ),
    tags=("agg", "stats"),
)
def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles: Spark percentile() and DuckDB
    quantile_cont() share the linear-interpolation definition. (At
    100 TB use approx_percentile / t-digest — exact quantiles need a
    sort or full value collection per group.)"""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        pround(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        pround(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        pround(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
    )


@query(
    "q_corr",
    oracle=(
        "SELECT " + sql_round("corr(l_quantity, l_extendedprice)", 6) + " AS corr_qty_price, "
        + sql_round("covar_samp(l_quantity, l_extendedprice)", 4) + " AS covar_qty_price "
        "FROM lineitem"
    ),
    tags=("agg", "stats"),
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance (single-pass co-moment
    aggregates, partial-merged across partitions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        pround(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        pround(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
    )


@query(
    "q_minmax_scale",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        + sql_round(
            "(l_extendedprice - MIN(l_extendedprice) OVER ()) / "
            "(MAX(l_extendedprice) OVER () - MIN(l_extendedprice) OVER ())",
            6,
        )
        + " AS price_01 FROM lineitem"
    ),
    tags=("ml", "feature"),
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max normalization to [0,1] — MinMaxScaler analog of the
    reference's StandardScaler path. Spark plan: tiny (min,max) agg
    broadcast back; no window over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    return li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        pround(
            (F.col("l_extendedprice") - F.col("lo")) / (F.col("hi") - F.col("lo")), 6
        ).alias("price_01"),
    )


@query(
    "q_pivot",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F, "
        "CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O "
        "FROM lineitem GROUP BY l_returnflag"
    ),
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide counts) — the confusion-matrix presentation
    shape (evaluate_model.py:31 heatmap). Missing cells coalesced to 0
    to match conditional-aggregation semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").pivot("l_linestatus", ["F", "O"]).count()
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("O"),
    )


@query(
    "q_join_outer",
    oracle=(
        "SELECT c_custkey, o_orderkey FROM customer FULL OUTER JOIN orders "
        "ON c_custkey = o_custkey"
    ),
    tags=("join",),
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — null-extended rows on both sides (customers
    without orders, orders whose customer is absent)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "q_intersect",
    oracle=(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' "
        "INTERSECT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    ),
    tags=("setop",),
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both open and finished
    orders."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.intersect(b)


@query(
    "q_except",
    oracle=(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' "
        "EXCEPT "
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    ),
    tags=("setop",),
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers with open but no finished orders."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.subtract(b)


@query(
    "q_window_running",
    oracle=(
        "SELECT o_custkey, o_orderkey, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) "
        "AS DOUBLE) / 100 AS running_total FROM orders"
    ),
    tags=("window",),
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (the cumulative-scan primitive behind
    the reference's ROC sweep, evaluate_model.py:49). The prefix sum
    runs over exact per-row cents (BIGINT), so it is bit-identical on
    any layout — no reliance on matching accumulation order."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(fp_units(F.col("o_totalprice"), 2)).over(w).cast("double") / 100)
        .alias("running_total"),
    )


@query(
    "q_window_rank_funcs",
    oracle=(
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(DENSE_RANK() OVER w AS BIGINT) AS drank, "
        + sql_round("PERCENT_RANK() OVER w", 6) + " AS prank, "
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile "
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice DESC, o_orderkey)"
    ),
    tags=("window",),
)
def q_window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank / percent_rank / ntile over a deterministic ordering
    (tie-broken by key — ntile assignment is order-sensitive)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        pround(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@query(
    "q_first_last",
    oracle=(
        "SELECT DISTINCT o_custkey, "
        "FIRST_VALUE(o_orderkey) OVER w AS first_order, "
        "LAST_VALUE(o_orderkey) OVER w AS last_order "
        "FROM orders WINDOW w AS (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    ),
    tags=("window",),
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last order per customer via frame-spanning window
    (UNBOUNDED..UNBOUNDED so last_value sees the whole partition)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).distinct()


@query(
    "q_filter_combo",
    oracle=(
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 20 "
        "AND l_linestatus LIKE 'F%'"
    ),
    tags=("filter",),
)
def q_filter_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + LIKE predicate combination — all pushed to
    the parquet scan (In, GreaterThanOrEqual/LessThanOrEqual,
    StringStartsWith)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 20)
        & F.col("l_linestatus").like("F%")
    ).select("l_orderkey", "l_linenumber")


@query(
    "q_null_funcs",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "NULLIF(l_discount, 0.0) AS disc_or_null, "
        "COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_defaulted, "
        "GREATEST(l_tax, l_discount) AS max_rate, "
        "LEAST(l_tax, l_discount) AS min_rate "
        "FROM lineitem"
    ),
    tags=("scalar",),
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLIF/COALESCE/GREATEST/LEAST — the null-handling scalar kit
    (reference analog: feature defaulting at xai_tasks.py:87)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.nullif(F.col("l_discount"), F.lit(0.0)).alias("disc_or_null"),
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "disc_defaulted"
        ),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@query(
    "q_case_bucket",
    oracle=(
        "SELECT CASE WHEN o_totalprice < 50000 THEN 'small' "
        "WHEN o_totalprice < 150000 THEN 'medium' ELSE 'large' END AS size_bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        + sql_round(sql_fixed_avg("o_totalprice", 2), 2) + " AS avg_price "
        "FROM orders GROUP BY size_bucket"
    ),
    tags=("scalar", "agg"),
)
def q_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE bucketing + aggregate (the alert-threshold
    pattern of deploy.py:40 generalized to bands)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.groupBy(bucket.alias("size_bucket"))
        .agg(
            F.count("*").alias("n"),
            pround(fixed_avg(F.col("o_totalprice"), 2), 2).alias("avg_price"),
        )
    )


# one dialect-shared text (sql_fixed_avg is valid Spark SQL and DuckDB):
# the threshold derives from exact integer sums, so the >-comparison
# cannot flip between engines or partition layouts.
_SCALAR_SUBQ_SQL = (
    "SELECT o_orderkey FROM orders "
    "WHERE o_totalprice > 1.5 * (SELECT "
    + sql_fixed_avg("o_totalprice", 2)
    + " FROM orders)"
)


@query("q_scalar_subquery", oracle=_SCALAR_SUBQ_SQL, tags=("subquery",))
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (orders at >1.5x the mean price).
    Catalyst plans the subquery as a one-row broadcast."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_SQL)


@query(
    "q_having",
    oracle=(
        "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders "
        "GROUP BY o_custkey HAVING COUNT(*) >= 15"
    ),
    tags=("agg",),
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation predicate)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q_cross_join",
    oracle=(
        "SELECT r_name, s FROM region CROSS JOIN "
        "(SELECT DISTINCT l_linestatus AS s FROM lineitem)"
    ),
    tags=("join",),
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit small×small cross join (dimension grid expansion)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    s = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("s")
    ).distinct()
    return r.crossJoin(s)
