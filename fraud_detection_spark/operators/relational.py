"""Relational core: scans, projections, filters, casts, joins, set ops,
sorts, limits, windows, JSON/string scalar functions.

Reference parity notes (see SURVEY.md §2a/2b/2d/2e): the reference's
single-table pandas pipeline uses scans (load_data.py:4), projections
(preprocess.py:27), casts (deploy.py:30), threshold predicates
(deploy.py:40), sorts (scripts/generate_synthetic_data.py:12), top-k
(explain_model.py:40), JSON serialize/parse (api/worker.py:85,
api/app.py:265-277) and key point-lookups (api/app.py:265-268). Joins /
set ops / rollups are part of the engine's relational surface (free via
Catalyst) even though the reference never joins.

Scale posture: every query here is a declarative DataFrame plan —
predicate pushdown + column pruning reach the parquet scan, small-side
joins are explicitly broadcast, and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fixed_sum, pround
from fraud_detection_spark.registry import query, sql_fixed_sum, sql_round
from fraud_detection_spark.sources import load_table


# ---------------------------------------------------------------------------
# Scans / counts / limits
# ---------------------------------------------------------------------------

@query(
    "q_scan",
    oracle="SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM lineitem",
    tags=("scan",),
)
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected parquet scan (column pruning reaches the reader).

    Ref: pd.read_csv at load_data.py:4 — here the projection prunes the
    parquet scan to 4 of 11 columns (check ReadSchema in .explain()).
    """
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )


@query(
    "q_count",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem",
    tags=("agg",),
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count introspection. Ref: df.shape at load_data.py:7.

    Spark answers this from parquet row-group metadata (no full scan).
    """
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@query(
    "q_limit",
    oracle=(
        "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 5"
    ),
    tags=("limit",),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic head: ORDER BY key + LIMIT. Ref: df.head() load_data.py:11.

    A bare limit() is nondeterministic under partitioning, so the
    declared form orders by the key first (TakeOrderedAndProject —
    per-partition top-k then merge; no full sort at scale).
    """
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(5)
    )


@query(
    "q_point_lookup",
    oracle=(
        "SELECT c_custkey, c_name, c_nationkey, " + sql_round("c_acctbal", 2) + " AS acctbal "
        "FROM customer WHERE c_custkey = 42"
    ),
    tags=("filter",),
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key. Ref: SELECT ... WHERE transaction_id = :tx_id
    (api/app.py:265-268). The equality predicate pushes down to parquet
    (row-group + page skipping via min/max stats)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            pround(F.col("c_acctbal"), 2).alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Projections / row transforms / casts / predicates
# ---------------------------------------------------------------------------

@query(
    "q_project",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        + sql_round("l_extendedprice * (1 - l_discount)", 2) + " AS revenue FROM lineitem"
    ),
    tags=("project",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + derived column. Ref: df.drop('Class') preprocess.py:27
    (column pruning) — the arithmetic stays in whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
    )


@query(
    "q_select_order",
    oracle=(
        "SELECT c_custkey, COALESCE(c_acctbal, 0.0) AS acctbal, c_mktsegment "
        "FROM customer"
    ),
    tags=("project",),
)
def q_select_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column realign with missing->default. Ref: input_df[self.features]
    (predict_single.py:22) and dict.get(f, 0.0) (xai_tasks.py:86-90):
    select in canonical order, defaulting nulls to 0.0."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("acctbal"),
        "c_mktsegment",
    )


@query(
    "q_cast",
    oracle=(
        "SELECT l_orderkey, CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int, "
        "CAST(l_orderkey AS VARCHAR) AS okey_str, "
        "TRY_CAST(l_returnflag AS DOUBLE) AS flag_num FROM lineitem"
    ),
    tags=("cast",),
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed casts incl. null-on-error. Ref: pd.to_numeric(errors='coerce')
    deploy.py:30 ≡ try_cast; astype(int) train_model.py:43."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.floor("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.expr("try_cast(l_returnflag AS DOUBLE)").alias("flag_num"),
    )


@query(
    "q_filter_threshold",
    oracle=(
        "SELECT event_id, user_id, " + sql_round("value", 4) + " AS value FROM events "
        "WHERE value > 80.0"
    ),
    tags=("filter",),
)
def q_filter_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold predicate. Ref: alert = prob > 0.8 (deploy.py:40).
    The > predicate is pushed to the parquet scan (PushedFilters)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("value") > 80.0).select(
        "event_id", "user_id", pround(F.col("value"), 4).alias("value")
    )


@query(
    "q_round",
    oracle=(
        "SELECT l_orderkey, l_linenumber, " + sql_round("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2) + " AS charge "
        "FROM lineitem"
    ),
    tags=("scalar",),
)
def q_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding scalar fn. Ref: round(float(prob), 4) deploy.py:44."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
    )


@query(
    "q_math_exp",
    oracle=(
        "SELECT l_orderkey, l_linenumber, " + sql_round("EXP(l_discount * 2.0 + 1.0)", 6) + " AS boost FROM lineitem"
    ),
    tags=("scalar",),
)
def q_math_exp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exp() scalar math. Ref: np.exp(N(3,1)) log-normal amounts
    (scripts/generate_synthetic_data.py:15) — deterministic input here
    so the oracle can replicate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(F.exp(F.col("l_discount") * 2.0 + 1.0), 6).alias("boost"),
    )


@query(
    "q_regexp_extract",
    oracle=(
        "SELECT event_id, regexp_extract(props, '[0-9]+', 0) AS first_num "
        "FROM events"
    ),
    tags=("scalar", "string"),
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction. Ref: re.findall(r'[0-9]+...') defensive parse
    api/app.py:226-231 — typed columns make it unnecessary, exposed as
    an engine scalar op."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.regexp_extract("props", "[0-9]+", 0).alias("first_num")
    )


@query(
    "q_to_json",
    oracle=(
        "SELECT o_orderkey, CAST(to_json(struct_pack(o_orderkey := o_orderkey, "
        "o_orderstatus := o_orderstatus, o_orderpriority := o_orderpriority)) "
        "AS VARCHAR) AS js FROM orders"
    ),
    tags=("json",),
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON serialize a struct. Ref: json.dumps(shap_values) api/worker.py:85.
    Int/string fields only — double JSON formatting differs per engine."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_json(F.struct("o_orderkey", "o_orderstatus", "o_orderpriority")).alias("js"),
    )


@query(
    "q_json_get",
    oracle=(
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
        "FROM events"
    ),
    tags=("json",),
)
def q_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction. Ref: JSONB read-back api/app.py:265-277."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@query(
    "q_map_build",
    oracle=(
        "SELECT event_id, CAST(to_json(struct_pack(event := event_id, "
        "user := user_id)) AS VARCHAR) AS feature_map FROM events"
    ),
    tags=("json", "map"),
)
def q_map_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a feature map column. Ref: {f'feature_{i}': v} api/app.py:243.
    Emitted as canonical JSON so the oracle can compare byte-equal."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("event"), F.col("event_id"), F.lit("user"), F.col("user_id")
    )
    return ev.select("event_id", F.to_json(m).alias("feature_map"))


# ---------------------------------------------------------------------------
# Sorts / top-k
# ---------------------------------------------------------------------------

@query(
    "q_sort",
    oracle=(
        "SELECT event_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS ts_epoch FROM events "
        "ORDER BY ts_epoch, event_id"
    ),
    tags=("sort",),
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sort by event time. Ref: np.sort(uniform Time)
    scripts/generate_synthetic_data.py:12. Range-partitioned exchange +
    per-partition sort in Spark (scales; no single-node sort)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", F.expr("ts div 1000000000").alias("ts_epoch"))
        .orderBy("ts_epoch", "event_id")
    )


@query(
    "q_topk",
    oracle=(
        "SELECT p_partkey, " + sql_round("p_retailprice", 2) + " AS p_retailprice FROM part "
        "ORDER BY p_retailprice DESC, p_partkey LIMIT 3"
    ),
    tags=("sort", "limit"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by score. Ref: argsort()[-3:][::-1] explain_model.py:40.
    Spark plans TakeOrderedAndProject: per-partition heap top-k, then a
    k-row merge on the driver — O(n) not O(n log n), no global sort."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", pround(F.col("p_retailprice"), 2).alias("p_retailprice"))
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(3)
    )


# ---------------------------------------------------------------------------
# Joins / set ops / grouping sets / SQL windows
# ---------------------------------------------------------------------------

@query(
    "q_join_inner",
    oracle=(
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        + sql_fixed_sum("o_totalprice", 2) + " AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "GROUP BY c_mktsegment"
    ),
    tags=("join", "agg"),
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner join + aggregate (orders ⋈ customer).

    At scale: shuffle-hash/sort-merge on the join key with AQE skew
    handling; partial aggregation (map-side combine) before the final
    group-by shuffle."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_sum(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "q_join_broadcast",
    oracle=(
        "SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_customers "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    tags=("join", "broadcast"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join with explicitly broadcast dims (nation: 25 rows,
    region: 5 rows) — zero shuffle for the joins; only the final
    group-by exchanges 5 rows. The canonical 100 TB dim-join shape."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )


@query(
    "q_join_semi",
    oracle=(
        "SELECT c_custkey FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
    tags=("join",),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with >=1 order (EXISTS)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@query(
    "q_join_anti",
    oracle=(
        "SELECT c_custkey FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderstatus = 'P')"
    ),
    tags=("join",),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no in-progress ('P') orders
    (NOT EXISTS). The status filter keeps the result non-trivial —
    every customer in the testdata has at least one order of *some*
    status."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@query(
    "q_union",
    oracle=(
        "SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT 'event' AS src, event_id AS id FROM events "
        "UNION ALL SELECT 'order' AS src, o_orderkey AS id FROM orders"
        ") GROUP BY src"
    ),
    tags=("setop",),
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogeneous sources, then aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        F.lit("event").alias("src"), F.col("event_id").alias("id")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("src"), F.col("o_orderkey").alias("id")
    )
    return ev.unionByName(o).groupBy("src").agg(F.count("*").alias("n"))


@query(
    "q_rollup",
    oracle=(
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n, "
        + sql_fixed_sum("l_quantity", 2) + " AS sum_qty FROM lineitem "
        "GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
    tags=("agg", "rollup"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (flag -> flag+status -> grand total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), fixed_sum(F.col("l_quantity"), 2).alias("sum_qty")
    )


@query(
    "q_cube",
    oracle=(
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
    ),
    tags=("agg", "cube"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping combinations)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@query(
    "q_grouping_sets",
    oracle=(
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    ),
    tags=("agg",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (flag-only and status-only marginals)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    )


@query(
    "q_window_rank",
    oracle=(
        "SELECT o_custkey, o_orderkey, " + sql_round("o_totalprice", 2) + " AS o_totalprice FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn = 1"
    ),
    tags=("window",),
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top order per customer via ROW_NUMBER window (deterministic
    tie-break on key). Partitioned window — shuffles once on o_custkey,
    no global sort; scales linearly with customers."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", pround(F.col("o_totalprice"), 2).alias("o_totalprice"))
    )
