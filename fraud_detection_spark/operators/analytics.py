"""Analytical patterns: canonical TPC-H-shaped queries, as-of join,
unpivot, and a salted skew join — the OLAP idioms a production engine
must plan well (pyspark guide §"Common OLAP patterns").

Scale posture notes per query below; the TPC-H shapes are the
benchmark-grade plans (pruned scans, partial aggs, broadcast dims,
AQE-coalesced shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import fixed_avg, fixed_sum, fp_units, pround
from fraud_detection_spark.registry import query, sql_fixed_avg, sql_fixed_sum, sql_round
from fraud_detection_spark.sources import load_table


@query(
    "q_tpch_q1",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        + sql_fixed_sum("l_quantity", 2) + " AS sum_qty, "
        + sql_fixed_sum("l_extendedprice", 2) + " AS sum_base_price, "
        + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2) + " AS sum_disc_price, "
        + sql_fixed_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 2) + " AS sum_charge, "
        + sql_round(sql_fixed_avg("l_quantity", 4), 4) + " AS avg_qty, "
        + sql_round(sql_fixed_avg("l_extendedprice", 4), 4) + " AS avg_price, "
        + sql_round(sql_fixed_avg("l_discount", 6), 6) + " AS avg_disc, "
        "CAST(COUNT(*) AS BIGINT) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    tags=("tpch", "agg"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report): 2-key group-by with 8
    aggregates over a date-filtered scan. The canonical partial-agg
    shape: each partition pre-aggregates to ≤|groups| rows before the
    single small shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            fixed_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            fixed_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            fixed_sum(disc_price, 2).alias("sum_disc_price"),
            fixed_sum(disc_price * (1 + F.col("l_tax")), 2).alias("sum_charge"),
            pround(fixed_avg(F.col("l_quantity"), 4), 4).alias("avg_qty"),
            pround(fixed_avg(F.col("l_extendedprice"), 4), 4).alias("avg_price"),
            pround(fixed_avg(F.col("l_discount"), 6), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_tpch_q3",
    oracle=(
        "SELECT l_orderkey, "
        + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2) + " AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00' "
        "AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00' "
        "GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective filters on all three
    tables (pushed to each scan) -> join -> group -> top-10. Customer
    side shrinks to one segment before the join; AQE picks broadcast
    when the filtered side fits."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q5",
    oracle=(
        "SELECT n_name, "
        + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2) + " AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' GROUP BY n_name"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-table star join with
    broadcast dims (supplier/nation/region) and the classic
    same-nation customer⋈supplier condition.

    customer and lineitem carry a shuffle_hash hint: both scale with
    SF, so broadcasting either is a test-scale accident — without the
    hint Spark's non-CBO join-size estimate (left×right product)
    inflates the customer⋈orders side past the 600k-row lineitem
    projection and BROADCASTS THE FACT TABLE (a single-threaded ~19MB
    hash-relation build here; impossible at 100 TB). The hinted plan —
    fact tables exchange on their join keys, dims broadcast — is the
    same plan a real cluster must run, and measured faster at sf0.1."""
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").hint("shuffle_hash")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q6",
    oracle=(
        "SELECT " + sql_fixed_sum("l_extendedprice * l_discount", 2) + " AS revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
    tags=("tpch", "filter"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate —
    every predicate pushes to parquet row-group stats; the canonical
    'filters reach the reader' probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(fixed_sum(F.col("l_extendedprice") * F.col("l_discount"), 2).alias("revenue"))
    )


@query(
    "q_asof_join",
    oracle=(
        "SELECT e.event_id, e.user_id, "
        "CAST(epoch_ns(p.ts) // 1000000000 AS BIGINT) AS last_purchase_ts "
        "FROM events e ASOF LEFT JOIN "
        "(SELECT user_id, ts FROM events WHERE event_type = 'purchase') p "
        "ON e.user_id = p.user_id AND e.ts >= p.ts "
        "WHERE e.event_type = 'click'"
    ),
    tags=("join", "asof"),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for every click, the most recent preceding purchase
    by the same user. Spark has no native ASOF JOIN (DuckDB does — the
    oracle uses it); composed here as the union-window idiom:
    union both sides tagged, then last_value(purchase_ts) IGNORE NULLS
    over (user, time) — one shuffle on user_id, no range cross join.
    The same plan shape scales to any history length (state is one
    value per user, not a buffer)."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_last = tagged.withColumn(
        "last_purchase_ns", F.last("purchase_ts", ignorenulls=True).over(w)
    )
    return with_last.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.expr("last_purchase_ns div 1000000000").alias("last_purchase_ts"),
    )


@query(
    "q_unpivot",
    oracle=(
        "SELECT l_orderkey, l_linenumber, rate_kind, rate FROM ("
        "SELECT l_orderkey, l_linenumber, 'discount' AS rate_kind, l_discount AS rate FROM lineitem "
        "UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'tax' AS rate_kind, l_tax AS rate FROM lineitem)"
    ),
    tags=("reshape",),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack(): the melt operation — the
    inverse of q_pivot. One pass, no shuffle (row expansion only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(2, 'discount', l_discount, 'tax', l_tax) AS (rate_kind, rate)"
        ),
    )


@query(
    "q_skew_join_salted",
    oracle=(
        "WITH f AS (SELECT event_id, "
        "CASE WHEN value < 90 THEN 0 ELSE event_id % 100 END AS hot_key, value FROM events), "
        "d AS (SELECT DISTINCT CASE WHEN value < 90 THEN 0 ELSE event_id % 100 END AS hot_key "
        "FROM events), "
        "dim AS (SELECT hot_key, hot_key * 10 AS weight FROM d) "
        "SELECT f.hot_key, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(dim.weight) AS BIGINT) AS wsum "
        "FROM f JOIN dim ON f.hot_key = dim.hot_key GROUP BY f.hot_key"
    ),
    tags=("join", "skew"),
)
def q_skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join with explicit salting: ~90% of fact rows share
    hot_key=0 (engineered skew). The fact side gets a random-free salt
    (event_id % NSALT); the dim side is exploded across all salts; the
    join key becomes (key, salt) so the hot key spreads over NSALT
    tasks. Result is salt-invariant — the oracle computes the plain
    join. (AQE skew-split is the automatic alternative; salting is the
    portable, partition-count-independent form.)"""
    NSALT = 8
    ev = load_table(spark, sf_dir, "events")
    hot_key = F.when(F.col("value") < 90, F.lit(0)).otherwise(F.col("event_id") % 100)
    f = ev.select(
        "event_id",
        hot_key.cast("bigint").alias("hot_key"),
        (F.col("event_id") % NSALT).alias("salt"),
    )
    dim_salted = (
        f.select(F.col("hot_key").alias("d_key"))
        .distinct()
        .withColumn("weight", F.col("d_key") * 10)
        .crossJoin(F.broadcast(spark.range(NSALT).select(F.col("id").alias("d_salt"))))
    )
    joined = f.join(
        dim_salted,
        (F.col("hot_key") == F.col("d_key")) & (F.col("salt") == F.col("d_salt")),
    ).select("hot_key", "weight")
    return joined.groupBy("hot_key").agg(
        F.count("*").alias("n"),
        F.sum("weight").cast("bigint").alias("wsum"),
    )


@query(
    "q_tpch_q14",
    oracle=(
        "SELECT " + sql_round(
            "100.00 * ("
            + sql_fixed_sum(
                "CASE WHEN p_type = 'PROMO' "
                "THEN l_extendedprice * (1 - l_discount) ELSE 0 END",
                2,
            )
            + ") / (" + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2) + ")",
            6,
        )
        + " AS promo_revenue FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): date-filtered fact ⋈ broadcast
    part dimension, conditional revenue ratio. The part side is
    broadcast — the fact table never shuffles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            pround(
                100.00
                * fixed_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0), 2)
                / fixed_sum(rev, 2),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q_tpch_q18",
    oracle=(
        "SELECT c_custkey, o_orderkey, " + sql_fixed_sum("l_quantity", 2) + " AS total_qty "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
        "HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 35000) "
        "GROUP BY c_custkey, o_orderkey"
    ),
    tags=("tpch", "join", "subquery"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): aggregate-then-semi-join —
    the HAVING subquery reduces lineitem to a small key set first, so
    the 3-way join only touches qualifying orders. The aggregate
    pre-filter is the scale lever (the key set after HAVING is tiny)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(fp_units(F.col("l_quantity"), 2)).alias("s_cents"))
        .filter(F.col("s_cents") > 35000)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "k"), F.col("l_orderkey") == F.col("k"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(fixed_sum(F.col("l_quantity"), 2).alias("total_qty"))
    )


@query(
    "q_tpch_q10",
    oracle=(
        "SELECT c_custkey, c_name, n_name, "
        + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2) + " AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): lost revenue from returned
    items per customer — the fraud-adjacent 'who returns things' query.
    Returned-flag + date filters push to the scans; nation broadcasts;
    top-20 is TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q7",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        + sql_fixed_sum("volume", 2) + " AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INT) AS l_year, "
        "l_extendedprice * (1 - l_discount) AS volume "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') "
        "GROUP BY supp_nation, cust_nation, l_year"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bidirectional nation-pair trade by
    year — the same dimension table joined TWICE under different
    aliases (supplier nation vs customer nation).

    Scale plan: the OR-of-pairs predicate cannot be pushed through a
    5-way join by Catalyst, so we push it by construction — supplier
    and customer are each pre-filtered to the two nations (broadcast
    join against the 2-row nation slice) BEFORE any fact join. The
    fact table then shrinks to ~2/25 of suppliers at the first
    (broadcast) join, and the residual pair filter only removes the
    two same-nation combinations instead of ~(23/25)² of all rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    two = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = two.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = two.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s2 = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(s2), li.l_suppkey == s2.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c2, o.o_custkey == c2.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q4",
    oracle=(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority"
    ),
    tags=("tpch", "join", "semi"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): orders in a quarter having
    at least one qualifying lineitem — the EXISTS becomes a LEFT SEMI
    join, which shuffles only the order keys of the filtered lineitem
    side and never duplicates orders (the reason semi beats inner+
    distinct at scale). Adapted predicate: the synthetic lineitem has
    no commit/receipt dates, so 'late' = returnflag R."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q12",
    oracle=(
        "SELECT l_linestatus, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l_linestatus"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / priority): fact-fact join with the
    date filter pushed to the lineitem scan, then conditional counts —
    map-side combinable, one shuffle per side on the join key. Adapted:
    the synthetic schema has no l_shipmode, so lines group by
    l_linestatus."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q13",
    oracle=(
        "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
        "SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count "
        "FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey) GROUP BY c_count"
    ),
    tags=("tpch", "join", "outer"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): LEFT OUTER join with a
    predicate INSIDE the join condition (customers keep their row even
    when no order qualifies — a WHERE would silently turn the outer
    join inner), then a two-level aggregation. COUNT(o_orderkey)
    counts non-null matches only. Adapted: the filter is on
    o_orderpriority (no o_comment column in the synthetic schema)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (F.col("o_orderpriority") != "1-URGENT"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("bigint").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q22",
    oracle=(
        "SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, "
        + sql_fixed_sum("c_acctbal", 2) + " AS totacctbal FROM ("
        "SELECT c_nationkey AS cntrycode, c_acctbal FROM customer "
        "WHERE c_acctbal > (SELECT " + sql_fixed_avg("c_acctbal", 2)
        + " FROM customer WHERE c_acctbal > 0.0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) "
        "GROUP BY cntrycode"
    ),
    tags=("tpch", "join", "anti"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no RECENT orders (the synthetic generator gives
    nearly every customer some order, so the anti-join is against the
    post-2000 window to stay non-vacuous — shape unchanged). The
    scalar subquery is a 1-row broadcast cross join; NOT EXISTS is a
    LEFT ANTI join (shuffles only keys); the final rollup groups by
    nation (the stand-in for the phone country code)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        fixed_avg(F.col("c_acctbal"), 2).alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            fixed_sum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q8",
    oracle=(
        "SELECT o_year, "
        + sql_round(
            "(" + sql_fixed_sum("CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END", 2)
            + ") / (" + sql_fixed_sum("volume", 2) + ")",
            6,
        )
        + " AS mkt_share FROM ("
        "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
        "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation "
        "FROM part JOIN lineitem ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "WHERE r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' "
        "AND p_type = 'PROMO') GROUP BY o_year"
    ),
    tags=("tpch", "join"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the nation table in two roles
    (customer's region gates the rows, supplier's nation feeds the
    numerator), conditional-sum ratio per year. All dims broadcast;
    the two fact joins shuffle once each; region/type filters shrink
    part and customer before any fact touches them."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    return joined.groupBy("o_year").agg(
        pround(
            fixed_sum(
                F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(0.0), 2
            )
            / fixed_sum(F.col("volume"), 2),
            6,
        ).alias("mkt_share")
    )


@query(
    "q_tpch_q15",
    oracle=(
        "WITH rev AS (SELECT l_suppkey AS supplier_no, "
        + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2)
        + " AS total_revenue FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM supplier JOIN rev ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"
    ),
    tags=("tpch", "join", "scalar-subquery"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue 'view' is computed once,
    its max is a 1-row broadcast, and the equality filter picks the
    top supplier(s). Comparing the PORTABLE-ROUNDED revenue on both
    sides keeps the equality cross-engine-safe (raw double max-equality
    would be a hash-flake)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_q17",
    oracle=(
        "SELECT " + sql_round("(" + sql_fixed_sum("l_extendedprice", 2) + ") / 7.0", 2)
        + " AS avg_yearly "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#1' AND l_quantity < ("
        "SELECT 0.2 * (" + sql_fixed_avg("l_quantity", 2) + ") FROM lineitem l2 "
        "WHERE l2.l_partkey = p_partkey)"
    ),
    tags=("tpch", "join", "correlated"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    per-part average decorrelates into one aggregate over lineitem
    grouped by partkey, joined back — the standard rewrite Catalyst
    performs for correlated scalar subqueries, written explicitly so
    the shuffle structure is visible: one agg pass + one join, no
    per-row subquery execution."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        (F.lit(0.2) * fixed_avg(F.col("l_quantity"), 2)).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("avg_key"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(pround(fixed_sum(F.col("l_extendedprice"), 2) / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_tpch_q19",
    oracle=(
        "SELECT " + sql_fixed_sum("l_extendedprice * (1 - l_discount)", 2)
        + " AS revenue FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity >= 1 AND l_quantity <= 20) "
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 "
        "AND l_quantity >= 5 AND l_quantity <= 25) "
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 "
        "AND l_quantity >= 10 AND l_quantity <= 30)"
    ),
    tags=("tpch", "join", "or-pushdown"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, OR-of-ANDs): the disjunction
    mixes part and lineitem columns, so Catalyst cannot push it whole;
    the part-only projection of the OR (brand+size) is applied to the
    part scan by construction — the same push-by-construction move as
    Q7 — so the broadcast side carries only the three brand slices,
    and the residual mixed predicate filters after the join."""
    part_pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50))
    )
    p = load_table(spark, sf_dir, "part").filter(part_pred)
    li = load_table(spark, sf_dir, "lineitem")
    full_pred = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(5, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(10, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(full_pred)
        .agg(
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "q_tpch_q21",
    oracle=(
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait FROM supplier "
        "JOIN lineitem l1 ON s_suppkey = l1.l_suppkey "
        "JOIN orders ON o_orderkey = l1.l_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
        "AND n_name = 'NATION_1' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
        "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey "
        "AND l3.l_returnflag = 'R') "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"
    ),
    tags=("tpch", "join", "semi", "anti"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the only
    canonical shape with BOTH an EXISTS and a NOT EXISTS against the
    same fact table — a LEFT SEMI then a LEFT ANTI join on
    (orderkey, other-supplier) pairs. The sole-blame condition ("some
    other supplier contributed, but no other supplier was late") is
    exactly semi minus anti; both auxiliary sides shuffle only
    (orderkey, suppkey) pairs, never full rows. Adapted: 'late' =
    returnflag R (the synthetic schema has no commit/receipt dates).
    """
    li = load_table(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")

    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    base = (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(s, l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    with_other = base.join(
        others,
        (F.col("l_orderkey") == F.col("o2_key"))
        & (F.col("l_suppkey") != F.col("s2_key")),
        "left_semi",
    )
    sole_blame = with_other.join(
        late_others,
        (F.col("l_orderkey") == F.col("o3_key"))
        & (F.col("l_suppkey") != F.col("s3_key")),
        "left_anti",
    )
    return (
        sole_blame.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


_BASKET_MIN_SUPPORT = 20  # pair must co-occur in >= this many orders


@query(
    "q_basket_rules",
    oracle=(
        "WITH it AS (SELECT DISTINCT l_orderkey AS okey, p_type AS item "
        "FROM lineitem JOIN part ON l_partkey = p_partkey), "
        "n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM it), "
        "sup AS (SELECT item, COUNT(*) AS n_item FROM it GROUP BY item), "
        "pairs AS (SELECT a.item AS ante, b.item AS cons, COUNT(*) AS n_pair "
        "FROM it a JOIN it b ON a.okey = b.okey AND a.item < b.item "
        f"GROUP BY ante, cons HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}) "
        "SELECT p.ante, p.cons, CAST(p.n_pair AS BIGINT) AS n_pair, "
        + sql_round("p.n_pair * 1.0 / n.n_orders", 6) + " AS support, "
        + sql_round("p.n_pair * 1.0 / sa.n_item", 6) + " AS confidence, "
        + sql_round(
            "(p.n_pair * 1.0 / n.n_orders) / "
            "((sa.n_item * 1.0 / n.n_orders) * (sc.n_item * 1.0 / n.n_orders))",
            6,
        )
        + " AS lift "
        "FROM pairs p JOIN sup sa ON p.ante = sa.item "
        "JOIN sup sc ON p.cons = sc.item CROSS JOIN n"
    ),
    tags=("analytics", "basket", "join"),
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-ordered part types:
    support / confidence / lift for every type pair appearing together
    in ≥20 orders — the classic co-occurrence analytic (and, at a
    fraud desk, the same machinery surfaces anomalous product
    combinations on one card). Items are the distinct types per order,
    so quantity within an order doesn't inflate a pair.

    Scale shape: the order→item set is one distinct aggregate after a
    broadcast dim join; the pair generation self-joins on the ORDER
    key, so the blowup per order is (items choose 2) — bounded by
    basket size, never |orders|² (the a.item < b.item cut halves it
    and canonicalizes the pair). The support HAVING prunes the long
    tail inside the aggregate; item supports and the order count are
    tiny broadcast joins. This is exactly FPGrowth's first pass; for
    deeper itemsets MLlib's FPGrowth takes over (same input shape)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    it = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("item"))
        .distinct()
    )
    n = it.agg(F.countDistinct("okey").alias("n_orders"))
    sup = it.groupBy("item").agg(F.count("*").alias("n_item"))
    a = it.select(F.col("okey"), F.col("item").alias("ante"))
    b = it.select(F.col("okey"), F.col("item").alias("cons"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("ante") < F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= _BASKET_MIN_SUPPORT)
    )
    sa = sup.select(F.col("item").alias("ante"), F.col("n_item").alias("n_ante"))
    sc = sup.select(F.col("item").alias("cons"), F.col("n_item").alias("n_cons"))
    return (
        pairs.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .crossJoin(F.broadcast(n))
        .select(
            "ante",
            "cons",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            pround(F.col("n_pair") * 1.0 / F.col("n_orders"), 6).alias("support"),
            pround(F.col("n_pair") * 1.0 / F.col("n_ante"), 6).alias("confidence"),
            pround(
                (F.col("n_pair") * 1.0 / F.col("n_orders"))
                / (
                    (F.col("n_ante") * 1.0 / F.col("n_orders"))
                    * (F.col("n_cons") * 1.0 / F.col("n_orders"))
                ),
                6,
            ).alias("lift"),
        )
    )
