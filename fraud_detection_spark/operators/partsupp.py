"""The five TPC-H shapes that need ``partsupp`` — a table the synthetic
schema lacks — run here over a DERIVED partsupp: the distinct
(partkey, suppkey) pairs actually traded in lineitem, with
availability/cost synthesized by integer hashes of the pair. Both
engines derive the identical relation (one DISTINCT over lineitem +
pure integer column math — no RNG, no floats until the final display
cast), so every query below is exactly oracle-checkable and every
lineitem join against partsupp matches by construction.

Derivation (all BIGINT math, overflow-free to sf ≥ 100):
    ps_partkey, ps_suppkey  = DISTINCT (l_partkey, l_suppkey)
    ps_availqty             = (pk*31 + sk*17) % 9999 + 1
    ps_cents                = (pk*53 + sk*29) % 90000 + 10000
    ps_supplycost           = ps_cents / 100.0   (display only)

Cost comparisons (Q2's min, Q11's threshold) happen in integer CENTS,
never in floating dollars — double equality across engines is exactly
the hash-flake class the engine bans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fraud_detection_spark.functions import fixed_sum, fp_units
from fraud_detection_spark.registry import query, sql_fixed_sum
from fraud_detection_spark.sources import load_table

_PS_SQL = (
    "(SELECT ps_partkey, ps_suppkey, "
    "CAST((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS BIGINT) AS ps_availqty, "
    "CAST((ps_partkey * 53 + ps_suppkey * 29) % 90000 + 10000 AS BIGINT) AS ps_cents, "
    "CAST((ps_partkey * 53 + ps_suppkey * 29) % 90000 + 10000 AS DOUBLE) / 100.0 AS ps_supplycost "
    "FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey "
    "FROM lineitem))"
)


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp derived from traded pairs — one shuffle (the DISTINCT
    on the two int keys), then narrow integer expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    cents = (
        F.col("ps_partkey") * 53 + F.col("ps_suppkey") * 29
    ) % 90000 + 10000
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1)
        .cast("bigint")
        .alias("ps_availqty"),
        cents.cast("bigint").alias("ps_cents"),
        (cents.cast("double") / 100.0).alias("ps_supplycost"),
    )


@query(
    "q_tpch_q2",
    oracle=(
        f"WITH ps AS {_PS_SQL}, "
        "asia AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'), "
        "costs AS (SELECT ps_partkey, ps_suppkey, ps_cents, ps_supplycost FROM ps "
        "JOIN asia ON ps_suppkey = s_suppkey), "
        "mins AS (SELECT ps_partkey AS m_key, MIN(ps_cents) AS min_cents "
        "FROM costs GROUP BY ps_partkey) "
        "SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost "
        "FROM part JOIN costs ON p_partkey = ps_partkey "
        "JOIN mins ON p_partkey = m_key AND ps_cents = min_cents "
        "JOIN asia ON ps_suppkey = s_suppkey "
        "WHERE p_size = 15 "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20"
    ),
    tags=("tpch", "join", "partsupp"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): correlated min decorrelated
    into a per-part MIN over the region's suppliers, equality-joined
    back — in integer cents, so the min-equality is exact on both
    engines. Region/size filters shrink both sides before the join."""
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = ps.join(asia, ps.ps_suppkey == asia.s_suppkey)
    mins = costs.groupBy(F.col("ps_partkey").alias("m_key")).agg(
        F.min("ps_cents").alias("min_cents")
    )
    return (
        costs.join(
            mins,
            (costs.ps_partkey == mins.m_key) & (costs.ps_cents == mins.min_cents),
        )
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(20)
    )


@query(
    "q_tpch_q9",
    oracle=(
        f"WITH ps AS {_PS_SQL} "
        "SELECT nation, o_year, "
        + sql_fixed_sum(
            "l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity", 2
        )
        + " AS sum_profit FROM ("
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, "
        "l_extendedprice, l_discount, ps_supplycost, l_quantity "
        "FROM lineitem "
        "JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "WHERE p_type = 'PROMO') GROUP BY nation, o_year"
    ),
    tags=("tpch", "join", "partsupp"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): the widest canonical join — the
    fact table against partsupp on BOTH keys plus three broadcast dims
    and orders. The derived partsupp covers every traded pair by
    construction, so the two-key join is lossless. Adapted filter:
    p_type = 'PROMO' (no LIKE-able p_name in the synthetic schema).
    The profit sum is per-row-cents exact (fixed_sum) — a raw
    SUM(double) here flaked by one cent between partition layouts in
    round 2 (group (NATION_23, 2000) at local[32])."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(
            ps,
            (ps.ps_partkey == li.l_partkey) & (ps.ps_suppkey == li.l_suppkey),
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(fixed_sum(profit, 2).alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    oracle=(
        f"WITH ps AS {_PS_SQL}, "
        "nat AS (SELECT ps_partkey, ps_cents * ps_availqty AS v FROM ps "
        "JOIN supplier ON ps_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_1'), "
        "tot AS (SELECT SUM(v) AS total_v FROM nat) "
        "SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents FROM ("
        "SELECT ps_partkey, SUM(v) AS value_cents FROM nat GROUP BY ps_partkey) "
        "CROSS JOIN tot WHERE value_cents > total_v * 0.001"
    ),
    tags=("tpch", "join", "partsupp", "having"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part inventory value vs a
    fraction of the national total — the HAVING-against-scalar shape.
    All value math in integer cents (BIGINT-exact on both engines);
    only the 0.001 threshold multiply is floating, applied identically
    to the same exact integer."""
    ps = derived_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    nat = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("ps_partkey", (F.col("ps_cents") * F.col("ps_availqty")).alias("v"))
    )
    tot = nat.agg(F.sum("v").alias("total_v"))
    per_part = nat.groupBy("ps_partkey").agg(F.sum("v").alias("value_cents"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") > F.col("total_v") * 0.001)
        .select("ps_partkey", F.col("value_cents").cast("bigint").alias("value_cents"))
    )


@query(
    "q_tpch_q16",
    oracle=(
        f"WITH ps AS {_PS_SQL} "
        "SELECT p_brand, p_type, p_size, "
        "CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM ps JOIN part ON p_partkey = ps_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29) "
        "AND ps_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size"
    ),
    tags=("tpch", "join", "partsupp", "anti"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT) per
    part attribute with a NOT IN exclusion — a LEFT ANTI join against
    the excluded suppliers (adapted: negative balance stands in for the
    complaints LIKE filter)."""
    ps = derived_partsupp(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_key"))
    )
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20",
    oracle=(
        f"WITH ps AS {_PS_SQL}, "
        "shipped AS (SELECT l_partkey, l_suppkey, "
        "SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_cents "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY l_partkey, l_suppkey), "
        "cand AS (SELECT DISTINCT ps_suppkey FROM ps "
        "JOIN part ON p_partkey = ps_partkey AND p_type = 'PROMO' "
        "JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey "
        "WHERE ps_availqty * 200 > qty_cents) "
        "SELECT s_name, s_acctbal FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN cand ON s_suppkey = ps_suppkey "
        "WHERE n_name = 'NATION_2'"
    ),
    tags=("tpch", "join", "partsupp", "semi"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): the nested-IN chain —
    suppliers whose stock of promo parts exceeds half of what they
    shipped in the year. The correlated SUM decorrelates into one
    windowed aggregate joined on both keys (inner join = the SQL NULL
    semantics: pairs with no shipments don't qualify); the final
    membership test is a semi join."""
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(fp_units(F.col("l_quantity"), 2)).alias("qty_cents")
    )
    cand = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            shipped,
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
        )
        .filter(F.col("ps_availqty") * 200 > F.col("qty_cents"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(cand, s.s_suppkey == cand.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
