"""Behavioral / product-analytics operators over the event stream.

The reference's event leg stops at per-transaction scoring; a fraud
platform also reads *behavior*: when accounts appear and whether they
come back (retention cohorts — bot farms churn instantly), what path a
session takes (funnels — account-takeover skips the browse phase), and
which state transitions are common (transition matrix — anomalous
chains flag scripted traffic). All three are classic analytics-engine
operators, SQL-expressible, and DuckDB-oracle-exact.

Scale posture: cohorts and funnels are hash aggregates keyed by
user_id with per-user firsts joined back (shuffle join on the key at
scale — the user dimension is too big to broadcast, and that is fine:
it co-partitions with the event stream); the transition matrix's only
window is partitioned by user_id and ordered by the ns-precision
timestamp + event_id (total order, so LEAD is deterministic on any
layout). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fraud_detection_spark.functions import pround
from fraud_detection_spark.registry import query, sql_round
from fraud_detection_spark.sources import events_with_time, load_table

_SEC_SQL = "(epoch_ns(ts) // 1000000000)"
_DAY_SQL = f"({_SEC_SQL} // 86400)"


@query(
    "q_retention_cohort",
    oracle=(
        f"WITH e AS (SELECT user_id, {_DAY_SQL} AS day FROM events), "
        "f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id), "
        "a AS (SELECT DISTINCT e.user_id, f.cohort_day, e.day - f.cohort_day AS age "
        "FROM e JOIN f ON e.user_id = f.user_id) "
        "SELECT CAST(cohort_day AS BIGINT) AS cohort_day, CAST(age AS BIGINT) AS age, "
        "CAST(COUNT(*) AS BIGINT) AS n_users FROM a GROUP BY cohort_day, age"
    ),
    tags=("behavior", "agg"),
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen day, and
    for each (cohort, age-in-days) the count of users still active —
    the table every retention curve is drawn from, and the fraud tell
    for throwaway-account farms (cohorts that never return past
    age 0).

    Plan: per-user first-day aggregate, joined back on user_id (the
    co-partitioned key), then DISTINCT (user, cohort, age) and one
    hash aggregate. All integer-day arithmetic — engine-exact."""
    ev = events_with_time(spark, sf_dir).select(
        "user_id", (F.col("ts_sec") / 86400).cast("bigint").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        ev.join(first, "user_id")
        .select("user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("age"))
        .distinct()
    )
    return active.groupBy("cohort_day", "age").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


@query(
    "q_funnel_steps",
    oracle=(
        f"WITH e AS (SELECT user_id, event_type, {_SEC_SQL} AS sec FROM events), "
        "v AS (SELECT user_id, MIN(sec) AS tv FROM e WHERE event_type = 'view' "
        "GROUP BY user_id), "
        "c AS (SELECT e.user_id, MIN(e.sec) AS tc FROM e JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.sec >= v.tv GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, MIN(e.sec) AS tp FROM e JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.sec >= c.tc GROUP BY e.user_id) "
        "SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view, "
        "CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click, "
        "CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase, "
        + sql_round("(SELECT COUNT(*) FROM c) * 1.0 / (SELECT COUNT(*) FROM v)", 6)
        + " AS view_to_click, "
        + sql_round("(SELECT COUNT(*) FROM p) * 1.0 / NULLIF((SELECT COUNT(*) FROM c), 0)", 6)
        + " AS click_to_purchase"
    ),
    tags=("behavior", "funnel"),
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked at-or-after
    their first view, then purchased at-or-after that click — with
    step conversion rates. Order matters (an account-takeover session
    that purchases without ever browsing does not convert through
    this funnel; a simple count-per-type would miss that).

    Plan: three per-user MIN aggregates, each chained through a join
    on user_id (co-partitioned — one shuffle reused), then three tiny
    counts. No window over the full stream, no Python."""
    ev = events_with_time(spark, sf_dir).select("user_id", "event_type", "ts_sec")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_sec") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_sec") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("tp"))
    )
    nv = v.agg(F.count("*").cast("bigint").alias("n_view"))
    nc = c.agg(F.count("*").cast("bigint").alias("n_click"))
    np_ = p.agg(F.count("*").cast("bigint").alias("n_purchase"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            pround(F.col("n_click") * 1.0 / F.col("n_view"), 6).alias("view_to_click"),
            pround(
                F.col("n_purchase") * 1.0 / F.nullif(F.col("n_click"), F.lit(0)), 6
            ).alias("click_to_purchase"),
        )
    )


@query(
    "q_event_transitions",
    oracle=(
        "WITH o AS (SELECT user_id, event_type, "
        "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type "
        "FROM events), "
        "g AS (SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n "
        "FROM o WHERE next_type IS NOT NULL GROUP BY from_type, to_type), "
        "t AS (SELECT from_type, to_type, n, "
        "SUM(n) OVER (PARTITION BY from_type) AS n_from FROM g) "
        "SELECT from_type, to_type, CAST(n AS BIGINT) AS n, "
        + sql_round("n * 1.0 / n_from", 6) + " AS p FROM t"
    ),
    tags=("behavior", "window"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event transition matrix: per user, each event's
    successor (LEAD over the per-user timeline), aggregated into
    (from, to, count, conditional probability) — the Markov chain of
    behavior that scripted/bot traffic deviates from.

    Plan: ONE window, partitioned by user_id and ordered by the
    ns-precision timestamp + event_id (a total order, so LEAD is
    deterministic on any layout), then a hash aggregate to the
    |types|² matrix with per-from totals from a second tiny window
    over that matrix."""
    ev = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    g = o.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    w_from = Window.partitionBy("from_type")
    return g.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        pround(F.col("n") * 1.0 / F.sum("n").over(w_from), 6).alias("p"),
    )


_RFM_QS = [0.2, 0.4, 0.6, 0.8]


@query(
    "q_rfm",
    oracle=(
        "WITH u AS (SELECT user_id, "
        "MAX(epoch_ns(ts) // 1000000000) AS last_sec, "
        "CAST(COUNT(*) AS BIGINT) AS freq, "
        "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000"
        " AS monetary FROM events GROUP BY user_id), "
        "g AS (SELECT MAX(last_sec) AS end_sec FROM u), "
        "r AS (SELECT user_id, CAST((end_sec - last_sec) // 86400 AS BIGINT)"
        " AS recency_days, freq, monetary FROM u, g), "
        "c AS (SELECT "
        + ", ".join(
            f"quantile_disc(recency_days, {q}) AS rc{i}, "
            f"quantile_disc(freq, {q}) AS fc{i}, "
            f"quantile_disc(monetary, {q}) AS mc{i}"
            for i, q in enumerate(_RFM_QS)
        )
        + " FROM r) "
        "SELECT user_id, recency_days, freq, "
        + "floor(monetary * 10000 + 0.5) / 10000"
        + " AS monetary, "
        # recency scores INVERTED: recent (small) = 5
        "CAST(5 - (" + " + ".join(
            f"CASE WHEN recency_days > rc{i} THEN 1 ELSE 0 END"
            for i in range(len(_RFM_QS))
        ) + ") AS INT) AS r_score, "
        "CAST(1 + " + " + ".join(
            f"CASE WHEN freq > fc{i} THEN 1 ELSE 0 END"
            for i in range(len(_RFM_QS))
        ) + " AS INT) AS f_score, "
        "CAST(1 + " + " + ".join(
            f"CASE WHEN monetary > mc{i} THEN 1 ELSE 0 END"
            for i in range(len(_RFM_QS))
        ) + " AS INT) AS m_score "
        "FROM r, c"
    ),
    tags=("behavior", "segmentation", "agg"),
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency (days since last event, inverted so
    recent = 5), frequency and monetary quintile scores per account —
    the classic customer-value segmentation, and at a fraud desk the
    prior for which accounts even matter (an attack on a 555 account
    outranks one on a 111). Monetary uses exact fixed-point sums.

    Shape: one per-account aggregate folds the stream; the 12 quintile
    cutoffs come from ONE array-free quantile aggregate over the
    ≤|accounts| table and broadcast back (the q_drift_profile cutoff
    pattern — PERCENTILE_DISC selects elements, so both engines cut
    identically); scores are codegen CASE sums. No window, no sort of
    anything unbounded."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.expr("ts div 1000000000")).alias("last_sec"),
        F.count("*").cast("bigint").alias("freq"),
        (
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / 10000
        ).alias("monetary"),
    )
    g = u.agg(F.max("last_sec").alias("end_sec"))
    r = u.crossJoin(F.broadcast(g)).select(
        "user_id",
        F.expr("(end_sec - last_sec) div 86400").cast("bigint").alias("recency_days"),
        "freq",
        "monetary",
    )
    cuts = r.agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})").alias(
                f"{tag}{i}"
            )
            for col, tag in (("recency_days", "rc"), ("freq", "fc"), ("monetary", "mc"))
            for i, q in enumerate(_RFM_QS)
        ]
    )

    def score(col: str, tag: str):
        s = F.lit(1)
        for i in range(len(_RFM_QS)):
            s = s + (F.col(col) > F.col(f"{tag}{i}")).cast("int")
        return s

    return r.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "recency_days",
        "freq",
        F.expr("floor(monetary * 10000 + 0.5) / 10000").alias("monetary"),
        (F.lit(6) - score("recency_days", "rc")).cast("int").alias("r_score"),
        score("freq", "fc").cast("int").alias("f_score"),
        score("monetary", "mc").cast("int").alias("m_score"),
    )


_ATTR_WINDOW_SEC = 86400  # look back one day for the touch


@query(
    "q_attribution",
    oracle=(
        "WITH e AS (SELECT event_id, user_id, event_type, "
        "(epoch_ns(ts) // 1000000000) AS ts_sec FROM events), "
        "w AS (SELECT *, "
        "LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END "
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_type, "
        "LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN ts_sec END "
        "IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_sec "
        "FROM e) "
        "SELECT event_id, user_id, "
        f"CASE WHEN prev_sec >= ts_sec - {_ATTR_WINDOW_SEC} "
        "THEN prev_type ELSE 'none' END AS touch, "
        f"CAST(CASE WHEN prev_sec >= ts_sec - {_ATTR_WINDOW_SEC} "
        "THEN ts_sec - prev_sec ELSE -1 END AS BIGINT) AS touch_age_sec "
        "FROM w WHERE event_type = 'purchase'"
    ),
    tags=("behavior", "attribution", "window"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent NON-purchase event within the trailing day (its type
    and age), or 'none' — the conversion-credit assignment behind every
    funnel ROI readout, and at a fraud desk the same lookup answers
    "what did the account do right before this charge".

    One pass: LAST_VALUE(... IGNORE NULLS) over a preceding-rows frame
    picks the latest earlier touch without a self-join (the ASOF-style
    window idiom; pyspark's lag() has no ignorenulls, last() over
    [unbounded, -1] is the equivalent both engines share). The day
    cutoff is a codegen comparison. Single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000000").alias("ts_sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    non_purchase = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    non_purchase_sec = F.when(F.col("event_type") != "purchase", F.col("ts_sec"))
    g = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_sec",
        F.last(non_purchase, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_type"),
        F.last(non_purchase_sec, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_sec"),
    )
    in_window = F.col("prev_sec") >= F.col("ts_sec") - _ATTR_WINDOW_SEC
    return g.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(in_window, F.col("prev_type")).otherwise(F.lit("none")).alias("touch"),
        F.when(in_window, F.col("ts_sec") - F.col("prev_sec"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("touch_age_sec"),
    )


@query(
    "q_cohort_ltv",
    oracle=(
        f"WITH e AS (SELECT user_id, {_DAY_SQL} AS day, value FROM events), "
        "f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id), "
        "cs AS (SELECT f.cohort_day, COUNT(*) AS cohort_size FROM f GROUP BY f.cohort_day), "
        "r AS (SELECT f.cohort_day, e.day - f.cohort_day AS age, "
        "SUM(CAST(FLOOR(e.value * 10000 + 0.5) AS BIGINT)) AS units "
        "FROM e JOIN f ON e.user_id = f.user_id GROUP BY f.cohort_day, age), "
        "c AS (SELECT r.cohort_day, r.age, cs.cohort_size, "
        "SUM(r.units) OVER (PARTITION BY r.cohort_day ORDER BY r.age) AS cum_units "
        "FROM r JOIN cs ON r.cohort_day = cs.cohort_day) "
        "SELECT CAST(cohort_day AS BIGINT) AS cohort_day, "
        "CAST(age AS BIGINT) AS age, CAST(cohort_size AS BIGINT) AS cohort_size, "
        + sql_round("CAST(cum_units AS DOUBLE) / 10000 / cohort_size", 4)
        + " AS ltv_per_user FROM c"
    ),
    tags=("behavior", "agg", "ltv"),
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative value per account by cohort age —
    the monetary companion to the retention matrix
    (q_retention_cohort): retention says WHO comes back, this says
    what they are WORTH as the cohort ages, the curve unit-economics
    decisions are read from. Value accumulates in exact fixed-point
    units; the denominator is the full cohort size (accounts that
    churned still count — that IS the LTV convention).

    Plan: per-account first-day aggregate joined back on user_id (the
    co-partitioned key), one (cohort, age) hash aggregate of unit
    sums, then the cumulative runs over the bounded cohort×age table
    partitioned BY COHORT — bounded windows, no fact-table sort."""
    ev = events_with_time(spark, sf_dir)
    e = ev.select(
        "user_id", F.expr("ts_sec div 86400").alias("day"), "value"
    )
    f = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    cs = f.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    r = (
        e.join(f, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("age"))
        .agg(
            F.sum(
                F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")
            ).alias("units")
        )
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = r.join(F.broadcast(cs), "cohort_day").select(
        "cohort_day",
        "age",
        "cohort_size",
        F.sum("units").over(w).alias("cum_units"),
    )
    return c.select(
        F.col("cohort_day").cast("bigint").alias("cohort_day"),
        F.col("age").cast("bigint").alias("age"),
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        pround(
            F.col("cum_units").cast("double") / 10000 / F.col("cohort_size"), 4
        ).alias("ltv_per_user"),
    )


@query(
    "q_active_users",
    oracle=(
        f"WITH e AS (SELECT DISTINCT user_id, {_DAY_SQL} AS day FROM events), "
        "days AS (SELECT DISTINCT day FROM e) "
        "SELECT d.day, "
        "CAST(COUNT(DISTINCT CASE WHEN e.day = d.day THEN e.user_id END) AS BIGINT)"
        " AS dau, "
        "CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau, "
        + sql_round(
            "COUNT(DISTINCT CASE WHEN e.day = d.day THEN e.user_id END) * 1.0 "
            "/ COUNT(DISTINCT e.user_id)",
            6,
        )
        + " AS stickiness "
        "FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day "
        "GROUP BY d.day"
    ),
    tags=("behavior", "agg", "activity"),
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the canonical
    activity triple every product and risk dashboard opens with
    (stickiness = DAU/WAU; a fraud farm shows high DAU with no weekly
    persistence). Distinct users must be counted per trailing window,
    which no rolling frame can do exactly — the scalable exact form
    EXPLODES each (user, day) activity row into the 7 window-days it
    contributes to, then equi-joins the tiny day dimension and runs
    one distinct aggregate per day.

    Plan: events fold to DISTINCT (user, day) once (a fraction of the
    stream); each row explodes to exactly 7 (user, day, d_day) rows
    and the broadcast day-dimension join is an EQUI-join on d_day —
    a BroadcastHashJoin with O(7·|activity|) compute. (The previous
    range-predicate formulation planned as BroadcastNestedLoopJoin,
    comparing every activity row against ALL days — O(|activity|·|days|)
    compute even though output replication was 7×; ADVICE r6.)
    Beyond-exact scale: per-day HLL sketches unioned over the window
    (q_hll_sketch's machinery) replace the distinct count."""
    ev = events_with_time(spark, sf_dir)
    e = ev.select("user_id", F.expr("ts_sec div 86400").alias("day")).distinct()
    days = e.select("day").distinct().select(F.col("day").alias("d_day"))
    j = e.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("d_day"),
    ).join(F.broadcast(days), "d_day")
    return (
        j.groupBy("d_day")
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("d_day"), F.col("user_id"))
            ).cast("bigint").alias("dau"),
            F.countDistinct("user_id").cast("bigint").alias("wau"),
        )
        .select(
            F.col("d_day").alias("day"),
            "dau",
            "wau",
            pround(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
        )
    )


@query(
    "q_growth_rates",
    oracle=(
        f"WITH d AS (SELECT {_DAY_SQL} AS day, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000"
        " AS amt FROM events GROUP BY day) "
        "SELECT CAST(day AS BIGINT) AS day, n, "
        + sql_round("amt", 4) + " AS amt, "
        + sql_round(
            "(n - LAG(n) OVER (ORDER BY day)) * 1.0 "
            "/ NULLIF(LAG(n) OVER (ORDER BY day), 0)",
            6,
        )
        + " AS dod, "
        + sql_round(
            "(n - LAG(n, 7) OVER (ORDER BY day)) * 1.0 "
            "/ NULLIF(LAG(n, 7) OVER (ORDER BY day), 0)",
            6,
        )
        + " AS wow FROM d"
    ),
    tags=("behavior", "agg", "growth"),
)
def q_growth_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day and week-over-week growth of event volume (with
    exact fixed-point daily amounts) — the first derivative every
    operations dashboard draws, and the raw series behind the alert
    rules in the reference's monitoring stack (alert_rules.yml
    increase() deltas are this computed by Prometheus). LAG over the
    bounded ≤|days| table only."""
    ev = events_with_time(spark, sf_dir)
    d = ev.groupBy(F.expr("ts_sec div 86400").alias("day")).agg(
        F.count("*").cast("bigint").alias("n"),
        (
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / 10000
        ).alias("amt"),
    )
    w = Window.orderBy("day")
    return d.select(
        F.col("day").cast("bigint").alias("day"),
        "n",
        pround(F.col("amt"), 4).alias("amt"),
        pround(
            (F.col("n") - F.lag("n").over(w)) * 1.0
            / F.nullif(F.lag("n").over(w), F.lit(0)),
            6,
        ).alias("dod"),
        pround(
            (F.col("n") - F.lag("n", 7).over(w)) * 1.0
            / F.nullif(F.lag("n", 7).over(w), F.lit(0)),
            6,
        ).alias("wow"),
    )


@query(
    "q_deseasonalize",
    oracle=(
        f"WITH d AS (SELECT {_DAY_SQL} AS day, "
        "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS DOUBLE)"
        " / 10000 / COUNT(*) AS day_mean FROM events GROUP BY day), "
        "s AS (SELECT day, day_mean, day % 7 AS dow, "
        "AVG(day_mean) OVER (PARTITION BY day % 7) AS dow_mean, "
        "AVG(day_mean) OVER () AS grand FROM d) "
        "SELECT CAST(day AS BIGINT) AS day, CAST(dow AS BIGINT) AS dow, "
        + sql_round("day_mean", 4) + " AS day_mean, "
        + sql_round("dow_mean - grand", 4) + " AS seasonal, "
        + sql_round("day_mean - (dow_mean - grand)", 4) + " AS deseasonalized "
        "FROM s"
    ),
    tags=("timeseries", "behavior", "seasonality"),
)
def q_deseasonalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality decomposition: each day's mean amount split
    into a day-of-week seasonal component (that weekday's mean minus
    the grand mean) and the deseasonalized residual — the STL-lite
    pre-step that keeps a weekend dip from tripping the drift monitors
    (q_cusum on raw means alarms every Saturday if weekends differ).

    Both windows run over the bounded ≤|days| daily table, partitioned
    by day-of-week / unpartitioned over ≤|days| rows — the
    q_roc_points bounded-table discipline. Day means are exact
    fixed-point; the dow/grand means average ≤|days| identical doubles
    in both engines (bounded, deterministic at 4 dp)."""
    ev = events_with_time(spark, sf_dir)
    d = ev.groupBy(F.expr("ts_sec div 86400").alias("day")).agg(
        (
            F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / 10000
            / F.count("*")
        ).alias("day_mean")
    )
    s = d.select(
        "day",
        "day_mean",
        (F.col("day") % 7).alias("dow"),
        F.avg("day_mean").over(Window.partitionBy(F.col("day") % 7)).alias("dow_mean"),
        F.avg("day_mean").over(Window.partitionBy()).alias("grand"),
    )
    seasonal = F.col("dow_mean") - F.col("grand")
    return s.select(
        F.col("day").cast("bigint").alias("day"),
        F.col("dow").cast("bigint").alias("dow"),
        pround(F.col("day_mean"), 4).alias("day_mean"),
        pround(seasonal, 4).alias("seasonal"),
        pround(F.col("day_mean") - seasonal, 4).alias("deseasonalized"),
    )


_LORENZ_BANDS = 50


@query(
    "q_lorenz",
    oracle=(
        "WITH u AS (SELECT user_id, "
        "SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS units "
        "FROM events GROUP BY user_id), "
        "m AS (SELECT MAX(units) AS u_max FROM u), "
        f"b AS (SELECT LEAST(CAST(FLOOR(units * {_LORENZ_BANDS}.0 / (u_max + 1)) "
        f"AS BIGINT), {_LORENZ_BANDS - 1}) AS band, "
        "CAST(COUNT(*) AS BIGINT) AS n_users, SUM(units) AS units "
        "FROM u, m GROUP BY band), "
        "c AS (SELECT band, n_users, "
        "SUM(n_users) OVER (ORDER BY band) * 1.0 / SUM(n_users) OVER () AS cum_pop, "
        "SUM(units) OVER (ORDER BY band) * 1.0 / SUM(units) OVER () AS cum_val "
        "FROM b) "
        "SELECT CAST(band AS BIGINT) AS band, n_users, "
        + sql_round("cum_pop", 6) + " AS cum_pop, "
        + sql_round("cum_val", 6) + " AS cum_val FROM c"
    ),
    tags=("behavior", "agg", "concentration"),
)
def q_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of account value: cumulative share of
    population vs cumulative share of total value by value band — the
    80/20 readout (and the Gini area under it) behind "our top X% of
    accounts carry Y% of volume", and at a fraud desk the exposure-
    concentration picture. The curve is banded, not ranked: an exact
    Lorenz curve needs a GLOBAL sort of per-account totals, which is
    the one thing this engine never does — 50 value bands give the
    same curve at 1/50 resolution from one hash aggregate, and the
    cumulative windows run over the bounded band table only
    (q_roc_points discipline). Band shares are exact integer ratios."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")).alias(
            "units"
        )
    )
    m = u.agg(F.max("units").alias("u_max"))
    b = (
        u.crossJoin(F.broadcast(m))
        .groupBy(
            F.least(
                F.floor(
                    F.col("units") * float(_LORENZ_BANDS) / (F.col("u_max") + 1)
                ).cast("bigint"),
                F.lit(_LORENZ_BANDS - 1),
            ).alias("band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("units").alias("units"),
        )
    )
    w_cum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    return b.select(
        F.col("band").cast("bigint").alias("band"),
        "n_users",
        pround(
            F.sum("n_users").over(w_cum) * 1.0 / F.sum("n_users").over(w_all), 6
        ).alias("cum_pop"),
        pround(
            F.sum("units").over(w_cum) * 1.0 / F.sum("units").over(w_all), 6
        ).alias("cum_val"),
    )


@query(
    "q_new_vs_returning",
    oracle=(
        f"WITH e AS (SELECT user_id, {_DAY_SQL} AS day FROM events), "
        "f AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY user_id) "
        "SELECT CAST(e.day AS BIGINT) AS day, "
        "CAST(SUM(CASE WHEN e.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_new, "
        "CAST(SUM(CASE WHEN e.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_returning "
        "FROM e JOIN f ON e.user_id = f.user_id GROUP BY e.day"
    ),
    tags=("behavior", "agg", "activity"),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event split by new vs returning accounts (new = the
    account's first-seen day) — the acquisition-vs-retention mix every
    growth dashboard shows, and the fraud-farm tell in volume form (a
    burst of 'new' with no 'returning' tail is a throwaway cohort).
    Per-account first-day aggregate joined back on the co-partitioned
    user_id key; one (day) hash aggregate."""
    ev = events_with_time(spark, sf_dir)
    e = ev.select("user_id", F.expr("ts_sec div 86400").alias("day"))
    f = e.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        e.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("n_new"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).cast("bigint").alias("n_returning"),
        )
        .select(F.col("day").cast("bigint").alias("day"), "n_new", "n_returning")
    )


# --- Sessionized user-journey path signatures (VERDICT r6 #6) ---------
#
# The reference threads a correlation id through every request
# (api/app.py:121-128) — the infrastructure for request JOURNEYS — but
# never analyzes them. These operators combine the engine's session-gap
# construction (q_session_window) with its transition analysis
# (q_event_transitions) into per-session PATH SIGNATURES: the ordered
# event-type string of each session, the corpus-wide top paths, and
# per-user path entropy — the standard bot-vs-human behavioral screen
# (scripted traffic replays one path; humans wander).

_SESSION_GAP_SEC = 1800  # same 30-min inactivity gap as q_session_window
_PATH_MAX_STEPS = 8      # signature = first 8 events (bounds string size)
_TOP_PATHS = 50

# Shared oracle prefix: gap-session construction (>= gap starts a new
# session — Spark's session_window end is exclusive, q_session_window's
# convention) -> one row per event with its (user_id, sid) session id.
_SESS_CORE_SQL = (
    f"e AS (SELECT user_id, event_id, event_type, {_SEC_SQL} AS sec FROM events), "
    "o AS (SELECT *, CASE WHEN LAG(sec) OVER "
    "(PARTITION BY user_id ORDER BY sec, event_id) IS NULL OR "
    "sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) "
    f">= {_SESSION_GAP_SEC} THEN 1 ELSE 0 END AS new_s FROM e), "
    "s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id "
    "ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM o)"
)

# ... -> one row per session with its truncated path signature.
_PATH_SQL = (
    _SESS_CORE_SQL + ", "
    "r AS (SELECT user_id, sid, event_type, ROW_NUMBER() OVER "
    "(PARTITION BY user_id, sid ORDER BY sec, event_id) AS rn FROM s), "
    "p AS (SELECT user_id, sid, STRING_AGG(event_type, '>' ORDER BY rn) "
    f"AS path FROM r WHERE rn <= {_PATH_MAX_STEPS} GROUP BY user_id, sid)"
)


def _session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (user_id, session): the session's ordered event-type
    path signature, truncated to the first _PATH_MAX_STEPS events.

    Plan: ONE shuffle on user_id drives everything — the session-id
    window (lag + cumsum over the per-user timeline, ordered by the
    ns timestamp + event_id: a total order, deterministic on any
    layout), then a (user, sid) hash aggregate whose collect_list is
    made order-independent by array_sort over (ts, event_id, type)
    structs before joining. No global sort, no Python; a per-session
    row_number caps every aggregation buffer at 8 rows BEFORE the
    groupBy, so nothing unbounded is ever buffered or shuffled."""
    ev = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    new_s = (
        F.lag("ts_sec").over(w).isNull()
        | (F.col("ts_sec") - F.lag("ts_sec").over(w) >= _SESSION_GAP_SEC)
    ).cast("int")
    s = ev.select(
        "user_id",
        "ts_sec",
        "event_id",
        "event_type",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("sid"),
    )
    # bound the aggregation buffer BEFORE the groupBy: a gap-free bot
    # session is unbounded, and collect_list would buffer all of it
    # just to keep 8 (round-7 self-review). The row_number rides the
    # same user_id shuffle/sort the session window already forced.
    w_sess = Window.partitionBy("user_id", "sid").orderBy("ts_sec", "event_id")
    s8 = s.withColumn("rn", F.row_number().over(w_sess)).filter(
        F.col("rn") <= _PATH_MAX_STEPS
    )
    # collect_list order is partition-dependent; array_sort over
    # (ts_sec, event_id) structs restores the total order engine-side
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts_sec", "event_id", "event_type"))
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return s8.groupBy("user_id", "sid").agg(path.alias("path"))


@query(
    "q_session_paths",
    oracle=(
        "WITH " + _PATH_SQL + ", "
        "g AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions "
        "FROM p GROUP BY path), "
        "t AS (SELECT SUM(n_sessions) AS tot FROM g) "
        "SELECT path, n_sessions, "
        + sql_round("n_sessions * 1.0 / tot", 6) + " AS share "
        "FROM g, t ORDER BY n_sessions DESC, path LIMIT " + str(_TOP_PATHS)
    ),
    tags=("behavior", "session", "window"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 session path signatures: the ordered event-type string of
    each 30-min-gap session (first 8 steps), with corpus frequency and
    share — the journey fingerprint table a fraud desk reads for
    scripted-traffic spikes (one path suddenly dominating) and for
    funnel shapes q_funnel_steps' fixed three-step frame can't see.

    Plan: the per-session paths come from ONE user_id shuffle
    (see _session_paths); the path frequency table is a second hash
    aggregate on the 8-step-bounded signature, its total a broadcast
    one-row aggregate, and only the |distinct paths| table — already
    tiny — passes through the final top-50 sort."""
    p = _session_paths(spark, sf_dir)
    g = p.groupBy("path").agg(F.count("*").cast("bigint").alias("n_sessions"))
    t = g.agg(F.sum("n_sessions").alias("tot"))
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "path",
            "n_sessions",
            pround(F.col("n_sessions") * 1.0 / F.col("tot"), 6).alias("share"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(_TOP_PATHS)
    )


@query(
    "q_path_entropy",
    oracle=(
        "WITH " + _PATH_SQL + ", "
        "u AS (SELECT user_id, path, COUNT(*) AS n FROM p "
        "GROUP BY user_id, path), "
        "t AS (SELECT user_id, SUM(n) AS tot, "
        "CAST(COUNT(*) AS BIGINT) AS n_paths FROM u GROUP BY user_id) "
        "SELECT u.user_id, CAST(t.tot AS BIGINT) AS n_sessions, t.n_paths, "
        + sql_round(
            "CAST(SUM(CAST(FLOOR(-(n * 1.0 / tot) * log2(n * 1.0 / tot) "
            "* 1000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000",
            6,
        )
        + " AS entropy "
        "FROM u JOIN t ON u.user_id = t.user_id "
        "GROUP BY u.user_id, t.tot, t.n_paths"
    ),
    tags=("behavior", "session", "entropy"),
)
def q_path_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user journey entropy: Shannon entropy (bits) of the user's
    session-path distribution, with session and distinct-path counts —
    THE bot-vs-human screen (a replay bot's sessions collapse to one
    path: entropy 0; organic use wanders: entropy grows with log2 of
    the paths). Each −p·log2 p term folds to 1e-9 fixed-point units
    BEFORE the sum (the q_chi2 discipline — a raw float sum's
    partial-aggregation order could flip the 6-dp rounding on some
    layouts; round-7 self-review), which also makes the single-path
    case exactly +0.0 with no sign normalization.

    Plan: sessions and both aggregates are keyed by user_id — the one
    shuffle from _session_paths carries through; the entropy sum runs
    over each user's (path, n) rows only. Output is |users| rows."""
    p = _session_paths(spark, sf_dir)
    u = p.groupBy("user_id", "path").agg(F.count("*").alias("n"))
    t = u.groupBy("user_id").agg(
        F.sum("n").alias("tot"), F.count("*").cast("bigint").alias("n_paths")
    )
    frac = F.col("n") * 1.0 / F.col("tot")
    ent_units = F.floor(
        -frac * F.log2(frac) * 1000000000 + F.lit(0.5)
    ).cast("bigint")
    return (
        u.join(t, "user_id")
        .groupBy("user_id", "tot", "n_paths")
        .agg(
            pround(
                F.sum(ent_units).cast("double") / 1000000000, 6
            ).alias("entropy")
        )
        .select(
            "user_id",
            F.col("tot").cast("bigint").alias("n_sessions"),
            "n_paths",
            "entropy",
        )
    )


@query(
    "q_session_stats",
    oracle=(
        "WITH " + _SESS_CORE_SQL + ", "
        "g AS (SELECT user_id, sid, MIN(sec) AS t0, MAX(sec) AS t1, "
        "COUNT(*) AS n FROM s GROUP BY user_id, sid) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, "
        + sql_round("SUM(n) * 1.0 / COUNT(*)", 6) + " AS avg_events, "
        + sql_round(
            "SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)", 6
        )
        + " AS bounce_rate, "
        + sql_round("SUM(t1 - t0) * 1.0 / COUNT(*)", 6) + " AS avg_dur_sec, "
        "CAST(quantile_disc(t1 - t0, 0.5) AS BIGINT) AS p50_dur_sec, "
        "CAST(quantile_disc(t1 - t0, 0.9) AS BIGINT) AS p90_dur_sec, "
        "CAST(MAX(t1 - t0) AS BIGINT) AS max_dur_sec FROM g"
    ),
    tags=("behavior", "session", "agg"),
)
def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shape summary: count, mean events/session, bounce rate
    (single-event sessions — the scripted-probe tell), and the
    duration distribution (mean / exact p50 / p90 / max seconds) over
    30-min-gap sessions. The duration percentiles are the numbers
    session-length SLOs and bot screens quote.

    Plan: one user_id shuffle builds sessions (same lag+cumsum as
    q_session_window), a (user, sid) hash aggregate folds each session
    to (t0, t1, n) — integer seconds and counts, so every sum is
    exact — then ONE global aggregate over the session table;
    percentile_disc SELECTS an element (no interpolation arithmetic
    to disagree on; q_robust_scale's argument). At 100 TB the
    percentile pair swaps to approx_percentile — the documented
    q_quantiles ↔ q_approx_quantile twin."""
    ev = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    new_s = (
        F.lag("ts_sec").over(w).isNull()
        | (F.col("ts_sec") - F.lag("ts_sec").over(w) >= _SESSION_GAP_SEC)
    ).cast("int")
    s = ev.select(
        "user_id",
        "ts_sec",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("sid"),
    )
    g = s.groupBy("user_id", "sid").agg(
        F.min("ts_sec").alias("t0"),
        F.max("ts_sec").alias("t1"),
        F.count("*").alias("n"),
    ).select((F.col("t1") - F.col("t0")).alias("dur"), "n")
    return g.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        pround(F.sum("n") * 1.0 / F.count("*"), 6).alias("avg_events"),
        pround(
            F.sum((F.col("n") == 1).cast("int")) * 1.0 / F.count("*"), 6
        ).alias("bounce_rate"),
        pround(F.sum("dur") * 1.0 / F.count("*"), 6).alias("avg_dur_sec"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dur)")
        .cast("bigint")
        .alias("p50_dur_sec"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY dur)")
        .cast("bigint")
        .alias("p90_dur_sec"),
        F.max("dur").cast("bigint").alias("max_dur_sec"),
    )


@query(
    "q_burstiness",
    oracle=(
        f"WITH e AS (SELECT user_id, event_id, {_SEC_SQL} AS sec FROM events), "
        "g AS (SELECT user_id, sec - LAG(sec) OVER "
        "(PARTITION BY user_id ORDER BY sec, event_id) AS gap FROM e), "
        "a AS (SELECT user_id, CAST(COUNT(gap) AS BIGINT) AS n_gaps, "
        "CAST(SUM(gap) AS BIGINT) AS sg, "
        "CAST(SUM(gap * gap) AS BIGINT) AS sgg "
        "FROM g WHERE gap IS NOT NULL GROUP BY user_id "
        "HAVING COUNT(gap) >= 2), "
        "m AS (SELECT user_id, n_gaps, sg * 1.0 / n_gaps AS mu, "
        "SQRT(sgg * 1.0 / n_gaps - (sg * 1.0 / n_gaps) * (sg * 1.0 / n_gaps))"
        " AS sigma FROM a) "
        "SELECT user_id, n_gaps, "
        + sql_round("mu", 4) + " AS mean_gap_sec, "
        + sql_round("CASE WHEN mu > 0 THEN sigma / mu END", 6) + " AS cv, "
        + sql_round(
            "CASE WHEN sigma + mu > 0 THEN (sigma - mu) / (sigma + mu) END", 6
        )
        + " AS burstiness FROM m"
    ),
    tags=("behavior", "agg", "fraud"),
)
def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-account inter-event burstiness: coefficient of variation of
    the gap distribution and the Goh–Barabási burstiness parameter
    B = (σ−μ)/(σ+μ) ∈ (−1, 1) — metronome-regular bot traffic sits
    near B = −1 (σ→0), Poisson-ish human activity near 0, bursty
    takeover sessions push positive. The behavioral twin of
    q_dormancy's single-gap screen, over the WHOLE gap distribution.

    Plan: one user-partitioned LAG window (total order: ts + event_id)
    then a per-user hash aggregate. Σgap and Σgap² are exact integer
    sums (gaps are integer seconds), so μ and the population σ are
    deterministic scalar IEEE ops on any layout — no float-sum
    order hazard anywhere."""
    ev = events_with_time(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    g = ev.select(
        "user_id", (F.col("ts_sec") - F.lag("ts_sec").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    a = (
        g.groupBy("user_id")
        .agg(
            F.count("gap").cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sgg"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    mu = F.col("sg") * 1.0 / F.col("n_gaps")
    sigma = F.sqrt(F.col("sgg") * 1.0 / F.col("n_gaps") - mu * mu)
    return a.select(
        "user_id",
        "n_gaps",
        pround(mu, 4).alias("mean_gap_sec"),
        pround(F.when(mu > 0, sigma / mu), 6).alias("cv"),
        pround(F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)), 6).alias(
            "burstiness"
        ),
    )


@query(
    "q_first_touch",
    oracle=(
        "WITH e AS (SELECT event_id, user_id, event_type, "
        "(epoch_ns(ts) // 1000000000) AS ts_sec FROM events), "
        "c AS (SELECT *, COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 "
        "ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cycle FROM e), "
        "ft AS (SELECT user_id, cycle, event_type AS touch_type, "
        "ts_sec AS touch_sec FROM ("
        "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, cycle "
        "ORDER BY ts_sec, event_id) AS rn FROM c "
        "WHERE event_type <> 'purchase') WHERE rn = 1) "
        "SELECT c.event_id, c.user_id, "
        "COALESCE(ft.touch_type, 'none') AS touch, "
        "CAST(COALESCE(c.ts_sec - ft.touch_sec, -1) AS BIGINT) AS touch_age_sec "
        "FROM c LEFT JOIN ft ON ft.user_id = c.user_id AND ft.cycle = c.cycle "
        "WHERE c.event_type = 'purchase'"
    ),
    tags=("behavior", "attribution", "window"),
)
def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution per conversion journey: each purchase
    is credited to the FIRST non-purchase event since the user's
    previous purchase (their current journey's entry point), or 'none'
    for a cold conversion — the acquisition-side complement of
    q_attribution's last-touch credit (first touch answers "what
    STARTED this journey", last touch "what closed it").

    Journey = purchase cycle: a preceding-rows running count of
    purchases partitions each user's timeline into cycles, the
    journey's first touch is ROW_NUMBER() = 1 over the genuine
    (ts_sec, event_id) total order within the (user, cycle) partition
    — no encoded key (an earlier ts·10⁷ + id mod 10⁷ encoding was NOT
    a total order once event ids pass 10⁷ and could collide,
    duplicating purchases; caught in round-7 self-review) — and each
    purchase joins its cycle's entry touch on the co-partitioned
    (user_id, cycle) key. One user_id shuffle carries the window, the
    row_number, and the join."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000000000").alias("ts_sec"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec", "event_id")
    c = e.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_sec",
        F.coalesce(
            F.sum((F.col("event_type") == "purchase").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("cycle"),
    )
    w_cycle = Window.partitionBy("user_id", "cycle").orderBy("ts_sec", "event_id")
    ft = (
        c.filter(F.col("event_type") != "purchase")
        .withColumn("rn", F.row_number().over(w_cycle))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "cycle",
            F.col("event_type").alias("touch_type"),
            F.col("ts_sec").alias("touch_sec"),
        )
    )
    return (
        c.filter(F.col("event_type") == "purchase")
        .join(ft, ["user_id", "cycle"], "left")
        .select(
            "event_id",
            "user_id",
            F.coalesce("touch_type", F.lit("none")).alias("touch"),
            F.coalesce(F.col("ts_sec") - F.col("touch_sec"), F.lit(-1))
            .cast("bigint")
            .alias("touch_age_sec"),
        )
    )


@query(
    "q_conversion_lag",
    oracle=(
        f"WITH e AS (SELECT user_id, event_type, {_SEC_SQL} AS sec FROM events), "
        "v AS (SELECT user_id, MIN(sec) AS tv FROM e WHERE event_type = 'view' "
        "GROUP BY user_id), "
        "c AS (SELECT e.user_id, MIN(e.sec) AS tc FROM e "
        "JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'click' AND e.sec >= v.tv GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, MIN(e.sec) AS tp FROM e "
        "JOIN c ON e.user_id = c.user_id "
        "WHERE e.event_type = 'purchase' AND e.sec >= c.tc GROUP BY e.user_id), "
        "l AS (SELECT p.user_id, p.tp - v.tv AS lag_sec "
        "FROM p JOIN v ON p.user_id = v.user_id) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_converted, "
        + sql_round("SUM(lag_sec) * 1.0 / COUNT(*)", 4) + " AS avg_lag_sec, "
        "CAST(quantile_disc(lag_sec, 0.5) AS BIGINT) AS p50_lag_sec, "
        "CAST(quantile_disc(lag_sec, 0.9) AS BIGINT) AS p90_lag_sec, "
        "CAST(MAX(lag_sec) AS BIGINT) AS max_lag_sec FROM l"
    ),
    tags=("behavior", "funnel", "agg"),
)
def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution through q_funnel_steps' ordered
    funnel: for users who completed view → click-after → purchase-after,
    the first-view-to-qualifying-purchase latency (mean / exact p50 /
    p90 / max seconds) — the speed axis the funnel's conversion RATES
    don't show, and a fraud tell in its left tail (carded accounts
    convert in seconds; humans browse).

    Plan: the same chained per-user MIN aggregates as q_funnel_steps
    (co-partitioned user_id joins, one shuffle reused), then ONE
    bounded aggregate over the converted-user lag table; integer
    seconds everywhere, percentile_disc selects elements."""
    ev = events_with_time(spark, sf_dir).select("user_id", "event_type", "ts_sec")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_sec") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_sec") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts_sec").alias("tp"))
    )
    lag = p.join(v, "user_id").select((F.col("tp") - F.col("tv")).alias("lag_sec"))
    return lag.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        pround(F.sum("lag_sec") * 1.0 / F.count("*"), 4).alias("avg_lag_sec"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_sec)")
        .cast("bigint")
        .alias("p50_lag_sec"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_sec)")
        .cast("bigint")
        .alias("p90_lag_sec"),
        F.max("lag_sec").cast("bigint").alias("max_lag_sec"),
    )


@query(
    "q_gini",
    oracle=(
        "WITH u AS (SELECT user_id, "
        "SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS units "
        "FROM events GROUP BY user_id), "
        "m AS (SELECT MAX(units) AS u_max FROM u), "
        f"b AS (SELECT LEAST(CAST(FLOOR(units * {_LORENZ_BANDS}.0 / (u_max + 1)) "
        f"AS BIGINT), {_LORENZ_BANDS - 1}) AS band, "
        "CAST(COUNT(*) AS BIGINT) AS n_users, SUM(units) AS units "
        "FROM u, m GROUP BY band), "
        "c AS (SELECT band, n_users, "
        "SUM(n_users) OVER (ORDER BY band) * 1.0 / SUM(n_users) OVER () AS cum_pop, "
        "SUM(units) OVER (ORDER BY band) * 1.0 / SUM(units) OVER () AS cum_val "
        "FROM b), "
        "t AS (SELECT cum_pop, cum_val, "
        "COALESCE(LAG(cum_pop) OVER (ORDER BY band), 0) AS pop0, "
        "COALESCE(LAG(cum_val) OVER (ORDER BY band), 0) AS val0 FROM c) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_bands, "
        + sql_round(
            "1.0 - CAST(SUM(CAST(FLOOR((cum_val + val0) * (cum_pop - pop0) "
            "* 1000000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000000",
            6,
        )
        + " AS gini FROM t"
    ),
    tags=("behavior", "agg", "concentration"),
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of account-value concentration — the scalar
    area summary of q_lorenz's curve (0 = perfectly even books,
    →1 = all value through a handful of accounts; the number exposure
    dashboards track round over round where the curve itself is the
    drill-down). Trapezoid rule over the SAME 50-band Lorenz
    construction: banded, so no global sort of per-account totals;
    the Gini is exact for the banded curve (resolution 1/50,
    documented — the same trade q_lorenz states).

    Plan: one per-account hash aggregate, one ≤50-row band aggregate,
    lag/cumulative windows on the bounded band table only."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("bigint")).alias(
            "units"
        )
    )
    m = u.agg(F.max("units").alias("u_max"))
    b = (
        u.crossJoin(F.broadcast(m))
        .groupBy(
            F.least(
                F.floor(
                    F.col("units") * float(_LORENZ_BANDS) / (F.col("u_max") + 1)
                ).cast("bigint"),
                F.lit(_LORENZ_BANDS - 1),
            ).alias("band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("units").alias("units"),
        )
    )
    # bounded: ≤50 bands by construction
    w_cum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    w_lag = Window.orderBy("band")
    c = b.select(
        "band",
        (F.sum("n_users").over(w_cum) * 1.0 / F.sum("n_users").over(w_all)).alias(
            "cum_pop"
        ),
        (F.sum("units").over(w_cum) * 1.0 / F.sum("units").over(w_all)).alias(
            "cum_val"
        ),
    )
    t = c.select(
        "cum_pop",
        "cum_val",
        F.coalesce(F.lag("cum_pop").over(w_lag), F.lit(0.0)).alias("pop0"),
        F.coalesce(F.lag("cum_val").over(w_lag), F.lit(0.0)).alias("val0"),
    )
    # per-trapezoid fixed-point units before the sum (layout-proof —
    # the q_chi2 discipline; round-7 self-review)
    trap_units = F.floor(
        (F.col("cum_val") + F.col("val0"))
        * (F.col("cum_pop") - F.col("pop0"))
        * 1000000000
        + F.lit(0.5)
    ).cast("bigint")
    return t.agg(
        F.count("*").cast("bigint").alias("n_bands"),
        pround(
            F.lit(1.0) - F.sum(trap_units).cast("double") / 1000000000, 6
        ).alias("gini"),
    )
