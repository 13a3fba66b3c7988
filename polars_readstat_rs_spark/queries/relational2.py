"""Second relational batch: pivot, bag-semantics EXCEPT ALL, range join,
ordered list aggregation, conditional counts — rounding out SURVEY §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import EVENTS_US, register
from .tpch import _dec_sum_double, _dec_to_double

_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


# --------------------------------------------------------------------------
# q34 — native session_window operator (batch form of streaming
# sessionization); the oracle derives identical sessions with the
# classic lag + cumulative-sum rewrite.
@register(
    "q34_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
             OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
      FROM {EVENTS_US} e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, epoch_ms(min(ts)) AS session_start_ms, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def q34_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum_double(F.col("value").cast("decimal(12,2)"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            "n_events",
            "total_value",
        )
    )


# --------------------------------------------------------------------------
# q36 — correlated scalar subquery (SQL API): orders above their
# customer's average order value.
@register(
    "q36_correlated_subquery",
    oracle="""
    SELECT o_custkey, count(*) AS n_above
    FROM orders o
    WHERE o_totalprice > (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    GROUP BY o_custkey
    """,
)
def q36_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q36_orders")
    return spark.sql(
        """
        SELECT o_custkey, count(*) AS n_above
        FROM _q36_orders o
        WHERE o_totalprice > (SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                              FROM _q36_orders o2 WHERE o2.o_custkey = o.o_custkey)
        GROUP BY o_custkey
        """
    )


# --------------------------------------------------------------------------
# q35 — approximate sketches, hash-gated: sketch values differ by engine,
# so the EMITTED columns are the exact NDV / exact median (identical
# cross-engine, same convention as q40_profile) plus `approx_ok`, a
# boolean asserting the engine's HLL++ / KLL sketches land within a
# relative-error bound of the exact answers. A sketch gone wrong flips
# approx_ok to FALSE and fails the driver's value hash — the gate is no
# longer unverifiable (SURVEY §2.6 approx_count_distinct /
# percentile_approx surface).
@register(
    "q35_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS DOUBLE)
             AS exact_median_price,
           count(*) AS n,
           TRUE AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q35_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_approx_parts"),
        F.percentile_approx(price, 0.5).alias("_approx_median"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.percentile(price, F.lit(0.5)).alias("exact_median_price"),
        F.count("*").alias("n"),
    )
    # HLL++ default rsd = 0.05 (3-sigma ~ 15%); percentile_approx default
    # accuracy 10000 -> rank error 1e-4, generous 10% value bound.
    ok = (
        F.abs(F.col("_approx_parts") - F.col("exact_parts"))
        <= 0.15 * F.col("exact_parts")
    ) & (
        F.abs(F.col("_approx_median") - F.col("exact_median_price"))
        <= 0.10 * F.abs(F.col("exact_median_price"))
    )
    return agg.select(
        "l_returnflag", "exact_parts", "exact_median_price", "n", ok.alias("approx_ok")
    )


# --------------------------------------------------------------------------
# q32 — semi-structured JSON extraction from the events props column.
@register(
    "q32_json_extract",
    oracle=f"""
    SELECT k_bucket, count(*) AS n, CAST(min(k) AS INT) AS min_k, CAST(max(k) AS INT) AS max_k
    FROM (
      SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
             CAST(json_extract(props, '$.k') AS INTEGER) // 10 AS k_bucket
      FROM {EVENTS_US} e)
    GROUP BY k_bucket
    """,
)
def q32_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select(k.alias("k"), F.floor(k / 10).cast("int").alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    )


# --------------------------------------------------------------------------
# q33 — Arrow-vectorized Pandas UDF (the sanctioned slow path): a scalar
# transform whose arithmetic is IEEE-exact on both engines (multiply/add
# only, fixed order), so even the UDF output hash-matches the oracle.
@register(
    "q33_pandas_udf",
    oracle=f"""
    SELECT event_type,
      CAST(sum(CAST(value * value * 0.5 + value AS DECIMAL(18,6))) AS DOUBLE) AS score_sum
    FROM {EVENTS_US} e
    GROUP BY event_type
    """,
)
def q33_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    def _score(v):  # pd.Series -> pd.Series, Arrow-batched
        return v * v * 0.5 + v

    score = pandas_udf(_score, "double")

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", score("value").alias("s"))
        .groupBy("event_type")
        .agg(F.sum(F.col("s").cast("decimal(18,6)")).cast("double").alias("score_sum"))
    )


# --------------------------------------------------------------------------
# q27 — pivot (conditional aggregation): per-user event-type counts.
@register(
    "q27_pivot",
    oracle=f"""
    SELECT user_id,
      coalesce(count(*) FILTER (WHERE event_type = 'click'), 0) AS click,
      coalesce(count(*) FILTER (WHERE event_type = 'view'), 0) AS view,
      coalesce(count(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
      coalesce(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
      coalesce(count(*) FILTER (WHERE event_type = 'error'), 0) AS error
    FROM {EVENTS_US} e GROUP BY user_id
    """,
)
def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return piv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


# --------------------------------------------------------------------------
# q28 — EXCEPT ALL (bag semantics: multiplicities preserved).
@register(
    "q28_except_all",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 10
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q28_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 10).select("l_suppkey")
    b = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return a.exceptAll(b)


# --------------------------------------------------------------------------
# q29 — range (interval) join: events against per-priority date windows.
# The build side is tiny -> broadcast non-equi join (no shuffle); at scale
# the standard trick is bucketing the range key, which q24's windowed agg
# demonstrates; here Catalyst picks BroadcastNestedLoopJoin.
@register(
    "q29_range_join",
    oracle="""
    WITH periods AS (
      SELECT o_orderpriority AS pri,
             min(o_orderdate) AS lo,
             min(o_orderdate) + INTERVAL 100 DAY AS hi
      FROM orders GROUP BY o_orderpriority
    )
    SELECT p.pri, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders o JOIN periods p
      ON o.o_orderdate >= p.lo AND o.o_orderdate < p.hi
    GROUP BY p.pri
    """,
)
def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    periods = orders.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.min("o_orderdate").alias("lo"),
        (F.min("o_orderdate") + F.expr("INTERVAL 100 DAYS")).alias("hi"),
    )
    return (
        orders.join(
            F.broadcast(periods),
            (F.col("o_orderdate") >= F.col("lo")) & (F.col("o_orderdate") < F.col("hi")),
        )
        .groupBy("pri")
        .agg(
            F.count("*").alias("n_orders"),
            _dec_sum_double(F.col("o_totalprice").cast("decimal(12,2)"), 2).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# q30 — ordered list aggregation (listagg / string_agg parity).
@register(
    "q30_list_agg",
    oracle="""
    SELECT c_mktsegment,
      string_agg(c_name, ',' ORDER BY c_name) AS names,
      count(*) AS n
    FROM (SELECT * FROM customer WHERE c_custkey < 40)
    GROUP BY c_mktsegment
    """,
)
def q30_list_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 40)
    return cust.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names"),
        F.count("*").alias("n"),
    )


# --------------------------------------------------------------------------
# q31 — conditional counts / count_if + sum FILTER equivalents.
@register(
    "q31_count_if",
    oracle="""
    SELECT l_linestatus,
      CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_heavy,
      CAST(count(*) FILTER (WHERE l_discount = 0.0) AS BIGINT) AS n_nodisc,
      CAST(sum(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_hightax
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q31_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_quantity") > 25).alias("n_heavy"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_nodisc"),
        F.sum(F.when(F.col("l_tax") > 0.05, 1).otherwise(0)).alias("n_hightax"),
    )


# --------------------------------------------------------------------------
# q38 — funnel analysis: ordered step progression per user
# (signup -> click -> purchase, each step strictly after the previous).
# The canonical product-analytics operator; Spark has no MATCH_RECOGNIZE,
# so the funnel is three conditional min-aggregations chained by
# time-bound joins — all shuffles on user_id, broadcast-free and
# skew-safe (user_id is the natural partition key of an event log).
@register(
    "q38_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM {EVENTS_US} e
      WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM {EVENTS_US} e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM {EVENTS_US} e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT s1.user_id,
           1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
             + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS reached_step,
           epoch_ms(t1) AS signup_ms, epoch_ms(t2) AS click_ms, epoch_ms(t3) AS purchase_ms
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q38_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.when(F.col("t2").isNull(), 0).otherwise(1)
                + F.when(F.col("t3").isNull(), 0).otherwise(1)
            ).cast("int").alias("reached_step"),
            F.unix_millis("t1").alias("signup_ms"),
            F.unix_millis("t2").alias("click_ms"),
            F.unix_millis("t3").alias("purchase_ms"),
        )
    )


# --------------------------------------------------------------------------
# q39 — cohort retention: users grouped by first-activity week, counted
# in each later week they return. Two aggregations (first-seen per user,
# then distinct user-weeks) and one join — the standard retention
# matrix, all shuffles on user_id / (cohort, offset).
@register(
    "q39_retention",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id,
             CAST(floor(epoch_ms(min(ts)) / 604800000) AS BIGINT) AS cohort_week
      FROM {EVENTS_US} e GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_ms(ts) / 604800000) AS BIGINT) AS week
      FROM {EVENTS_US} e)
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           count(*) AS n_users
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q39_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = lambda c: F.floor(F.unix_millis(c) / F.lit(604800000)).cast("bigint")  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort_week"))
    active = ev.select("user_id", wk(F.col("ts")).alias("week")).distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


# --------------------------------------------------------------------------
# q40 — one-pass numeric column profiler (operators/profile.py): the
# engine-side `summarize` a pipeline runs before committing compute to
# a table. Exact count-distinct (Catalyst Expand) and exact percentiles
# here so the oracle matches bitwise; the operator's approx_distinct
# flag is the documented 100 TB path.
def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name, count({c}) AS n, count(*) - count({c}) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS min_v, CAST(max({c}) AS DOUBLE) AS max_v,
           CAST(sum(CAST({c} AS DECIMAL(12,2))) AS DOUBLE) AS sum_v,
           CAST(sum(CAST({c} AS DECIMAL(12,2))) AS DOUBLE) / count({c}) AS mean_v,
           CAST(quantile_cont({c}, 0.25) AS DOUBLE) AS p25,
           CAST(quantile_cont({c}, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont({c}, 0.75) AS DOUBLE) AS p75
    FROM lineitem"""


_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@register(
    "q40_profile",
    oracle=" UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS),
)
def q40_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_numeric

    li = load_table(spark, sf_dir, "lineitem")
    return profile_numeric(li, _PROFILE_COLS)


# --------------------------------------------------------------------------
# q41 — declarative data-quality expectations (operators/expectations.py):
# named row predicates + uniqueness constraints validated in one
# aggregation pass; the pre-training gate of a 100 TB ingest.
@register(
    "q41_expectations",
    oracle="""
    SELECT 'qty_in_range' AS rule_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
           sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) = 0 AS passed
    FROM lineitem
    UNION ALL
    SELECT 'discount_le_10pct', count(*),
           CAST(sum(CASE WHEN l_discount <= 0.1 THEN 0 ELSE 1 END) AS BIGINT),
           sum(CASE WHEN l_discount <= 0.1 THEN 0 ELSE 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_valid', count(*),
           CAST(sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) AS BIGINT),
           sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'orderkey_line_unique', count(*),
           CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT),
           count(*) = count(DISTINCT (l_orderkey, l_linenumber))
    FROM lineitem
    """,
)
def q41_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.expectations import expect

    li = load_table(spark, sf_dir, "lineitem")
    return expect(
        li,
        rules={
            "qty_in_range": F.col("l_quantity").between(1, 50),
            "discount_le_10pct": F.col("l_discount") <= 0.1,
            "returnflag_valid": F.col("l_returnflag").isin("A", "N", "R"),
        },
        unique={"orderkey_line_unique": ["l_orderkey", "l_linenumber"]},
    )
