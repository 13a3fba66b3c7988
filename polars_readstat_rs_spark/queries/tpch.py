"""TPC-H adaptation suite (q62-q75): the classic decision-support
queries re-rooted on the testdata's TPC-H-lite schema (no partsupp, no
commit/receipt dates — Q2/Q16/Q20 shapes are covered by adapted
predicates; everything else follows the official query text).

Complements the cherry-picked q01/q03/q05/q06: correlated EXISTS /
NOT EXISTS, scalar-subquery HAVING, left-outer distribution, market
share, top-by-max, OR-branch predicate pushdown — the SQL surface a
reference user drives through the host engine (reference README.md:
135-137 delegates relational processing to the host).

Determinism: money accumulates in DECIMAL and casts to DOUBLE at the
end (registry.py rules); counts stay BIGINT; years cast to INT; all
comparisons against aggregates are exact-decimal (never double-vs-
double from different accumulation orders). Joins keep lineitem as the
probe side with broadcast dimension hints (the q05 lesson:
never hash-build the fact table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import register

DEC = "decimal(12,2)"
MONEY8 = "decimal(8,2)"
RATE3 = "decimal(3,2)"


def _money(c: str):
    return F.col(c).cast(MONEY8)


def _rate(c: str):
    return F.col(c).cast(RATE3)


def _one():
    return F.lit(1).cast(RATE3)


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)


def _rev():
    return _money("l_extendedprice") * (_one() - _rate("l_discount"))


def _dec_to_double(col, scale: int):
    """Decimal -> double EXACTLY the way DuckDB's CAST(decimal AS
    DOUBLE) computes it: round(N) / 10^scale over the unscaled integer
    N (two roundings, exact power-of-ten divisor). Spark's own decimal
    cast single-rounds the exact value, which diverges by one ulp once
    N exceeds 2^53 — the r12 sf1 sweep caught the class in q01's
    sum_charge, and these money sums cross the same line at sf10-level
    groups. The multiply is exact (integer-valued product within
    decimal(38,0)), so both orders agree bit-for-bit below 2^53 and
    the small-SF gate hashes are unchanged."""
    return (
        (col * F.lit(10**scale)).cast("decimal(38,0)").cast("double")
        / F.lit(float(10**scale))
    )


def _dec_sum_double(col, scale: int):
    return _dec_to_double(F.sum(col), scale)


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"_tpch_{t}")


# --------------------------------------------------------------------------
# q62 — TPC-H Q4 shape: order-priority checking via correlated EXISTS
# (semi-join decorrelation is Catalyst's job; the gate proves it).
@register(
    "q62_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q62_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM _tpch_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM _tpch_lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# q63 — TPC-H Q7 volume shipping: bidirectional nation-pair trade by year.
@register(
    "q63_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q63_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dec_sum_double(_rev(), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q64 — TPC-H Q8 market share: NATION_2's share of ASIA's PROMO volume.
@register(
    "q64_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {_REV_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO')
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share,
           CAST(sum(volume) AS DOUBLE) AS total_volume
    FROM all_nations GROUP BY o_year
    """,
)
def q64_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    vol = _rev()
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    zero = F.lit(0).cast(DEC)
    return base.groupBy("o_year").agg(
        (
            _dec_sum_double(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero), 4)
            / _dec_sum_double(F.col("volume"), 4)
        ).alias("mkt_share"),
        _dec_sum_double(F.col("volume"), 4).alias("total_volume"),
    )


# --------------------------------------------------------------------------
# q65 — TPC-H Q9 shape: profit by supplier nation and year (supply cost
# proxied as half the part's retail price — no partsupp table).
@register(
    "q65_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                  - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(3,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q65_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    amount = _rev() - _money("p_retailprice") * F.lit(0.5).cast(RATE3) * _money("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dec_sum_double(amount, 6).alias("sum_profit"))
    )


# --------------------------------------------------------------------------
# q66 — TPC-H Q10: returned-item revenue per customer (all groups; the
# official top-20 cut is an ORDER BY artifact the gate does not need).
@register(
    "q66_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3
    """,
)
def q66_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dec_sum_double(_rev(), 4).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q67 — TPC-H Q11 shape: parts whose revenue from region-0 suppliers
# exceeds a scalar-subquery fraction of the total (HAVING + scalar).
@register(
    "q67_important_parts",
    oracle="""
    SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_regionkey = 0
    GROUP BY l_partkey
    HAVING sum(CAST(l_extendedprice AS DECIMAL(12,2))) >
      (SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2))) * CAST(0.001 AS DECIMAL(4,3))
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey = 0)
    """,
)
def q67_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(
        """
        SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS value
        FROM _tpch_lineitem
        JOIN _tpch_supplier ON l_suppkey = s_suppkey
        JOIN _tpch_nation   ON s_nationkey = n_nationkey
        WHERE n_regionkey = 0
        GROUP BY l_partkey
        HAVING sum(CAST(l_extendedprice AS DECIMAL(12,2))) >
          (SELECT sum(CAST(l_extendedprice AS DECIMAL(12,2))) * CAST(0.001 AS DECIMAL(4,3))
           FROM _tpch_lineitem JOIN _tpch_supplier ON l_suppkey = s_suppkey
           JOIN _tpch_nation ON s_nationkey = n_nationkey WHERE n_regionkey = 0)
        """
    )


# --------------------------------------------------------------------------
# q68 — TPC-H Q13: customer order-count distribution via LEFT OUTER join
# (customers with zero orders land in the c_count = 0 bucket).
@register(
    "q68_cust_order_dist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q68_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# --------------------------------------------------------------------------
# q69 — TPC-H Q14: promo revenue share for one ship month.
@register(
    "q69_promo_share",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE)
             * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum({_REV_SQL}) AS DOUBLE) AS promo_revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-06-01' AND l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def q69_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * _dec_sum_double(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero), 4)
                / _dec_sum_double(_rev(), 4)
            ).alias("promo_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q70 — TPC-H Q15: top supplier(s) by quarterly revenue; the max is an
# exact-DECIMAL scalar subquery, so ties resolve identically everywhere.
@register(
    "q70_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_REV_SQL}) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total = (SELECT max(total) FROM revenue)
    """,
)
def q70_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total")
    )
    mx = revenue.agg(F.max("total").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), revenue.total == mx.mx)
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", _dec_to_double(F.col("total"), 4).alias("total_revenue"))
    )


# --------------------------------------------------------------------------
# q71 — TPC-H Q17: small-quantity-order revenue. The 20%-of-average
# comparison is kept exact: qty * 5 * n < sum_qty (no double averages).
@register(
    "q71_small_qty",
    oracle="""
    WITH pstats AS (
      SELECT l_partkey AS pk, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey JOIN pstats ON l_partkey = pk
    WHERE p_brand = 'Brand#23'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * n < sum_qty
    """,
)
def q71_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pstats = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count("*").alias("n"), F.sum(_money("l_quantity")).alias("sum_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pstats, li.l_partkey == pstats.pk)
        .filter(_money("l_quantity") * 5 * F.col("n") < F.col("sum_qty"))
        .agg(
            (_dec_sum_double(_money("l_extendedprice"), 2) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# q72 — TPC-H Q18: large-volume orders (group-by-HAVING then join back).
@register(
    "q72_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS ok, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
    SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice, CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM big JOIN orders ON ok = o_orderkey JOIN customer ON o_custkey = c_custkey
    """,
)
def q72_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(_money("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.ok == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            _dec_to_double(F.col("sum_qty"), 2).alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------
# q73 — TPC-H Q19: three OR-ed brand/size/quantity branches; Catalyst
# must still push the disjunction to the scans.
@register(
    "q73_or_predicates",
    oracle=f"""
    SELECT CAST(sum({_REV_SQL}) AS DOUBLE) AS revenue, count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q73_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(_dec_sum_double(_rev(), 4).alias("revenue"), F.count("*").alias("n_lines"))
    )


# --------------------------------------------------------------------------
# q74 — TPC-H Q21 shape: suppliers who were the LAST to ship on a
# multi-supplier finished order (EXISTS + NOT EXISTS pair; no
# commit/receipt dates in this schema, so lateness = latest l_shipdate).
@register(
    "q74_waiting_supplier",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q74_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM _tpch_supplier, _tpch_lineitem l1, _tpch_orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM _tpch_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM _tpch_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        """
    )


# --------------------------------------------------------------------------
# q75 — TPC-H Q22 shape: high-balance customers with no RECENT orders,
# by nation (every customer has SOME order in this data, so the
# official "no orders at all" anti-join would gate on an empty result;
# the dated anti-join keeps the same plan shape with a non-trivial
# answer). The above-average test is exact: bal * n_pos > sum_pos.
@register(
    "q75_no_order_customers",
    oracle="""
    WITH pos AS (
      SELECT count(*) AS n_pos, sum(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_pos
      FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * n_pos > sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
)
def q75_no_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count("*").alias("n_pos"), F.sum(F.col("c_acctbal").cast(DEC)).alias("sum_pos")
    )
    return (
        cust.join(F.broadcast(pos))
        .filter(F.col("c_acctbal").cast(DEC) * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dec_sum_double(F.col("c_acctbal").cast(DEC), 2).alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------
# q76 — recursive CTE (Spark 4's WITH RECURSIVE): every supplier walks
# the implicit binary-tree hierarchy parent(k) = k div 2 up to the
# root; per supplier: depth, ancestor count, exact path-key sum. All
# integer arithmetic — bitwise identical recursion on both engines.
@register(
    "q76_recursive_cte",
    oracle="""
    WITH RECURSIVE up(start_key, cur, depth) AS (
      SELECT s_suppkey, s_suppkey, 0 FROM supplier
      UNION ALL
      SELECT start_key, cur // 2, depth + 1 FROM up WHERE cur > 1
    )
    SELECT start_key AS s_suppkey,
           CAST(max(depth) AS INT) AS depth,
           count(*) AS n_nodes,
           CAST(sum(cur) AS BIGINT) AS path_sum
    FROM up GROUP BY start_key
    """,
)
def q76_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "supplier")
    return spark.sql(
        """
        WITH RECURSIVE up(start_key, cur, depth) AS (
          SELECT s_suppkey, s_suppkey, 0 FROM _tpch_supplier
          UNION ALL
          SELECT start_key, cur DIV 2, depth + 1 FROM up WHERE cur > 1
        )
        SELECT start_key AS s_suppkey,
               CAST(max(depth) AS INT) AS depth,
               count(*) AS n_nodes,
               CAST(sum(cur) AS BIGINT) AS path_sum
        FROM up GROUP BY start_key
        """
    )


# --------------------------------------------------------------------------
# q77 — TPC-H Q2 shape (no partsupp): cheapest supplier per part — the
# correlated =(SELECT min(...)) pattern, price proxied by the part's
# minimum sold unit price (extendedprice/quantity exact-decimal ratio
# avoided: compare extendedprice*qty' cross products? keep it simple —
# minimum l_extendedprice per (part, supplier) pair).
@register(
    "q77_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(12,2))) AS best
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT o.l_partkey, o.l_suppkey, s_name, CAST(o.best AS DOUBLE) AS best_price
    FROM offers o JOIN supplier ON l_suppkey = s_suppkey
    WHERE o.best = (SELECT min(best) FROM offers o2 WHERE o2.l_partkey = o.l_partkey)
    """,
)
def q77_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH offers AS (
          SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(12,2))) AS best
          FROM _tpch_lineitem GROUP BY l_partkey, l_suppkey)
        SELECT o.l_partkey, o.l_suppkey, s_name, CAST(o.best AS DOUBLE) AS best_price
        FROM offers o JOIN _tpch_supplier ON l_suppkey = s_suppkey
        WHERE o.best = (SELECT min(best) FROM offers o2 WHERE o2.l_partkey = o.l_partkey)
        """
    )


# --------------------------------------------------------------------------
# q78 — TPC-H Q16 shape: distinct-supplier counts per part attribute
# group, excluding a NOT IN subquery's supplier set.
@register(
    "q78_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11' AND p_size IN (5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q78_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "part", "supplier")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM _tpch_lineitem JOIN _tpch_part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#11' AND p_size IN (5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM _tpch_supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """
    )


# --------------------------------------------------------------------------
# q79 — TPC-H Q20 shape: suppliers with excess inventory of widget
# parts — nested IN over a correlated half-of-total-demand threshold
# (exact: 10 * supplier_qty > total_qty — a >10%% demand share;
# the official half-of-total threshold empties on this data's ~30
# suppliers per part).
@register(
    "q79_excess_suppliers",
    oracle="""
    WITH demand AS (
      SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
      FROM lineitem GROUP BY l_partkey),
    per_supp AS (
      SELECT l_suppkey AS sk, l_partkey AS pk,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
      FROM lineitem GROUP BY l_suppkey, l_partkey)
    SELECT s_suppkey, s_name, count(*) AS n_excess_parts
    FROM supplier JOIN per_supp ON s_suppkey = sk
    JOIN demand USING (pk)
    WHERE pk IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      AND 10 * supp_qty > total_qty
    GROUP BY s_suppkey, s_name
    """,
)
def q79_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem", "supplier", "part")
    return spark.sql(
        """
        WITH demand AS (
          SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
          FROM _tpch_lineitem GROUP BY l_partkey),
        per_supp AS (
          SELECT l_suppkey AS sk, l_partkey AS pk,
                 sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
          FROM _tpch_lineitem GROUP BY l_suppkey, l_partkey)
        SELECT s_suppkey, s_name, count(*) AS n_excess_parts
        FROM _tpch_supplier JOIN per_supp ON s_suppkey = sk
        JOIN demand USING (pk)
        WHERE pk IN (SELECT p_partkey FROM _tpch_part WHERE p_name LIKE '%widget%')
          AND 10 * supp_qty > total_qty
        GROUP BY s_suppkey, s_name
        """
    )
