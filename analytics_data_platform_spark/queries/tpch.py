"""TPC-H-shaped analytical queries over the driver corpus.

These exercise the reference's relational operator families (SURVEY.md §2):
multi-way equi-join chains (J1), group-by aggregation (A1/A5), filters with
pushdown (P2/P5), sorts/top-k (O1/O3) — expressed declaratively so Catalyst
handles pushdown, join reordering and AQE picks broadcast sides.

Scale notes: `region`/`nation`/`supplier` are broadcast-size at any SF (they
grow sub-linearly); `customer⋈orders⋈lineitem` shuffles on the join keys —
at 100 TB these shuffles are the dominant cost, so filters are applied before
joins and aggregates are expressed as single groupBy.agg (map-side partial
aggregation). Monetary sums are rounded to 2dp so double-summation order
(engine- and partitioning-dependent) cannot flip the comparison hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.exact import (
    avg_money,
    sql_avg_money,
    sql_sum_disc_price,
    sql_sum_money,
    sql_sum_promo_price,
    sum_disc_price,
    sum_money,
    sum_promo_price,
)
from analytics_data_platform_spark.sources.testdata import load_table


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


# --- q1: pricing summary (A1 grouped aggregation with filter pushdown) ----


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= _ts("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_money("l_quantity").alias("sum_qty"),
            sum_money("l_extendedprice").alias("sum_base_price"),
            sum_disc_price().alias("sum_disc_price"),
            avg_money("l_quantity").alias("avg_qty"),
            avg_money("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum_money("l_quantity")} AS sum_qty,
       {sql_sum_money("l_extendedprice")} AS sum_base_price,
       {sql_sum_disc_price()} AS sum_disc_price,
       {sql_avg_money("l_quantity")} AS avg_qty,
       {sql_avg_money("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""

register(
    QuerySpec(
        "q1_pricing_summary",
        q1_pricing_summary,
        Q1_SQL,
        doc="grouped aggregation + filter pushdown (pricing summary)",
        cites="SURVEY §2.4 A1/A5/A7; stg_opralogweb pivot-agg family",
        bench=True,
        tags=("agg", "filter"),
    )
)


# --- q3: shipping priority (J1 join chain + top-k) ------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < _ts("1998-03-15"))
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            sum_disc_price().alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

register(
    QuerySpec(
        "q3_shipping_priority",
        q3_shipping_priority,
        Q3_SQL,
        doc="3-way join chain + grouped agg + deterministic top-k",
        cites="SURVEY §2.3 J1 (stg_opralogweb__mcr_equipment_downtime.sql:29-35); §2.6 O3",
        bench=True,
        tags=("join", "topk"),
    )
)


# --- q5: local supplier volume (deep snowflake join, J1) ------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1999-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            sum_disc_price().alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
"""

register(
    QuerySpec(
        "q5_local_supplier_volume",
        q5_local_supplier_volume,
        Q5_SQL,
        doc="6-way snowflake join with broadcast dims",
        cites="SURVEY §2.3 J1; §4 join strategy (broadcast small dims)",
        bench=True,
        tags=("join",),
    )
)


# --- q6: forecast revenue (pure scan+filter+agg — pushdown showcase) ------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            sum_promo_price().alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

register(
    QuerySpec(
        "q6_forecast_revenue",
        q6_forecast_revenue,
        Q6_SQL,
        doc="scan + multi-predicate filter + scalar agg (parquet pushdown)",
        cites="SURVEY §2.2 P2/P5; §4 predicate pushdown",
        bench=True,
        tags=("filter", "agg"),
    )
)


# --- q4: order priority checking (correlated EXISTS) ----------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-07-01")) & (F.col("o_orderdate") < _ts("1997-10-01"))
    )
    # lineitems that shipped >60 days after order proxy the commit/receipt
    # test (no l_commitdate/l_receiptdate in this corpus)
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey).where(
        F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(60), F.col("o_orderdate"))
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""

register(
    QuerySpec(
        "q4_order_priority",
        q4_order_priority,
        Q4_SQL,
        doc="correlated-EXISTS semi filter + grouped count",
        cites="SURVEY §2.3 J5 family; TPC-H q4 shape",
        tags=("join", "subquery"),
    )
)


# --- q10: returned-item reporting (join + topk by revenue) ----------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum_disc_price().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

register(
    QuerySpec(
        "q10_returned_items",
        q10_returned_items,
        Q10_SQL,
        doc="returned-item revenue report (4-way join + top-20)",
        cites="SURVEY §2.3 J1; TPC-H q10 shape",
        tags=("join", "topk"),
    )
)


# --- q12: shipping-priority buckets (CASE aggregation) --------------------


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1998-01-01")) & (F.col("l_shipdate") < _ts("1999-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_linestatus
"""

register(
    QuerySpec(
        "q12_priority_shipping",
        q12_priority_shipping,
        Q12_SQL,
        doc="CASE-bucketed counts after join (shipmode-style report)",
        cites="SURVEY §2.8 F7; TPC-H q12 shape",
        tags=("join", "agg"),
    )
)


# --- q14: promo revenue ratio (conditional agg ratio) ---------------------


def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1998-03-01")) & (F.col("l_shipdate") < _ts("1998-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT ROUND(100 * SUM(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01' AND l_shipdate < TIMESTAMP '1998-04-01'
"""

register(
    QuerySpec(
        "q14_promo_ratio",
        q14_promo_ratio,
        Q14_SQL,
        doc="conditional-aggregate ratio (promo revenue share)",
        cites="SURVEY §2.4 A1; TPC-H q14 shape",
        tags=("join", "agg"),
    )
)


# --- monthly order histogram (date_trunc rollup) --------------------------


def orders_monthly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            sum_money("o_totalprice").alias("month_revenue"),
        )
    )


ORDERS_MONTHLY_SQL = """
SELECT date_trunc('month', o_orderdate) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_revenue
FROM orders
GROUP BY date_trunc('month', o_orderdate)
"""

register(
    QuerySpec(
        "orders_monthly_histogram",
        orders_monthly_histogram,
        ORDERS_MONTHLY_SQL,
        doc="date_trunc month rollup (time-partitioned agg)",
        cites="SURVEY §1.4 month() partition transform; §2.4 A1",
        tags=("agg", "datetime"),
    )
)


# --- q2: min-cost supplier (correlated MIN subquery) ----------------------
# The corpus has no partsupp table; the part↔supplier cost relation is
# derived from lineitem as MIN(l_extendedprice / l_quantity) per
# (l_partkey, l_suppkey) — MIN of exact IEEE divisions, so the correlated
# minimum compares bit-identically across engines (no summation-order
# sensitivity). Query shape preserved: correlated scalar MIN subquery
# (TPC-H q2), region-restricted on both sides.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")

    # derived part-supplier cost: one shuffle on (l_partkey, l_suppkey)
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # suppliers in EUROPE: dims are broadcast-size at any SF
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey).join(
        F.broadcast(p), ps.l_partkey == p.p_partkey
    )
    # the correlated MIN: per-part minimum among EUROPE suppliers, joined
    # back on equality (decorrelated group-then-join — the plan Catalyst
    # produces for the scalar-subquery form, stated explicitly)
    min_cost = ps_eu.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("unit_cost").alias("_min_cost")
    )
    return (
        ps_eu.join(
            min_cost,
            (ps_eu.l_partkey == min_cost._mk) & (ps_eu.unit_cost == min_cost._min_cost),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       ROUND(ps.unit_cost, 4) AS unit_cost
FROM ps
JOIN part ON ps.l_partkey = p_partkey
JOIN supplier ON ps.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_type = 'LARGE' AND p_size <= 15 AND r_name = 'EUROPE'
  AND ps.unit_cost = (
      SELECT MIN(ps2.unit_cost)
      FROM ps ps2
      JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      WHERE ps2.l_partkey = ps.l_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""

register(
    QuerySpec(
        "q2_min_cost_supplier",
        q2_min_cost_supplier,
        Q2_SQL,
        doc="correlated MIN subquery (min-cost supplier per part, TPC-H q2 shape)",
        cites="SURVEY §2.3 J5 (scalar subquery family); TPC-H q2",
        tags=("join", "subquery"),
    )
)


# --- q13: customer order-count distribution (left outer + re-agg) ---------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = c.join(o, c.c_custkey == o.o_custkey, "left_outer").groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")  # COUNT(col): NULLs from the outer join drop out
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""

register(
    QuerySpec(
        "q13_customer_distribution",
        q13_customer_distribution,
        Q13_SQL,
        doc="left-outer join + two-level count distribution (TPC-H q13 shape)",
        cites="SURVEY §2.3 J3 outer family; TPC-H q13",
        tags=("join", "agg"),
    )
)


# --- q16: supplier count per part attributes (distinct agg + NOT IN) ------
# No partsupp: the part↔supplier link is distinct (l_partkey, l_suppkey)
# pairs from lineitem; the "customer complaints" supplier exclusion is
# proxied by negative account balance (same NOT-IN-subquery shape).


def q16_supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    excl = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(excl), l.l_suppkey == excl.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

register(
    QuerySpec(
        "q16_supplier_part_coverage",
        q16_supplier_part_coverage,
        Q16_SQL,
        doc="COUNT DISTINCT agg + NOT-IN anti subquery (TPC-H q16 shape)",
        cites="SURVEY §2.4 A4 distinct family, §2.3 J6 anti; TPC-H q16",
        tags=("agg", "subquery"),
    )
)


# --- q18: large-quantity orders (IN-subquery over HAVING + top-k) ---------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    # IN (SELECT l_orderkey ... HAVING SUM(l_quantity) > 250): one shuffle
    # on l_orderkey; the semi form never widens rows (l_quantity sums are
    # integral doubles — exact, so the HAVING threshold is engine-stable)
    big = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("_qty")).where(F.col("_qty") > 250)
    return (
        l.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum_money("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

register(
    QuerySpec(
        "q18_large_orders",
        q18_large_orders,
        Q18_SQL,
        doc="IN-subquery over grouped HAVING + deterministic top-k (TPC-H q18 shape)",
        cites="SURVEY §2.3 J5, §2.6 O3; TPC-H q18",
        tags=("join", "subquery", "topk"),
    )
)


# --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ---------
# No l_receiptdate/l_commitdate in the corpus: "late" is shipdate more
# than 60 days after the order date (same proxy as q4). The double
# correlated EXISTS / NOT EXISTS is rewritten as one per-order aggregation
# — n_supp distinct suppliers, n_late_supp distinct LATE suppliers — and a
# filter (n_supp > 1 AND n_late_supp = 1) on late rows: exactly the
# multi-supplier / sole-late-supplier semantics, but with two shuffles
# total instead of two per-row correlated probes (the 100 TB-safe form).


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")

    ol = l.join(
        o.select("o_orderkey", "o_orderdate"), l.l_orderkey == F.col("o_orderkey")
    ).withColumn(
        "_late",
        F.col("l_shipdate") > F.timestamp_add("DAY", F.lit(60), F.col("o_orderdate")),
    )
    flags = ol.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count_distinct("l_suppkey").alias("_n_supp"),
        F.count_distinct(F.when(F.col("_late"), F.col("l_suppkey"))).alias("_n_late_supp"),
    )
    return (
        ol.where("_late")
        .join(
            flags.where((F.col("_n_supp") > 1) & (F.col("_n_late_supp") == 1)),
            ol.l_orderkey == flags._ok,
        )
        .join(F.broadcast(s), ol.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_9'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""

register(
    QuerySpec(
        "q21_suppliers_kept_waiting",
        q21_suppliers_kept_waiting,
        Q21_SQL,
        doc="double correlated EXISTS/NOT EXISTS via per-order agg rewrite (TPC-H q21 shape)",
        cites="SURVEY §2.3 J5/J6; TPC-H q21",
        tags=("join", "subquery"),
    )
)


# --- q7: volume shipping between two nations ------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("_sk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("_ck"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            sum_disc_price().alias("revenue")
        )
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       YEAR(l_shipdate) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, YEAR(l_shipdate)
"""

register(
    QuerySpec(
        "q7_volume_shipping",
        q7_volume_shipping,
        Q7_SQL,
        doc="bidirectional nation-pair trade volume by year (TPC-H q7 shape)",
        cites="SURVEY §2.3 J1 self-joined dims; TPC-H q7",
        tags=("join", "agg"),
    )
)


# --- q8: national market share --------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("_ck"), F.col("n_regionkey").alias("_crk"))
    n2 = n.select(F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("_ck"))
        .join(F.broadcast(r), F.col("_crk") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("_sk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


Q8_SQL = """
SELECT YEAR(o_orderdate) AS o_year,
       ROUND(SUM(CASE WHEN n2.n_name = 'NATION_5'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY YEAR(o_orderdate)
"""

register(
    QuerySpec(
        "q8_market_share",
        q8_market_share,
        Q8_SQL,
        doc="conditional-share ratio over 8-way snowflake join (TPC-H q8 shape)",
        cites="SURVEY §2.3 J1, §2.4 A1; TPC-H q8",
        tags=("join", "agg"),
    )
)


# --- q9: product-type profit (derived supply cost) ------------------------
# No partsupp: supply cost per (part, supplier) is the q2-derived
# MIN(l_extendedprice / l_quantity) relation, so profit =
# revenue − unit_cost × quantity. Shape preserved: LIKE-filtered part,
# profit by (nation, year).


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    n = load_table(spark, sf_dir, "nation")
    ps = l.groupBy(
        F.col("l_partkey").alias("_pk"), F.col("l_suppkey").alias("_sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "unit_cost"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(ps, (l.l_partkey == F.col("_pk")) & (l.l_suppkey == F.col("_sk")))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


Q9_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
)
SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount) - unit_cost * l_quantity), 2)
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN ps ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, YEAR(o_orderdate)
"""

register(
    QuerySpec(
        "q9_product_profit",
        q9_product_profit,
        Q9_SQL,
        doc="profit by nation/year with derived supply cost (TPC-H q9 shape)",
        cites="SURVEY §2.3 J1, §2.4 A1; TPC-H q9",
        tags=("join", "agg"),
    )
)


# --- q11: important stock values (scalar-subquery HAVING) -----------------
# Sums are DECIMAL(18,2) — exact and summation-order independent — so the
# threshold comparison can never flip on cross-engine double ulps; the
# final value is cast to DOUBLE for output.


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_0")
    pv = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_val"))
    )
    total = pv.agg((F.sum("_val") * F.lit(0.002)).alias("_threshold"))
    return (
        pv.join(F.broadcast(total))
        .where(F.col("_val") > F.col("_threshold"))
        .select("l_partkey", F.col("_val").cast("double").alias("stock_value"))
    )


Q11_SQL = """
WITH pv AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_0'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS stock_value
FROM pv
WHERE val > (SELECT SUM(val) * 0.002 FROM pv)
"""

register(
    QuerySpec(
        "q11_important_stock",
        q11_important_stock,
        Q11_SQL,
        doc="group totals vs global-scalar threshold, exact DECIMAL sums (TPC-H q11 shape)",
        cites="SURVEY §2.3 J5 scalar subquery; TPC-H q11",
        tags=("agg", "subquery"),
    )
)


# --- q15: top supplier (scalar MAX over a derived view) -------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey").alias("_sk")).agg(
        sum_disc_price().alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("_best"))
    return (
        rev.join(F.broadcast(best))
        .where(F.col("total_rev") == F.col("_best"))
        .join(F.broadcast(s), F.col("_sk") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
"""

register(
    QuerySpec(
        "q15_top_supplier",
        q15_top_supplier,
        Q15_SQL,
        doc="argmax via scalar MAX over derived revenue view (TPC-H q15 shape)",
        cites="SURVEY §2.3 J5, §2.4 A5; TPC-H q15",
        tags=("agg", "subquery"),
    )
)


# --- q17: small-quantity-order revenue (correlated AVG subquery) ----------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL")
    )
    # decorrelated per-part AVG (l_quantity is integral → AVG is exact and
    # engine-identical, so the 0.2× threshold cannot flip)
    avg_q = l.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_limit")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_q, l.l_partkey == F.col("_pk"))
        .where(F.col("l_quantity") < F.col("_limit"))
        .agg(F.round(sum_money("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""

register(
    QuerySpec(
        "q17_small_quantity",
        q17_small_quantity,
        Q17_SQL,
        doc="correlated per-part AVG threshold (TPC-H q17 shape)",
        cites="SURVEY §2.3 J5; TPC-H q17",
        tags=("join", "subquery"),
    )
)


# --- q19: disjunctive predicate join (OR-of-ANDs pushdown) ----------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(
            sum_disc_price().alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

register(
    QuerySpec(
        "q19_disjunctive_revenue",
        q19_disjunctive_revenue,
        Q19_SQL,
        doc="OR-of-ANDs disjunctive predicates across join (TPC-H q19 shape)",
        cites="SURVEY §2.2 P5; TPC-H q19",
        tags=("join", "filter"),
    )
)


# --- q20: heavy shippers of promoted parts (nested IN subqueries) ---------
# No partsupp.ps_availqty: "excess stock" is proxied by suppliers whose
# 1997 shipped quantity of any LIKE-filtered part exceeds a threshold —
# the same two-level nested-IN shape (suppkey IN (… partkey IN (…))).


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    heavy = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, n_name, ROUND(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > 50)
ORDER BY s_name
"""

register(
    QuerySpec(
        "q20_promotion_suppliers",
        q20_promotion_suppliers,
        Q20_SQL,
        doc="two-level nested IN subqueries with grouped HAVING (TPC-H q20 shape)",
        cites="SURVEY §2.3 J5/J7; TPC-H q20",
        tags=("join", "subquery"),
    )
)


# --- q22: lapsed high-balance customers (anti-join + scalar AVG) ----------
# No c_phone: the country code is the last two digits of c_name
# ('Customer#000000123' → '23'). Every customer has SOME order in this
# corpus, so "no orders at all" is tightened to "no orders since
# 2000-01-01" — the NOT-EXISTS anti shape is identical.


def q22_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = ("11", "17", "23", "29", "31", "37", "41")
    c = (
        load_table(spark, sf_dir, "customer")
        .withColumn("cntrycode", F.expr("right(c_name, 2)"))
        .where(F.col("cntrycode").isin(*codes))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg_bal"))
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            sum_money("c_acctbal").alias("totacctbal"),
        )
    )


Q22_SQL = """
WITH cust AS (
  SELECT RIGHT(c_name, 2) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE RIGHT(c_name, 2) IN ('11', '17', '23', '29', '31', '37', '41')
)
SELECT cntrycode, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM cust
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM cust WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
"""

register(
    QuerySpec(
        "q22_lapsed_customers",
        q22_lapsed_customers,
        Q22_SQL,
        doc="scalar AVG threshold + NOT-EXISTS anti-join (TPC-H q22 shape)",
        cites="SURVEY §2.3 J5/J6; TPC-H q22",
        tags=("subquery", "agg"),
    )
)
