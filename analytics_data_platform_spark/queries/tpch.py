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
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_discount), 4) AS avg_disc,
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
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
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
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
            F.round(F.sum("o_totalprice"), 2).alias("month_revenue"),
        )
    )


ORDERS_MONTHLY_SQL = """
SELECT date_trunc('month', o_orderdate) AS order_month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS month_revenue
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
