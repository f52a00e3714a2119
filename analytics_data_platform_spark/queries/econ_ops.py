"""Concentration / inequality analytics: Gini, Lorenz curve, Herfindahl.

Revenue-concentration measures every commercial analytics platform
ships. Each is formulated as exact integer/rational arithmetic over cent
sums and dense ranks, so the statistics are engine-identical before the
single final division:

- Gini via the rank identity G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n over
  values sorted ascending (i = 1..n) — one sort window, two sums;
- the Lorenz curve sampled at deciles by integer row position;
- Herfindahl-Hirschman as Σ(sᵢ/S)² computed as (Σ sᵢ²)/S² — one
  aggregation, no per-row division.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table


def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue (cents-exact), with
    the component sums exposed for auditability. One groupBy(customer) +
    one global sort window over the |customers|-row aggregate."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = per_cust.select(
        "cents", F.row_number().over(w).alias("i")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.sum(F.col("i") * F.col("cents")).alias("rank_weighted_cents"),
    )
    gini = (
        F.lit(2.0) * F.col("rank_weighted_cents") / (F.col("n_customers") * F.col("total_cents"))
        - (F.col("n_customers") + F.lit(1.0)) / F.col("n_customers")
    )
    return agg.select(
        "n_customers",
        "total_cents",
        "rank_weighted_cents",
        F.round(gini, 6).alias("gini"),
    )


GINI_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i FROM per_cust
),
agg AS (
  SELECT COUNT(*) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS total_cents,
         CAST(SUM(i * cents) AS BIGINT) AS rank_weighted_cents
  FROM ranked
)
SELECT n_customers, total_cents, rank_weighted_cents,
       ROUND(2.0 * rank_weighted_cents / (n_customers * CAST(total_cents AS DOUBLE))
             - (n_customers + 1.0) / n_customers, 6) AS gini
FROM agg
"""

register(
    QuerySpec(
        "gini_customer_revenue",
        gini_customer_revenue,
        GINI_SQL,
        doc="Gini coefficient of customer revenue via the exact rank identity",
        cites="concentration-analytics family; pairs with pareto_customer_share",
        tags=("analytics", "statistics", "window"),
    )
)


def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer revenue sampled at deciles: for each 10%
    of customers (poorest first, integer row positions), the cumulative
    share of total revenue. Cumulative cent sums are exact; the one
    division per output row happens on exact integers."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    n_tot = per_cust.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    ranked = (
        per_cust.select(
            F.row_number().over(w).alias("i"),
            F.sum("cents").over(w_cum).alias("cum_cents"),
        )
        .crossJoin(F.broadcast(n_tot))
        .withColumn("decile", F.expr("(i * 10) div n"))
        .where(F.col("i") == F.expr("(decile * n) div 10"))  # last row of each decile
    )
    return ranked.select(
        "decile",
        F.col("i").alias("n_customers_cum"),
        "cum_cents",
        F.round(F.col("cum_cents") / F.col("total"), 6).alias("revenue_share"),
    )


LORENZ_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
),
nt AS (SELECT COUNT(*) AS n, SUM(cents) AS total FROM per_cust),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
         SUM(cents) OVER (ORDER BY cents, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM per_cust
)
SELECT (i * 10) // n AS decile,
       i AS n_customers_cum,
       CAST(cum_cents AS BIGINT) AS cum_cents,
       ROUND(CAST(cum_cents AS DOUBLE) / total, 6) AS revenue_share
FROM ranked, nt
WHERE i = (((i * 10) // n) * n) // 10
"""

register(
    QuerySpec(
        "lorenz_curve_deciles",
        lorenz_curve_deciles,
        LORENZ_SQL,
        doc="Lorenz curve at integer-position deciles (exact cumulative cent shares)",
        cites="concentration-analytics family",
        tags=("analytics", "window"),
    )
)


def herfindahl_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of lineitem revenue across
    suppliers, per year: HHI = (Σ sᵢ²)/S² from one aggregation pass —
    no per-supplier division, both sums exact BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(
        F.year("l_shipdate").alias("yr"), "l_suppkey"
    ).agg(
        F.sum(F.round(F.col("l_extendedprice")).cast("bigint")).alias("rev")
    )
    return per.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        # square the total in DOUBLE: the BIGINT product sits at the int64
        # edge already at sf0.1-per-year and would wrap at sf1; the double
        # product is the correctly-rounded true value, matching the oracle
        F.round(
            (
                F.sum(F.col("rev") * F.col("rev"))
                / (F.sum("rev").cast("double") * F.sum("rev"))
            ),
            6,
        ).alias("hhi"),
    )


HHI_SQL = """
WITH per AS (
  SELECT EXTRACT(year FROM l_shipdate) AS yr, l_suppkey,
         SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1, 2
)
SELECT CAST(yr AS INT) AS yr, COUNT(*) AS n_suppliers,
       ROUND(CAST(SUM(rev * rev) AS DOUBLE) / (CAST(SUM(rev) AS DOUBLE) * SUM(rev)), 6) AS hhi
FROM per GROUP BY yr
"""

register(
    QuerySpec(
        "herfindahl_supplier_share",
        herfindahl_supplier_share,
        HHI_SQL,
        doc="Herfindahl-Hirschman revenue concentration per year (one pass, exact sums)",
        cites="concentration-analytics family",
        tags=("analytics", "agg"),
    )
)
