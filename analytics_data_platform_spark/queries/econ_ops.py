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

from analytics_data_platform_spark.operators.ordered import (
    multi_global_ranks,
    with_global_order,
)
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table


def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue (cents-exact), with
    the component sums exposed for auditability. One groupBy(customer),
    then the global rank comes from the two-pass bucketed scan
    (operators/ordered.py) — |customers| grows with data, so a global
    sort window would be a single-reducer at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    ranked = with_global_order(
        per_cust, "cents", tiebreaks=["o_custkey"], rank_col="i"
    ).select("cents", "i")
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
    n_tot = per_cust.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    ranked = (
        with_global_order(
            per_cust, "cents", tiebreaks=["o_custkey"],
            rank_col="i", prefix_sums={"cum_cents": "cents"},
        )
        .select("i", "cum_cents")
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


# ---- price-volume-mix revenue decomposition --------------------------------

_PVM_Y1, _PVM_Y2 = 1994, 1995


def pvm_revenue_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge per return flag: ΔRevenue split into
    a VOLUME effect (quantity change at old average price) and a PRICE
    effect (the residual) — the finance-standard PVM waterfall.

        volume = (q₂ − q₁) · (rev₁ / q₁)
        price  = Δrev − volume

    Everything up to the final division is exact integer sums (quantity
    units, revenue cents) from ONE conditional-aggregation pass over the
    two years — no join between year snapshots, no second scan. The two
    effects reconcile to Δrev by construction; the oracle recomputes the
    identical single-division doubles.
    """
    li = load_table(spark, sf_dir, "lineitem")
    two = li.where(
        F.year(F.col("l_shipdate")).isin(_PVM_Y1, _PVM_Y2)
    ).select(
        "l_returnflag",
        F.year("l_shipdate").alias("yr"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("rev_cents"),
    )
    agg = two.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("yr") == _PVM_Y1, F.col("qty")).otherwise(F.lit(0))).alias("q1"),
        F.sum(F.when(F.col("yr") == _PVM_Y1, F.col("rev_cents")).otherwise(F.lit(0))).alias("r1"),
        F.sum(F.when(F.col("yr") == _PVM_Y2, F.col("qty")).otherwise(F.lit(0))).alias("q2"),
        F.sum(F.when(F.col("yr") == _PVM_Y2, F.col("rev_cents")).otherwise(F.lit(0))).alias("r2"),
    )
    agg = agg.where((F.col("q1") > 0) & (F.col("q2") > 0))  # bridge needs a base year
    vol = (F.col("q2") - F.col("q1")).cast("double") * F.col("r1").cast("double") / F.col(
        "q1"
    ).cast("double")
    return agg.select(
        "l_returnflag",
        F.round(F.col("r1") / 100.0, 2).alias("rev_y1"),
        F.round(F.col("r2") / 100.0, 2).alias("rev_y2"),
        F.round((F.col("r2") - F.col("r1")) / 100.0, 2).alias("delta_rev"),
        F.round(vol / 100.0, 2).alias("volume_effect"),
        F.round(((F.col("r2") - F.col("r1")).cast("double") - vol) / 100.0, 2).alias(
            "price_effect"
        ),
    )


PVM_SQL = f"""
WITH two AS (
  SELECT l_returnflag, EXTRACT(year FROM l_shipdate) AS yr,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE EXTRACT(year FROM l_shipdate) IN ({_PVM_Y1}, {_PVM_Y2})
),
agg AS (
  SELECT l_returnflag,
         CAST(SUM(CASE WHEN yr = {_PVM_Y1} THEN qty ELSE 0 END) AS BIGINT) AS q1,
         CAST(SUM(CASE WHEN yr = {_PVM_Y1} THEN rev_cents ELSE 0 END) AS BIGINT) AS r1,
         CAST(SUM(CASE WHEN yr = {_PVM_Y2} THEN qty ELSE 0 END) AS BIGINT) AS q2,
         CAST(SUM(CASE WHEN yr = {_PVM_Y2} THEN rev_cents ELSE 0 END) AS BIGINT) AS r2
  FROM two GROUP BY 1
  HAVING SUM(CASE WHEN yr = 1994 THEN qty ELSE 0 END) > 0
     AND SUM(CASE WHEN yr = 1995 THEN qty ELSE 0 END) > 0
)
SELECT l_returnflag,
       ROUND(r1 / 100.0, 2) AS rev_y1,
       ROUND(r2 / 100.0, 2) AS rev_y2,
       ROUND((r2 - r1) / 100.0, 2) AS delta_rev,
       ROUND(CAST(q2 - q1 AS DOUBLE) * CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE) / 100.0, 2)
         AS volume_effect,
       ROUND((CAST(r2 - r1 AS DOUBLE)
              - CAST(q2 - q1 AS DOUBLE) * CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) / 100.0, 2)
         AS price_effect
FROM agg
"""


register(
    QuerySpec(
        "pvm_revenue_decomposition",
        pvm_revenue_decomposition,
        PVM_SQL,
        doc="YoY price-volume-mix revenue bridge from one conditional-agg pass",
        cites="finance waterfall twin of yoy_revenue_growth",
        tags=("analytics", "econ"),
    )
)


# ---- log-log demand elasticity ---------------------------------------------

_ELAST_SCALE = 1_000_000  # micro-nats (the naive-Bayes quantization idiom)
_ELAST_CENTER = 14_000_000  # ≈ ln(1.2M cents): centers x so Σx² stays in BIGINT


def demand_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity of demand per brand: the OLS slope of
    ln(quantity) on ln(unit price) over line items — the log-log
    regression whose slope IS the elasticity (scale factors cancel).

    Both logs are quantized once to integer micro-nats (centered so the
    per-brand Σx² moment stays inside BIGINT); the per-brand slope is
    then a single double division of exact integer moment expressions —
    the same reassociation-proof recipe as ols_order_price. One
    part⋈lineitem join (brand is a part attribute), one moment
    aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    obs = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        F.expr(
            f"CAST(round(ln(l_extendedprice * 100 / l_quantity) * {_ELAST_SCALE}) AS BIGINT)"
            f" - {_ELAST_CENTER}"
        ).alias("x"),
        F.expr(f"CAST(round(ln(l_quantity) * {_ELAST_SCALE}) AS BIGINT)").alias("y"),
    )
    mom = obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # moments convert to double BEFORE the slope arithmetic: each moment is
    # an exact BIGINT, the conversion and the few IEEE ops after it are
    # deterministic, and n·Σxy − Σx·Σy would overflow BIGINT at scale
    slope = (
        "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS elasticity"
    )
    return mom.selectExpr("p_brand", "n AS n_lineitems", slope).orderBy("p_brand")


ELASTICITY_SQL = f"""
WITH obs AS (
  SELECT p.p_brand,
         CAST(ROUND(ln(l.l_extendedprice * 100 / l.l_quantity) * {_ELAST_SCALE}) AS BIGINT)
           - {_ELAST_CENTER} AS x,
         CAST(ROUND(ln(l.l_quantity) * {_ELAST_SCALE}) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
mom AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM obs GROUP BY 1
)
SELECT p_brand, n AS n_lineitems,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS elasticity
FROM mom ORDER BY p_brand
"""


register(
    QuerySpec(
        "demand_elasticity_by_brand",
        demand_elasticity_by_brand,
        ELASTICITY_SQL,
        doc="log-log price elasticity per brand (micro-nat quantized logs, exact integer moments)",
        cites="econ family; quantized-log idiom of naive_bayes_source, moment OLS of ols_order_price",
        tags=("econ", "ml", "stats"),
    )
)


# ---- ABC / XYZ inventory segmentation --------------------------------------


def abc_xyz_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supply-chain planning matrix: parts classed ABC by cumulative
    revenue share (A ≤ 80%, B ≤ 95%, C rest — integer cumulative-cents
    comparisons, no float cumsum) × XYZ by demand variability (weekly CV:
    X ≤ 0.5, Y ≤ 1, Z above). The CV thresholds compare in CLEARED
    integer form — CV² ≤ t ⟺ n·Σc² ≤ (1+t)·(Σc)² — so class boundaries
    are exact; zero-demand weeks enter the variance automatically because
    n is the part-independent calendar week count. One lineitem pass for
    both statistics, two rank windows, a 9-cell rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    weeks = li.agg(
        F.expr(
            "CAST(max(datediff(l_shipdate, DATE'1970-01-01')) div 7"
            " - min(datediff(l_shipdate, DATE'1970-01-01')) div 7 + 1 AS BIGINT)"
        ).alias("nw")
    )
    weekly = li.groupBy(
        "l_partkey",
        F.expr("CAST(datediff(l_shipdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk"),
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("c"),
        F.expr("CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)").alias(
            "rev"
        ),
    )
    per_part = weekly.groupBy("l_partkey").agg(
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
        F.sum("rev").alias("rev"),
    )
    tot = per_part.agg(F.sum("rev").alias("tr"))
    classed = (
        with_global_order(
            per_part, "rev", descending=True, tiebreaks=["l_partkey"],
            prefix_sums={"cum": "rev"},
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(weeks))
        .select(
            "l_partkey",
            "rev",
            F.expr(
                "CASE WHEN cum * 100 <= tr * 80 THEN 'A' "
                "WHEN cum * 100 <= tr * 95 THEN 'B' ELSE 'C' END"
            ).alias("abc"),
            F.expr(
                "CASE WHEN 4 * nw * ss <= 5 * s * s THEN 'X' "
                "WHEN nw * ss <= 2 * s * s THEN 'Y' ELSE 'Z' END"
            ).alias("xyz"),
        )
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr("CAST(sum(rev) AS BIGINT)").alias("rev_cents"),
        )
        .orderBy("abc", "xyz")
    )


ABC_XYZ_SQL = """
WITH weeks AS (
  SELECT CAST(MAX(date_diff('day', DATE '1970-01-01', l_shipdate)) // 7
         - MIN(date_diff('day', DATE '1970-01-01', l_shipdate)) // 7 + 1 AS BIGINT) AS nw
  FROM lineitem
),
weekly AS (
  SELECT l_partkey,
         date_diff('day', DATE '1970-01-01', l_shipdate) // 7 AS wk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS c,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS ss,
         CAST(SUM(rev) AS BIGINT) AS rev
  FROM weekly GROUP BY 1
),
tot AS (SELECT CAST(SUM(rev) AS BIGINT) AS tr FROM per_part),
classed AS (
  SELECT p.l_partkey, p.rev,
         CASE WHEN CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * 100
                <= t.tr * 80 THEN 'A'
              WHEN CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) * 100
                <= t.tr * 95 THEN 'B' ELSE 'C' END AS abc,
         CASE WHEN 4 * w.nw * p.ss <= 5 * p.s * p.s THEN 'X'
              WHEN w.nw * p.ss <= 2 * p.s * p.s THEN 'Y' ELSE 'Z' END AS xyz
  FROM per_part p, tot t, weeks w
)
SELECT abc, xyz, COUNT(*) AS n_parts, CAST(SUM(rev) AS BIGINT) AS rev_cents
FROM classed GROUP BY 1, 2 ORDER BY 1, 2
"""


register(
    QuerySpec(
        "abc_xyz_segmentation",
        abc_xyz_segmentation,
        ABC_XYZ_SQL,
        doc="ABC (cumulative revenue) x XYZ (integer-exact CV bands) part segmentation matrix",
        cites="supply-chain twin of pareto_customer_share + order_count_dispersion",
        tags=("econ", "inventory", "window"),
    )
)


# ---- within-part price dispersion ------------------------------------------


def price_dispersion_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by relative unit-price dispersion (IQR/median of the
    realized per-line unit price) — the pricing-consistency screen that
    flags parts sold at wildly different effective prices. Quartiles and
    the median are integer-position selections per part (no interpolated
    percentiles), the unit price is exact integer cents, and the final
    ratio is one rounded double division — so the ranking is stable and
    the oracle hash-matches."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = li.select(
        "l_partkey",
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100 / l_quantity) AS BIGINT)"
        ).alias("up"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_partkey").orderBy("up", "l_orderkey", "l_linenumber")
    ranked = unit.select(
        "l_partkey",
        "up",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("l_partkey")).alias("n"),
    ).where(F.col("n") >= 8)
    quarts = (
        ranked.where(
            F.expr(
                "rn = (n + 3) div 4 OR rn = (n + 1) div 2 OR rn = (3 * n + 1) div 4"
            )
        )
        .groupBy("l_partkey")
        .agg(
            F.min("n").alias("n_lines"),
            F.min("up").alias("q1_cents"),
            F.expr(
                "max(CASE WHEN rn = (n + 1) div 2 THEN up END)"
            ).alias("median_cents"),
            F.max("up").alias("q3_cents"),
        )
        .where(F.col("median_cents") > 0)
    )
    scored = quarts.selectExpr(
        "l_partkey AS part_key",
        "n_lines",
        "q1_cents",
        "median_cents",
        "q3_cents",
        "round(CAST(q3_cents - q1_cents AS DOUBLE) / median_cents, 6) AS rel_iqr",
    )
    wtop = Window.orderBy(F.desc("rel_iqr"), "part_key")
    return (
        scored.withColumn("pos", F.row_number().over(wtop))
        .where(F.col("pos") <= 20)
        .select("pos", "part_key", "n_lines", "q1_cents", "median_cents", "q3_cents", "rel_iqr")
    )


PRICE_DISPERSION_SQL = """
WITH unit AS (
  SELECT l_partkey,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100 / l_quantity) AS BIGINT) AS up,
         l_orderkey, l_linenumber
  FROM lineitem
),
ranked AS (
  SELECT l_partkey, up,
         ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY up, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n
  FROM unit
),
quarts AS (
  SELECT l_partkey, MIN(n) AS n_lines,
         MIN(up) AS q1_cents,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN up END) AS median_cents,
         MAX(up) AS q3_cents
  FROM ranked
  WHERE n >= 8 AND (rn = (n + 3) // 4 OR rn = (n + 1) // 2 OR rn = (3 * n + 1) // 4)
  GROUP BY 1
  HAVING MAX(CASE WHEN rn = (n + 1) // 2 THEN up END) > 0
),
scored AS (
  SELECT l_partkey AS part_key, n_lines, q1_cents, median_cents, q3_cents,
         ROUND(CAST(q3_cents - q1_cents AS DOUBLE) / median_cents, 6) AS rel_iqr
  FROM quarts
)
SELECT ROW_NUMBER() OVER (ORDER BY rel_iqr DESC, part_key) AS pos,
       part_key, n_lines, q1_cents, median_cents, q3_cents, rel_iqr
FROM scored
QUALIFY pos <= 20
ORDER BY pos
"""


register(
    QuerySpec(
        "price_dispersion_by_part",
        price_dispersion_by_part,
        PRICE_DISPERSION_SQL,
        doc="top-20 parts by relative unit-price IQR (integer-position quartiles)",
        cites="pricing screen; quartile idiom of winsorized_stats_by_type",
        tags=("econ", "window", "stats"),
    )
)


def single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration screen: per part, supplier count and the top
    supplier's share of shipped quantity; output the riskiest 25 parts
    (fewest alternatives × highest dependence). Exact integer quantity
    sums, struct-max argmax for the top supplier, one rounded division —
    the procurement twin of herfindahl_supplier_share at part grain."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("q")
    )
    agg = per.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("q").alias("total_q"),
        F.max(F.struct("q", F.expr("-l_suppkey AS negk"))).alias("top"),
    )
    scored = agg.selectExpr(
        "l_partkey AS part_key",
        "n_suppliers",
        "total_q",
        "-top.negk AS top_supplier",
        "top.q AS top_q",
        "round(CAST(top.q AS DOUBLE) / total_q, 6) AS top_share",
    )
    w = Window.orderBy(F.desc("top_share"), "n_suppliers", "part_key")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 25)
        .select("pos", "part_key", "n_suppliers", "top_supplier", "top_q", "total_q", "top_share")
    )


SINGLE_SOURCE_SQL = """
WITH per AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT l_partkey, COUNT(*) AS n_suppliers, CAST(SUM(q) AS BIGINT) AS total_q,
         MAX({'q': q, 'negk': -l_suppkey}) AS top
  FROM per GROUP BY 1
),
scored AS (
  SELECT l_partkey AS part_key, n_suppliers, total_q,
         -(top.negk) AS top_supplier, top.q AS top_q,
         ROUND(CAST(top.q AS DOUBLE) / total_q, 6) AS top_share
  FROM agg
)
SELECT ROW_NUMBER() OVER (ORDER BY top_share DESC, n_suppliers, part_key) AS pos,
       part_key, n_suppliers, top_supplier, top_q, total_q, top_share
FROM scored
QUALIFY pos <= 25
ORDER BY pos
"""


register(
    QuerySpec(
        "single_source_risk",
        single_source_risk,
        SINGLE_SOURCE_SQL,
        doc="top single-source-risk parts: supplier count + top-supplier quantity share",
        cites="procurement twin of herfindahl_supplier_share; struct-max argmax idiom",
        tags=("econ", "risk", "agg"),
    )
)


def return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate anomaly screen: per brand, the share of 'R' line items
    vs the corpus-wide rate, with a two-proportion z-score — the QA
    signal that flags brands whose merchandise comes back unusually
    often. Counts are exact; the z expression is a handful of IEEE ops
    over them (the Welch-t discipline of ab_test_spend)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand", (F.col("l_returnflag") == "R").cast("bigint").alias("ret")
    )
    per = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"), F.sum("ret").alias("r")
    )
    tot = per.agg(F.sum("n").alias("tn"), F.sum("r").alias("tr"))
    z = (
        "(CAST(r AS DOUBLE)/n - CAST(tr AS DOUBLE)/tn)"
        " / sqrt((CAST(tr AS DOUBLE)/tn) * (1.0 - CAST(tr AS DOUBLE)/tn) / n)"
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "p_brand",
            "n AS n_lines",
            "r AS n_returned",
            "round(CAST(r AS DOUBLE)/n, 6) AS return_rate",
            f"round({z}, 4) AS z_vs_overall",
        )
        .orderBy("p_brand")
    )


RETURN_RATE_SQL = """
WITH j AS (
  SELECT p.p_brand, CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
per AS (
  SELECT p_brand, COUNT(*) AS n, CAST(SUM(ret) AS BIGINT) AS r FROM j GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(r) AS BIGINT) AS tr FROM per)
SELECT p_brand, n AS n_lines, r AS n_returned,
       ROUND(CAST(r AS DOUBLE)/n, 6) AS return_rate,
       ROUND((CAST(r AS DOUBLE)/n - CAST(tr AS DOUBLE)/tn)
             / sqrt((CAST(tr AS DOUBLE)/tn) * (1.0 - CAST(tr AS DOUBLE)/tn) / n), 4)
         AS z_vs_overall
FROM per, tot
ORDER BY p_brand
"""


register(
    QuerySpec(
        "return_rate_by_brand",
        return_rate_by_brand,
        RETURN_RATE_SQL,
        doc="per-brand return-rate with two-proportion z vs the overall rate",
        cites="QA screen; proportion-test discipline of ab_test_spend",
        tags=("econ", "quality", "stats"),
    )
)


def basket_brand_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-order brand diversity: how many distinct
    brands does a basket span? The cross-sell health metric — a shift
    toward 1-brand baskets signals assortment problems. One orders-grain
    distinct-count, one histogram aggregation, exact everywhere."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_order = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_orderkey")
        .agg(F.countDistinct("p_brand").cast("bigint").alias("n_brands"))
    )
    tot = per_order.agg(F.count(F.lit(1)).alias("t"))
    return (
        per_order.groupBy("n_brands")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_brands",
            "n_orders",
            "round(CAST(n_orders AS DOUBLE) / t, 6) AS order_share",
        )
        .orderBy("n_brands")
    )


BASKET_DIVERSITY_SQL = """
WITH per_order AS (
  SELECT l.l_orderkey, CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
),
tot AS (SELECT COUNT(*) AS t FROM per_order)
SELECT n_brands, COUNT(*) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(t.t), 6) AS order_share
FROM per_order, tot t
GROUP BY n_brands
ORDER BY n_brands
"""


register(
    QuerySpec(
        "basket_brand_diversity",
        basket_brand_diversity,
        BASKET_DIVERSITY_SQL,
        doc="histogram of distinct brands per order with exact shares",
        cites="cross-sell metric beside association_rules_parts",
        tags=("econ", "basket", "agg"),
    )
)


def discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a deeper discount actually move volume? Per discount percent
    (an exact integer band), mean quantity and mean net revenue per line
    — the pricing curve that justifies (or kills) promotions. One
    aggregation; exact integer sums with two final divisions per band."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = li.select(
        F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("discount_pct"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.expr(
            "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("net_cents"),
    )
    return (
        bands.groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("qty").alias("total_qty"),
            F.sum("net_cents").alias("net_cents"),
        )
        .selectExpr(
            "discount_pct",
            "n_lines",
            "round(CAST(total_qty AS DOUBLE) / n_lines, 4) AS avg_qty",
            "round(CAST(net_cents AS DOUBLE) / n_lines / 100.0, 2) AS avg_net_revenue",
        )
        .orderBy("discount_pct")
    )


DISCOUNT_SQL = """
WITH bands AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS discount_pct,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents
  FROM lineitem
)
SELECT discount_pct, COUNT(*) AS n_lines,
       ROUND(CAST(SUM(qty) AS BIGINT) * 1.0 / COUNT(*), 4) AS avg_qty,
       ROUND(CAST(SUM(net_cents) AS BIGINT) * 1.0 / COUNT(*) / 100.0, 2) AS avg_net_revenue
FROM bands GROUP BY 1 ORDER BY 1
"""


register(
    QuerySpec(
        "discount_effectiveness",
        discount_effectiveness,
        DISCOUNT_SQL,
        doc="mean quantity and net revenue per exact discount-percent band",
        cites="pricing curve beside demand_elasticity_by_brand",
        tags=("econ", "pricing", "agg"),
    )
)


def order_cadence_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the median days between consecutive
    orders per market segment, selected by integer row position over the
    pooled per-customer gaps — the lifecycle input reorder-reminder
    timing needs. One customer-keyed lag window over orders, one
    position-selection per segment."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("prev", F.lag("o_orderdate").over(w))
        .where(F.col("prev").isNotNull())
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.expr("CAST(datediff(o_orderdate, prev) AS BIGINT)").alias("gap_days"),
            "o_orderkey",
        )
    )
    ws = Window.partitionBy("segment").orderBy("gap_days", "o_orderkey")
    ranked = gaps.select(
        "segment",
        "gap_days",
        F.row_number().over(ws).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("segment")).alias("n"),
    )
    return (
        ranked.where(F.expr("rn = (n + 1) div 2"))
        .selectExpr("segment", "n AS n_gaps", "gap_days AS median_gap_days")
        .orderBy("segment")
    )


CADENCE_SQL = """
WITH gaps AS (
  SELECT c.c_mktsegment AS segment,
         CAST(date_diff('day',
              lag(o.o_orderdate) OVER (PARTITION BY o.o_custkey
                                       ORDER BY o.o_orderdate, o.o_orderkey),
              o.o_orderdate) AS BIGINT) AS gap_days,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT segment, gap_days, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY gap_days, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM gaps WHERE gap_days IS NOT NULL
)
SELECT segment, n AS n_gaps, gap_days AS median_gap_days
FROM ranked WHERE rn = (n + 1) // 2
ORDER BY segment
"""


register(
    QuerySpec(
        "order_cadence_by_segment",
        order_cadence_by_segment,
        CADENCE_SQL,
        doc="median inter-order gap per segment by integer position",
        cites="lifecycle cadence beside customer_aliveness; position-median idiom",
        tags=("analytics", "lifecycle", "window"),
    )
)


def nation_rank_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation revenue league table with year-over-year rank movement
    (1995 vs 1996): who is gaining share? Exact cent sums per
    (nation, year), dense integer ranks, and the delta — no floats at
    all until the optional share column."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.where(F.year("o_orderdate").isin(1995, 1996))
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
                "rev_cents"
            )
        )
    )
    piv = rev.groupBy("n_name").agg(
        F.max(F.when(F.col("yr") == 1995, F.col("rev_cents"))).alias("rev95"),
        F.max(F.when(F.col("yr") == 1996, F.col("rev_cents"))).alias("rev96"),
    ).where(F.col("rev95").isNotNull() & F.col("rev96").isNotNull())
    ranked = piv.select(
        "n_name",
        "rev95",
        "rev96",
        F.row_number().over(Window.orderBy(F.desc("rev95"), "n_name")).alias("rank95"),
        F.row_number().over(Window.orderBy(F.desc("rev96"), "n_name")).alias("rank96"),
    )
    return ranked.selectExpr(
        "n_name AS nation",
        "rank95",
        "rank96",
        "rank95 - rank96 AS rank_gain",
        "rev95",
        "rev96",
    ).orderBy("rank96")


RANK_MOMENTUM_SQL = """
WITH rev AS (
  SELECT n.n_name, EXTRACT(year FROM o.o_orderdate) AS yr,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2
),
piv AS (
  SELECT n_name,
         MAX(CASE WHEN yr = 1995 THEN rev_cents END) AS rev95,
         MAX(CASE WHEN yr = 1996 THEN rev_cents END) AS rev96
  FROM rev GROUP BY 1
  HAVING MAX(CASE WHEN yr = 1995 THEN rev_cents END) IS NOT NULL
     AND MAX(CASE WHEN yr = 1996 THEN rev_cents END) IS NOT NULL
),
ranked AS (
  SELECT n_name, rev95, rev96,
         ROW_NUMBER() OVER (ORDER BY rev95 DESC, n_name) AS rank95,
         ROW_NUMBER() OVER (ORDER BY rev96 DESC, n_name) AS rank96
  FROM piv
)
SELECT n_name AS nation, rank95, rank96, rank95 - rank96 AS rank_gain, rev95, rev96
FROM ranked ORDER BY rank96
"""


register(
    QuerySpec(
        "nation_rank_momentum",
        nation_rank_momentum,
        RANK_MOMENTUM_SQL,
        doc="nation revenue ranks 1995 vs 1996 with rank movement, exact cents",
        cites="league-table twin of yoy_revenue_growth",
        tags=("econ", "ranking"),
    )
)


# --- Simpson's paradox screen: pooled vs within-brand OLS slopes -----------


def simpson_paradox_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the pooled OLS slope of line revenue on
    quantity vs each brand's within-brand slope — brands whose slope sign
    OPPOSES the pooled sign are aggregation traps where a dashboard's
    'overall trend' inverts on drill-down.

    Slopes come from exact BIGINT co-moments (quantity is integer,
    revenue in cents): slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), evaluated
    in DOUBLE only at the final division, identically in both engines.
    One pass builds brand moments; the pooled moments are their sums."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.col("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    brand = rows.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    pooled = brand.agg(
        F.sum("n").alias("tn"), F.sum("sx").alias("tsx"), F.sum("sy").alias("tsy"),
        F.sum("sxx").alias("tsxx"), F.sum("sxy").alias("tsxy"),
    )
    # moment cross-products overflow int64 at sf0.1+ (tn·tsxy ~ 1e20);
    # widen to DECIMAL(38,0) (Spark) / HUGEINT (oracle) — exact, loud on
    # overflow, and both engines divide the same exact integers
    def d(c):
        return F.col(c).cast("decimal(19,0)")

    den = (d("n") * d("sxx") - d("sx") * d("sx")).cast("double")
    slope = F.when(den != 0, (d("n") * d("sxy") - d("sx") * d("sy")).cast("double") / den)
    tden = (d("tn") * d("tsxx") - d("tsx") * d("tsx")).cast("double")
    pooled_slope = F.when(
        tden != 0, (d("tn") * d("tsxy") - d("tsx") * d("tsy")).cast("double") / tden
    )
    return (
        brand.crossJoin(F.broadcast(pooled))
        .select(
            "p_brand", "n",
            F.round(slope / 100.0, 6).alias("brand_slope"),
            F.round(pooled_slope / 100.0, 6).alias("pooled_slope"),
            (F.signum(slope) != F.signum(pooled_slope)).alias("sign_flip"),
        )
    )


SIMPSON_SQL = """
WITH rows_ AS (
  SELECT p_brand, CAST(l_quantity AS BIGINT) AS x,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
brand AS (
  SELECT p_brand, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM rows_ GROUP BY p_brand
),
pooled AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(sx) AS BIGINT) AS tsx,
         CAST(SUM(sy) AS BIGINT) AS tsy, CAST(SUM(sxx) AS BIGINT) AS tsxx,
         CAST(SUM(sxy) AS BIGINT) AS tsxy
  FROM brand
)
SELECT p_brand, n,
       ROUND(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / NULLIF(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 0) / 100.0, 6) AS brand_slope,
       ROUND(CAST(CAST(tn AS HUGEINT) * tsxy - CAST(tsx AS HUGEINT) * tsy AS DOUBLE)
         / NULLIF(CAST(CAST(tn AS HUGEINT) * tsxx - CAST(tsx AS HUGEINT) * tsx AS DOUBLE), 0) / 100.0, 6) AS pooled_slope,
       SIGN(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
            / NULLIF(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE), 0))
         <> SIGN(CAST(CAST(tn AS HUGEINT) * tsxy - CAST(tsx AS HUGEINT) * tsy AS DOUBLE)
            / NULLIF(CAST(CAST(tn AS HUGEINT) * tsxx - CAST(tsx AS HUGEINT) * tsx AS DOUBLE), 0)) AS sign_flip
FROM brand CROSS JOIN pooled
"""

register(
    QuerySpec(
        "simpson_paradox_brands",
        simpson_paradox_brands,
        SIMPSON_SQL,
        doc="pooled vs within-brand OLS slope sign flips (aggregation-trap screen)",
        cites="statistics family; exact BIGINT co-moments, one pass + rollup of moments",
        tags=("stats", "agg"),
    )
)


# --- price indices: Laspeyres / Paasche / Fisher vs the base year ----------

_IDX_BASE_YEAR = 1995


def price_index_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche and Fisher price indices per year against the
    1995 base basket: unit values per (part, year) from exact integer
    cents/quantity sums, index numerators/denominators as weighted sums
    over the matched part basket. The sums are of non-grid rationals, so
    double summation is drift-safe at 6-dp rounding; everything upstream
    is exact integers. One lineitem aggregation + one self-join of the
    compact (part, year) panel against its base-year slice."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
    py = (
        li.groupBy(F.col("l_partkey").alias("pk"), F.year("l_shipdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("cents"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        )
    )
    base = py.where(F.col("yr") == _IDX_BASE_YEAR).select(
        "pk", F.col("cents").alias("c0"), F.col("qty").alias("q0")
    )
    joined = py.where(F.col("yr") != _IDX_BASE_YEAR).join(base, "pk")
    # unit values p = cents/qty; Laspeyres weights q0, Paasche weights qt
    p_t = F.col("cents") / F.col("qty").cast("double")
    p_0 = F.col("c0") / F.col("q0").cast("double")
    agg = joined.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(p_t * F.col("q0")).alias("l_num"),
        F.sum(p_0 * F.col("q0")).alias("l_den"),
        F.sum(p_t * F.col("qty")).alias("p_num"),
        F.sum(p_0 * F.col("qty")).alias("p_den"),
    )
    lasp = F.col("l_num") / F.col("l_den")
    paas = F.col("p_num") / F.col("p_den")
    return agg.select(
        "yr", "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


PRICE_IDX_SQL = f"""
WITH py AS (
  SELECT l_partkey AS pk, year(l_shipdate) AS yr,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
base AS (SELECT pk, cents AS c0, qty AS q0 FROM py WHERE yr = {_IDX_BASE_YEAR}),
joined AS (
  SELECT p.*, b.c0, b.q0 FROM py p JOIN base b ON p.pk = b.pk WHERE p.yr <> {_IDX_BASE_YEAR}
),
agg AS (
  SELECT yr, COUNT(*) AS n_parts,
         SUM(cents / CAST(qty AS DOUBLE) * q0) AS l_num,
         SUM(c0 / CAST(q0 AS DOUBLE) * q0) AS l_den,
         SUM(cents / CAST(qty AS DOUBLE) * qty) AS p_num,
         SUM(c0 / CAST(q0 AS DOUBLE) * qty) AS p_den
  FROM joined GROUP BY yr
)
SELECT yr, n_parts,
       ROUND(l_num / l_den, 6) AS laspeyres,
       ROUND(p_num / p_den, 6) AS paasche,
       ROUND(sqrt((l_num / l_den) * (p_num / p_den)), 6) AS fisher
FROM agg
"""

register(
    QuerySpec(
        "price_index_yearly",
        price_index_yearly,
        PRICE_IDX_SQL,
        doc="Laspeyres/Paasche/Fisher price indices per year vs the 1995 basket",
        cites="economics family; exact integer unit-value panel",
        tags=("econ", "agg"),
    )
)


# --- revenue waterfall: gross → discount → net → tax → charged -------------


def margin_waterfall_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finance waterfall per ship-year: gross line revenue, discount
    given, net, tax collected, total charged — TPC-H's charge formula
    decomposed into the bridge a CFO deck shows. Every component is an
    exact DECIMAL product/sum (scales 2→4→6), so the waterfall ties out
    to the cent and the identity net = gross − discount holds exactly in
    both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(18,2)")
    t = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(p).cast("double").alias("gross"),
            F.round(F.sum(p * d), 2).cast("double").alias("discount_given"),
            F.round(F.sum(p * (F.lit(1) - d)), 2).cast("double").alias("net"),
            F.round(F.sum(p * (F.lit(1) - d) * t), 2).cast("double").alias("tax_collected"),
            F.round(F.sum(p * (F.lit(1) - d) * (F.lit(1) + t)), 2).cast("double").alias("charged"),
        )
    )


WATERFALL_SQL = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS discount_given,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS net,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * CAST(l_tax AS DECIMAL(18,2))), 2) AS DOUBLE) AS tax_collected,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                      * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS charged
FROM lineitem
GROUP BY year(l_shipdate)
"""

register(
    QuerySpec(
        "margin_waterfall_yearly",
        margin_waterfall_yearly,
        WATERFALL_SQL,
        doc="gross/discount/net/tax/charged waterfall per year, exact to the cent",
        cites="finance-reporting family; decimal product chain (q1's charge formula decomposed)",
        tags=("econ", "agg"),
    )
)


# --- cohort unit economics --------------------------------------------------


def unit_economics_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit economics by acquisition cohort (first-order year): customers,
    lifetime orders and revenue, orders-per-customer, AOV, and revenue per
    customer. Revenue is exact decimal; the ratios divide exact values so
    the cohort table is engine-stable. One orders aggregation + one
    per-customer reduce."""
    from analytics_data_platform_spark.queries.exact import sum_money

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    per_cust = o.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("int").alias("cohort_year"),
        F.count(F.lit(1)).alias("n_orders"),
        sum_money("o_totalprice").alias("revenue"),
    )
    return (
        per_cust.groupBy("cohort_year")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
        .select(
            "cohort_year", "n_customers", "n_orders", "revenue",
            F.round(F.col("n_orders") / F.col("n_customers").cast("double"), 4).alias("orders_per_customer"),
            F.round(F.col("revenue") / F.col("n_orders").cast("double"), 2).alias("aov"),
            F.round(F.col("revenue") / F.col("n_customers").cast("double"), 2).alias("revenue_per_customer"),
        )
    )


UNIT_ECON_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(year(MIN(o_orderdate)) AS INT) AS cohort_year,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
),
cohort AS (
  SELECT cohort_year, COUNT(*) AS n_customers,
         CAST(SUM(n_orders) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM per_cust GROUP BY cohort_year
)
SELECT cohort_year, n_customers, n_orders, revenue,
       ROUND(n_orders / CAST(n_customers AS DOUBLE), 4) AS orders_per_customer,
       ROUND(revenue / CAST(n_orders AS DOUBLE), 2) AS aov,
       ROUND(revenue / CAST(n_customers AS DOUBLE), 2) AS revenue_per_customer
FROM cohort
"""

register(
    QuerySpec(
        "unit_economics_cohort",
        unit_economics_cohort,
        UNIT_ECON_SQL,
        doc="acquisition-cohort unit economics (orders/customer, AOV, revenue/customer)",
        cites="business-analytics family; exact decimal lifetime revenue",
        tags=("econ", "agg"),
    )
)


# --- vendor scorecard -------------------------------------------------------

SCORECARD_TOP = 15


def vendor_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: revenue, return rate, part breadth and average
    discount per supplier, combined into a rank-sum composite (rank by
    revenue DESC, return rate ASC, breadth DESC — integer ranks, so the
    composite is engine-exact). Top 15 vendors. One lineitem aggregation;
    the ranking windows run over the supplier-sized aggregate."""
    from analytics_data_platform_spark.queries.exact import sum_disc_price

    li = load_table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        sum_disc_price().alias("revenue"),
        F.round(
            F.sum((F.col("l_returnflag") == "R").cast("bigint")) / F.count(F.lit(1)), 6
        ).alias("return_rate"),
        F.count_distinct("l_partkey").alias("n_parts"),
    )
    # three independent global ranks from ONE materialized base (chained
    # with_global_order calls would re-evaluate every earlier stage)
    ranked = multi_global_ranks(
        per_supp,
        on=["suppkey"],
        specs=[
            dict(key="revenue", out="_r_rev", descending=True, tiebreaks=["suppkey"]),
            dict(key="return_rate", out="_r_ret", tiebreaks=["suppkey"]),
            dict(key="n_parts", out="_r_brd", descending=True, tiebreaks=["suppkey"]),
        ],
    )
    scored = ranked.select(
        "suppkey", "revenue", "return_rate", "n_parts",
        (F.col("_r_rev") + F.col("_r_ret") + F.col("_r_brd")).alias("rank_sum"),
    )
    return (
        scored.withColumn(
            "pos", F.row_number().over(Window.orderBy("rank_sum", "suppkey"))
        )
        .where(F.col("pos") <= SCORECARD_TOP)
        .select("pos", "suppkey", "revenue", "return_rate", "n_parts", "rank_sum")
    )


SCORECARD_SQL = f"""
WITH per_supp AS (
  SELECT l_suppkey AS suppkey,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
         ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               / CAST(COUNT(*) AS DOUBLE), 6) AS return_rate,
         COUNT(DISTINCT l_partkey) AS n_parts
  FROM lineitem GROUP BY l_suppkey
),
scored AS (
  SELECT suppkey, revenue, return_rate, n_parts,
         ROW_NUMBER() OVER (ORDER BY revenue DESC, suppkey)
         + ROW_NUMBER() OVER (ORDER BY return_rate ASC, suppkey)
         + ROW_NUMBER() OVER (ORDER BY n_parts DESC, suppkey) AS rank_sum
  FROM per_supp
)
SELECT pos, suppkey, revenue, return_rate, n_parts, CAST(rank_sum AS BIGINT) AS rank_sum
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rank_sum, suppkey) AS pos FROM scored
) WHERE pos <= {SCORECARD_TOP}
"""

register(
    QuerySpec(
        "vendor_scorecard",
        vendor_scorecard,
        SCORECARD_SQL,
        doc="supplier rank-sum scorecard (revenue, return rate, breadth)",
        cites="procurement-analytics family; integer rank composite",
        tags=("econ", "window"),
    )
)
