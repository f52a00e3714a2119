"""Extended relational coverage: rollup/grouping sets, full-outer join,
window frames — operators the reference never needed (SURVEY §2 notes
"available for free in Spark") but a lakehouse user reaches for daily;
included so the engine's surface is complete, each with a DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.operators.ordered import (
    ntile_distributed,
    top_n_with_pos,
    with_global_order,
)
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.exact import money, sum_money
from analytics_data_platform_spark.sources.testdata import load_table


def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: 15-minute epoch-aligned buckets per
    event_type (the continuous-aggregate shape; integer epoch math so the
    bucket boundary is bit-identical to DuckDB's time_bucket)."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(F.floor(F.unix_timestamp("ts") / 900) * 900)
    return (
        e.groupBy(bucket.alias("bucket_start"), "event_type")
        .agg(F.count("*").alias("n_events"), sum_money("value").alias("value_sum"))
    )


TIME_BUCKET_SQL = """
WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start, event_type,
       COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM e
GROUP BY 1, 2
"""

register(
    QuerySpec(
        "time_bucket_rollup",
        time_bucket_rollup,
        TIME_BUCKET_SQL,
        doc="hypertable-style time-bucket rollup (15-min continuous aggregate)",
        cites="custom operator family (brief: hypertable rollup)",
        tags=("agg", "datetime"),
    )
)


def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): subtotals + grand total in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), sum_money("o_totalprice").alias("revenue"))
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

register(
    QuerySpec(
        "rollup_order_revenue",
        rollup_order_revenue,
        ROLLUP_SQL,
        doc="ROLLUP hierarchy totals (subtotals + grand total)",
        cites="SURVEY §2.4 note: grouping sets free in Spark",
        tags=("agg", "rollup"),
    )
)


def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase event picks up the latest prior
    click (same user). Single-shuffle union+window formulation
    (operators.asof) verified against DuckDB's native ASOF JOIN."""
    from analytics_data_platform_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.round("value", 2).alias("click_value")
    )
    out = asof_join(purchases, clicks, ["user_id"], value_cols=["click_id", "click_value"], suffix="")
    return out.select("purchase_id", "user_id", "click_id", "click_value")


ASOF_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
p AS (SELECT user_id, ts, event_id AS purchase_id FROM e WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, event_id AS click_id, ROUND(value, 2) AS click_value
      FROM e WHERE event_type = 'click')
SELECT p.purchase_id, p.user_id, c.click_id, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

register(
    QuerySpec(
        "asof_purchase_click",
        asof_purchase_click,
        ASOF_SQL,
        doc="backward as-of join (latest prior event per key)",
        cites="custom temporal operator (brief: as-of join); operators/asof.py",
        bench=True,
        tags=("join", "asof"),
    )
)


def full_outer_nation_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of per-nation customer vs (filtered) supplier books —
    unmatched sides surface as NULLs."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(sum_money("c_acctbal").alias("customer_balance"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(sum_money("s_acctbal").alias("supplier_balance"))
    )
    return c.join(s, on="nationkey", how="full_outer").select(
        "nationkey", "customer_balance", "supplier_balance"
    )


FULL_OUTER_SQL = """
WITH c AS (
  SELECT c_nationkey AS nationkey, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS customer_balance
  FROM customer GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nationkey, CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supplier_balance
  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, customer_balance, supplier_balance
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""

register(
    QuerySpec(
        "full_outer_nation_balances",
        full_outer_nation_balances,
        FULL_OUTER_SQL,
        doc="full-outer join with NULL-extended unmatched sides",
        cites="SURVEY §2.3 note: no full-outer in reference; completeness",
        tags=("join",),
    )
)


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame per user over event time."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(money("value")).over(w).cast("double").alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


RUNNING_SQL = """
WITH e AS (SELECT event_id, user_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
       COUNT(*) OVER w AS running_n
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
"""

register(
    QuerySpec(
        "running_user_totals",
        running_user_totals,
        RUNNING_SQL,
        doc="running aggregates with explicit ROWS window frame",
        cites="SURVEY §2.5 note: full Window API available",
        tags=("window",),
    )
)


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per priority (percentile_cont
    semantics — Spark's percentile() and DuckDB's percentile_cont use the
    same linear interpolation; verified by the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_price"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99_price"),
    )


PERCENTILE_SQL = """
SELECT o_orderpriority,
       ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 2)
         AS median_price,
       ROUND(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 2)
         AS p90_price,
       ROUND(CAST(percentile_cont(0.99) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 2)
         AS p99_price
FROM orders
GROUP BY o_orderpriority
"""

register(
    QuerySpec(
        "price_percentiles",
        price_percentiles,
        PERCENTILE_SQL,
        doc="exact interpolated percentiles (median/p90/p99) per group",
        cites="SURVEY §2.4 note: no approx aggregates in reference; exact quantiles",
        tags=("agg", "percentile"),
    )
)


def rolling_value_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, sum of values within the trailing
    10 minutes of event time (time-based frame, not row-based)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-10 * 60 * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(money("value")).over(w).cast("double").alias("trailing_10m_value"),
        F.count("*").over(w).alias("trailing_10m_events"),
    )


RANGE_WINDOW_SQL = """
WITH e AS (SELECT event_id, user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events)
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS trailing_10m_value,
       COUNT(*) OVER w AS trailing_10m_events
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY tsu
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""

register(
    QuerySpec(
        "rolling_value_range_window",
        rolling_value_range_window,
        RANGE_WINDOW_SQL,
        doc="time-based RANGE window frame (trailing 10-minute aggregates)",
        cites="SURVEY §2.5 note: explicit frames available",
        tags=("window",),
    )
)


def user_first_last_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last event per user via min/max struct packing (one shuffle,
    no full-frame window scan)."""
    e = load_table(spark, sf_dir, "events")
    packed = F.struct("ts", "event_id", "event_type")
    return (
        e.groupBy("user_id")
        .agg(F.min(packed).alias("first_e"), F.max(packed).alias("last_e"))
        .select(
            "user_id",
            F.col("first_e.event_id").alias("first_event_id"),
            F.col("first_e.event_type").alias("first_event_type"),
            F.col("last_e.event_id").alias("last_event_id"),
            F.col("last_e.event_type").alias("last_event_type"),
        )
    )


FIRST_LAST_SQL = """
WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT a.user_id,
       a.event_id AS first_event_id, a.event_type AS first_event_type,
       d.event_id AS last_event_id, d.event_type AS last_event_type
FROM ranked a JOIN ranked d ON a.user_id = d.user_id AND a.rn_a = 1 AND d.rn_d = 1
"""

register(
    QuerySpec(
        "user_first_last_events",
        user_first_last_events,
        FIRST_LAST_SQL,
        doc="first/last per key via ordered-struct min/max (single shuffle)",
        cites="scale pattern: argmin/argmax without window sort",
        tags=("agg", "window"),
    )
)


def ranking_windows_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family windows in one pass: percent_rank / cume_dist /
    ntile(4) per priority, ordered by (totalprice, orderkey) — the order
    key is made unique so tile assignment is deterministic across
    engines. One shuffle on the partition key; all three functions share
    the same window frame so Spark evaluates them in a single Window
    operator."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.ntile(4).over(w).alias("quartile"),
    )


RANKING_SQL = """
SELECT o_orderkey, o_orderpriority,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume_dist,
       NTILE(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""

register(
    QuerySpec(
        "ranking_windows_order_values",
        ranking_windows_order_values,
        RANKING_SQL,
        doc="percent_rank/cume_dist/ntile in one shared window pass",
        cites="SURVEY §2.5 note: full Window API beyond the reference's lag",
        tags=("window",),
    )
)


def customer_year_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics): customers ordering in
    both 1995 and 1996 vs only-1995 vs only-1996, tagged in one result.
    Spark plans set ops as aggregated joins on the same key — the three
    branches reuse one exchange of each year's distinct key set."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    both = y95.intersect(y96).select(F.lit("both").alias("tag"), "o_custkey")
    only95 = y95.subtract(y96).select(F.lit("only_1995").alias("tag"), "o_custkey")
    only96 = y96.subtract(y95).select(F.lit("only_1996").alias("tag"), "o_custkey")
    return both.unionByName(only95).unionByName(only96)


SETOPS_SQL = """
WITH y95 AS (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995),
     y96 AS (SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996)
SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT 'only_1995', o_custkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
UNION ALL
SELECT 'only_1996', o_custkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
"""

register(
    QuerySpec(
        "customer_year_set_ops",
        customer_year_set_ops,
        SETOPS_SQL,
        doc="INTERSECT/EXCEPT distinct set operations, tagged union output",
        cites="SURVEY §2.7 note: reference lacks INTERSECT/EXCEPT — beyond-parity",
        tags=("setop",),
    )
)


def lineitem_price_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: stddev/variance (sample),
    Pearson correlation, covariance — one partial-aggregable pass (every
    moment is a sum-of-powers; map-side combine does the heavy lifting
    at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
    )


STATS_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS price_stddev,
       ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
       ROUND(CORR(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS qty_disc_covar
FROM lineitem GROUP BY l_returnflag
"""

register(
    QuerySpec(
        "lineitem_price_statistics",
        lineitem_price_statistics,
        STATS_SQL,
        doc="statistical aggregates: stddev/variance/correlation/covariance",
        cites="SURVEY §2.4: aggregate family beyond count/sum/avg",
        tags=("agg", "stats"),
    )
)


def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile (equi-depth) histogram of order values: NTILE(10) over the
    exact total order (o_totalprice, o_orderkey tie-break — without the
    unique key, ties would make bucket boundaries engine-dependent).
    The profiling primitive behind CBO histograms and drift monitors.
    Exact NTILE over |orders| rows without a one-task sort: the
    distributed two-pass rank (operators/ordered.py — approx-quantile
    bucket cut-points for balance, exact in-bucket ranks + cross-bucket
    offsets for correctness) feeds the closed-form tile formula, so the
    plan parallelizes while bucket counts stay oracle-exact."""
    o = load_table(spark, sf_dir, "orders")
    return (
        ntile_distributed(
            o.select("o_totalprice", "o_orderkey"),
            "o_totalprice", 10, "decile", tiebreaks=["o_orderkey"],
        )
        .select("o_totalprice", "decile")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
            sum_money("o_totalprice").alias("total_value"),
        )
    )


EQUI_DEPTH_SQL = """
SELECT decile, COUNT(*) AS n_orders,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
"""

register(
    QuerySpec(
        "equi_depth_histogram",
        equi_depth_histogram,
        EQUI_DEPTH_SQL,
        doc="decile equi-depth histogram of order values (deterministic NTILE)",
        cites="SURVEY §2.4/§4: optimizer statistics; profiling primitive",
        tags=("agg", "profile"),
    )
)


GAP_BUCKET_S = 21600  # 6-hour buckets


def gap_fill_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user time series with gap filling: a 6-hour bucket spine
    from each user's first to last event, empty buckets filled by LOCF
    (last observation carried forward) — the resampling step every
    time-series feature pipeline needs before a model sees the data.

    The spine is `sequence()` over integer epoch buckets exploded per
    user (no driver loop, no cross join against a global calendar — each
    user generates exactly their own span), then one left join back to
    the observed bucket averages and one ordered window for the
    carry-forward. Shuffles are keyed on user_id throughout, so the plan
    is a linear pass at any scale; bucket keys stay integer epochs end
    to end (timezone-proof and hash-stable)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / GAP_BUCKET_S) * GAP_BUCKET_S).alias("bucket_epoch"),
        "value",
    )
    observed = e.groupBy("user_id", "bucket_epoch").agg(
        F.round(F.avg("value"), 6).alias("bucket_value")
    )
    spine = (
        observed.groupBy("user_id")
        .agg(F.min("bucket_epoch").alias("lo"), F.max("bucket_epoch").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(GAP_BUCKET_S))).alias("bucket_epoch"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(observed, ["user_id", "bucket_epoch"], "left")
        .select(
            "user_id",
            "bucket_epoch",
            F.last("bucket_value", ignorenulls=True).over(w).alias("value_filled"),
            F.col("bucket_value").isNull().alias("is_gap"),
        )
    )


GAP_FILL_SQL = f"""
WITH e AS (
  SELECT user_id,
         (CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / {GAP_BUCKET_S}) AS BIGINT)) * {GAP_BUCKET_S} AS bucket_epoch,
         value
  FROM events
),
observed AS (
  SELECT user_id, bucket_epoch, ROUND(AVG(value), 6) AS bucket_value
  FROM e GROUP BY user_id, bucket_epoch
),
spans AS (
  SELECT user_id, MIN(bucket_epoch) AS lo, MAX(bucket_epoch) AS hi
  FROM observed GROUP BY user_id
),
spine AS (
  SELECT user_id, UNNEST(generate_series(lo, hi, {GAP_BUCKET_S})) AS bucket_epoch
  FROM spans
)
SELECT s.user_id, s.bucket_epoch,
       LAST_VALUE(o.bucket_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket_epoch
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_filled,
       o.bucket_value IS NULL AS is_gap
FROM spine s
LEFT JOIN observed o ON s.user_id = o.user_id AND s.bucket_epoch = o.bucket_epoch
"""

register(
    QuerySpec(
        "gap_fill_user_values",
        gap_fill_user_values,
        GAP_FILL_SQL,
        doc="per-user time-series gap fill (dense bucket spine + LOCF)",
        cites="hypertable resampling / interpolation family",
        tags=("timeseries", "window"),
    )
)


# ---- top-k WITH TIES + Gini mean difference --------------------------------


def top_parts_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top parts by total shipped quantity using WITH-TIES semantics
    (dense_rank ≤ 3): every part on a tied total is kept, so the result
    is value-determined — unlike row_number top-k, no arbitrary ordering
    inside ties ever reaches the output.

    Distributed shape: dense_rank ≤ k over a data-linear aggregate never
    needs a global window — the k highest DISTINCT totals come from a
    distinct-aggregate + TakeOrderedAndProject (operators/ordered.py
    top_n_with_pos), and a broadcast semi-join attaches the rank to
    every tied part."""
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty")
    )
    top_vals = top_n_with_pos(
        totals.select("total_qty").distinct(),
        [F.desc("total_qty")], 3, pos_col="qty_rank",
    )
    return (
        totals.join(F.broadcast(top_vals), "total_qty")
        .select(F.col("l_partkey").alias("part_key"), "total_qty", "qty_rank")
        .orderBy("qty_rank", "part_key")
    )


TOP_TIES_SQL = """
WITH totals AS (
  SELECT l_partkey AS part_key, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT part_key, total_qty, DENSE_RANK() OVER (ORDER BY total_qty DESC) AS qty_rank
  FROM totals
)
SELECT part_key, total_qty, qty_rank FROM ranked
WHERE qty_rank <= 3 ORDER BY qty_rank, part_key
"""


register(
    QuerySpec(
        "top_parts_with_ties",
        top_parts_with_ties,
        TOP_TIES_SQL,
        doc="top-3 totals WITH TIES (dense_rank): value-determined top-k, no arbitrary tie order",
        cites="ordering family; complements row_number top-k (latest_event_per_user)",
        tags=("window", "ranking"),
    )
)


def gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini mean difference of order value per priority — the mean
    |xᵢ−xⱼ| over ALL pairs, computed WITHOUT the O(n²) pair join via the
    rank linearization  GMD = 2·Σᵢ(2i−n−1)·x₍ᵢ₎ / (n(n−1)).

    One per-group sort window gives the order statistics; the weighted
    sum is exact BIGINT (values quantized to whole dollars so the
    rank-weight products stay in range at 100×), and only the final
    normalization divides. The same trick turns any pairwise-L1
    statistic into a sort + prefix weights — the scale story the naive
    formulation lacks entirely."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(round(o_totalprice) AS BIGINT)").alias("usd"),
        "o_orderkey",
    )
    w = Window.partitionBy("priority").orderBy("usd", "o_orderkey")
    ranked = vals.select(
        "priority",
        "usd",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.min("n").alias("n_orders"),
            F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("usd")).alias("s"),
        )
        .selectExpr(
            "priority",
            "n_orders",
            "round(2.0 * CAST(s AS DOUBLE) / (CAST(n_orders AS DOUBLE) * (n_orders - 1)), 4)"
            " AS gini_mean_diff_usd",
        )
        .orderBy("priority")
    )


GMD_SQL = """
WITH vals AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice) AS BIGINT) AS usd,
         o_orderkey
  FROM orders
),
ranked AS (
  SELECT priority, usd,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY usd, o_orderkey) AS i,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM vals
)
SELECT priority, CAST(MIN(n) AS BIGINT) AS n_orders,
       ROUND(2.0 * CAST(CAST(SUM((2 * i - n - 1) * usd) AS BIGINT) AS DOUBLE)
             / (CAST(MIN(n) AS DOUBLE) * (MIN(n) - 1)), 4) AS gini_mean_diff_usd
FROM ranked GROUP BY priority ORDER BY priority
"""


register(
    QuerySpec(
        "gini_mean_difference",
        gini_mean_difference,
        GMD_SQL,
        doc="exact pairwise mean |xi-xj| per priority via rank linearization (no pair join)",
        cites="dispersion family with gini_customer_revenue; O(n log n) rewrite of an O(n^2) statistic",
        tags=("stats", "window", "econ"),
    )
)


def spearman_qty_vs_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between two part rankings — total shipped
    quantity vs total revenue. With unique ranks (integer-position, part
    key tie-break) the statistic is EXACT until one final division:
    ρ = 1 − 6·Σd² / (n(n²−1)), every term BIGINT. Rank correlation
    completes the association family next to Pearson (corr_matrix) and
    the contingency chi-square."""
    li = load_table(spark, sf_dir, "lineitem")
    totals = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        F.expr("CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)").alias(
            "rev"
        ),
    )
    # two distributed global ranks (|parts| grows with data — no global
    # sort window; operators/ordered.py two-pass scan)
    ranked = with_global_order(
        totals, "qty", descending=True, tiebreaks=["l_partkey"], rank_col="rank_qty"
    )
    ranked = with_global_order(
        ranked, "rev", descending=True, tiebreaks=["l_partkey"], rank_col="rank_rev"
    ).select("l_partkey", "rank_qty", "rank_rev")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(
            (F.col("rank_qty") - F.col("rank_rev")) * (F.col("rank_qty") - F.col("rank_rev"))
        ).alias("sum_d2"),
    ).selectExpr(
        "n_parts",
        "sum_d2",
        "round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)"
        " / (CAST(n_parts AS DOUBLE) * (CAST(n_parts AS DOUBLE) * n_parts - 1)), 6)"
        " AS spearman_rho",
    )


SPEARMAN_SQL = """
WITH totals AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
ranked AS (
  SELECT l_partkey,
         ROW_NUMBER() OVER (ORDER BY qty DESC, l_partkey) AS rank_qty,
         ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey) AS rank_rev
  FROM totals
)
SELECT COUNT(*) AS n_parts,
       CAST(SUM((rank_qty - rank_rev) * (rank_qty - rank_rev)) AS BIGINT) AS sum_d2,
       ROUND(1.0 - 6.0 * CAST(SUM((rank_qty - rank_rev) * (rank_qty - rank_rev)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) * COUNT(*) - 1)), 6)
         AS spearman_rho
FROM ranked
"""


register(
    QuerySpec(
        "spearman_qty_vs_revenue",
        spearman_qty_vs_revenue,
        SPEARMAN_SQL,
        doc="Spearman rank correlation of part quantity vs revenue rankings (exact sum of d^2)",
        cites="association family: rank twin of corr_matrix_lineitem",
        tags=("stats", "ranking"),
    )
)


def weighted_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-WEIGHTED median order value per market segment: the order
    value at which half the segment's revenue sits below — the "typical
    dollar's order size", which an unweighted median understates whenever
    big orders carry the revenue. Selection by cumulative integer weight
    (first order whose running revenue share reaches 50%) — one sort
    window over exact cents, no interpolation, engine-stable."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    vals = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    ws = Window.partitionBy("segment")
    ranked = vals.select(
        "segment",
        "cents",
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cents").over(ws).alias("tot"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    hits = ranked.where(F.col("cum") * 2 >= F.col("tot"))
    return (
        hits.groupBy("segment")
        .agg(
            F.min("n").alias("n_orders"),
            F.min(F.struct("cum", "cents")).alias("m"),
        )
        .selectExpr(
            "segment",
            "n_orders",
            "round(CAST(m.cents AS DOUBLE) / 100.0, 2) AS weighted_median_value",
        )
        .orderBy("segment")
    )


WEIGHTED_MEDIAN_SQL = """
WITH vals AS (
  SELECT c.c_mktsegment AS segment,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
         o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
ranked AS (
  SELECT segment, cents,
         CAST(SUM(cents) OVER (PARTITION BY segment ORDER BY cents, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(cents) OVER (PARTITION BY segment) AS BIGINT) AS tot,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM vals
),
hits AS (SELECT * FROM ranked WHERE cum * 2 >= tot),
best AS (
  SELECT segment, n, cents,
         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY cum, cents) AS rk
  FROM hits
)
SELECT segment, CAST(n AS BIGINT) AS n_orders,
       ROUND(cents / 100.0, 2) AS weighted_median_value
FROM best WHERE rk = 1 ORDER BY segment
"""


register(
    QuerySpec(
        "weighted_median_order_value",
        weighted_median_order_value,
        WEIGHTED_MEDIAN_SQL,
        doc="revenue-weighted median order value per segment (cumulative integer-weight selection)",
        cites="weighted twin of price_percentiles; cumulative idiom of pareto_customer_share",
        tags=("stats", "window", "econ"),
    )
)


# --- 2-D skyline (Pareto frontier) ------------------------------------------


def skyline_parts_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts on the (cheapest, largest) Pareto frontier —
    no other part is both cheaper-or-equal AND larger-or-equal with one
    strict. In 2-D the skyline needs NO pairwise dominance join: sort by
    (price asc, size desc) and keep rows whose size strictly exceeds the
    running max of everything cheaper — one window over the part
    dimension instead of the textbook O(n²) self-join. Prices compare in
    exact cents."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    # exclusive running max in the global (price asc, size desc) order,
    # via the distributed two-pass scan (operators/ordered.py) — |parts|
    # grows with data, so a global window would single-reduce at 100 TB
    flagged = with_global_order(
        p, "price_cents",
        tiebreaks=[F.desc("size"), F.asc("p_partkey")],
        prefix_maxes_excl={"best_prev": "size"},
    )
    return (
        flagged.where(F.col("best_prev").isNull() | (F.col("size") > F.col("best_prev")))
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "p_partkey")
    )


SKYLINE_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
),
flagged AS (
  SELECT p_partkey, price_cents, size,
         MAX(size) OVER (ORDER BY price_cents ASC, size DESC, p_partkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
  FROM p
)
SELECT p_partkey, price_cents, size
FROM flagged WHERE best_prev IS NULL OR size > best_prev
ORDER BY price_cents, p_partkey
"""

register(
    QuerySpec(
        "skyline_parts_price_size",
        skyline_parts_price_size,
        SKYLINE_SQL,
        doc="2-D Pareto frontier (skyline) via running-max window, no dominance self-join",
        cites="skyline-operator family; O(n log n) instead of O(n^2)",
        tags=("window", "topk"),
    )
)


def spend_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK over per-customer lifetime spend, rolled into 20
    equal-width percentile bands — the distribution-position profile
    (who sits in the top 5%?) that NTILE's equal-COUNT buckets cannot
    express when the question is about score position, not population.

    percent_rank = (rank-1)/(total-1) needs a global rank AND the grand
    total; both come from ONE two-pass distributed scan
    (operators/ordered.py::with_global_order with total_count_col — the
    total rides the ≤64-row bucket-totals frame, no extra count job) —
    never a single-partition window over all customers. Spend is summed
    in DECIMAL(18,2) (exact, order-independent); the band id is a single
    identical double expression in both engines, so boundaries cannot
    drift cross-engine.
    """
    o = load_table(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("spend_d"))
    )
    ranked = with_global_order(
        spend, "spend_d", tiebreaks=["o_custkey"],
        rank_col="rk", total_count_col="n",
    )
    # n == 1 would make percent_rank 0/0 (engine-dependent NaN): a single
    # customer is band 0 by definition, matching SQL's NULLIF guard
    pct = F.when(
        F.col("n") > 1,
        (F.col("rk") - 1).cast("double") / (F.col("n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    band = F.least(F.floor(pct * 20), F.lit(19)).cast("int")
    return (
        ranked.select(F.col("spend_d"), band.alias("band"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("spend_d").cast("double").alias("lo_spend"),
            F.max("spend_d").cast("double").alias("hi_spend"),
            F.sum("spend_d").cast("double").alias("total_spend"),
        )
    )


SPEND_PCTL_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_d
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT spend_d,
         ROW_NUMBER() OVER (ORDER BY spend_d, o_custkey) AS rk,
         COUNT(*) OVER () AS n
  FROM spend
)
SELECT CAST(LEAST(FLOOR(COALESCE(CAST(rk - 1 AS DOUBLE) / NULLIF(CAST(n - 1 AS DOUBLE), 0), 0) * 20), 19) AS INT) AS band,
       COUNT(*) AS n_customers,
       CAST(MIN(spend_d) AS DOUBLE) AS lo_spend,
       CAST(MAX(spend_d) AS DOUBLE) AS hi_spend,
       CAST(SUM(spend_d) AS DOUBLE) AS total_spend
FROM ranked
GROUP BY 1
"""

register(
    QuerySpec(
        "spend_percentile_bands",
        spend_percentile_bands,
        SPEND_PCTL_SQL,
        doc="percent_rank spend bands via the two-pass distributed global rank",
        cites="profiling family: score-position distribution (PERCENT_RANK)",
        tags=("analytics", "ordered"),
    )
)
