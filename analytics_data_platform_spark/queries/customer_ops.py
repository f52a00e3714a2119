"""Customer-behavior analytics query family: Pareto/RFM segmentation,
activity recency ("aliveness"), retention-adjacent revenue splits, path
and SLA analysis, churn hazard, and duplicate-invoice screening.

Split out of analytics_ops.py (same registry family, same audience —
the reference's interactive layer, SURVEY §3.3) purely to keep query
modules under the 1,500-line hygiene bound; every query keeps its name,
oracle, and tags. Shuffles key on high-cardinality ids (user_id /
c_custkey / o_orderkey), so the shapes hold at 100 TB. All entries are
DuckDB-oracle-backed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.functions.expr import spread
from analytics_data_platform_spark.operators.ordered import (
    multi_global_ranks,
    with_global_order,
)
from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.exact import sum_money
from analytics_data_platform_spark.sources.testdata import load_table


def pareto_customer_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: the smallest set of customers covering 80% of
    revenue, with each customer's cumulative share — "how concentrated is
    the business?". Per-customer revenue is rounded to exact cents, the
    ordered cumulative sum runs as a two-pass bucketed prefix scan
    (operators/ordered.py — |customers| grows with data, so a global
    window would single-reduce at 100 TB), and the 80% cutoff compares
    in cleared-integer form (10·prev_cum < 8·total) so the selected row
    set is engine-exact; the one division per output row happens last."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    per_cust = o.groupBy("o_custkey").agg(
        sum_money("o_totalprice").alias("revenue"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
    )
    tot = per_cust.agg(F.sum("cents").alias("tot_cents"))
    ranked = with_global_order(
        per_cust, "revenue", descending=True, tiebreaks=["o_custkey"],
        prefix_sums={"cum_cents": "cents"},
    ).crossJoin(F.broadcast(tot))
    return (
        # keep every customer whose PREVIOUS cumulative share was below
        # the cutoff: the minimal prefix reaching 80%
        ranked.where(
            (F.col("cum_cents") - F.col("cents")) * 10 < F.col("tot_cents") * 8
        )
        .select(
            "o_custkey",
            "revenue",
            F.round(F.col("cum_cents") / F.col("tot_cents"), 6).alias("cum_share"),
        )
    )


PARETO_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tot_cents FROM per_cust),
ranked AS (
  SELECT o_custkey, revenue, cents,
         CAST(SUM(cents) OVER (ORDER BY revenue DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
  FROM per_cust
)
SELECT o_custkey, revenue,
       ROUND(CAST(cum_cents AS DOUBLE) / tot_cents, 6) AS cum_share
FROM ranked, tot
WHERE (cum_cents - cents) * 10 < tot_cents * 8
"""

register(
    QuerySpec(
        "pareto_customer_share",
        pareto_customer_share,
        PARETO_SQL,
        doc="Pareto revenue concentration: minimal customer prefix reaching 80%",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "window"),
    )
)


RFM_ASOF = "1998-08-02"  # day after the last order date in the corpus


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation: each
    active customer scored 1-5 by NTILE quintile on days-since-last-order,
    order count, and rounded lifetime spend, plus the classic
    champion/loyal/at-risk/hibernating labels on the R×F grid.

    One groupBy(customer) computes all three metrics; the three quintile
    assignments share full-key tie-breaks (metric, custkey) so bucket
    boundaries are engine-deterministic. |customers| grows with data, so
    each NTILE runs as the distributed two-pass rank + closed-form tile
    formula (operators/ordered.py) instead of a global sort window —
    bucket assignment is provably identical to SQL NTILE over the same
    tie-broken order."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ASOF).cast("date"), F.max("o_orderdate")).alias("recency_days"),
        F.count("*").alias("frequency"),
        sum_money("o_totalprice").alias("monetary"),
    )
    # three independent quintiles from ONE materialized base + one
    # batched quantile pass (multi_global_ranks) — chaining three
    # ntile_distributed calls would re-evaluate the groupBy cascade
    scored = multi_global_ranks(
        per_cust,
        on=["o_custkey"],
        specs=[
            # 1 = most recent / most frequent / highest spend
            dict(key="recency_days", out="r_score", ntile=5, tiebreaks=["o_custkey"]),
            dict(key="frequency", out="f_score", ntile=5, descending=True, tiebreaks=["o_custkey"]),
            dict(key="monetary", out="m_score", ntile=5, descending=True, tiebreaks=["o_custkey"]),
        ],
    )
    scored = scored.select(
        "o_custkey", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .when(F.col("r_score") <= 2, "recent_casual")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "hibernating")
        .otherwise("middling")
    )
    return scored.withColumn("segment", seg)


RFM_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(o_orderdate), DATE '{RFM_ASOF}') AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, CAST(recency_days AS INT) AS recency_days, frequency, monetary,
         NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM per_cust
)
SELECT *,
       CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
            WHEN f_score <= 2 THEN 'loyal_lapsing'
            WHEN r_score <= 2 THEN 'recent_casual'
            WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
            ELSE 'middling' END AS segment
FROM scored
"""

register(
    QuerySpec(
        "rfm_segments",
        rfm_segments,
        RFM_SQL,
        doc="RFM quintile segmentation with champion/at-risk grid labels",
        cites="interactive-analytics surface (SURVEY §3.3 audience)",
        tags=("analytics", "window"),
    )
)


def conversion_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of view→purchase conversion latency: for each user
    whose first purchase follows their first view, the hours between,
    bucketed into an hour histogram — the "how long does conversion
    take?" follow-up to funnel_conversion. Two user-keyed min-aggregations
    and one small groupBy; integer epoch math end to end."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    first_purchase = (
        e.where(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .where(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"), F.min("view_ts").alias("view_ts2"))
    )
    hours = F.floor(
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts2")) / 3600
    )
    return (
        first_purchase.select(hours.alias("latency_hours"))
        .groupBy("latency_hours")
        .agg(F.count("*").alias("n_users"))
    )


CONV_LATENCY_SQL = """
WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
first_view AS (
  SELECT user_id, MIN(ts) AS view_ts FROM e WHERE event_type = 'view' GROUP BY user_id
),
first_purchase AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts, MIN(v.view_ts) AS view_ts2
  FROM e JOIN first_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= v.view_ts
  GROUP BY e.user_id
)
SELECT CAST(FLOOR((epoch(purchase_ts) - epoch(view_ts2)) / 3600) AS BIGINT) AS latency_hours,
       COUNT(*) AS n_users
FROM first_purchase
GROUP BY 1
"""

register(
    QuerySpec(
        "conversion_latency_histogram",
        conversion_latency_histogram,
        CONV_LATENCY_SQL,
        doc="view-to-purchase conversion latency histogram (hours)",
        cites="interactive-analytics surface; funnel_conversion companion",
        tags=("analytics", "window"),
    )
)


def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the windowed
    COUNT(DISTINCT) no engine can express as a plain window function.

    Scalable formulation: each (user, active-day) row contributes to the
    7 window-end days it falls in (sequence + explode — a bounded 7×
    row expansion), then ONE groupBy(day) distinct-count. This is the
    standard trick that turns an unbounded sliding-distinct into a
    shuffle keyed on (day), linear at any scale; the self-join
    formulation the oracle uses would be quadratic in window count.
    Reported days are restricted to days with any activity."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 86400).alias("d")
    )
    days = e.distinct()
    spine = days.select("d").distinct()
    contrib = days.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("win_d")
    )
    return (
        contrib.join(spine.withColumnRenamed("d", "win_d"), "win_d", "left_semi")
        .groupBy("win_d")
        .agg(F.count_distinct("user_id").alias("active_users_7d"))
        .select(F.col("win_d").alias("day_epoch"), "active_users_7d")
    )


ROLLING_DAU_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS d
  FROM events
),
spine AS (SELECT DISTINCT d FROM days)
SELECT s.d AS day_epoch, COUNT(DISTINCT y.user_id) AS active_users_7d
FROM spine s JOIN days y ON y.d BETWEEN s.d - 6 AND s.d
GROUP BY s.d
"""

register(
    QuerySpec(
        "rolling_7d_active_users",
        rolling_7d_active_users,
        ROLLING_DAU_SQL,
        doc="rolling 7-day distinct actives via contribution explode (no sliding-distinct window)",
        cites="interactive-analytics surface; scalable windowed-distinct pattern",
        tags=("analytics", "window"),
    )
)


def cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly new users + running cumulative uniques — the growth curve.

    Running COUNT(DISTINCT) needs no distinct at all: a user is "new" in
    exactly one hour (their min-hour row), so one user-keyed aggregation
    plus a tiny hour-level window gives the exact cumulative uniques.
    The groupBy(user) shuffle is the only data-sized move."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.unix_timestamp("ts") / 3600).alias("h")
    )
    first_hour = e.groupBy("user_id").agg(F.min("h").alias("h"))
    hourly_new = first_hour.groupBy("h").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return hourly_new.select(
        F.col("h").alias("hour_epoch"),
        "new_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    )


CUM_NEW_USERS_SQL = """
WITH e AS (
  SELECT user_id, CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h
  FROM events
),
first_hour AS (SELECT user_id, MIN(h) AS h FROM e GROUP BY user_id),
hourly_new AS (SELECT h, COUNT(*) AS new_users FROM first_hour GROUP BY h)
SELECT h AS hour_epoch, new_users,
       CAST(SUM(new_users) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cumulative_users
FROM hourly_new
"""

register(
    QuerySpec(
        "cumulative_new_users",
        cumulative_new_users,
        CUM_NEW_USERS_SQL,
        doc="hourly new users + exact running cumulative uniques (first-seen trick)",
        cites="interactive-analytics surface; growth-curve primitive",
        tags=("analytics", "window"),
    )
)


# Poisson(1) CDF thresholds: resample count k is the number of thresholds
# below the row's deterministic uniform draw.
_POIS_CDF = (
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)
BOOTSTRAP_B = 32


def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean order value: B=32 deterministic
    resamples computed in ONE pass — the scalable bootstrap (each row
    draws an independent Poisson(1) replication count per resample from
    a seeded md5 uniform, so no resample ever materializes and no
    sampling shuffle exists; the pass is embarrassingly parallel).

    Determinism: prices are converted to exact integer cents and summed
    as DECIMAL (order-independent), so each resample mean is bit-stable
    across engines and partitionings — the driver hashes all 32 rows."""
    # the orders scan is a handful of splits at test SFs while the per-row
    # hash work is large — spread() widens compute to the session's cores
    # (a no-op on real wide scans)
    o = spread(load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"))
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)")

    # Expressions are built as SQL strings (one py4j call per column, not
    # one per operator node — the fluent form spent ~2.5 s of DRIVER time
    # constructing 32x8 comparison Columns). Four 32-bit uniforms per md5:
    # resamples 4j..4j+3 slice hash j. The CDF inversion stays a chained
    # comparison — it codegens (an equivalent size(filter(...)) HOF form
    # executes interpreted and measured ~6x slower at sf0.1).
    def draw(b: int) -> str:
        u = (
            f"(CAST(conv(substring(md5(concat_ws('#', o_orderkey, {b // 4})), "
            f"{(b % 4) * 8 + 1}, 8), 16, 10) AS BIGINT) / 4294967296.0D)"
        )
        c = " + ".join(f"CAST({u} >= {t!r}D AS INT)" for t in _POIS_CDF)
        return f"({c}) AS c{b}"

    proj = o.select(
        cents.alias("cents"),
        *[F.expr(draw(b)) for b in range(BOOTSTRAP_B)],
    )
    wide = proj.agg(
        *[F.expr(e) for b in range(BOOTSTRAP_B) for e in (
            f"sum(cents * c{b}) AS s{b}", f"CAST(sum(c{b}) AS BIGINT) AS n{b}"
        )]
    )
    rows = F.expr(
        "array(" + ", ".join(
            f"struct({b} AS resample, n{b} AS n_eff, "
            f"round(CAST(s{b} AS DOUBLE) / n{b} / 100.0D, 4) AS resample_mean)"
            for b in range(BOOTSTRAP_B)
        ) + ")"
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def _bootstrap_sql() -> str:
    cols = []
    for b in range(BOOTSTRAP_B):
        u = (
            f"(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#{b // 4}'), "
            f"{(b % 4) * 8 + 1}, 8))::BIGINT / 4294967296.0)"
        )
        c = " + ".join(f"CASE WHEN {u} >= {t!r} THEN 1 ELSE 0 END" for t in _POIS_CDF)
        cols.append(f"({c}) AS c{b}")
    sums = ", ".join(
        f"SUM(cents * c{b}) AS s{b}, CAST(SUM(c{b}) AS BIGINT) AS n{b}"
        for b in range(BOOTSTRAP_B)
    )
    rows = " UNION ALL ".join(
        f"SELECT {b} AS resample, n{b} AS n_eff,"
        f" ROUND(CAST(s{b} AS DOUBLE) / n{b} / 100.0, 4) AS resample_mean FROM wide"
        for b in range(BOOTSTRAP_B)
    )
    return f"""
WITH proj AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS DECIMAL(18,0)) AS cents,
         {', '.join(cols)}
  FROM orders
),
wide AS (SELECT {sums} FROM proj)
{rows}
"""


register(
    QuerySpec(
        "bootstrap_mean_ci",
        bootstrap_mean_ci,
        _bootstrap_sql(),
        doc="Poisson bootstrap of mean order value (32 one-pass deterministic resamples)",
        cites="scalable resampling: Poisson bootstrap (Chamandy et al.)",
        tags=("analytics", "stats", "sampling"),
    )
)


# ---- time-constrained funnel ------------------------------------------------

_FUNNEL_WINDOW_H = 24


def timed_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel with per-step time budgets: first view → first click within
    24 h of that view → first purchase within 24 h of that click.
    `funnel_conversion` orders steps but never bounds the wait; bounded
    steps are what campaign/journey analysis actually measures.

    Greedy-earliest semantics make the chain unique and deterministic:
    v₀ = user's first view; c₀ = first click in (v₀, v₀+24h]; p₀ = first
    purchase in (c₀, c₀+24h]. Three user-keyed aggregations/joins (the
    sessionization shuffle key), integer epoch-µs arithmetic end to end;
    latency sums stay BIGINT seconds until two final rounded divisions.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    win = _FUNNEL_WINDOW_H * 3_600_000_000
    v0 = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v0"))
    )
    c0 = (
        e.where(F.col("event_type") == "click")
        .join(v0, "user_id")
        .where((F.col("us") > F.col("v0")) & (F.col("us") <= F.col("v0") + F.lit(win)))
        .groupBy("user_id")
        .agg(F.min("us").alias("c0"), F.min("v0").alias("v0"))
    )
    p0 = (
        e.where(F.col("event_type") == "purchase")
        .join(c0, "user_id")
        .where((F.col("us") > F.col("c0")) & (F.col("us") <= F.col("c0") + F.lit(win)))
        .groupBy("user_id")
        .agg(F.min("us").alias("p0"), F.min("c0").alias("c0"), F.min("v0").alias("v0"))
    )
    counts = (
        v0.agg(F.count(F.lit(1)).alias("users_view"))
        .crossJoin(c0.agg(F.count(F.lit(1)).alias("users_click_24h")))
        .crossJoin(
            p0.agg(
                F.count(F.lit(1)).alias("users_purchase_24h"),
                F.sum(F.expr("(c0 - v0) div 1000000")).alias("s_vc"),
                F.sum(F.expr("(p0 - c0) div 1000000")).alias("s_cp"),
            )
        )
    )
    return counts.selectExpr(
        "users_view",
        "users_click_24h",
        "users_purchase_24h",
        "round(CAST(s_vc AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_view_to_click_h",
        "round(CAST(s_cp AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_click_to_buy_h",
    )


def _timed_funnel_sql() -> str:
    win = _FUNNEL_WINDOW_H * 3_600_000_000
    return f"""
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v0 AS (SELECT user_id, MIN(us) AS v0 FROM ev WHERE event_type = 'view' GROUP BY 1),
c0 AS (
  SELECT e.user_id, MIN(e.us) AS c0, MIN(v.v0) AS v0
  FROM ev e JOIN v0 v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.us > v.v0 AND e.us <= v.v0 + {win}
  GROUP BY 1
),
p0 AS (
  SELECT e.user_id, MIN(e.us) AS p0, MIN(c.c0) AS c0, MIN(c.v0) AS v0
  FROM ev e JOIN c0 c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.us > c.c0 AND e.us <= c.c0 + {win}
  GROUP BY 1
),
agg AS (
  SELECT (SELECT COUNT(*) FROM v0) AS users_view,
         (SELECT COUNT(*) FROM c0) AS users_click_24h,
         (SELECT COUNT(*) FROM p0) AS users_purchase_24h,
         (SELECT CAST(SUM((c0 - v0) // 1000000) AS BIGINT) FROM p0) AS s_vc,
         (SELECT CAST(SUM((p0 - c0) // 1000000) AS BIGINT) FROM p0) AS s_cp
)
SELECT users_view, users_click_24h, users_purchase_24h,
       ROUND(CAST(s_vc AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_view_to_click_h,
       ROUND(CAST(s_cp AS DOUBLE) / users_purchase_24h / 3600.0, 4) AS avg_click_to_buy_h
FROM agg
"""


register(
    QuerySpec(
        "timed_funnel_conversion",
        timed_funnel_conversion,
        _timed_funnel_sql(),
        doc="funnel with 24h per-step budgets: greedy-earliest chains, integer epoch arithmetic",
        cites="bounded-step twin of funnel_conversion",
        tags=("analytics", "funnel", "behavior"),
    )
)


def benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit screen on order values — the follow-up test
    auditors run when the first digit passes (fabricated numbers often
    fake the leading digit but draw the second uniformly). Expected
    P(d₂=d) = Σ_{d₁=1..9} log10(1 + 1/(10·d₁+d)), written as the same
    fixed-order 9-term sum on both engines."""
    o = load_table(spark, sf_dir, "orders")
    digits = o.selectExpr(
        "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 2, 1) AS INT) AS d"
    ).where("d IS NOT NULL")
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    exp_case = _benford2_case()
    # deviation from the ROUNDED components: the 9-term log10 sums differ
    # between libm implementations in the last ulp, which flips the 6th
    # decimal exactly on rounding boundaries (verify-skill float rule)
    rounded = counts.selectExpr(
        "d",
        "n",
        "round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_p",
        f"round({exp_case}, 6) AS benford_p",
    )
    return rounded.selectExpr(
        "d", "n", "observed_p", "benford_p",
        "round(ABS(observed_p - benford_p), 6) AS abs_dev",
    ).orderBy("d")


def _benford2_case() -> str:
    """Expected second-digit probabilities as PRECOMPUTED literals — the
    9-term log10 sums evaluated per-engine disagree in the last ulp and
    flip the 6-decimal rounding; a shared Python-computed constant cannot."""
    import math

    def expected(d: int) -> float:
        return sum(math.log10(1 + 1.0 / (10 * d1 + d)) for d1 in range(1, 10))

    return (
        "CASE "
        + " ".join(f"WHEN d = {d} THEN CAST({expected(d)!r} AS DOUBLE)" for d in range(10))
        + " END"
    )


def _benford2_sql() -> str:
    exp_case = _benford2_case()
    return f"""
WITH digits AS (
  SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 2, 1) AS INT) AS d
  FROM orders
),
counts AS (SELECT d, COUNT(*) AS n FROM digits WHERE d IS NOT NULL GROUP BY d)
SELECT d, n, observed_p, benford_p,
       ROUND(ABS(observed_p - benford_p), 6) AS abs_dev
FROM (
  SELECT d, n,
         ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_p,
         ROUND({exp_case}, 6) AS benford_p
  FROM counts
) ORDER BY d
"""


register(
    QuerySpec(
        "benford_second_digit",
        benford_second_digit,
        _benford2_sql(),
        doc="Benford second-digit deviation screen (fixed-order expected-probability sums)",
        cites="forensic pair of benford_first_digit",
        tags=("analytics", "forensics", "stats"),
    )
)


def customer_aliveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn screen: for each repeat customer, the BG/NBD-flavored
    heuristic  log P(alive) = n · ln((T − recency)/T)  — a customer who
    ordered often (large n) but not recently (large recency) gets a very
    negative score. The log STAYS an integer (micro-nat quantization, the
    naive-Bayes idiom), so ranking needs no cross-engine libm exp and
    the output hash-verifies exactly. One orders aggregation; output the
    25 highest-value customers most likely to have churned."""
    o = load_table(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("t_end"))
    per = (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("o_orderdate").alias("last_order"),
            F.expr("CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)").alias(
                "rev_cents"
            ),
        )
        .where(F.col("n_orders") >= 3)
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_custkey",
            "n_orders",
            "rev_cents",
            F.expr("CAST(datediff(t_end, last_order) AS BIGINT)").alias("recency_days"),
            F.expr(
                "CAST(datediff(t_end, DATE'1992-01-01') AS BIGINT)"
            ).alias("t_days"),
        )
        .where(F.col("recency_days") < F.col("t_days"))
    )
    scored = per.select(
        "o_custkey",
        "n_orders",
        "recency_days",
        "rev_cents",
        F.expr(
            "n_orders * CAST(round(ln(CAST(t_days - recency_days AS DOUBLE) / t_days)"
            " * 1000000) AS BIGINT)"
        ).alias("log_p_alive_micronats"),
    )
    w = Window.orderBy("log_p_alive_micronats", F.desc("rev_cents"), "o_custkey")
    return (
        scored.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= 25)
        .select(
            "pos",
            F.col("o_custkey").alias("cust_key"),
            "n_orders",
            "recency_days",
            "rev_cents",
            "log_p_alive_micronats",
        )
    )


ALIVENESS_SQL = """
WITH horizon AS (SELECT MAX(o_orderdate) AS t_end FROM orders),
per AS (
  SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderdate) AS last_order,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
  HAVING COUNT(*) >= 3
),
feat AS (
  SELECT p.o_custkey, p.n_orders, p.rev_cents,
         CAST(date_diff('day', p.last_order, h.t_end) AS BIGINT) AS recency_days,
         CAST(date_diff('day', DATE '1992-01-01', h.t_end) AS BIGINT) AS t_days
  FROM per p, horizon h
),
scored AS (
  SELECT o_custkey, n_orders, recency_days, rev_cents,
         n_orders * CAST(ROUND(ln(CAST(t_days - recency_days AS DOUBLE) / t_days)
                               * 1000000) AS BIGINT) AS log_p_alive_micronats
  FROM feat WHERE recency_days < t_days
)
SELECT ROW_NUMBER() OVER (ORDER BY log_p_alive_micronats, rev_cents DESC, o_custkey) AS pos,
       o_custkey AS cust_key, n_orders, recency_days, rev_cents, log_p_alive_micronats
FROM scored
QUALIFY pos <= 25
ORDER BY pos
"""


register(
    QuerySpec(
        "customer_aliveness",
        customer_aliveness,
        ALIVENESS_SQL,
        doc="BG/NBD-style churn screen: n·ln((T-recency)/T) kept integer in micro-nats",
        cites="lifecycle family with rfm_segments/kaplan_meier; quantized-log idiom",
        tags=("analytics", "lifecycle", "ml"),
    )
)


def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per quarter, revenue split into NEW customers
    (first-ever order falls in that quarter — the first-seen trick, no
    sequential scan) vs returning ones. Exact cent sums; the shares are
    single divisions. The decomposition every board deck wants and every
    naive 'revenue is up' reading misses."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    q = F.expr(
        "CONCAT(CAST(year(o_orderdate) AS STRING), '-Q', CAST(quarter(o_orderdate) AS STRING))"
    )
    with_q = o.select(
        "o_custkey",
        q.alias("qtr"),
        F.expr("year(o_orderdate) * 10 + quarter(o_orderdate)").alias("qord"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    first_q = with_q.groupBy("o_custkey").agg(F.min("qord").alias("first_qord"))
    j = with_q.join(first_q, "o_custkey").select(
        "qtr",
        "qord",
        "cents",
        (F.col("qord") == F.col("first_qord")).cast("int").alias("is_new"),
    )
    return (
        j.groupBy("qtr", "qord")
        .agg(
            F.sum(F.expr("IF(is_new = 1, cents, 0)")).alias("new_cents"),
            F.sum(F.expr("IF(is_new = 0, cents, 0)")).alias("returning_cents"),
            F.sum(F.expr("is_new")).alias("n_new_orders"),
        )
        .selectExpr(
            "qtr",
            "new_cents",
            "returning_cents",
            "round(CAST(new_cents AS DOUBLE) / (new_cents + returning_cents), 6)"
            " AS new_share",
        )
        .orderBy("qord")
        .drop("qord")
    )


NEW_RETURNING_SQL = """
WITH with_q AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) || '-Q'
           || CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR) AS qtr,
         EXTRACT(year FROM o_orderdate) * 10 + EXTRACT(quarter FROM o_orderdate) AS qord,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
first_q AS (SELECT o_custkey, MIN(qord) AS first_qord FROM with_q GROUP BY 1)
SELECT w.qtr,
       CAST(SUM(CASE WHEN w.qord = f.first_qord THEN w.cents ELSE 0 END) AS BIGINT)
         AS new_cents,
       CAST(SUM(CASE WHEN w.qord <> f.first_qord THEN w.cents ELSE 0 END) AS BIGINT)
         AS returning_cents,
       ROUND(CAST(SUM(CASE WHEN w.qord = f.first_qord THEN w.cents ELSE 0 END) AS DOUBLE)
             / SUM(w.cents), 6) AS new_share
FROM with_q w JOIN first_q f ON w.o_custkey = f.o_custkey
GROUP BY w.qtr, w.qord
ORDER BY w.qord
"""


register(
    QuerySpec(
        "new_vs_returning_revenue",
        new_vs_returning_revenue,
        NEW_RETURNING_SQL,
        doc="quarterly revenue split into new vs returning customers (first-seen trick)",
        cites="growth accounting beside cumulative_new_users",
        tags=("analytics", "growth"),
    )
)


def bestseller_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stability of the top-20 bestseller list between adjacent quarters:
    |top20(q) ∩ top20(q+1)| / 20 — the assortment-churn metric. Ranks by
    exact cent revenue with part-key tie-break; the overlap is an integer
    set intersection, so every number is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    qrev = li.groupBy(
        F.expr("year(l_shipdate) * 10 + quarter(l_shipdate)").alias("qord"),
        "l_partkey",
    ).agg(
        F.expr(
            "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)"
        ).alias("rev")
    )
    w = Window.partitionBy("qord").orderBy(F.desc("rev"), "l_partkey")
    top = qrev.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 20)
    a, b = top.alias("a"), top.alias("b")
    return (
        a.join(b, F.col("a.qord") + 1 == F.col("b.qord"))
        .where(F.col("a.l_partkey") == F.col("b.l_partkey"))
        .groupBy(F.col("a.qord").alias("qord"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .selectExpr(
            "qord",
            "n_common",
            "round(CAST(n_common AS DOUBLE) / 20, 4) AS retention_of_top20",
        )
        .orderBy("qord")
    )


BESTSELLER_SQL = """
WITH qrev AS (
  SELECT EXTRACT(year FROM l_shipdate) * 10 + EXTRACT(quarter FROM l_shipdate) AS qord,
         l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS rev
  FROM lineitem GROUP BY 1, 2
),
top AS (
  SELECT qord, l_partkey,
         ROW_NUMBER() OVER (PARTITION BY qord ORDER BY rev DESC, l_partkey) AS rn
  FROM qrev QUALIFY rn <= 20
)
SELECT a.qord, COUNT(*) AS n_common,
       ROUND(CAST(COUNT(*) AS DOUBLE) / 20, 4) AS retention_of_top20
FROM top a JOIN top b ON a.qord + 1 = b.qord AND a.l_partkey = b.l_partkey
GROUP BY 1 ORDER BY 1
"""


register(
    QuerySpec(
        "bestseller_stability",
        bestseller_stability,
        BESTSELLER_SQL,
        doc="quarter-over-quarter retention of the top-20 bestseller set (exact overlap)",
        cites="assortment churn beside nation_rank_momentum",
        tags=("analytics", "ranking"),
    )
)


# --- session path analysis: top full event-type sequences ------------------

PATH_TOP = 15


def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the most common COMPLETE event-type sequences per
    30-min session ('view>click>purchase'), with session counts and the
    exact-decimal value total. Generalizes the first-order transition
    matrix (event_transition_matrix) to whole paths.

    Scale shape: sessionization and the ordered path concat share ONE
    user-keyed shuffle — the path is built by array_sort over collected
    (ts, event_id, type) structs inside the session group, not by a
    second ordering pass. Path cardinality, not event volume, feeds the
    final bounded top-k."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts", 1).over(w)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    is_new = F.when(prev.isNull() | (gap_us > 30 * 60 * 1000000), 1).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    per_session = (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                    lambda s: s.event_type,
                ),
                ">",
            ).alias("path"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sess_value"),
        )
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("sess_value").cast("double").alias("total_value"),
        )
        .withColumn("pos", F.row_number().over(Window.orderBy(F.desc("n_sessions"), "path")))
        .where(F.col("pos") <= PATH_TOP)
        .select("pos", "path", "n_sessions", "total_value")
    )


SESSION_PATH_SQL = f"""
WITH e AS (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts FROM events),
flagged AS (
  SELECT *,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id,
         STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path,
         SUM(CAST(value AS DECIMAL(18,2))) AS sess_value
  FROM sessions GROUP BY user_id, session_id
)
SELECT pos, path, n_sessions, total_value FROM (
  SELECT path, COUNT(*) AS n_sessions,
         CAST(SUM(sess_value) AS DOUBLE) AS total_value,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path) AS pos
  FROM per_session GROUP BY path
) WHERE pos <= {PATH_TOP}
"""

register(
    QuerySpec(
        "session_path_topk",
        session_path_topk,
        SESSION_PATH_SQL,
        doc="top complete session paths (ordered event-type sequences) with value totals",
        cites="path-analysis family; generalizes event_transition_matrix",
        tags=("analytics", "window", "text"),
    )
)


# --- SLA compliance: fulfilment-day percentiles per month ------------------

SLA_DAYS = 30


def sla_fulfilment_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational SLA report: per order-month, the p50/p90 fulfilment
    time (order date → last line shipped) selected by exact integer ROW
    POSITION (ceil(q·n), ties by order key — no interpolated quantiles,
    so the value is a real observation and engine-exact), plus the % of
    orders inside the 30-day SLA. One lineitem max-reduce, one month
    window for ranks."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    days = (
        li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("m"),
            F.greatest(F.datediff(F.to_date("done"), F.to_date("o_orderdate")), F.lit(0)).alias("d"),
        )
    )
    w_rank = Window.partitionBy("m").orderBy("d", "o_orderkey")
    w_m = Window.partitionBy("m")
    ranked = days.select(
        "m", "d",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_m).alias("n"),
    )
    return ranked.groupBy("m", "n").agg(
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.5), F.col("d"))).alias("p50_days"),
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * 0.9), F.col("d"))).alias("p90_days"),
        F.round(
            F.sum((F.col("d") <= SLA_DAYS).cast("bigint")) / F.col("n").cast("double"), 4
        ).alias("pct_within_sla"),
    ).select(F.col("m").alias("month"), "n", "p50_days", "p90_days", "pct_within_sla")


SLA_SQL = f"""
WITH days AS (
  SELECT o_orderkey, date_trunc('month', o_orderdate) AS m,
         GREATEST(date_diff('day', CAST(o_orderdate AS DATE), CAST(done AS DATE)), 0) AS d
  FROM (SELECT l_orderkey, MAX(l_shipdate) AS done FROM lineitem GROUP BY l_orderkey) x
  JOIN orders ON l_orderkey = o_orderkey
),
ranked AS (
  SELECT m, d,
         ROW_NUMBER() OVER (PARTITION BY m ORDER BY d, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY m) AS n
  FROM days
)
SELECT m AS month, n,
       MAX(CASE WHEN rn = CEIL(n * 0.5) THEN d END) AS p50_days,
       MAX(CASE WHEN rn = CEIL(n * 0.9) THEN d END) AS p90_days,
       ROUND(SUM(CASE WHEN d <= {SLA_DAYS} THEN 1 ELSE 0 END) / CAST(n AS DOUBLE), 4)
         AS pct_within_sla
FROM ranked GROUP BY m, n
"""

register(
    QuerySpec(
        "sla_fulfilment_percentiles",
        sla_fulfilment_percentiles,
        SLA_SQL,
        doc="monthly fulfilment p50/p90 by exact row position + SLA compliance rate",
        cites="ops-analytics family; position-selected percentiles, no interpolation",
        tags=("analytics", "window"),
    )
)


# --- discrete churn hazard by tenure month ---------------------------------

CHURN_CUTOFF = "1998-05-01"  # quarter before the corpus end: no orders after = churned


def churn_hazard_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time churn hazard: customers enter at their first order;
    tenure is measured in 90-day periods to their LAST order (censored at
    the cutoff). hazard(t) = churners-at-t / at-risk-at-t, the
    life-table form (Kaplan-Meier's sibling that reads as a per-period
    churn probability). at-risk counts come from a reverse cumulative
    window over the tenure histogram — one orders aggregation, one tiny
    window."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    span = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_o"), F.max("o_orderdate").alias("last_o")
    )
    cutoff = F.to_timestamp(F.lit(CHURN_CUTOFF))
    per_cust = span.select(
        F.expr("CAST(datediff(to_date(last_o), to_date(first_o)) div 90 AS BIGINT)").alias("tenure_p"),
        (F.col("last_o") < cutoff).cast("int").alias("churned"),
    )
    hist = per_cust.groupBy("tenure_p").agg(
        F.count(F.lit(1)).alias("ended_here"),
        F.sum("churned").alias("churned_here"),
    )
    w_risk = Window.orderBy(F.desc("tenure_p")).rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.select(
            "tenure_p", "churned_here",
            F.sum("ended_here").over(w_risk).alias("at_risk"),
        )
        .select(
            "tenure_p", "churned_here", "at_risk",
            F.round(F.col("churned_here") / F.col("at_risk").cast("double"), 4).alias("hazard"),
        )
        .orderBy("tenure_p")
    )


CHURN_SQL = f"""
WITH span AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_o, MAX(o_orderdate) AS last_o
  FROM orders GROUP BY o_custkey
),
per_cust AS (
  SELECT CAST(date_diff('day', CAST(first_o AS DATE), CAST(last_o AS DATE)) // 90 AS BIGINT)
           AS tenure_p,
         CASE WHEN last_o < TIMESTAMP '{CHURN_CUTOFF}' THEN 1 ELSE 0 END AS churned
  FROM span
),
hist AS (
  SELECT tenure_p, COUNT(*) AS ended_here, CAST(SUM(churned) AS BIGINT) AS churned_here
  FROM per_cust GROUP BY tenure_p
)
SELECT tenure_p, churned_here,
       CAST(SUM(ended_here) OVER (ORDER BY tenure_p DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS at_risk,
       ROUND(churned_here / CAST(SUM(ended_here) OVER (ORDER BY tenure_p DESC
                                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE), 4)
         AS hazard
FROM hist
ORDER BY tenure_p
"""

register(
    QuerySpec(
        "churn_hazard_by_tenure",
        churn_hazard_by_tenure,
        CHURN_SQL,
        doc="discrete life-table churn hazard per 90-day tenure period",
        cites="retention family; kaplan_meier_retention's per-period sibling",
        tags=("analytics", "window", "survival"),
    )
)


# --- duplicate-invoice screen (fraud/ops audit) ----------------------------

DUP_INV_WINDOW_DAYS = 7
DUP_INV_TOP = 20


def duplicate_invoice_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: pairs of orders from the SAME customer
    with the IDENTICAL total (exact cents) within 7 days — the classic
    accounts-payable audit. The self-join is an EQUI-join on
    (custkey, amount_cents) — the date window is a post-filter — so
    candidate volume is bounded by per-(customer, amount) multiplicity,
    never orders². Top pairs by narrowest gap."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.cents") == F.col("b.cents"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
    ).select(
        F.col("a.o_custkey").alias("custkey"),
        F.col("a.o_orderkey").alias("order_1"),
        F.col("b.o_orderkey").alias("order_2"),
        F.col("a.cents").alias("cents"),
        F.abs(F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))).alias("day_gap"),
    ).where(F.col("day_gap") <= DUP_INV_WINDOW_DAYS)
    w = Window.orderBy("day_gap", "custkey", "order_1", "order_2")
    return (
        pairs.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= DUP_INV_TOP)
        .select("pos", "custkey", "order_1", "order_2", "cents", "day_gap")
    )


DUP_INV_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
pairs AS (
  SELECT a.o_custkey AS custkey, a.o_orderkey AS order_1, b.o_orderkey AS order_2,
         a.cents,
         ABS(date_diff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)))
           AS day_gap
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.cents = b.cents AND a.o_orderkey < b.o_orderkey
)
SELECT pos, custkey, order_1, order_2, cents, day_gap FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY day_gap, custkey, order_1, order_2) AS pos
  FROM pairs WHERE day_gap <= {DUP_INV_WINDOW_DAYS}
) WHERE pos <= {DUP_INV_TOP}
"""

register(
    QuerySpec(
        "duplicate_invoice_screen",
        duplicate_invoice_screen,
        DUP_INV_SQL,
        doc="same-customer same-amount orders within 7 days (AP audit screen)",
        cites="fraud/ops audit family; equi-join on (customer, exact cents)",
        tags=("analytics", "dq", "join"),
    )
)
