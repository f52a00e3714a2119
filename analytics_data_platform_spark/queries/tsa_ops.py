"""Time-series analysis: autocorrelation of the daily-revenue series.

The ACF is the diagnostic behind every seasonality/forecasting decision
(which lags matter → which features a forecast model needs). The classic
estimator divides two mean-centered sums — float accumulation whose value
depends on reduction order, so it can never hash-match an oracle. This
formulation clears the denominator instead: with S = Σx and n = |series|,

    acf(k) = Σᵢ (n·xᵢ − S)(n·xᵢ₊ₖ − S)  /  Σᵢ (n·xᵢ − S)²

both sums are EXACT BIGINT (daily revenue quantized to integer k$ keeps
every product far inside 64 bits at the tested SFs; at sf ≥ 10 bump the
quantization unit one decade), and only the final ratio becomes a rounded
double — bit-stable on both engines.

Scale shape: the heavy input (orders) reduces through one partial-agg
shuffle to ~2.4k daily rows; the lag windows and final sums run on that
reduced series, so the single-partition window sort is bounded by the
calendar, not the data volume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.sources.testdata import load_table

MAX_LAG = 7
_KD = 100_000  # cents per k$ quantization unit


def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "x"
        )
    )
    scal = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    dev = daily.crossJoin(F.broadcast(scal)).select(
        "o_orderdate", "n", (F.col("n") * F.col("x") - F.col("s")).alias("dev")
    )
    w = Window.orderBy("o_orderdate")
    lagged = dev.select(
        "n",
        "dev",
        *[F.lag("dev", k).over(w).alias(f"dev_{k}") for k in range(1, MAX_LAG + 1)],
    )
    agg = lagged.agg(
        F.first("n").alias("n_days"),
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        *[
            F.sum(F.col("dev") * F.col(f"dev_{k}")).alias(f"num_{k}")
            for k in range(1, MAX_LAG + 1)
        ],
    )
    pairs = ", ".join(f"{k}, num_{k}" for k in range(1, MAX_LAG + 1))
    return agg.select(
        F.expr(f"stack({MAX_LAG}, {pairs})").alias("lag", "num"),
        "den",
        "n_days",
    ).select(
        "lag",
        F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6).alias("acf"),
        "n_days",
    )


def _acf_sql() -> str:
    lag_cols = ",\n         ".join(
        f"lag(dev, {k}) OVER (ORDER BY d) AS dev_{k}" for k in range(1, MAX_LAG + 1)
    )
    num_cols = ",\n         ".join(
        f"CAST(SUM(dev * dev_{k}) AS BIGINT) AS num_{k}" for k in range(1, MAX_LAG + 1)
    )
    branches = "\nUNION ALL\n".join(
        f"SELECT {k} AS lag, ROUND(CAST(num_{k} AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf, "
        f"n_days FROM sums"
        for k in range(1, MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS x
  FROM orders GROUP BY 1
),
sc AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM daily),
dev AS (SELECT d, n, n * x - s AS dev FROM daily, sc),
lagged AS (
  SELECT n, dev,
         {lag_cols}
  FROM dev
),
sums AS (
  SELECT MIN(n) AS n_days,
         CAST(SUM(dev * dev) AS BIGINT) AS den,
         {num_cols}
  FROM lagged
)
{branches}
"""


_HOLT_WINDOW = 16  # last N observed weekly points per series
_HOLT_HORIZON = 4


def holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend forecast (level+trend smoothing, α=β=1/2) of
    weekly revenue per order priority, horizons 1-4.

    Dyadic smoothing makes the recurrence EXACT: tracking the scaled
    integers Lnumₜ = lₜ·4ᵗ and Bnumₜ = bₜ·4ᵗ,

        Lnumₜ = yₜ·2^(2t−1) + 2(Lnumₜ₋₁ + Bnumₜ₋₁)
        Bnumₜ = (Lnumₜ − 4·Lnumₜ₋₁)/2 + 2·Bnumₜ₋₁   (always even → exact)

    stays in BIGINT for a 16-point window of k$-quantized values, so the
    sequential fold (one `aggregate` HOF over the per-group sorted array —
    inherently ordered, 16 elements, zero Python) reproduces bit-identically
    in the oracle's recursive CTE. Forecast ŷ(h) = (Lnum + h·Bnum)/4ᵀ with
    one final rounded double division.

    Scale: the raw orders scan reduces via one partial-agg shuffle to
    |groups|×16 rows before any sequential work.
    """
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk"),
    ).agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "y"
        )
    )
    w = Window.partitionBy("priority").orderBy(F.col("wk").desc())
    last = (
        weekly.withColumn("rdesc", F.row_number().over(w))
        .where(F.col("rdesc") <= _HOLT_WINDOW)
        .groupBy("priority")
        .agg(F.expr("transform(sort_array(collect_list(struct(wk, y))), p -> p.y)").alias("ys"))
    )
    ln_t = "shiftleft(y, CAST(2 * (a.t + 1) - 1 AS INT)) + 2 * (a.ln + a.bn)"
    fold = (
        "aggregate(ys, named_struct('t', 0L, 'ln', 0L, 'bn', 0L), "
        "(a, y) -> IF(a.t = 0, named_struct('t', 1L, 'ln', 4 * y, 'bn', 0L), "
        f"named_struct('t', a.t + 1, 'ln', {ln_t}, "
        f"'bn', (({ln_t}) - 4 * a.ln) div 2 + 2 * a.bn)))"
    )
    acc = last.select("priority", F.expr(fold).alias("acc"))
    return acc.select(
        "priority",
        F.explode(F.expr(f"sequence(1, {_HOLT_HORIZON})")).alias("horizon"),
        F.col("acc.t").alias("n_points"),
        "acc.ln",
        "acc.bn",
    ).select(
        "priority",
        "horizon",
        "n_points",
        F.expr(
            "ROUND(CAST(ln + horizon * bn AS DOUBLE) / "
            "CAST(shiftleft(1L, CAST(2 * n_points AS INT)) AS DOUBLE), 4)"
        ).alias("forecast_kusd"),
    )


HOLT_SQL = f"""
WITH RECURSIVE weekly AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', DATE '1970-01-01', o_orderdate) // 7 AS wk,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS y
  FROM orders GROUP BY 1, 2
),
last16 AS (
  SELECT priority, wk, y,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY wk DESC) AS rdesc
  FROM weekly
),
ser AS (
  SELECT priority, y,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY wk) AS t
  FROM last16 WHERE rdesc <= {_HOLT_WINDOW}
),
holt(priority, t, ln, bn) AS (
  SELECT priority, CAST(1 AS BIGINT), 4 * y, CAST(0 AS BIGINT) FROM ser WHERE t = 1
  UNION ALL
  SELECT s.priority, CAST(s.t AS BIGINT),
         (s.y << (2 * s.t - 1)) + 2 * (h.ln + h.bn),
         ((s.y << (2 * s.t - 1)) + 2 * (h.ln + h.bn) - 4 * h.ln) // 2 + 2 * h.bn
  FROM holt h JOIN ser s ON s.priority = h.priority AND s.t = h.t + 1
),
final AS (
  SELECT priority, t, ln, bn,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY t DESC) AS rr
  FROM holt
)
SELECT f.priority, hz.horizon, f.t AS n_points,
       ROUND(CAST(f.ln + hz.horizon * f.bn AS DOUBLE)
             / CAST(CAST(1 AS BIGINT) << (2 * f.t) AS DOUBLE), 4) AS forecast_kusd
FROM final f
CROSS JOIN (SELECT unnest(generate_series(1, {_HOLT_HORIZON})) AS horizon) hz
WHERE f.rr = 1
"""


_BURST_MIN_EVENTS = 10


def user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-process burstiness per user: B = (σ−μ)/(σ+μ) over the
    inter-event gaps (B→−1 periodic, 0 Poisson, →1 bursty) — the
    diagnostic separating machine heartbeats from human sessions.

    Gaps are integer MINUTES from epoch-µs subtraction (minute grain
    keeps n·Σg² inside BIGINT for any realistic per-user history); n, Σg,
    Σg² are exact integer sums, σ² = (nΣg²−(Σg)²)/n² only becomes a
    double for the final σ/B — IEEE sqrt and division agree across
    engines, so the rounded result hash-matches. One user-keyed sort
    window for the lag, one partial-agg shuffle — the standard
    sessionization shuffle shape.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select(
            "user_id",
            "event_id",
            F.expr("unix_micros(ts)").alias("us"),
        )
        .withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select("user_id", F.expr("(us - prev) div 60000000").alias("g"))
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.sum(F.col("g") * F.col("g")).alias("sg2"),
    ).where((F.col("n") >= _BURST_MIN_EVENTS - 1) & (F.col("sg") > 0))
    return stats.select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.round(F.col("sg").cast("double") / F.col("n"), 4).alias("mean_gap_min"),
        F.round(
            (
                F.sqrt((F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg")).cast("double"))
                - F.col("sg").cast("double")
            )
            / (
                F.sqrt((F.col("n") * F.col("sg2") - F.col("sg") * F.col("sg")).cast("double"))
                + F.col("sg").cast("double")
            ),
            6,
        ).alias("burstiness"),
    )


BURST_SQL = f"""
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           // 60000000 AS g
  FROM events
),
stats AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(g) AS BIGINT) AS sg,
         CAST(SUM(g * g) AS BIGINT) AS sg2
  FROM gaps WHERE g IS NOT NULL
  GROUP BY 1
  HAVING COUNT(*) >= {_BURST_MIN_EVENTS - 1} AND CAST(SUM(g) AS BIGINT) > 0
)
SELECT user_id, n AS n_gaps,
       ROUND(CAST(sg AS DOUBLE) / n, 4) AS mean_gap_min,
       ROUND((sqrt(CAST(n * sg2 - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE))
             / (sqrt(CAST(n * sg2 - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE)), 6)
         AS burstiness
FROM stats
"""


register(
    QuerySpec(
        "user_burstiness",
        user_burstiness,
        BURST_SQL,
        doc="inter-event burstiness (sigma-mu)/(sigma+mu) from exact integer gap moments",
        cites="point-process twin of sessionize_events; integer-moment idiom of eval_ops",
        tags=("timeseries", "stats", "behavior"),
    )
)


def theil_sen_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of weekly revenue: the median of all
    pairwise slopes (yⱼ−yᵢ)/(wⱼ−wᵢ). Outlier weeks shift OLS arbitrarily
    but move a median-of-slopes by one rank — the robust estimator a
    revenue series with promo spikes needs.

    Scale shape: the O(m²) pair enumeration runs on the AGGREGATED weekly
    series (m ≈ calendar weeks, m² ≈ 60k pairs — bounded by the calendar,
    independent of data volume; the heavy orders scan reduces first).
    Median by integer row position over a fully deterministic sort key
    (double slope, then exact Δy, Δx, week ids) — both engines select the
    identical pair, so the result is bit-stable.
    """
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk")
    ).agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "y"
        )
    )
    a, b = weekly.alias("a"), weekly.alias("b")
    slopes = (
        a.join(b, F.col("a.wk") < F.col("b.wk"))
        .select(
            (F.col("b.y") - F.col("a.y")).alias("dy"),
            (F.col("b.wk") - F.col("a.wk")).alias("dx"),
            F.col("a.wk").alias("wi"),
            F.col("b.wk").alias("wj"),
        )
        .withColumn("slope", F.col("dy").cast("double") / F.col("dx").cast("double"))
    )
    w = Window.orderBy("slope", "dy", "dx", "wi", "wj")
    ranked = slopes.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("np"),
    )
    return ranked.where(F.col("rn") == F.expr("(np + 1) div 2")).select(
        F.round("slope", 6).alias("trend_kusd_per_week"),
        F.col("np").alias("n_pairs"),
    )


THEIL_SEN_SQL = f"""
WITH weekly AS (
  SELECT date_diff('day', DATE '1970-01-01', o_orderdate) // 7 AS wk,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS y
  FROM orders GROUP BY 1
),
slopes AS (
  SELECT b.y - a.y AS dy, b.wk - a.wk AS dx, a.wk AS wi, b.wk AS wj,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.wk - a.wk AS DOUBLE) AS slope
  FROM weekly a JOIN weekly b ON a.wk < b.wk
),
ranked AS (
  SELECT slope,
         ROW_NUMBER() OVER (ORDER BY slope, dy, dx, wi, wj) AS rn,
         COUNT(*) OVER () AS np
  FROM slopes
)
SELECT ROUND(slope, 6) AS trend_kusd_per_week, np AS n_pairs
FROM ranked WHERE rn = (np + 1) // 2
"""


register(
    QuerySpec(
        "theil_sen_weekly_trend",
        theil_sen_weekly_trend,
        THEIL_SEN_SQL,
        doc="Theil-Sen robust slope: position-selected median of pairwise weekly-revenue slopes",
        cites="robust twin of ols_daily_revenue_trend (econ_ops)",
        tags=("timeseries", "stats", "robust"),
    )
)


register(
    QuerySpec(
        "holt_trend_forecast",
        holt_trend_forecast,
        HOLT_SQL,
        doc="Holt level+trend forecast (dyadic alpha/beta, exact integer recurrence) per priority",
        cites="extends ewma_user_values (ml_ops) to trended smoothing; recursive-CTE oracle",
        tags=("timeseries", "forecast", "ml"),
    )
)

register(
    QuerySpec(
        "acf_daily_revenue",
        acf_daily_revenue,
        _acf_sql(),
        doc="autocorrelation (lags 1-7) of daily revenue via cleared-denominator exact-integer sums",
        cites="time-series diagnostics family; same integer-moment idiom as eval_ops Welch t",
        tags=("timeseries", "stats", "window"),
    )
)


# ---- floor-at-zero running balance (non-associative stateful fold) ---------


def user_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running balance with a floor at zero:

        balₜ = max(0, balₜ₋₁ + Δₜ)   (Δ = +cents for purchases, −cents else)

    The floor makes the fold NON-associative — no prefix-sum/window
    rewrite exists (unlike plain running totals), which is exactly why
    inventory/credit pipelines end up with UDFs. Here it is a per-user
    `aggregate` HOF over the time-sorted delta array: pure JVM, exact
    BIGINT state, distributed across users (the only shuffle is the
    per-user collect — bounded by a user's own history, same shape as
    sessionization). The oracle replays the identical recurrence as a
    recursive CTE.
    """
    e = load_table(spark, sf_dir, "events")
    deltas = e.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
        F.expr(
            "IF(event_type = 'purchase', CAST(round(value * 100) AS BIGINT), "
            "-CAST(round(value * 100) AS BIGINT))"
        ).alias("delta"),
    )
    arr = deltas.groupBy("user_id").agg(
        F.expr(
            "transform(sort_array(collect_list(struct(us, event_id, delta))), p -> p.delta)"
        ).alias("ds")
    )
    fold = (
        "aggregate(ds, named_struct('bal', 0L, 'mx', 0L, 'floors', 0L), "
        "(a, d) -> named_struct("
        "'bal', greatest(0L, a.bal + d), "
        "'mx', greatest(a.mx, greatest(0L, a.bal + d)), "
        "'floors', a.floors + IF(a.bal + d < 0, 1L, 0L)))"
    )
    # inline(array(fold)) evaluates the interpreted fold ONCE per row —
    # referencing fold.bal/.mx/.floors separately would re-run it 3x after
    # CollapseProject inlines the defining expression (functions/expr.py)
    gen = arr.select(
        "user_id",
        F.size("ds").cast("bigint").alias("n_events"),
        F.expr(f"inline(array({fold}))"),
    )
    return gen.select(
        "user_id",
        F.col("bal").alias("balance_cents"),
        F.col("mx").alias("peak_cents"),
        F.col("floors").alias("n_floor_hits"),
        "n_events",
    )


BALANCE_SQL = """
WITH RECURSIVE ser AS (
  SELECT user_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t,
         CASE WHEN event_type = 'purchase'
              THEN CAST(ROUND(value * 100) AS BIGINT)
              ELSE -CAST(ROUND(value * 100) AS BIGINT) END AS delta,
         COUNT(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
),
walk(user_id, t, bal, mx, floors, n_events) AS (
  SELECT user_id, t, GREATEST(0, delta), GREATEST(0, delta),
         CASE WHEN delta < 0 THEN 1 ELSE 0 END, n_events
  FROM ser WHERE t = 1
  UNION ALL
  SELECT s.user_id, s.t,
         GREATEST(0, w.bal + s.delta),
         GREATEST(w.mx, GREATEST(0, w.bal + s.delta)),
         w.floors + CASE WHEN w.bal + s.delta < 0 THEN 1 ELSE 0 END,
         w.n_events
  FROM walk w JOIN ser s ON s.user_id = w.user_id AND s.t = w.t + 1
)
SELECT user_id,
       CAST(bal AS BIGINT) AS balance_cents,
       CAST(mx AS BIGINT) AS peak_cents,
       CAST(floors AS BIGINT) AS n_floor_hits,
       CAST(n_events AS BIGINT) AS n_events
FROM walk WHERE t = n_events
"""


register(
    QuerySpec(
        "user_running_balance",
        user_running_balance,
        BALANCE_SQL,
        doc="floor-at-zero balance walk per user: non-associative fold, no window rewrite exists",
        cites="stateful-fold family with holt_trend_forecast; recursive-CTE oracle",
        tags=("timeseries", "stateful", "fold"),
    )
)


# ---- day-of-week seasonal decomposition ------------------------------------


def dow_seasonal_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive day-of-week decomposition of daily revenue: per-weekday
    effect (weekday mean − grand mean) plus the count of days whose
    residual |x − grand − effect| exceeds 2 residual sigmas — the
    seasonality-aware outlier screen (a plain z-score flags every
    weekend as anomalous when weekends genuinely differ).

    Integer discipline: daily revenue in k$ (BIGINT); each mean is one
    double division of exact sums; the residual variance clears
    denominators like the ACF (all products of BIGINTs), so the cutoff
    comparison is identical on both engines. Two aggregation passes over
    the |calendar|-sized daily table (one for effects, one for
    residuals) — the heavy orders scan reduces first.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "x"
        )
    ).select(
        # ISO numbering (Mon=1) — Spark dayofweek() is Sun=1, DuckDB's Sun=0
        F.expr("CAST(weekday(o_orderdate) + 1 AS BIGINT)").alias("dow"),
        "o_orderdate",
        "x",
    )
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("x").alias("sd")
    )
    tot = per_dow.agg(F.sum("nd").alias("n"), F.sum("sd").alias("s"))
    # the outlier residual is x - sd/nd (the grand mean cancels out of
    # x - grand - effect), tested in cleared-denominator integer form
    mom = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("x").alias("sd"),
        F.sum(F.col("x") * F.col("x")).alias("sdd"),
    )
    out = (
        daily.join(F.broadcast(mom), "dow")
        .select(
            "dow",
            "x",
            "nd",
            "sd",
            # (nd*x - sd)² > 4 * nd * (nd*sdd - sd*sd) / nd  — cleared form of
            # (x - sd/nd)² > 4 σ², σ² = (nd*sdd - sd²)/nd²  (population var)
            (
                (F.col("nd") * F.col("x") - F.col("sd"))
                * (F.col("nd") * F.col("x") - F.col("sd"))
                > 4 * (F.col("nd") * F.col("sdd") - F.col("sd") * F.col("sd"))
            ).cast("int").alias("is_outlier"),
        )
        .groupBy("dow")
        .agg(
            F.min("nd").alias("n_days"),
            F.min("sd").alias("sd"),
            F.sum("is_outlier").alias("n_outliers"),
        )
    )
    return (
        out.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            F.round(F.col("sd").cast("double") / F.col("n_days"), 4).alias("dow_mean_kusd"),
            F.round(
                F.col("sd").cast("double") / F.col("n_days")
                - F.col("s").cast("double") / F.col("n"),
                4,
            ).alias("dow_effect_kusd"),
            "n_outliers",
        )
        .orderBy("dow")
    )


DOW_SQL = f"""
WITH daily AS (
  SELECT CAST(isodow(o_orderdate) AS BIGINT) AS dow, o_orderdate,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS x
  FROM orders GROUP BY 2
),
mom AS (
  SELECT dow, COUNT(*) AS nd, CAST(SUM(x) AS BIGINT) AS sd,
         CAST(SUM(x * x) AS BIGINT) AS sdd
  FROM daily GROUP BY 1
),
tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS n, CAST(SUM(sd) AS BIGINT) AS s FROM mom),
flags AS (
  SELECT d.dow, m.nd, m.sd,
         CASE WHEN (m.nd * d.x - m.sd) * (m.nd * d.x - m.sd)
                   > 4 * (m.nd * m.sdd - m.sd * m.sd)
              THEN 1 ELSE 0 END AS is_outlier
  FROM daily d JOIN mom m ON d.dow = m.dow
),
agg AS (
  SELECT dow, MIN(nd) AS n_days, MIN(sd) AS sd,
         CAST(SUM(is_outlier) AS BIGINT) AS n_outliers
  FROM flags GROUP BY 1
)
SELECT dow, n_days,
       ROUND(CAST(sd AS DOUBLE) / n_days, 4) AS dow_mean_kusd,
       ROUND(CAST(sd AS DOUBLE) / n_days - CAST(s AS DOUBLE) / n, 4) AS dow_effect_kusd,
       n_outliers
FROM agg, tot
ORDER BY dow
"""


register(
    QuerySpec(
        "dow_seasonal_effects",
        dow_seasonal_effects,
        DOW_SQL,
        doc="day-of-week additive effects + seasonality-aware outlier counts (cleared-denominator test)",
        cites="seasonal twin of zscore_events_by_type; integer-moment idiom of acf_daily_revenue",
        tags=("timeseries", "seasonality", "stats"),
    )
)


# ---- rolling correlation of two daily series -------------------------------

_ROLL_W = 28  # 28-day trailing window


def rolling_corr_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """28-day trailing correlation between daily revenue and daily order
    count — the co-movement monitor that flags when volume decouples from
    value (mix shift, pricing bug).

    Window co-moments (Σx, Σy, Σxy, Σx², Σy², n) are EXACT BIGINT window
    sums over the k$-quantized daily table; each day's correlation is one
    closed-form double expression over them, so no float state ever
    accumulates across rows. The window runs on the calendar-sized daily
    aggregate (single partition, ~2.4k rows) — the orders scan reduces
    first, as in every TSA query here. Emitted monthly (1st of month) to
    keep the row set stable across SFs.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "x"
        ),
        F.count(F.lit(1)).alias("y"),
    )
    w = (
        Window.orderBy("o_orderdate").rowsBetween(-(_ROLL_W - 1), 0)
    )
    mom = daily.select(
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    corr = (
        "CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN "
        "CAST(n*sxy - sx*sy AS DOUBLE) / "
        "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) "
        "ELSE NULL END"
    )
    return (
        mom.where((F.dayofmonth("o_orderdate") == 1) & (F.col("n") == _ROLL_W))
        .selectExpr(
            "o_orderdate AS obs_date",
            "n AS window_days",
            f"round({corr}, 6) AS corr_rev_orders",
        )
        .orderBy("obs_date")
    )


ROLLCORR_SQL = f"""
WITH daily AS (
  SELECT o_orderdate,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS x,
         COUNT(*) AS y
  FROM orders GROUP BY 1
),
mom AS (
  SELECT o_orderdate,
         COUNT(*) OVER wnd AS n,
         CAST(SUM(x) OVER wnd AS BIGINT) AS sx,
         CAST(SUM(y) OVER wnd AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER wnd AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER wnd AS BIGINT) AS sxx,
         CAST(SUM(y * y) OVER wnd AS BIGINT) AS syy
  FROM daily
  WINDOW wnd AS (ORDER BY o_orderdate ROWS BETWEEN {_ROLL_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT o_orderdate AS obs_date, n AS window_days,
       ROUND(CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
         CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE)))
       ELSE NULL END, 6) AS corr_rev_orders
FROM mom
WHERE EXTRACT(day FROM o_orderdate) = 1 AND n = {_ROLL_W}
ORDER BY obs_date
"""


register(
    QuerySpec(
        "rolling_corr_revenue_orders",
        rolling_corr_revenue_orders,
        ROLLCORR_SQL,
        doc="28-day rolling revenue/volume correlation from exact integer window co-moments",
        cites="TSA family; window-moment idiom of cuped_adjusted_ab",
        tags=("timeseries", "window", "stats"),
    )
)


# ---- Croston's intermittent-demand forecast --------------------------------

_CROSTON_WINDOW = 16
_CROSTON_MIN_PERIODS = 5


def croston_part_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand, per part: most parts sell
    in only ~10% of weeks, where level smoothing (EWMA/Holt) collapses
    toward zero between orders. Croston smooths TWO series — nonzero
    demand size z and inter-demand interval p — updating only on demand
    weeks; the rate forecast is z/p.

    With α = 1/2 both recurrences are exact in scaled integers
    (Znumₖ = Znumₖ₋₁ + dₖ·2ᵏ⁻¹ over the last 16 demand weeks, same for
    the interval chain), and the forecast z/p = Znum/Pnum — the scale
    cancels — is one rounded double division. One aggregation to weekly
    demand, one part-keyed lag window for intervals, one `aggregate` HOF
    fold per part; the oracle replays the recurrence as a recursive CTE.
    """
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.expr("CAST(datediff(l_shipdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("d"))
    w = Window.partitionBy("part").orderBy("wk")
    gaps = weekly.select(
        "part",
        "wk",
        "d",
        F.coalesce(F.col("wk") - F.lag("wk").over(w), F.lit(1)).alias("q"),
    )
    wdesc = Window.partitionBy("part").orderBy(F.col("wk").desc())
    last = (
        gaps.withColumn("rdesc", F.row_number().over(wdesc))
        .where(F.col("rdesc") <= _CROSTON_WINDOW)
        .groupBy("part")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(wk, d, q))), s -> struct(s.d AS d, s.q AS q))"
            ).alias("ds"),
            F.count(F.lit(1)).alias("n_periods"),
        )
        .where(F.col("n_periods") >= _CROSTON_MIN_PERIODS)
    )
    fold = (
        "aggregate(ds, named_struct('k', 0L, 'zn', 0L, 'pn', 0L), "
        "(a, s) -> named_struct("
        "'k', a.k + 1, "
        "'zn', a.zn + s.d * shiftleft(1L, CAST(a.k AS INT)), "
        "'pn', a.pn + s.q * shiftleft(1L, CAST(a.k AS INT))))"
    )
    gen = last.select(
        "part", "n_periods", F.expr(f"inline(array({fold}))")
    )
    return gen.select(
        "part",
        "n_periods",
        F.round(F.col("zn").cast("double") / F.col("pn").cast("double"), 6).alias(
            "demand_per_week"
        ),
    ).orderBy("part")


CROSTON_SQL = f"""
WITH RECURSIVE weekly AS (
  SELECT l_partkey AS part,
         date_diff('day', DATE '1970-01-01', l_shipdate) // 7 AS wk,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
  FROM lineitem GROUP BY 1, 2
),
gaps AS (
  SELECT part, wk, d,
         COALESCE(wk - lag(wk) OVER (PARTITION BY part ORDER BY wk), 1) AS q
  FROM weekly
),
lastw AS (
  SELECT part, wk, d, q,
         ROW_NUMBER() OVER (PARTITION BY part ORDER BY wk DESC) AS rdesc
  FROM gaps
),
ser AS (
  SELECT part, d, q,
         ROW_NUMBER() OVER (PARTITION BY part ORDER BY wk) AS t,
         COUNT(*) OVER (PARTITION BY part) AS n_periods
  FROM lastw WHERE rdesc <= {_CROSTON_WINDOW}
),
eligible AS (SELECT * FROM ser WHERE n_periods >= {_CROSTON_MIN_PERIODS}),
cro(part, t, zn, pn, n_periods) AS (
  SELECT part, CAST(1 AS BIGINT), d, q, n_periods FROM eligible WHERE t = 1
  UNION ALL
  SELECT e.part, CAST(e.t AS BIGINT),
         c.zn + e.d * (CAST(1 AS BIGINT) << (e.t - 1)),
         c.pn + e.q * (CAST(1 AS BIGINT) << (e.t - 1)),
         c.n_periods
  FROM cro c JOIN eligible e ON e.part = c.part AND e.t = c.t + 1
),
final AS (
  SELECT part, zn, pn, n_periods,
         ROW_NUMBER() OVER (PARTITION BY part ORDER BY t DESC) AS rr
  FROM cro
)
SELECT part, n_periods,
       ROUND(CAST(zn AS DOUBLE) / CAST(pn AS DOUBLE), 6) AS demand_per_week
FROM final WHERE rr = 1
ORDER BY part
"""


register(
    QuerySpec(
        "croston_part_demand",
        croston_part_demand,
        CROSTON_SQL,
        doc="Croston's intermittent-demand rate per part (dyadic dual-EWMA, exact scaled integers)",
        cites="forecasting family: completes naive/seasonal/EWMA/Holt; fold idiom of holt_trend_forecast",
        tags=("timeseries", "forecast"),
    )
)


# ---- dispersion index (over/under-dispersion of counts) --------------------


def order_count_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio (index of dispersion) of weekly order
    counts per market segment — the diagnostic that decides Poisson vs
    negative-binomial count models (VMR > 1: clumped demand; < 1:
    regularized). Cleared-denominator form: VMR = (nΣc² − (Σc)²)/(n·Σc),
    every term an exact BIGINT from one orders⋈customer pass + one
    calendar-grain aggregation; a single rounded double division at the
    end."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    weekly = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mom = weekly.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_weeks"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    return mom.selectExpr(
        "segment",
        "n_weeks",
        "s AS n_orders",
        "round(CAST(n_weeks * ss - s * s AS DOUBLE) / CAST(n_weeks AS DOUBLE) / s, 6)"
        " AS dispersion_index",
    ).orderBy("segment")


DISPERSION_SQL = """
WITH weekly AS (
  SELECT c.c_mktsegment AS segment,
         date_diff('day', DATE '1970-01-01', o.o_orderdate) // 7 AS wk,
         COUNT(*) AS cnt
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
mom AS (
  SELECT segment, COUNT(*) AS n_weeks,
         CAST(SUM(cnt) AS BIGINT) AS s,
         CAST(SUM(cnt * cnt) AS BIGINT) AS ss
  FROM weekly GROUP BY 1
)
SELECT segment, n_weeks, s AS n_orders,
       ROUND(CAST(n_weeks * ss - s * s AS DOUBLE) / CAST(n_weeks AS DOUBLE) / s, 6)
         AS dispersion_index
FROM mom ORDER BY segment
"""


register(
    QuerySpec(
        "order_count_dispersion",
        order_count_dispersion,
        DISPERSION_SQL,
        doc="variance-to-mean ratio of weekly order counts per segment (Poisson vs NB diagnostic)",
        cites="count-model diagnostics; cleared-denominator idiom of acf_daily_revenue",
        tags=("timeseries", "stats"),
    )
)


# ---- Hurst exponent (aggregated-variance method) ---------------------------

_HURST_SCALES = (1, 2, 4, 8)


def hurst_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of weekly revenue by the aggregated-variance
    method: block the series at scales m ∈ {1,2,4,8}, take the variance
    of the block MEANS at each scale, and fit ln Var(m) = (2H−2)·ln m + c
    — H > 0.5 means long-memory persistence (trends compound), H < 0.5
    anti-persistent mean reversion; the diagnostic that says whether a
    forecast may extrapolate runs.

    Exactness: block sums/moments are BIGINT at every scale (block mean
    variance is computed in cleared-denominator form); the 4-point
    regression is closed-form arithmetic over 4 doubles — no float
    accumulation anywhere. Everything after the one partial-agg shuffle
    to weekly grain is calendar-bounded."""
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk")
    ).agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "x"
        )
    )
    per_scale = []
    for m in _HURST_SCALES:
        blocks = weekly.groupBy(F.expr(f"wk div {m}").alias("blk")).agg(
            F.sum("x").alias("bs"), F.count(F.lit(1)).alias("bn")
        ).where(F.col("bn") == m)  # complete blocks only
        mom = blocks.agg(
            F.lit(m).alias("m"),
            F.count(F.lit(1)).alias("nb"),
            F.sum("bs").alias("s"),
            F.sum(F.col("bs") * F.col("bs")).alias("ss"),
        )
        per_scale.append(mom)
    scales = per_scale[0]
    for p in per_scale[1:]:
        scales = scales.unionByName(p)
    # Var of block MEANS in cleared form: (nb·ss − s²) / (nb²·m²)
    pts = scales.selectExpr(
        "m",
        "nb",
        "ln(CAST(m AS DOUBLE)) AS lx",
        "ln((CAST(nb AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        " / (CAST(nb AS DOUBLE) * nb * m * m)) AS ly",
    )
    # pivot the 4 points to columns: the tiny regression sums are then
    # FIXED-ORDER arithmetic (a float SUM over 4 rows could reassociate)
    wide = pts.agg(
        *[
            F.max(F.when(F.col("m") == m, F.col(c))).alias(f"{c}{m}")
            for m in _HURST_SCALES
            for c in ("lx", "ly")
        ]
    )
    sx = " + ".join(f"lx{m}" for m in _HURST_SCALES)
    sy = " + ".join(f"ly{m}" for m in _HURST_SCALES)
    sxx = " + ".join(f"lx{m} * lx{m}" for m in _HURST_SCALES)
    sxy = " + ".join(f"lx{m} * ly{m}" for m in _HURST_SCALES)
    k = len(_HURST_SCALES)
    slope = f"(({k} * ({sxy})) - ({sx}) * ({sy})) / (({k} * ({sxx})) - ({sx}) * ({sx}))"
    return wide.selectExpr(
        f"{k} AS n_scales",
        f"round({slope}, 6) AS slope",
        f"round(1.0 + ({slope}) / 2.0, 6) AS hurst",
    )


HURST_SQL = f"""
WITH weekly AS (
  SELECT date_diff('day', DATE '1970-01-01', o_orderdate) // 7 AS wk,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS x
  FROM orders GROUP BY 1
),
scales AS (
  SELECT m, COUNT(*) AS nb, CAST(SUM(bs) AS BIGINT) AS s, CAST(SUM(bs * bs) AS BIGINT) AS ss
  FROM (
    SELECT ms.m, wk // ms.m AS blk,
           CAST(SUM(x) AS BIGINT) AS bs, COUNT(*) AS bn
    FROM weekly, (SELECT UNNEST(ARRAY{list(_HURST_SCALES)}) AS m) ms
    GROUP BY 1, 2
    HAVING COUNT(*) = ms.m
  ) b
  GROUP BY m
),
pts AS (
  SELECT m, nb, ln(CAST(m AS DOUBLE)) AS lx,
         ln((CAST(nb AS DOUBLE) * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
            / (CAST(nb AS DOUBLE) * nb * m * m)) AS ly
  FROM scales
),
wide AS (
  SELECT MAX(CASE WHEN m = 1 THEN lx END) AS lx1, MAX(CASE WHEN m = 1 THEN ly END) AS ly1,
         MAX(CASE WHEN m = 2 THEN lx END) AS lx2, MAX(CASE WHEN m = 2 THEN ly END) AS ly2,
         MAX(CASE WHEN m = 4 THEN lx END) AS lx4, MAX(CASE WHEN m = 4 THEN ly END) AS ly4,
         MAX(CASE WHEN m = 8 THEN lx END) AS lx8, MAX(CASE WHEN m = 8 THEN ly END) AS ly8
  FROM pts
)
SELECT 4 AS n_scales,
       ROUND(((4 * (lx1 * ly1 + lx2 * ly2 + lx4 * ly4 + lx8 * ly8))
              - (lx1 + lx2 + lx4 + lx8) * (ly1 + ly2 + ly4 + ly8))
             / ((4 * (lx1 * lx1 + lx2 * lx2 + lx4 * lx4 + lx8 * lx8))
                - (lx1 + lx2 + lx4 + lx8) * (lx1 + lx2 + lx4 + lx8)), 6) AS slope,
       ROUND(1.0 + (((4 * (lx1 * ly1 + lx2 * ly2 + lx4 * ly4 + lx8 * ly8))
              - (lx1 + lx2 + lx4 + lx8) * (ly1 + ly2 + ly4 + ly8))
             / ((4 * (lx1 * lx1 + lx2 * lx2 + lx4 * lx4 + lx8 * lx8))
                - (lx1 + lx2 + lx4 + lx8) * (lx1 + lx2 + lx4 + lx8))) / 2.0, 6) AS hurst
FROM wide
"""


register(
    QuerySpec(
        "hurst_weekly_revenue",
        hurst_weekly_revenue,
        HURST_SQL,
        doc="Hurst exponent via aggregated variance at scales 1/2/4/8 (exact block moments)",
        cites="long-memory diagnostic; closes the TSA family with acf/holt/theil-sen",
        tags=("timeseries", "stats"),
    )
)


# ---- forecast model backtest (model selection as a query) ------------------

_BT_HOLDOUT = 4  # last 4 complete weeks are the holdout
