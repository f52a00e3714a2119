"""Forecast-evaluation time-series queries: model backtesting,
bootstrap trend-slope CIs, STL-style decomposition, hierarchical
reconciliation, and the runs test.

Split out of tsa_ops.py purely to keep query modules under the
1,500-line hygiene bound; every query keeps its name, oracle, and tags,
and the shared quantization constants / Holt forecaster stay in tsa_ops
(single source). See tsa_ops.py's module docstring for the
cleared-denominator integer strategy that makes these oracle-able.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.queries import QuerySpec, register
from analytics_data_platform_spark.queries.tsa_ops import (
    _BT_HOLDOUT,
    _HOLT_WINDOW,
    _KD,
    holt_trend_forecast,
)
from analytics_data_platform_spark.sources.testdata import load_table


def forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model selection as a declarative query: fit THREE forecasters on
    the weekly-revenue series with the last 4 weeks held out — naive
    (last train value), seasonal-naive (value 4 weeks earlier), and Holt
    (the exact dyadic level+trend fold) — then score each holdout week
    and rank models by WAPE. The pipeline a forecasting platform runs on
    every series, here in one plan.

    Determinism: train statistics are the exact-integer constructions of
    the member queries; each holdout error is one double expression per
    (model, week); WAPE sums run over exactly 4 rows pivoted to FIXED
    textual order (the Hurst idiom), so nothing reassociates."""
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') div 7 AS BIGINT)").alias("wk")
    ).agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "y"
        )
    )
    maxwk = weekly.agg(F.max("wk").alias("mw"))
    wk = weekly.crossJoin(F.broadcast(maxwk))
    train = wk.where(F.col("wk") <= F.col("mw") - _BT_HOLDOUT)
    hold = wk.where(F.col("wk") > F.col("mw") - _BT_HOLDOUT).select(
        "wk", F.col("y").alias("actual"), "mw"
    )
    # naive: last train value; seasonal: value at wk-4 (train tail weeks)
    last_train = (
        train.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.col("wk").desc()))
        )
        .where(F.col("rn") == 1)
        .select(F.col("y").alias("naive_fc"))
    )
    seasonal = train.select((F.col("wk") + _BT_HOLDOUT).alias("wk"), F.col("y").alias("seasonal_fc"))
    # Holt on the train tail (same construction as holt_trend_forecast)
    wdesc = Window.orderBy(F.col("wk").desc())
    last16 = (
        train.withColumn("rdesc", F.row_number().over(wdesc))
        .where(F.col("rdesc") <= _HOLT_WINDOW)
        .groupBy()
        .agg(F.expr("transform(sort_array(collect_list(struct(wk, y))), p -> p.y)").alias("ys"))
    )
    ln_t = "shiftleft(y, CAST(2 * (a.t + 1) - 1 AS INT)) + 2 * (a.ln + a.bn)"
    fold = (
        "aggregate(ys, named_struct('t', 0L, 'ln', 0L, 'bn', 0L), "
        "(a, y) -> IF(a.t = 0, named_struct('t', 1L, 'ln', 4 * y, 'bn', 0L), "
        f"named_struct('t', a.t + 1, 'ln', {ln_t}, "
        f"'bn', (({ln_t}) - 4 * a.ln) div 2 + 2 * a.bn)))"
    )
    holt = last16.select(F.expr(f"inline(array({fold}))"))
    scored = (
        hold.crossJoin(F.broadcast(last_train))
        .join(seasonal, "wk", "left")
        .crossJoin(F.broadcast(holt))
        .select(
            (F.col("wk") - F.col("mw") + _BT_HOLDOUT).alias("h"),  # 1..4
            "actual",
            "naive_fc",
            F.coalesce("seasonal_fc", "naive_fc").alias("seasonal_fc"),
            F.expr(
                "CAST(ln + (CAST(wk - (mw - " + str(_BT_HOLDOUT) + ") AS BIGINT)) * bn AS DOUBLE)"
                " / CAST(shiftleft(1L, CAST(2 * t AS INT)) AS DOUBLE)"
            ).alias("holt_fc"),
        )
    )
    piv = scored.agg(
        *[
            F.max(F.when(F.col("h") == h, F.col(c))).alias(f"{c}_{h}")
            for h in range(1, _BT_HOLDOUT + 1)
            for c in ("actual", "naive_fc", "seasonal_fc", "holt_fc")
        ]
    )

    def wape(fc: str) -> str:
        num = " + ".join(
            f"ABS(CAST(actual_{h} AS DOUBLE) - {fc}_{h})" for h in range(1, _BT_HOLDOUT + 1)
        )
        den = " + ".join(f"CAST(actual_{h} AS DOUBLE)" for h in range(1, _BT_HOLDOUT + 1))
        return f"round(({num}) / ({den}), 6)"

    w = piv.selectExpr(
        f"{wape('naive_fc')} AS wape_naive",
        f"{wape('seasonal_fc')} AS wape_seasonal",
        f"{wape('holt_fc')} AS wape_holt",
    )
    return w.selectExpr(
        "stack(3, 'naive', wape_naive, 'seasonal_naive', wape_seasonal, 'holt', wape_holt)"
        " AS (model, wape)"
    ).selectExpr(
        "model",
        "wape",
        "rank() OVER (ORDER BY wape, model) AS model_rank",
    ).orderBy("model_rank", "model")


def _backtest_sql() -> str:
    wape_num = lambda fc: " + ".join(
        f"ABS(CAST(actual_{h} AS DOUBLE) - {fc}_{h})" for h in range(1, _BT_HOLDOUT + 1)
    )
    wape_den = " + ".join(f"CAST(actual_{h} AS DOUBLE)" for h in range(1, _BT_HOLDOUT + 1))
    piv_cols = ",\n         ".join(
        f"MAX(CASE WHEN h = {h} THEN {c} END) AS {c}_{h}"
        for h in range(1, _BT_HOLDOUT + 1)
        for c in ("actual", "naive_fc", "seasonal_fc", "holt_fc")
    )
    return f"""
WITH RECURSIVE weekly AS (
  SELECT date_diff('day', DATE '1970-01-01', o_orderdate) // 7 AS wk,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS y
  FROM orders GROUP BY 1
),
mw AS (SELECT MAX(wk) AS mw FROM weekly),
train AS (SELECT w.wk, w.y FROM weekly w, mw WHERE w.wk <= mw.mw - {_BT_HOLDOUT}),
hold AS (SELECT w.wk, w.y AS actual, mw.mw FROM weekly w, mw WHERE w.wk > mw.mw - {_BT_HOLDOUT}),
naive AS (
  SELECT y AS naive_fc FROM (
    SELECT y, ROW_NUMBER() OVER (ORDER BY wk DESC) AS rn FROM train
  ) WHERE rn = 1
),
seasonal AS (SELECT wk + {_BT_HOLDOUT} AS wk, y AS seasonal_fc FROM train),
last16 AS (
  SELECT wk, y, ROW_NUMBER() OVER (ORDER BY wk DESC) AS rdesc FROM train
),
ser AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY wk) AS t
  FROM last16 WHERE rdesc <= {_HOLT_WINDOW}
),
holt(t, ln, bn) AS (
  SELECT CAST(1 AS BIGINT), 4 * y, CAST(0 AS BIGINT) FROM ser WHERE t = 1
  UNION ALL
  SELECT CAST(s.t AS BIGINT),
         (s.y << (2 * s.t - 1)) + 2 * (h.ln + h.bn),
         ((s.y << (2 * s.t - 1)) + 2 * (h.ln + h.bn) - 4 * h.ln) // 2 + 2 * h.bn
  FROM holt h JOIN ser s ON s.t = h.t + 1
),
hf AS (
  SELECT t, ln, bn FROM (
    SELECT t, ln, bn, ROW_NUMBER() OVER (ORDER BY t DESC) AS rr FROM holt
  ) WHERE rr = 1
),
scored AS (
  SELECT ho.wk - (ho.mw - {_BT_HOLDOUT}) AS h,
         ho.actual,
         n.naive_fc,
         COALESCE(s.seasonal_fc, n.naive_fc) AS seasonal_fc,
         CAST(hf.ln + (ho.wk - (ho.mw - {_BT_HOLDOUT})) * hf.bn AS DOUBLE)
           / CAST(CAST(1 AS BIGINT) << (2 * hf.t) AS DOUBLE) AS holt_fc
  FROM hold ho
  CROSS JOIN naive n
  LEFT JOIN seasonal s ON s.wk = ho.wk
  CROSS JOIN hf
),
piv AS (
  SELECT {piv_cols}
  FROM scored
),
wapes AS (
  SELECT ROUND(({wape_num('naive_fc')}) / ({wape_den}), 6) AS wape_naive,
         ROUND(({wape_num('seasonal_fc')}) / ({wape_den}), 6) AS wape_seasonal,
         ROUND(({wape_num('holt_fc')}) / ({wape_den}), 6) AS wape_holt
  FROM piv
),
stacked AS (
  SELECT 'naive' AS model, wape_naive AS wape FROM wapes
  UNION ALL SELECT 'seasonal_naive', wape_seasonal FROM wapes
  UNION ALL SELECT 'holt', wape_holt FROM wapes
)
SELECT model, wape, RANK() OVER (ORDER BY wape, model) AS model_rank
FROM stacked ORDER BY model_rank, model
"""


register(
    QuerySpec(
        "forecast_backtest",
        forecast_backtest,
        _backtest_sql(),
        doc="3-model holdout backtest (naive/seasonal/Holt) ranked by fixed-order WAPE",
        cites="model selection over the forecasting family; Hurst pivot idiom for the 4-week sums",
        tags=("timeseries", "forecast", "eval"),
    )
)


# ---- bootstrap CI for the trend slope --------------------------------------

_SLOPE_B = 32


def bootstrap_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap distribution of the daily-revenue OLS trend
    slope: 32 deterministic resamples in ONE pass (each day draws an
    integer Poisson(1) weight per resample from seeded md5 — the
    bootstrap_mean_ci machinery), and every resample's slope comes from
    weighted integer moments (Σw, Σwx, Σwy, Σwxx, Σwxy all BIGINT — the
    regression twin of the mean bootstrap). The result is the slope's
    sampling distribution — the error bar a point-estimate trend lacks —
    with nothing float-accumulated anywhere."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.expr(f"CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) div {_KD} AS BIGINT)").alias(
            "y"
        )
    ).select(
        F.expr("CAST(datediff(o_orderdate, DATE'1970-01-01') AS BIGINT)").alias("x"),
        "y",
        "o_orderdate",
    )

    def wexpr(b: int) -> str:
        u = (
            f"(CAST(conv(substring(md5(concat_ws('#', o_orderdate, {b // 4})), "
            f"{(b % 4) * 8 + 1}, 8), 16, 10) AS BIGINT) / 4294967296.0D)"
        )
        from analytics_data_platform_spark.queries.customer_ops import _POIS_CDF

        c = " + ".join(f"CAST({u} >= {t!r}D AS INT)" for t in _POIS_CDF)
        return f"CAST({c} AS BIGINT) AS w{b}"

    proj = daily.select("x", "y", *[F.expr(wexpr(b)) for b in range(_SLOPE_B)])
    wide = proj.agg(
        *[
            F.expr(e)
            for b in range(_SLOPE_B)
            for e in (
                f"sum(w{b}) AS n{b}",
                f"sum(w{b} * x) AS sx{b}",
                f"sum(w{b} * y) AS sy{b}",
                f"sum(w{b} * x * x) AS sxx{b}",
                f"sum(w{b} * x * y) AS sxy{b}",
            )
        ]
    )
    rows = F.expr(
        "array(" + ", ".join(
            f"struct({b} AS resample, n{b} AS n_eff, "
            f"round((CAST(n{b} AS DOUBLE) * CAST(sxy{b} AS DOUBLE)"
            f" - CAST(sx{b} AS DOUBLE) * CAST(sy{b} AS DOUBLE))"
            f" / (CAST(n{b} AS DOUBLE) * CAST(sxx{b} AS DOUBLE)"
            f" - CAST(sx{b} AS DOUBLE) * CAST(sx{b} AS DOUBLE)), 8) AS slope_kusd_per_day)"
            for b in range(_SLOPE_B)
        ) + ")"
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def _bootstrap_slope_sql() -> str:
    from analytics_data_platform_spark.queries.customer_ops import _POIS_CDF

    cols = []
    for b in range(_SLOPE_B):
        u = (
            f"(('0x' || substr(md5(CAST(o_orderdate AS VARCHAR) || '#{b // 4}'), "
            f"{(b % 4) * 8 + 1}, 8))::BIGINT / 4294967296.0)"
        )
        c = " + ".join(f"CASE WHEN {u} >= {t!r} THEN 1 ELSE 0 END" for t in _POIS_CDF)
        cols.append(f"CAST({c} AS BIGINT) AS w{b}")
    sums = ", ".join(
        f"CAST(SUM(w{b}) AS BIGINT) AS n{b}, CAST(SUM(w{b} * x) AS BIGINT) AS sx{b}, "
        f"CAST(SUM(w{b} * y) AS BIGINT) AS sy{b}, CAST(SUM(w{b} * x * x) AS BIGINT) AS sxx{b}, "
        f"CAST(SUM(w{b} * x * y) AS BIGINT) AS sxy{b}"
        for b in range(_SLOPE_B)
    )
    branches = " UNION ALL ".join(
        f"SELECT {b} AS resample, n{b} AS n_eff,"
        f" ROUND((CAST(n{b} AS DOUBLE) * CAST(sxy{b} AS DOUBLE)"
        f" - CAST(sx{b} AS DOUBLE) * CAST(sy{b} AS DOUBLE))"
        f" / (CAST(n{b} AS DOUBLE) * CAST(sxx{b} AS DOUBLE)"
        f" - CAST(sx{b} AS DOUBLE) * CAST(sx{b} AS DOUBLE)), 8) AS slope_kusd_per_day"
        f" FROM wide"
        for b in range(_SLOPE_B)
    )
    return f"""
WITH daily AS (
  SELECT o_orderdate,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS x,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) // {_KD} AS y
  FROM orders GROUP BY 1
),
proj AS (
  SELECT x, y, {', '.join(cols)}
  FROM daily
),
wide AS (SELECT {sums} FROM proj)
{branches}
"""


register(
    QuerySpec(
        "bootstrap_trend_slope",
        bootstrap_trend_slope,
        _bootstrap_slope_sql(),
        doc="one-pass Poisson bootstrap of the OLS trend slope (32 resamples, exact weighted moments)",
        cites="bootstrap_mean_ci machinery x ols_daily_revenue_trend",
        tags=("timeseries", "stats", "bootstrap"),
    )
)


# --- STL-style decomposition: trend + day-of-week seasonal + residual ------

STL_TAIL_DAYS = 28


def stl_dow_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical decomposition of daily revenue into trend (7-day centered
    moving average), day-of-week seasonal effect (mean detrended value per
    weekday, centered to sum≈0), and residual — reported for the last 28
    days. The additive identity revenue = trend + seasonal + residual
    holds exactly by construction.

    Engine notes: daily revenue is an exact decimal sum; weekday uses
    Spark weekday()+1 ≡ DuckDB isodow (Mon=1) — Spark/DuckDB dayofweek
    disagree on Sunday. Three window/agg passes over the tiny daily
    series; everything upstream of it is the one orders aggregation."""
    from analytics_data_platform_spark.queries.exact import sum_money

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        sum_money("o_totalprice").alias("revenue")
    )
    w_ma = Window.orderBy("day").rowsBetween(-3, 3)
    # trend numerator as an exact decimal window sum: Spark folds window
    # frames sequentially while DuckDB uses a segment tree, so a double
    # sum would drift by association order
    trended = daily.select(
        "day", "revenue",
        (
            F.sum(F.col("revenue").cast("decimal(18,2)")).over(w_ma).cast("double")
            / F.count(F.lit(1)).over(w_ma)
        ).alias("trend"),
        F.count(F.lit(1)).over(w_ma).alias("_span"),
    ).where(F.col("_span") == 7)
    detr = trended.select(
        "day", "revenue", "trend",
        (F.col("revenue") - F.col("trend")).alias("detrended"),
        (F.weekday("day") + 1).alias("dow"),
    )
    dow_eff = detr.groupBy("dow").agg(F.avg("detrended").alias("raw_eff"))
    centered = dow_eff.crossJoin(
        F.broadcast(dow_eff.agg(F.avg("raw_eff").alias("grand")))
    ).select("dow", (F.col("raw_eff") - F.col("grand")).alias("seasonal"))
    w_tail = Window.orderBy(F.desc("day"))
    return (
        detr.join(F.broadcast(centered), "dow")
        .withColumn("rn", F.row_number().over(w_tail))
        .where(F.col("rn") <= STL_TAIL_DAYS)
        .select(
            "day", "dow", "revenue",
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round(F.col("detrended") - F.col("seasonal"), 4).alias("residual"),
        )
    )


STL_SQL = f"""
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
),
trended AS (
  SELECT day, revenue,
         CAST(SUM(CAST(revenue AS DECIMAL(18,2))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS trend,
         COUNT(*) OVER w AS _span
  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT day, revenue, trend, revenue - trend AS detrended,
         CAST(isodow(day) AS INT) AS dow
  FROM trended WHERE _span = 7
),
dow_eff AS (SELECT dow, AVG(detrended) AS raw_eff FROM detr GROUP BY dow),
centered AS (
  SELECT dow, raw_eff - (SELECT AVG(raw_eff) FROM dow_eff) AS seasonal FROM dow_eff
)
SELECT day, dow, revenue,
       ROUND(trend, 4) AS trend,
       ROUND(seasonal, 4) AS seasonal,
       ROUND(detrended - seasonal, 4) AS residual
FROM (
  SELECT d.*, c.seasonal, ROW_NUMBER() OVER (ORDER BY d.day DESC) AS rn
  FROM detr d JOIN centered c ON d.dow = c.dow
) WHERE rn <= {STL_TAIL_DAYS}
"""

register(
    QuerySpec(
        "stl_dow_decomposition",
        stl_dow_decomposition,
        STL_SQL,
        doc="trend + day-of-week seasonal + residual decomposition of daily revenue",
        cites="time-series family; weekday portability note (weekday+1 ≡ isodow)",
        tags=("tsa", "window"),
    )
)


# --- hierarchical forecast reconciliation (region → nation) ----------------

_HF_TRAIN = ("2001-02-01", "2001-03-01", "2001-04-01")
_HF_HOLDOUT = "2001-05-01"


def hierarchical_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecasting: per-nation 3-month-mean base forecasts
    disagree with the independently-forecast region total, so the region
    forecast is allocated TOP-DOWN by each nation's base-forecast share —
    the standard proportional reconciliation that makes drill-downs sum
    to the headline number. Reports base vs reconciled vs holdout actual
    per nation.

    Monthly revenue is exact decimal; forecasts divide exact sums, so
    both engines allocate identical shares. One aggregation builds the
    monthly panel; windows over region provide the share denominators."""
    from analytics_data_platform_spark.queries.exact import sum_money

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    panel = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name", F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(sum_money("o_totalprice").alias("rev"))
    )
    in_train = F.date_format("m", "yyyy-MM-dd").isin(list(_HF_TRAIN))
    base = (
        panel.where(in_train)
        .groupBy("r_name", "n_name")
        .agg((F.sum(F.col("rev").cast("decimal(18,2)")).cast("double") / 3.0).alias("base_fc"))
    )
    w_region = Window.partitionBy("r_name")
    region_fc = F.sum("base_fc").over(w_region)  # bottom-up region total
    # independent region forecast: mean of the region's 3 training months
    region_own = (
        panel.where(in_train)
        .groupBy("r_name")
        .agg((F.sum(F.col("rev").cast("decimal(18,2)")).cast("double") / 3.0).alias("region_fc"))
    )
    actual = (
        panel.where(F.col("m") == F.to_timestamp(F.lit(_HF_HOLDOUT)))
        .select("r_name", "n_name", F.col("rev").alias("actual"))
    )
    return (
        base.withColumn("bu_region_sum", region_fc)
        .join(F.broadcast(region_own), "r_name")
        .join(actual, ["r_name", "n_name"], "left")
        .select(
            "r_name", "n_name",
            F.round("base_fc", 2).alias("base_fc"),
            F.round(F.col("region_fc") * F.col("base_fc") / F.col("bu_region_sum"), 2).alias("td_fc"),
            F.round(F.coalesce("actual", F.lit(0.0)), 2).alias("actual"),
        )
    )


HF_SQL = f"""
WITH panel AS (
  SELECT r_name, n_name, date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2, 3
),
base AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / 3.0 AS base_fc
  FROM panel WHERE m IN (TIMESTAMP '{_HF_TRAIN[0]}', TIMESTAMP '{_HF_TRAIN[1]}', TIMESTAMP '{_HF_TRAIN[2]}')
  GROUP BY 1, 2
),
region_own AS (
  SELECT r_name,
         CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / 3.0 AS region_fc
  FROM panel WHERE m IN (TIMESTAMP '{_HF_TRAIN[0]}', TIMESTAMP '{_HF_TRAIN[1]}', TIMESTAMP '{_HF_TRAIN[2]}')
  GROUP BY 1
),
actual AS (
  SELECT r_name, n_name, rev AS actual FROM panel WHERE m = TIMESTAMP '{_HF_HOLDOUT}'
)
SELECT b.r_name, b.n_name,
       ROUND(b.base_fc, 2) AS base_fc,
       ROUND(ro.region_fc * b.base_fc / SUM(b.base_fc) OVER (PARTITION BY b.r_name), 2) AS td_fc,
       ROUND(COALESCE(a.actual, 0.0), 2) AS actual
FROM base b
JOIN region_own ro ON b.r_name = ro.r_name
LEFT JOIN actual a ON b.r_name = a.r_name AND b.n_name = a.n_name
"""

register(
    QuerySpec(
        "hierarchical_forecast_reconcile",
        hierarchical_forecast_reconcile,
        HF_SQL,
        doc="top-down proportional reconciliation of nation forecasts to the region total",
        cites="hierarchical-forecasting family; exact decimal panel, window share allocation",
        tags=("tsa", "warehouse", "window"),
    )
)


# --- Wald–Wolfowitz runs test on daily revenue ------------------------------


def runs_test_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz randomness test: is daily revenue's above/below-
    median sequence random, or does it cluster (momentum/regimes)?
    The median splits by exact integer row position; the observed run
    count is a lag-compare sum; E[R] = 2·n₊·n₋/n + 1 and Var[R] follow
    from exact integer counts, so z is one deterministic double
    expression. Positive autocorrelation ⇒ fewer runs than expected ⇒
    negative z."""
    from analytics_data_platform_spark.queries.exact import sum_money

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        sum_money("o_totalprice").alias("rev")
    )
    w_pos = Window.orderBy("rev", "day")
    n_w = Window.partitionBy()
    med = daily.select(
        "day", "rev",
        F.row_number().over(w_pos).alias("rn"),
        F.count(F.lit(1)).over(n_w).alias("n"),
    ).select(
        "day", "rev",
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("rev"))).over(n_w).alias("median"),
    )
    w_t = Window.orderBy("day")
    seq = med.select(
        "day",
        (F.col("rev") > F.col("median")).cast("int").alias("above"),
    ).select(
        "above",
        F.when(
            F.lag("above").over(w_t).isNull() | (F.lag("above").over(w_t) != F.col("above")), 1
        ).otherwise(0).alias("new_run"),
    )
    agg = seq.agg(
        F.sum("new_run").alias("runs"),
        F.sum("above").alias("n_pos"),
        F.sum(1 - F.col("above")).alias("n_neg"),
    )
    n = (F.col("n_pos") + F.col("n_neg")).cast("double")
    e_r = 2.0 * F.col("n_pos") * F.col("n_neg") / n + 1.0
    var_r = (
        2.0 * F.col("n_pos") * F.col("n_neg")
        * (2.0 * F.col("n_pos") * F.col("n_neg") - n)
        / (n * n * (n - 1.0))
    )
    return agg.select(
        "runs", "n_pos", "n_neg",
        F.round(e_r, 4).alias("expected_runs"),
        F.round((F.col("runs") - e_r) / F.sqrt(var_r), 4).alias("z"),
    )


RUNS_TEST_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT day, rev,
         ROW_NUMBER() OVER (ORDER BY rev, day) AS rn,
         COUNT(*) OVER () AS n
  FROM daily
),
med AS (
  SELECT day, rev, MAX(CASE WHEN rn = (n + 1) // 2 THEN rev END) OVER () AS median
  FROM ranked
),
seq AS (
  SELECT CASE WHEN rev > median THEN 1 ELSE 0 END AS above,
         CASE WHEN LAG(CASE WHEN rev > median THEN 1 ELSE 0 END) OVER (ORDER BY day) IS NULL
                OR LAG(CASE WHEN rev > median THEN 1 ELSE 0 END) OVER (ORDER BY day)
                   <> CASE WHEN rev > median THEN 1 ELSE 0 END
              THEN 1 ELSE 0 END AS new_run
  FROM med
),
agg AS (
  SELECT CAST(SUM(new_run) AS BIGINT) AS runs,
         CAST(SUM(above) AS BIGINT) AS n_pos,
         CAST(SUM(1 - above) AS BIGINT) AS n_neg
  FROM seq
)
SELECT runs, n_pos, n_neg,
       ROUND(2.0 * n_pos * n_neg / CAST(n_pos + n_neg AS DOUBLE) + 1.0, 4) AS expected_runs,
       ROUND((runs - (2.0 * n_pos * n_neg / CAST(n_pos + n_neg AS DOUBLE) + 1.0))
             / sqrt(2.0 * n_pos * n_neg * (2.0 * n_pos * n_neg - CAST(n_pos + n_neg AS DOUBLE))
                    / (CAST(n_pos + n_neg AS DOUBLE) * CAST(n_pos + n_neg AS DOUBLE)
                       * (CAST(n_pos + n_neg AS DOUBLE) - 1.0))), 4) AS z
FROM agg
"""

register(
    QuerySpec(
        "runs_test_daily_revenue",
        runs_test_daily_revenue,
        RUNS_TEST_SQL,
        doc="Wald-Wolfowitz runs test for randomness of daily revenue around its median",
        cites="statistics family; exact integer run/median machinery",
        tags=("tsa", "stats", "window"),
    )
)
