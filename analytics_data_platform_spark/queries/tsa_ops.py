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
