"""As-of join semantics tests (backward match, ties, tolerance, nulls)."""

from __future__ import annotations

import datetime as dt

import pytest

from analytics_data_platform_spark.operators.asof import asof_join


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:05"), 100),
            ("A", ts("2024-01-01 10:00:10"), 101),
            ("A", ts("2024-01-01 09:59:00"), 102),  # before any quote
            ("B", ts("2024-01-01 10:00:07"), 200),
        ],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts("2024-01-01 10:00:00"), 10.0),
            ("A", ts("2024-01-01 10:00:10"), 11.0),  # exact tie with trade 101
            ("B", ts("2024-01-01 09:00:00"), 20.0),
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_backward_match_ties_and_missing(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {r["trade_id"]: r for r in asof_join(trades, quotes, ["sym"]).collect()}
    assert out[100]["px_right"] == 10.0  # latest prior quote
    assert out[101]["px_right"] == 11.0  # tie at equal ts takes the quote
    assert out[102]["px_right"] is None  # no prior quote → NULL
    assert out[200]["px_right"] == 20.0
    # left columns intact
    assert out[100]["sym"] == "A" and out[100]["ts"] == ts("2024-01-01 10:00:05")


def test_tolerance_window(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r["trade_id"]: r
        for r in asof_join(trades, quotes, ["sym"], tolerance_seconds=60).collect()
    }
    assert out[100]["px_right"] == 10.0  # 5s old quote: inside tolerance
    assert out[200]["px_right"] is None  # 1h old quote: outside tolerance


def test_value_cols_subset_and_suffix(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"], value_cols=["px"], suffix="_q")
    assert set(out.columns) == {"sym", "ts", "trade_id", "px_q"}


def test_asof_join_single_shuffle_plan(spark, trades_quotes):
    """The plan must contain exactly one Exchange on the key (the union +
    window formulation), not a nested-loop inequality join."""
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, ["sym"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
