"""operators/ordered.py — distributed global-order primitives.

Every helper is checked for VALUE equality against the naive
single-partition window it replaces (rank, exact prefix sums over
integers and decimals, exclusive running max, NTILE for several k and
both directions), and for PLAN shape: the helper output must carry no
unbounded Exchange SinglePartition while the naive formulation must be
flagged (which also pins the audit detector itself).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from analytics_data_platform_spark.operators.ordered import (
    ntile_distributed,
    top_n_with_pos,
    with_global_order,
)
from analytics_data_platform_spark.plans.audit import audit


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(0, 5000).select(
        (F.col("id") % 313).alias("k"),
        F.col("id").alias("uid"),
        ((F.col("id") % 37) - 5).cast("long").alias("v"),  # negatives included
        (F.col("id") % 29).cast("decimal(18,2)").alias("d"),
    )


def _same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_rank_and_prefix_sums_match_naive_window(spark, df):
    w = Window.orderBy(F.desc("k"), "uid")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    naive = df.select(
        "uid",
        F.row_number().over(w).cast("long").alias("r"),
        F.sum("v").over(wc).alias("cv"),
        F.sum("d").over(wc).alias("cd"),
    )
    mine = with_global_order(
        df, "k", descending=True, tiebreaks=["uid"],
        rank_col="r", prefix_sums={"cv": "v", "cd": "d"},
    ).select("uid", "r", "cv", "cd")
    _same(naive, mine)


def test_ascending_rank_matches(spark, df):
    naive = df.select(
        "uid", F.row_number().over(Window.orderBy("k", "uid")).cast("long").alias("r")
    )
    mine = with_global_order(df, "k", tiebreaks=["uid"], rank_col="r").select("uid", "r")
    _same(naive, mine)


def test_exclusive_prefix_max_matches(spark, df):
    w = Window.orderBy("k", F.desc("v"), "uid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = df.select("uid", F.max("v").over(w).alias("m"))
    mine = with_global_order(
        df, "k", tiebreaks=[F.desc("v"), "uid"], prefix_maxes_excl={"m": "v"}
    ).select("uid", "m")
    _same(naive, mine)
    # globally-first row must be NULL (no preceding rows)
    assert mine.where(F.col("m").isNull()).count() == naive.where(
        F.col("m").isNull()
    ).count()


@pytest.mark.parametrize("n,desc", [(5, False), (7, True), (4, True)])
def test_ntile_matches_sql_ntile(spark, df, n, desc):
    order = [F.desc("v") if desc else F.asc("v"), "uid"]
    naive = df.select("uid", F.ntile(n).over(Window.orderBy(*order)).alias("t"))
    mine = ntile_distributed(
        df, "v", n, "t", descending=desc, tiebreaks=["uid"]
    ).select("uid", "t")
    _same(naive, mine)


def test_ntile_total_smaller_than_n(spark):
    tiny = spark.range(0, 3).select(F.col("id").alias("k"), F.col("id").alias("uid"))
    got = (
        ntile_distributed(tiny, "k", 5, "t", tiebreaks=["uid"])
        .orderBy("k").select("t").collect()
    )
    assert [r["t"] for r in got] == [1, 2, 3]


def test_top_n_with_pos_matches_and_plans_take_ordered(spark, df):
    order = [F.desc("k"), "uid"]
    top = top_n_with_pos(df, order, 25)
    naive = (
        df.withColumn("pos", F.row_number().over(Window.orderBy(*order)))
        .where(F.col("pos") <= 25)
        .select("uid", "pos")
    )
    _same(top.select("uid", "pos"), naive)
    r = audit(top)
    assert "TakeOrderedAndProject" in r.simple
    assert not r.unbounded_single_partition


def test_helper_plans_have_no_unbounded_single_partition(spark, df):
    mine = with_global_order(
        df, "k", descending=True, tiebreaks=["uid"],
        rank_col="r", prefix_sums={"cv": "v"}, prefix_maxes_excl={"m": "v"},
    )
    assert not audit(mine).unbounded_single_partition
    nt = ntile_distributed(df, "k", 5, "t", tiebreaks=["uid"])
    assert not audit(nt).unbounded_single_partition


def test_detector_flags_naive_global_window(spark, df):
    naive = df.select(F.row_number().over(Window.orderBy("k", "uid")).alias("r"))
    assert audit(naive).unbounded_single_partition
    # ...but not a scalar aggregate (partial-agg bounded)
    assert not audit(df.groupBy().agg(F.sum("v").alias("s"))).unbounded_single_partition
    # ...and not orderBy().limit() top-n
    assert not audit(df.orderBy("k").limit(10)).unbounded_single_partition


def test_string_key_fallback_sampling(spark):
    sdf = spark.range(0, 2000).select(
        F.concat(F.lit("id_"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("s"),
        F.col("id").alias("uid"),
    )
    naive = sdf.select(
        "uid", F.row_number().over(Window.orderBy("s", "uid")).cast("long").alias("r")
    )
    mine = with_global_order(sdf, "s", tiebreaks=["uid"], rank_col="r").select("uid", "r")
    _same(naive, mine)


def test_multi_global_ranks_matches_naive_windows(spark, df):
    from analytics_data_platform_spark.operators.ordered import multi_global_ranks

    naive = df.select(
        "uid",
        F.row_number().over(Window.orderBy(F.desc("k"), "uid")).cast("long").alias("rk"),
        F.ntile(5).over(Window.orderBy("v", "uid")).alias("tv"),
        F.ntile(3).over(Window.orderBy(F.desc("d"), "uid")).alias("td"),
    )
    mine = multi_global_ranks(
        df,
        on=["uid"],
        specs=[
            dict(key="k", out="rk", descending=True, tiebreaks=["uid"]),
            dict(key="v", out="tv", ntile=5, tiebreaks=["uid"]),
            dict(key="d", out="td", ntile=3, descending=True, tiebreaks=["uid"]),
        ],
    ).select("uid", "rk", "tv", "td")
    _same(naive, mine)
    assert not audit(mine).unbounded_single_partition
