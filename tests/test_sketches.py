"""Approximate aggregation sketches (HLL count-distinct, quantile
sketch): error-bounded against exact answers. These are the built-in
Spark sketches a 100 TB pipeline reaches for when exact distinct/rank
shuffles are too expensive — no DuckDB oracle (the sketch algorithms
differ across engines by design), so the bound IS the contract."""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_hll_count_distinct_within_rsd(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    exact = o.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_approx_percentile_within_rank_error(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = o.count()
    exact_median = o.select(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    approx_median = o.select(
        F.percentile_approx("o_totalprice", 0.5, 1000)
    ).collect()[0][0]
    # rank error <= n/accuracy; translate to a generous value tolerance
    window = (
        o.where(F.col("o_totalprice").between(exact_median * 0.95, exact_median * 1.05)).count()
    )
    assert window > 0
    assert abs(approx_median - exact_median) / exact_median < 0.05
