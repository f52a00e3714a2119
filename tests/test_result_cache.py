"""Result cache: semantic-key hits, input-change invalidation, crash safety."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.tables.result_cache import ResultCache

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def cache(spark, tmp_path):
    return ResultCache(spark, str(tmp_path / "rc"))


@pytest.fixture()
def mutable_input(spark, tmp_path):
    src = spark.read.parquet(f"{SF}/region.parquet")
    path = str(tmp_path / "region_copy")
    src.write.mode("overwrite").parquet(path)
    return path


def _q(spark, path):
    return (
        spark.read.parquet(path)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_identical_plans_hit_even_across_dataframe_objects(spark, cache, mutable_input):
    r1 = cache.get_or_compute(_q(spark, mutable_input)).collect()
    # a NEW DataFrame with the same semantics (fresh alias ids) must hit
    r2 = cache.get_or_compute(_q(spark, mutable_input)).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))
    assert cache.stats.hits == 1 and cache.stats.misses == 1


def test_different_plans_miss(spark, cache, mutable_input):
    cache.get_or_compute(_q(spark, mutable_input))
    other = spark.read.parquet(mutable_input).groupBy("r_regionkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    cache.get_or_compute(other)
    assert cache.stats.misses == 2


def test_input_change_invalidates(spark, cache, mutable_input):
    before = cache.get_or_compute(_q(spark, mutable_input)).collect()
    # append a row: same plan, changed input files -> must recompute
    spark.createDataFrame(
        [(99, "ZEDLAND", "appended")],
        "r_regionkey int, r_name string, r_comment string",
    ).write.mode("append").parquet(mutable_input)
    after = cache.get_or_compute(_q(spark, mutable_input)).collect()
    assert cache.stats.misses == 2, "changed input must not serve the stale entry"
    assert sum(r.n for r in after) == sum(r.n for r in before) + 1


def test_torn_entry_is_a_miss_not_poison(spark, cache, mutable_input):
    df = _q(spark, mutable_input)
    key = cache.key_for(df)
    # simulate a crash mid-write: entry dir without _SUCCESS
    torn = os.path.join(cache.root, key)
    os.makedirs(torn)
    out = cache.get_or_compute(df).collect()
    assert cache.stats.misses == 1
    assert out  # recomputed fine
    shutil.rmtree(torn, ignore_errors=True)


def test_evict_all(spark, cache, mutable_input):
    cache.get_or_compute(_q(spark, mutable_input))
    assert cache.evict_all() >= 1
    cache.get_or_compute(_q(spark, mutable_input))
    assert cache.stats.misses == 2
