"""Incremental continuous aggregate: partial refresh must always equal
the full recompute, across ticks, updates to open buckets, and late data
within the lateness horizon."""

from __future__ import annotations

import datetime as dt
import uuid

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.tables.io import TableIO
from analytics_data_platform_spark.tables.rollup import refresh_time_bucket_rollup

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


@pytest.fixture()
def ns(spark):
    io = TableIO(spark)
    name = f"ca_{uuid.uuid4().hex[:8]}"
    io.ensure_namespace(name)
    yield name
    io.drop_namespace(name)


def _append(io, table, rows):
    df = io.spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    io.write_table(df, table, mode="append")


def _full_recompute(spark, src_table):
    return (
        spark.table(src_table)
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
        .select(F.col("w.start").alias("bucket_start"), "n_events", "value_sum")
    )


def _assert_matches_full(spark, io, src, tgt):
    io.invalidate_caches(tgt)
    got = {
        r.bucket_start: (r.n_events, r.value_sum) for r in spark.table(tgt).collect()
    }
    want = {
        r.bucket_start: (r.n_events, r.value_sum)
        for r in _full_recompute(spark, src).collect()
    }
    assert got == want


def test_incremental_refresh_equals_full_recompute(spark, ns):
    io = TableIO(spark)
    src, tgt = f"{ns}.events", f"{ns}.rollup"
    _append(io, src, [
        (1, T0, 1.0),
        (2, T0 + dt.timedelta(minutes=5), 2.0),
        (3, T0 + dt.timedelta(minutes=20), 3.0),
    ])
    n = refresh_time_bucket_rollup(io, src, tgt)
    assert n == 2  # two 15-min buckets
    _assert_matches_full(spark, io, src, tgt)

    # tick 2: a new bucket AND an update to the open bucket
    _append(io, src, [
        (4, T0 + dt.timedelta(minutes=25), 4.0),
        (5, T0 + dt.timedelta(minutes=40), 5.0),
    ])
    refresh_time_bucket_rollup(io, src, tgt)
    _assert_matches_full(spark, io, src, tgt)

    # tick 3: late row within the 1h lateness horizon lands in an OLD bucket
    _append(io, src, [(6, T0 + dt.timedelta(minutes=6), 10.0)])
    refresh_time_bucket_rollup(io, src, tgt)
    _assert_matches_full(spark, io, src, tgt)


def test_refresh_is_idempotent_and_bounded(spark, ns):
    io = TableIO(spark)
    src, tgt = f"{ns}.events", f"{ns}.rollup"
    _append(io, src, [(1, T0, 1.0), (2, T0 + dt.timedelta(hours=3), 2.0)])
    refresh_time_bucket_rollup(io, src, tgt)
    # re-running with no new data recomputes only the lateness horizon —
    # and changes nothing
    before = sorted(map(tuple, spark.table(tgt).collect()))
    n = refresh_time_bucket_rollup(io, src, tgt)
    io.invalidate_caches(tgt)
    assert sorted(map(tuple, spark.table(tgt).collect())) == before
    assert n <= 1  # only buckets within the 1h horizon of the watermark
    wm = io.get_watermark_json(tgt)
    assert wm and wm["max_ts"].startswith("2024-01-01 13:00")


def test_answer_from_rollup_matches_raw_aggregation(spark, ns):
    from analytics_data_platform_spark.tables.rollup import answer_from_rollup

    io = TableIO(spark)
    src, tgt = f"{ns}.events", f"{ns}.rollup"
    _append(io, src, [
        (1, T0, 1.0),
        (2, T0 + dt.timedelta(minutes=5), 2.0),
        (3, T0 + dt.timedelta(minutes=20), 3.0),
        (4, T0 + dt.timedelta(minutes=70), 4.0),
    ])
    refresh_time_bucket_rollup(io, src, tgt)

    got = sorted(
        map(tuple, answer_from_rollup(io, tgt, "1 hour").collect())
    )
    want = sorted(
        map(
            tuple,
            io.read(src)
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
            .select(F.col("w.start").alias("bucket_start"), "n_events", "value_sum")
            .collect(),
        )
    )
    assert got == want


def test_answer_from_rollup_rejects_non_multiple_and_bad_groups(spark, ns):
    from analytics_data_platform_spark.tables.rollup import answer_from_rollup

    io = TableIO(spark)
    src, tgt = f"{ns}.events", f"{ns}.rollup"
    _append(io, src, [(1, T0, 1.0)])
    refresh_time_bucket_rollup(io, src, tgt)
    with pytest.raises(ValueError, match="not a multiple"):
        answer_from_rollup(io, tgt, "25 minutes")
    with pytest.raises(ValueError, match="not present"):
        answer_from_rollup(io, tgt, "1 hour", group_cols=["event_type"])
