"""SCD2 apply semantics: close/keep/insert, idempotent re-delivery,
multi-generation history."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from analytics_data_platform_spark.tables.scd2 import scd2_apply

DIM_SCHEMA = (
    "k long, attr string, valid_from timestamp, valid_to timestamp, is_current boolean"
)


def _ts(s):
    return F.lit(s).cast("timestamp")


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)


def test_scd2_close_keep_insert(spark):
    dim = _dim(spark, [(1, "a", T0, None, True), (2, "b", T0, None, True)])
    out = scd2_apply(
        dim,
        _changes(spark, [(1, "a2"), (3, "new")]),
        keys=["k"],
        tracked=["attr"],
        effective_ts=_ts("2024-06-01"),
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r.k, []).append(r)
    assert len(by[1]) == 2  # closed old + new current
    closed = next(r for r in by[1] if not r.is_current)
    assert closed.attr == "a" and closed.valid_to == T1
    cur1 = next(r for r in by[1] if r.is_current)
    assert cur1.attr == "a2" and cur1.valid_from == T1 and cur1.valid_to is None
    assert len(by[2]) == 1 and by[2][0].is_current  # untouched
    assert len(by[3]) == 1 and by[3][0].attr == "new" and by[3][0].is_current


def test_scd2_identical_snapshot_is_noop(spark):
    dim = _dim(spark, [(1, "a", T0, None, True), (2, "b", T0, None, True)])
    out = scd2_apply(
        dim,
        _changes(spark, [(1, "a"), (2, "b")]),
        keys=["k"],
        tracked=["attr"],
        effective_ts=_ts("2024-06-01"),
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_two_generations_preserve_history(spark):
    dim = _dim(spark, [(1, "a", T0, None, True)])
    g1 = scd2_apply(dim, _changes(spark, [(1, "b")]), ["k"], ["attr"], _ts("2024-06-01"))
    g2 = scd2_apply(g1, _changes(spark, [(1, "c")]), ["k"], ["attr"], _ts("2024-09-01"))
    rows = sorted(g2.collect(), key=lambda r: r.valid_from)
    assert [r.attr for r in rows] == ["a", "b", "c"]
    assert [r.is_current for r in rows] == [False, False, True]
    # interval chain: each valid_to equals the successor's valid_from
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert rows[2].valid_to is None
