"""Versioned parquet tables (tables/versioned.py): the atomic-commit
protocol the parquet fallback otherwise lacks — pointer flips, crash
consistency, time travel, rollback, vacuum."""

from __future__ import annotations

import os

import pytest

from analytics_data_platform_spark.tables.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_replace_is_versioned_and_time_travels(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    v1 = t.replace(_df(spark, [(1, "a"), (2, "b")]))
    v2 = t.replace(_df(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    assert {r.id for r in t.read().collect()} == {3}
    assert {r.id for r in t.read(version=1).collect()} == {1, 2}


def test_merge_is_atomic_upsert(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.replace(_df(spark, [(1, "a"), (2, "b")]))
    t.merge(_df(spark, [(2, "B"), (3, "c")]), keys=["id"])
    rows = {r.id: r.val for r in t.read().collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}
    # previous state intact under time travel
    old = {r.id: r.val for r in t.read(version=1).collect()}
    assert old == {1: "a", 2: "b"}


def test_crashed_write_leaves_readers_on_old_version(spark, tmp_path):
    """A version directory without a pointer flip (crash between write and
    commit) must be invisible: readers stay on the old version."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.replace(_df(spark, [(1, "a")]))
    # simulate a crashed writer: the data landed, the pointer never flipped
    _df(spark, [(9, "garbage")]).write.parquet(os.path.join(t.root, "v=2"))
    assert {r.id for r in t.read().collect()} == {1}
    # the next successful writer must NOT reuse the orphaned version number
    v = t.replace(_df(spark, [(2, "b")]))
    assert v == 3
    assert {r.id for r in t.read().collect()} == {2}


def test_rollback_is_pointer_flip(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.replace(_df(spark, [(1, "a")]))
    t.replace(_df(spark, [(2, "b")]))
    t.rollback(1)
    assert {r.id for r in t.read().collect()} == {1}
    with pytest.raises(FileNotFoundError):
        t.rollback(99)


def test_vacuum_keeps_live_and_recent(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.replace(_df(spark, [(i, "x")]))
    t.rollback(1)  # live version is OLD
    removed = t.vacuum(keep_last=2)
    assert 1 not in removed, "vacuum must never remove the live version"
    assert t.versions() == sorted(set(t.versions()))
    assert {r.id for r in t.read().collect()} == {0}


def test_read_empty_table_raises(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.read()


def test_version_diff_classifies_changes(spark, tmp_path):
    from analytics_data_platform_spark.tables.versioned import version_diff

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.replace(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.merge(_df(spark, [(2, "B"), (4, "d")]), keys=["id"])
    changes = {r.id: r.change for r in version_diff(t, ["id"], 1, 2).collect()}
    assert changes == {2: "update", 4: "insert"}
    t.replace(_df(spark, [(2, "B")]))
    changes = {r.id: r.change for r in version_diff(t, ["id"], 2, 3).collect()}
    assert changes == {1: "delete", 3: "delete", 4: "delete"}
