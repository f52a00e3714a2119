"""SnapshotTable.changelog + pipelines.incremental.state_changelog: the
manifest-derived CDC read (Iceberg changelog analog). Contract: for any
adjacent pair of committed state ticks, (appeared, evicted) computed
straight from the tick's appended data files and merge-on-read
delete-key files must equal the anti-join diff of the two full live
versions — while READING only delta-sized files (no version-diff join,
nothing state-sized scanned), and refusing ranges that contain rewrites."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.pipelines.incremental import (
    _ref,
    _table,
    read_state_part,
    refresh_corpus_state,
    state_changelog,
    takedown_corpus_state,
)
from analytics_data_platform_spark.sources.testdata import load_table


def _remapped(docs, id_expr):
    """The documents table with REMAPPED doc_ids (same texts, so C4
    cleaning and fingerprints are unchanged) — lets a later batch deliver
    duplicate content under SMALLER ids, guaranteeing keeper evictions."""
    return docs.select(
        id_expr.cast("long").alias("doc_id"), "text", "lang", "source", "n_chars"
    )


def _live_ids(spark, state, tick):
    return {
        r.doc_id
        for r in read_state_part(spark, state, "live", tick).select("doc_id").collect()
    }


def _three_tick_state(spark, tmp_path, sf_dir):
    """tick0: every doc under ids shifted +10^6 (big ids); tick1: a third
    of the SAME texts under their original (smaller) ids — every clean
    keeper among them EVICTS a resident; tick2: content takedown."""
    docs = load_table(spark, sf_dir, "documents")
    state = str(tmp_path / "state")
    refresh_corpus_state(
        spark, state, _remapped(docs, F.col("doc_id") + 1_000_000), 0
    )
    refresh_corpus_state(
        spark, state, docs.where(F.col("doc_id") % 3 == 0), 1
    )
    takedown_corpus_state(spark, state, docs.where(F.col("doc_id") % 17 == 0), 2)
    return docs, state


def test_changelog_equals_antijoin_diff_with_evictions(spark, tmp_path, sf_dir):
    docs, state = _three_tick_state(spark, tmp_path, sf_dir)

    total_evicted = 0
    for tick in (1, 2):
        prev_ids = _live_ids(spark, state, tick - 1)
        cur = read_state_part(spark, state, "live", tick)
        cur_ids = {r.doc_id for r in cur.select("doc_id").collect()}

        appeared, evicted = state_changelog(
            spark, state, "live", tick - 1, tick, key_cols=["doc_id"]
        )
        got_appeared = {r.doc_id for r in appeared.select("doc_id").collect()}
        got_evicted = {r.doc_id for r in evicted.collect()}

        assert got_appeared == cur_ids - prev_ids
        assert got_evicted == prev_ids - cur_ids
        total_evicted += len(got_evicted)

        # appeared carries FULL rows equal to the live version's rows
        want_rows = {
            tuple(r)
            for r in cur.join(
                F.broadcast(
                    spark.createDataFrame(
                        [(i,) for i in sorted(got_appeared)] or [], "doc_id long"
                    )
                ),
                "doc_id",
                "left_semi",
            ).collect()
        }
        assert {tuple(r) for r in appeared.collect()} == want_rows

    assert total_evicted > 0, "fixture must exercise real evictions"


def test_changelog_reads_only_delta_files_no_state_join(spark, tmp_path, sf_dir):
    """The O(delta) claim, pinned on the executed artifacts: the appeared
    frame reads ONLY the tick's appended data files, the evicted frame
    reads ONLY delete-key files (+ at most the same appended files for
    the intra-range net-zero rule), and neither plan contains a
    state-sized join (no SortMergeJoin / ShuffledHashJoin anywhere)."""
    _docs, state = _three_tick_state(spark, tmp_path, sf_dir)
    live_t = _table(spark, state, "live")
    v0 = live_t.resolve_ref(_ref(0))
    v1 = live_t.resolve_ref(_ref(1))
    s0 = live_t.snapshot(v0)
    s1 = live_t.snapshot(v1)
    old_paths = {f.path for f in s0.files}
    new_paths = {f.path for f in s1.files} - old_paths
    delete_paths = {
        p
        for e in s1.delete_files
        if e["path"] not in {d["path"] for d in s0.delete_files}
        for p in (e["path"], *e.get("extra_paths", []))
    }
    assert new_paths and delete_paths, "tick 1 must both append and evict"

    appeared, evicted = state_changelog(spark, state, "live", 0, 1, ["doc_id"])
    appeared.collect()
    evicted.collect()

    norm = lambda paths: {os.path.abspath(p.removeprefix("file:")) for p in paths}
    assert norm(appeared.inputFiles()) <= norm(new_paths), (
        "appeared read beyond the tick's appended files"
    )
    assert norm(evicted.inputFiles()) <= norm(delete_paths | new_paths), (
        "evicted read beyond the tick's delete-key + appended files"
    )
    for df, name in ((appeared, "appeared"), (evicted, "evicted")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, f"{name}: state-sized join"
        assert "ShuffledHashJoin" not in plan, f"{name}: state-sized join"


def test_changelog_refuses_rewrite_ranges(spark, tmp_path):
    """A range containing a rewrite (apply_deletes materialization /
    replace) surfaces full file contents in an incremental read — the
    changelog must refuse loudly, never report a rewrite as churn."""
    from analytics_data_platform_spark.tables.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "doc_id long, v string")
    v1 = t.replace(df)
    t.delete_keys_mor(
        spark.createDataFrame([(3,), (7,)], "doc_id long"), ["doc_id"]
    )
    t.append(spark.createDataFrame([(100, "x")], "doc_id long, v string"))
    v3 = t.current_version()

    # append + MOR-delete lineage: fine
    appeared, evicted = t.changelog(v1, v3, key_cols=["doc_id"])
    assert {r.doc_id for r in appeared.collect()} == {100}
    assert {r.doc_id for r in evicted.collect()} == {3, 7}

    v4 = t.apply_deletes()  # rewrite: every surviving row lands in new files
    with pytest.raises(ValueError, match="append lineage"):
        t.changelog(v1, v4, key_cols=["doc_id"])
    with pytest.raises(ValueError, match="append lineage"):
        t.changelog(v3, v4, key_cols=["doc_id"])
    # post-rewrite ranges are clean again
    t.append(spark.createDataFrame([(101, "y")], "doc_id long, v string"))
    appeared, evicted = t.changelog(v4, key_cols=["doc_id"])
    assert {r.doc_id for r in appeared.collect()} == {101}
    assert evicted.count() == 0

    # wrong key_cols refuse rather than mis-join
    t.delete_keys_mor(spark.createDataFrame([(101,)], "doc_id long"), ["doc_id"])
    with pytest.raises(ValueError, match="keyed on"):
        t.changelog(v4, key_cols=["v"])


def test_changelog_nets_out_intra_range_append_then_delete(spark, tmp_path):
    """A key appended AND deleted inside the range was never live at
    from_version: it must appear in NEITHER side (the MOR read nets the
    appeared row; the new-file anti-join nets the evicted key)."""
    from analytics_data_platform_spark.tables.snapshots import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "t"))
    v1 = t.replace(spark.createDataFrame([(1, "a")], "doc_id long, v string"))
    t.append(spark.createDataFrame([(2, "b"), (3, "c")], "doc_id long, v string"))
    # delete 2 (appended in-range) and 1 (live at from)
    t.delete_keys_mor(spark.createDataFrame([(2,), (1,)], "doc_id long"), ["doc_id"])
    appeared, evicted = t.changelog(v1, key_cols=["doc_id"])
    assert {r.doc_id for r in appeared.collect()} == {3}
    assert {r.doc_id for r in evicted.collect()} == {1}
