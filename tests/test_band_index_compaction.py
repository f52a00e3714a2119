"""Band-index expiry under re-ingest (operators/dedup.compact_band_index +
tables/maintenance.compact_band_index_table).

Scenario the round-3 verdict flagged: incremental_minhash_candidates
appends every batch's band rows to the index forever. Here a corpus is
ingested, half of it re-ingested with edited text (same ids, new
version), and some ids deleted — the raw index grows past O(live docs);
after compaction it is exactly the fresh-build index of the live latest
versions, and incremental candidates against it match a from-scratch
run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


KW = dict(num_hashes=16, bands=8, seed=7)


@pytest.fixture()
def corpus(spark):
    base = [
        (i, f"the quick brown fox jumps over lazy dog number {i} " * 3)
        for i in range(40)
    ]
    return _docs(spark, base)


def test_compaction_keeps_index_at_live_size(spark, corpus):
    v1 = dedup.minhash_band_rows(corpus, **KW).withColumn("version", F.lit(1))

    # re-ingest ids 0..19 with edited text (version 2), delete ids 30..39
    edited = _docs(
        spark,
        [(i, f"the quick brown fox NOW EDITED dog number {i} " * 3) for i in range(20)],
    )
    v2 = dedup.minhash_band_rows(edited, **KW).withColumn("version", F.lit(2))
    index = v1.unionByName(v2)  # append-forever state

    live = _docs(
        spark,
        [(i, "x") for i in range(30)],  # ids 30..39 deleted upstream
    )
    compacted = dedup.compact_band_index(index, live, version_col="version")

    # ground truth: fresh index over the live latest versions
    latest_live = edited.unionByName(
        corpus.where((F.col("doc_id") >= 20) & (F.col("doc_id") < 30))
    )
    fresh = dedup.minhash_band_rows(latest_live, **KW)

    got = sorted((r["doc_id"], r["bucket"]) for r in compacted.collect())
    want = sorted((r["doc_id"], r["bucket"]) for r in fresh.collect())
    assert got == want
    assert index.count() > len(want)  # the raw index really had dead rows


def test_candidates_after_compaction_match_fresh_index(spark, corpus):
    v1 = dedup.minhash_band_rows(corpus, **KW).withColumn("version", F.lit(1))
    edited = _docs(
        spark,
        [(i, f"totally different content about ships and sails {i} " * 3)
         for i in range(10)],
    )
    v2 = dedup.minhash_band_rows(edited, **KW).withColumn("version", F.lit(2))
    index = dedup.compact_band_index(
        v1.unionByName(v2), corpus, version_col="version"
    ).drop("version")

    batch = _docs(
        spark,
        [(100 + i, f"the quick brown fox jumps over lazy dog number {i} " * 3)
         for i in range(5)],
    )
    new_rows = dedup.minhash_band_rows(batch, **KW)
    got = dedup.incremental_minhash_candidates(index, new_rows)

    latest = edited.unionByName(corpus.where(F.col("doc_id") >= 10))
    fresh = dedup.minhash_band_rows(latest, **KW)
    want = dedup.incremental_minhash_candidates(fresh, new_rows)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_maintenance_entry_rewrites_table(spark, corpus):
    from analytics_data_platform_spark.tables.maintenance import (
        compact_band_index_table,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS band_ix_test")
    idx = dedup.minhash_band_rows(corpus, **KW)
    idx.write.mode("overwrite").saveAsTable("band_ix_test.index")
    corpus.where(F.col("doc_id") < 25).write.mode("overwrite").saveAsTable(
        "band_ix_test.docs"
    )
    msg = compact_band_index_table(
        spark, "band_ix_test.index", "band_ix_test.docs"
    )
    assert "->" in msg
    left = spark.table("band_ix_test.index")
    assert left.where(F.col("doc_id") >= 25).count() == 0
    assert left.where(F.col("doc_id") < 25).count() > 0
    # idempotent second run reports clean
    msg2 = compact_band_index_table(spark, "band_ix_test.index", "band_ix_test.docs")
    assert "clean" in msg2
    spark.sql("DROP DATABASE band_ix_test CASCADE")
