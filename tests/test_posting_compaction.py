"""Per-bucket posting-list compaction (tables/maintenance.py::
compact_posting_buckets): incremental partition-wise appends accumulate
one small file per ingest tick in every bucket directory — the index
family's version of the merge-on-read delete debt. Compaction must
shrink the file counts WITHOUT changing a single served result, and a
torn swap must be recoverable."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from analytics_data_platform_spark.queries.search_ops import (
    CONJ_TERMS,
    INDEX_BUCKETS,
    _conjunctive_serve,
    _posting_rows,
)
from analytics_data_platform_spark.sources.testdata import load_table
from analytics_data_platform_spark.tables.maintenance import (
    compact_posting_buckets,
    recover_posting_compaction,
)


def _bucket_files(idx: str) -> dict[str, int]:
    return {
        n: len([f for f in os.listdir(os.path.join(idx, n)) if f.endswith(".parquet")])
        for n in os.listdir(idx)
        if n.startswith("bucket=")
    }


def _build_incremental_index(spark, sf_dir, idx: str) -> None:
    d = load_table(spark, sf_dir, "documents")
    _posting_rows(d.where(F.col("doc_id") % 3 == 0)).write.partitionBy(
        "bucket"
    ).parquet(idx)
    for tick in (1, 2):  # two ingest ticks append a file per bucket each
        _posting_rows(d.where(F.col("doc_id") % 3 == tick)).write.mode(
            "append"
        ).partitionBy("bucket").parquet(idx)


def _serve_hash(spark, idx: str):
    want = [
        r["bucket"]
        for r in spark.createDataFrame([(t,) for t in CONJ_TERMS], "term string")
        .select(F.pmod(F.hash("term"), F.lit(INDEX_BUCKETS)).alias("bucket"))
        .collect()
    ]
    index = spark.read.parquet(idx)
    served = _conjunctive_serve(index.where(F.col("bucket").isin(*want)))
    full = index.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("term", "doc_id").cast("decimal(38,0)")).alias("h"),
    )
    return sorted(map(tuple, served.collect())), sorted(map(tuple, full.collect()))


def test_compaction_shrinks_files_and_preserves_serving(spark, tmp_path, sf_dir):
    idx = str(tmp_path / "idx")
    _build_incremental_index(spark, sf_dir, idx)
    before_files = _bucket_files(idx)
    assert max(before_files.values()) >= 3, "appends must have left small files"
    served_before, content_before = _serve_hash(spark, idx)

    done = compact_posting_buckets(spark, idx)
    assert done, "oversized buckets must be compacted"
    after_files = _bucket_files(idx)
    assert set(after_files) == set(before_files), "no bucket may appear/vanish"
    assert all(
        n == 1 for b, n in after_files.items() if before_files[b] >= 2
    ), after_files

    served_after, content_after = _serve_hash(spark, idx)
    assert served_after == served_before, "serving changed across compaction"
    assert content_after == content_before, "index content changed"

    # idempotent: a second pass finds nothing oversized
    assert compact_posting_buckets(spark, idx) == []


def test_zero_row_oversized_bucket_compacts_to_one_file(spark, tmp_path, sf_dir):
    """A bucket whose resident files are all EMPTY (every row deleted /
    empty-batch appends) still owes its file-count debt: compaction must
    rewrite N empty files to ONE empty file — not skip the bucket, which
    would let a fleet of many-file empty buckets dodge compaction forever."""
    import pyarrow.parquet as pq

    idx = str(tmp_path / "idx")
    _build_incremental_index(spark, sf_dir, idx)
    # clone a resident file's footer schema into 3 zero-row files
    donor_bucket = next(n for n in sorted(os.listdir(idx)) if n.startswith("bucket="))
    donor = next(
        f
        for f in os.listdir(os.path.join(idx, donor_bucket))
        if f.endswith(".parquet")
    )
    schema = pq.read_schema(os.path.join(idx, donor_bucket, donor))
    empty_dir = os.path.join(idx, "bucket=999")
    os.makedirs(empty_dir)
    for i in range(3):
        pq.write_table(schema.empty_table(), os.path.join(empty_dir, f"e{i}.parquet"))
    _, content_before = _serve_hash(spark, idx)

    done = compact_posting_buckets(spark, idx)
    assert any(d.startswith("bucket=999:") for d in done), done
    files = [f for f in os.listdir(empty_dir) if f.endswith(".parquet")]
    assert len(files) == 1, files
    assert spark.read.parquet(empty_dir).count() == 0
    _, content_after = _serve_hash(spark, idx)
    assert content_after == content_before, "compaction changed index content"
    # idempotent: the single-file empty bucket is no longer oversized
    assert compact_posting_buckets(spark, idx) == []


def test_torn_swap_recovers_both_ways(spark, tmp_path, sf_dir):
    idx = str(tmp_path / "idx")
    _build_incremental_index(spark, sf_dir, idx)
    _, content_before = _serve_hash(spark, idx)
    buckets = sorted(n for n in os.listdir(idx) if n.startswith("bucket="))

    # crash window A: resident dir retired, staged dir never installed
    victim = buckets[0]
    os.rename(os.path.join(idx, victim), os.path.join(idx, f"_old.{victim}"))
    actions = recover_posting_compaction(idx)
    assert any("restored" in a for a in actions)

    # crash window B: install completed, retired copy not yet dropped —
    # the retired dir must go, not double-count (underscore prefix keeps
    # it invisible to readers meanwhile)
    victim_dir = os.path.join(idx, buckets[1])
    os.makedirs(os.path.join(idx, f"_old.{buckets[1]}"))
    open(os.path.join(idx, f"_old.{buckets[1]}", "stale.parquet"), "w").close()
    assert os.path.exists(victim_dir)
    actions = recover_posting_compaction(idx)
    assert any("dropped retired" in a for a in actions)

    # crash window C: a stage written but never swapped in
    os.makedirs(os.path.join(idx, "_stage.abc"))
    actions = recover_posting_compaction(idx)
    assert any("stale stage" in a for a in actions)

    _, content_after = _serve_hash(spark, idx)
    assert content_after == content_before, "recovery must restore exact content"
