#!/usr/bin/env python
"""Deep profile of one refresh_corpus_state tick pair at sf0.1: times the
snapshot-layer commits and dedup building blocks inside each tick."""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from analytics_data_platform_spark.session import get_spark

CALLS: list[tuple[str, float]] = []
DEPTH = [0]


def timed(label, fn):
    def wrap(*a, **k):
        DEPTH[0] += 1
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            DEPTH[0] -= 1
            CALLS.append(("  " * DEPTH[0] + label, time.perf_counter() - t0))
    return wrap


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="adps-profile-refresh")

    from analytics_data_platform_spark.operators import dedup
    from analytics_data_platform_spark.tables.snapshots import SnapshotTable
    import analytics_data_platform_spark.pipelines.incremental as incr
    from analytics_data_platform_spark.sources.testdata import load_table

    for m in ("append", "replace", "delete_keys_mor", "set_ref", "_write_files"):
        setattr(SnapshotTable, m, timed(f"snap.{m}", getattr(SnapshotTable, m)))
    for fname in (
        "minhash_band_rows",
        "exact_jaccard_pairs",
        "incremental_minhash_candidates",
    ):
        setattr(dedup, fname, timed(f"dedup.{fname}", getattr(dedup, fname)))
    incr.batch_keepers = timed("batch_keepers", incr.batch_keepers)
    incr.delta_merge_parts = timed("delta_merge_parts(plan)", incr.delta_merge_parts)
    incr._commit_state_version = timed("commit_state_version", incr._commit_state_version)

    docs = load_table(spark, sf_dir, "documents")
    # warmup
    docs.agg(F.count(F.lit(1))).collect()

    state = tempfile.mkdtemp(prefix="adps-prof-state-")
    for tick, batch in (
        (0, docs.where(F.col("doc_id") % 2 == 0)),
        (1, docs.where(F.col("doc_id") % 2 == 1)),
    ):
        CALLS.clear()
        t0 = time.perf_counter()
        incr.refresh_corpus_state(spark, state, batch, tick)
        total = time.perf_counter() - t0
        print(f"\n=== tick {tick}: {total:.2f}s ===")
        for label, dt in CALLS:
            print(f"  {dt:7.2f}s  {label}")
        acc = sum(dt for label, dt in CALLS if not label.startswith(" "))
        print(f"  {total - acc:7.2f}s  (else: annotate/tallies/guards/collects)")
    import shutil

    shutil.rmtree(state, ignore_errors=True)


if __name__ == "__main__":
    main()
