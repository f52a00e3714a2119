"""Incremental training-corpus refresh: new documents arrive in batches,
and the corpus state (exact-dedup keepers, LSH band index, verified
near-dup pairs) is MERGED per batch instead of recomputed — the
production shape at 100 TB, where re-running the one-shot pipeline on
every ingest tick would re-shingle the whole corpus.

Reference analogue: the watermark/incremental machinery of
`elt-common/src/elt_common/runner.py:67-107` (each tick processes only
the delta and folds it into persisted state), applied to the dedup/split
stages of pipelines/training_corpus.py.

Persisted state per version (plain parquet; an Iceberg table at scale):

- ``live``       — one row per kept document (min-id per fingerprint),
- ``band_index`` — the LSH band rows of every live doc
  (operators/dedup.py::minhash_band_rows, the bucket-keyed index that
  :func:`~analytics_data_platform_spark.operators.dedup.incremental_minhash_candidates`
  probes),
- ``pairs``      — verified near-dup pairs among live docs,
- ``counts``     — per-batch raw/clean tallies (manifest bookkeeping).

Provable-collapse contract (what the oracle gate checks): after any
sequence of refreshes, the state equals the ONE-SHOT pipeline run on the
union of all batches —

1. the exact-dedup keeper rule (min doc_id per fingerprint) is an
   associative/commutative min, so per-batch merging equals the global
   collapse; a batch doc can EVICT a previously-kept doc (same
   fingerprint, smaller id) and the eviction cascades into 2–3;
2. band rows are a deterministic function of a doc's text, so the
   compact-then-append index always equals ``minhash_band_rows(live)``;
3. every one-shot pair touches only live docs, and every pair is either
   old×old (present in the retained pair state — both docs were live
   together in an earlier tick, same text ⇒ same buckets ⇒ same
   candidate ⇒ same verified jaccard) or touches a newly-live doc
   (emitted by the incremental bucket join of new band rows vs the
   compacted index); pairs touching evicted docs are filtered by the
   live semi-join exactly as the one-shot never produces them;
4. connected components + the salted component-hash split rule
   (queries/scale_ops.py::leak_split_of) are pure functions of (live,
   pairs).

Scale shape per tick: one fingerprint-key shuffle over state ∪ batch
(map-side min partials), two id-key semi-joins for compaction, and
shingling/hashing of ONLY the newly-live docs — never the corpus.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.operators import dedup
from analytics_data_platform_spark.queries.corpus_ops import c4_core_pass
from analytics_data_platform_spark.queries.scale_ops import leak_split_of

# the pipeline's near-dup verify threshold (pipelines/training_corpus.py)
JACCARD_THRESHOLD = 0.5

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _versions(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        f"{state_dir}/{d}" for d in os.listdir(state_dir) if d.startswith("state_v")
    )


def merge_corpus_state(
    old_live: DataFrame,
    old_index: DataFrame,
    old_pairs: DataFrame,
    clean: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The pure state-merge plan: (old_live, old_index, old_pairs) × a
    CLEANED batch → (live, band_index, pairs). No I/O — callers persist
    `live` (it is referenced by all three outputs) and write; tests audit
    the plans directly."""
    # 1) exact-dedup merge: min-id keeper per fingerprint over old ∪ new —
    #    associative, so the merged keeper set equals the one-shot's
    live = (
        old_live.unionByName(clean)
        .groupBy(dedup.fingerprint_col("text").alias("_fp"))
        .agg(
            F.min_by(
                F.struct(*[F.col(c) for c in _DOC_COLS]), F.col("doc_id")
            ).alias("m")
        )
        .select("m.*")
    )
    newly_live = live.join(old_live.select("doc_id"), "doc_id", "left_anti")

    # 2) band-index maintenance: expire evicted docs' rows (live semi-join),
    #    shingle/hash ONLY the newly-live docs and append their rows.
    #    Both frames have TWO consumers (the index write and the candidate
    #    join) — checkpoint so the expensive shingle+minhash of the new
    #    docs runs once per tick, not twice
    compacted = dedup.compact_band_index(
        old_index, live.select("doc_id")
    ).localCheckpoint(eager=False)
    new_rows = dedup.minhash_band_rows(newly_live).localCheckpoint(eager=False)
    band_index = compacted.unionByName(new_rows)

    # 3) near-dup candidates touching new docs: bucket equi-join of the new
    #    band rows against the compacted index (+ new×new), then the exact
    #    Jaccard verify over only the candidate docs' shingles
    cands = dedup.incremental_minhash_candidates(compacted, new_rows)
    new_pairs = (
        dedup.exact_jaccard_pairs(live, cands)
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("id_a", "id_b")
    )

    # 4) retained pairs: both endpoints still live (pairs of evicted docs
    #    die with them, exactly as the one-shot never emits them)
    live_ids = live.select("doc_id")
    retained = old_pairs.join(
        live_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
    ).join(live_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
    # join-on-id_b reorders columns; normalize before the union/write
    pairs = retained.select("id_a", "id_b").unionByName(new_pairs)
    return live, band_index, pairs


def refresh_corpus_state(
    spark: SparkSession, state_dir: str, batch: DataFrame, batch_id: int
) -> None:
    """Fold one arriving document batch into the persisted corpus state.

    Runs as a ``foreachBatch`` body (streaming ingestion) or as a plain
    batch call. Writes ``state_v{batch_id}`` under ``state_dir``; earlier
    versions are left in place (copy-on-write — the catalog-free stand-in
    for an Iceberg snapshot commit).
    """
    # predecessor = latest version with a LOWER batch id — never this
    # batch's own (possibly partial) output: a foreachBatch retry replays
    # with the same batch_id after a crash, and merging against the failed
    # attempt would double-count (idempotence test pins this)
    prior = [
        v
        for v in _versions(state_dir)
        if int(v.rsplit("state_v", 1)[1]) < int(batch_id)
    ]

    nonempty = batch.where(F.length(F.trim("text")) > 0)
    # ONE scan for both manifest tallies (raw + clean predicates ride it)
    tallies = nonempty.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.coalesce(F.sum(c4_core_pass("text").cast("long")), F.lit(0)).alias(
            "n_clean"
        ),
    ).collect()[0]
    clean = nonempty.where(c4_core_pass("text")).select(*_DOC_COLS)

    if prior:
        old_live = spark.read.parquet(f"{prior[-1]}/live")
        old_index = spark.read.parquet(f"{prior[-1]}/band_index")
        old_pairs = spark.read.parquet(f"{prior[-1]}/pairs")
        old_counts = spark.read.parquet(f"{prior[-1]}/counts")
    else:
        # bootstrap: empty state with the computed frames' own schemas —
        # the unified path below then IS the full run on the first batch
        old_live = clean.limit(0)
        old_index = dedup.minhash_band_rows(clean.limit(0))
        old_pairs = clean.select(
            F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
        ).limit(0)
        old_counts = None

    live, band_index, pairs = merge_corpus_state(old_live, old_index, old_pairs, clean)
    live = live.persist()  # reused by compaction/verify inside the lazy
    # plan AND by the write below; unpersisted after the state commit

    batch_counts = spark.createDataFrame(
        [(int(batch_id), int(tallies.n_raw), int(tallies.n_clean))],
        "batch_id long, n_raw long, n_clean long",
    )
    counts = (
        old_counts.unionByName(batch_counts) if old_counts is not None else batch_counts
    )

    out = f"{state_dir}/state_v{batch_id:05d}"
    live.write.mode("overwrite").parquet(f"{out}/live")
    band_index.write.mode("overwrite").parquet(f"{out}/band_index")
    pairs.write.mode("overwrite").parquet(f"{out}/pairs")
    counts.write.mode("overwrite").parquet(f"{out}/counts")
    live.unpersist()


def takedown_corpus_state(
    spark: SparkSession, state_dir: str, takedown: DataFrame, batch_id: int
) -> None:
    """Content-based TAKEDOWN tick (GDPR erasure / opt-out / license
    removal): remove every live document whose normalized-text
    FINGERPRINT matches a takedown request, then cascade into the band
    index and pair state exactly like an eviction.

    Takedowns are content-keyed, not id-keyed, because exact duplicates
    of removed content must go too — a request names text the corpus may
    hold under any doc_id (including ids deduped away and never stored).
    Removing by fingerprint keeps the provable-collapse contract: the
    keeper of a removed fingerprint disappears, a keeper of any other
    fingerprint is untouched, so the state equals the one-shot pipeline
    over (corpus minus all docs carrying a taken-down fingerprint). The
    ingest tallies (``counts``) are historical arrival records and are
    deliberately NOT rewritten.

    Scale shape: one fingerprint anti-join over live + the two id-key
    semi-joins of the eviction cascade; nothing is re-shingled.
    """
    prior = [
        v
        for v in _versions(state_dir)
        if int(v.rsplit("state_v", 1)[1]) < int(batch_id)
    ]
    if not prior:
        raise ValueError("takedown requires existing corpus state")
    old_live = spark.read.parquet(f"{prior[-1]}/live")
    old_index = spark.read.parquet(f"{prior[-1]}/band_index")
    old_pairs = spark.read.parquet(f"{prior[-1]}/pairs")
    old_counts = spark.read.parquet(f"{prior[-1]}/counts")

    td_fps = takedown.select(dedup.fingerprint_col("text").alias("_fp")).distinct()
    live = old_live.join(
        td_fps,
        dedup.fingerprint_col("text") == F.col("_fp"),
        "left_anti",
    )
    band_index = dedup.compact_band_index(old_index, live.select("doc_id"))
    live_ids = live.select("doc_id")
    pairs = (
        old_pairs.join(
            live_ids.withColumnRenamed("doc_id", "id_a"), "id_a", "left_semi"
        )
        .join(live_ids.withColumnRenamed("doc_id", "id_b"), "id_b", "left_semi")
        .select("id_a", "id_b")
    )

    out = f"{state_dir}/state_v{batch_id:05d}"
    live.write.mode("overwrite").parquet(f"{out}/live")
    band_index.write.mode("overwrite").parquet(f"{out}/band_index")
    pairs.write.mode("overwrite").parquet(f"{out}/pairs")
    old_counts.write.mode("overwrite").parquet(f"{out}/counts")


def expire_state_versions(state_dir: str, keep_last: int = 2) -> list[str]:
    """Expire old copy-on-write state versions (the M3 expire_snapshots
    analog for incremental-pipeline state): every version before the last
    ``keep_last`` is removed. Versions are self-contained (each holds the
    FULL live/band_index/pairs/counts state, not deltas), so expiry never
    breaks a later read. keep_last >= 2 (the default) also keeps the
    latest batch's predecessor, so a foreachBatch retry of the CURRENT
    batch — the only batch the checkpoint can replay — still finds its
    true prior state after expiry. Returns the removed version paths."""
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    doomed = _versions(state_dir)[:-keep_last]
    for v in doomed:
        shutil.rmtree(v, ignore_errors=True)
    return doomed


def corpus_split_manifest(spark: SparkSession, state_dir: str) -> list[tuple[str, int]]:
    """Stage manifest of the CURRENT state: raw/clean tallies, live doc
    count, and the leakage-safe split counts (near-dup components hash to
    one split; the same rule as the one-shot pipeline)."""
    latest = _versions(state_dir)[-1]
    live = spark.read.parquet(f"{latest}/live")
    pairs = spark.read.parquet(f"{latest}/pairs")
    counts = spark.read.parquet(f"{latest}/counts")

    cc = dedup.cluster_duplicates_star(pairs, a_col="id_a", b_col="id_b")
    assigned = (
        live.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            leak_split_of(F.coalesce(F.col("cluster_id"), F.col("doc_id"))).alias(
                "split"
            ),
        )
    )
    totals = counts.agg(
        F.sum("n_raw").alias("n_raw"), F.sum("n_clean").alias("n_clean")
    ).collect()[0]
    manifest: list[tuple[str, int]] = [
        ("raw", int(totals.n_raw)),
        ("clean", int(totals.n_clean)),
        ("exact_dedup", live.count()),
    ]
    for row in assigned.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect():
        manifest.append((f"split:{row.split}", row.n))
    return sorted(manifest)
