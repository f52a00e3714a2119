"""Incremental training-corpus refresh: new documents arrive in batches,
and the corpus state (exact-dedup keepers, LSH band index, verified
near-dup pairs, takedown tombstones) is MERGED per batch instead of
recomputed — the production shape at 100 TB, where re-running the
one-shot pipeline on every ingest tick would re-shingle the whole corpus.

Reference analogue: the watermark/incremental machinery of
`elt-common/src/elt_common/runner.py:67-107` (each tick processes only
the delta and folds it into persisted state), applied to the dedup/split
stages of pipelines/training_corpus.py; the commit protocol is the same
transactional write+property commit the reference gets from pyiceberg
(`elt-common/src/elt_common/iceberg/io.py:92-113`), supplied here by the
repo's own snapshot layer.

Persisted state: FIVE snapshot tables (tables/snapshots.py — the same
atomic-commit/time-travel/expiry mechanism every other warehouse table
uses; no bespoke directory convention):

    state_dir/live        one row per kept document (min-id per fingerprint)
    state_dir/band_index  the LSH band rows of every live doc
                          (operators/dedup.py::minhash_band_rows, the
                          bucket-keyed index incremental_minhash_candidates
                          probes)
    state_dir/pairs       verified near-dup pairs among live docs
    state_dir/counts      per-batch raw/clean tallies (arrival history)
    state_dir/tombstones  fingerprints of taken-down content — a batch
                          re-ingesting erased content is filtered at the
                          door, so GDPR erasure survives later refreshes

A STATE VERSION is a named ref ``state_v{batch_id}`` across the five
tables. Commits are DELTAS, not rewrites: each non-bootstrap tick
appends its new rows (O(batch)) and records evictions/takedowns as
merge-on-read equality-delete files (O(keys) — Iceberg v2 semantics, no
data file rewritten), so a tick's WRITE cost is O(delta) while versions
still share unchanged files by reference. The bootstrap tick is a full
replace (delta == full state). Refs are then set in a fixed order with
``counts`` LAST — the counts ref IS the commit marker. Readers and the
predecessor rule recognize only versions whose counts ref exists, so a
crash anywhere mid-commit leaves the previous version live and the torn
attempt invisible (its snapshots are garbage-collected by
``expire_state_versions``). Because delta commits advance each part
table's own history, every tick REBASES first: if a part's current
version differs from the predecessor's pinned ref (a crashed attempt),
it is rolled back — restoring files AND the delete list — before this
tick's delta applies; a ``foreachBatch`` retry of the same batch_id is
therefore idempotent (pinned by test). Accumulated delete files are
compacted by ``compact_state_deletes`` (maintenance), which re-points
the latest ref at the materialized version.

Provable-collapse contract (what the oracle gate checks): after any
sequence of refreshes and takedowns, the state equals the ONE-SHOT
pipeline run on (the union of all batches MINUS every document whose
normalized-text fingerprint was ever taken down) —

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
   pairs);
5. a taken-down fingerprint never re-enters: existing keepers are removed
   at takedown time (with the eviction cascade) and later arrivals are
   anti-joined against the tombstone set at ingest, so the order of
   takedown vs re-ingest cannot matter.

PRECONDITION (enforced): doc_ids are stable per content — a batch may
re-deliver a (doc_id, text) pair verbatim (idempotent), but re-using a
doc_id for DIFFERENT text would leave the band index holding the stale
version's rows (the newly-live anti-join is id-keyed). The merge detects
the resulting duplicate-id live rows and fails the tick loudly instead
of committing silent corruption.

Scale shape per tick: one fingerprint-key shuffle over state ∪ batch
(map-side min partials), two id-key semi-joins for compaction,
shingling/hashing of ONLY the newly-live docs — never the corpus — and
one tombstone anti-join over the batch. The WRITE path is O(delta):
appends of the new rows plus O(keys) equality-delete files for the
eviction cascade; unchanged state files carry across versions by
reference. (The merge SHUFFLE still reads state ∪ batch — the next rung
when state ≫ batch is fingerprint-bucketed state so the batch shuffles
into it; recorded in SCALE.md.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.operators import dedup
from analytics_data_platform_spark.queries.corpus_ops import c4_core_pass
from analytics_data_platform_spark.queries.scale_ops import leak_split_of
from analytics_data_platform_spark.tables.snapshots import SnapshotTable

# the pipeline's near-dup verify threshold (pipelines/training_corpus.py)
JACCARD_THRESHOLD = 0.5

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")

# ref order within a state-version commit: counts LAST = the commit marker
# (readers recognize a version by its counts ref); expiry drops counts
# FIRST so a half-expired version is invisible, never torn
_REF_ORDER = ("live", "band_index", "pairs", "tombstones", "counts")
_PARTS = _REF_ORDER
# per-part stats columns: id/bucket bounds are what CoW/scan pruning can
# use; text-heavy columns would bloat the manifests for nothing
_STATS_COLS: dict[str, list[str] | None] = {
    "live": ["doc_id"],
    "band_index": ["doc_id"],
    "pairs": ["id_a", "id_b"],
    "counts": None,
    "tombstones": [],
}

_TOMBSTONE_SCHEMA = "_fp string"


class _InjectedCrash(RuntimeError):
    """Raised by the test-only crash hook to simulate dying mid-commit."""


def _ref(batch_id: int) -> str:
    return f"state_v{int(batch_id):05d}"


def _table(spark: SparkSession | None, state_dir: str, part: str) -> SnapshotTable:
    return SnapshotTable(spark, f"{state_dir}/{part}", stats_cols=_STATS_COLS[part])


def committed_versions(state_dir: str) -> list[int]:
    """Batch ids of fully committed state versions — exactly the refs on
    the ``counts`` table (written last, dropped first), so a torn commit
    or half-finished expiry never surfaces here."""
    refs = _table(None, state_dir, "counts").refs()
    return sorted(
        int(name[len("state_v"):]) for name in refs if name.startswith("state_v")
    )


def read_state_part(
    spark: SparkSession, state_dir: str, part: str, batch_id: int | None = None
) -> DataFrame:
    """Read one state part at a committed version (default: latest). An
    empty part (e.g. no pairs yet) comes back as an empty frame with the
    schema the commit recorded."""
    if batch_id is None:
        versions = committed_versions(state_dir)
        if not versions:
            raise FileNotFoundError(f"no committed corpus state under {state_dir}")
        batch_id = versions[-1]
    t = _table(spark, state_dir, part)
    v = t.resolve_ref(_ref(batch_id))
    if not t.snapshot(v).files:
        return spark.createDataFrame([], t._read_schema(v))
    return t.read(v)


# a per-part commit op: ("replace", full_frame) on the bootstrap tick
# (delta == full state, and a full replace also resets any torn bootstrap
# attempt), or ("delta", [(keys_df, key_cols), ...], append_df_or_None) —
# merge-on-read equality deletes + an O(batch) append, so a tick's WRITE
# cost is O(delta), never O(state)
_StateOp = tuple


def _commit_state_version(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    ops: dict[str, _StateOp],
    prior_batch: int | None,
    _crash_after: str | None = None,
) -> None:
    """Commit one state version: apply every part's op, then point the
    ``state_v{batch_id}`` refs in ``_REF_ORDER`` (counts last — the
    marker). Delta ops REBASE first: a crashed earlier attempt leaves the
    part table's current version ahead of the last committed ref, and
    appending onto the torn attempt would double-count — roll back to the
    predecessor's pinned version (restores files AND the merge-on-read
    delete list) before applying this tick's delta. ``_crash_after``
    ('replace:<part>' / 'ref:<part>') is the crash-injection hook for the
    torn-commit tests."""
    tables = {p: _table(spark, state_dir, p) for p in _PARTS}
    for part in _PARTS:
        t = tables[part]
        op = ops[part]
        if op[0] == "replace":
            t.replace(op[1])
        else:
            _, deletes, append_df = op
            if prior_batch is not None:
                pinned = t.resolve_ref(_ref(prior_batch))
                if t.current_version() != pinned:
                    t.rollback(pinned)
            for keys, key_cols in deletes:
                t.delete_keys_mor(keys, key_cols)
            if append_df is not None:
                t.append(append_df)
        if _crash_after == f"replace:{part}":
            raise _InjectedCrash(_crash_after)
    ref = _ref(batch_id)
    for part in _REF_ORDER:
        tables[part].set_ref(ref, tables[part].current_version())
        if _crash_after == f"ref:{part}":
            raise _InjectedCrash(_crash_after)


def _merge_parts(
    old_live: DataFrame,
    old_index: DataFrame,
    old_pairs: DataFrame,
    clean: DataFrame,
) -> dict[str, DataFrame]:
    """Shared construction for the merge plan AND its delta decomposition.
    No I/O; every entry is a lazy frame over the inputs (callers persist
    ``live`` — it is referenced by everything else)."""
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
    # docs evicted by a smaller-id fingerprint-duplicate in the batch —
    # the DELETE half of the delta commit (and the cascade driver)
    evicted = old_live.select("doc_id").join(
        live.select("doc_id"), "doc_id", "left_anti"
    )

    # 2) band-index maintenance: expire evicted docs' rows (live semi-join),
    #    shingle/hash ONLY the newly-live docs and append their rows.
    #    Both frames have TWO consumers (the index write/audit and the
    #    candidate join) — checkpoint so the expensive shingle+minhash of
    #    the new docs runs once per tick, not twice
    compacted = dedup.compact_band_index(
        old_index, live.select("doc_id")
    ).localCheckpoint(eager=False)
    new_rows = dedup.minhash_band_rows(newly_live).localCheckpoint(eager=False)

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
    return {
        "live": live,
        "newly_live": newly_live,
        "evicted": evicted,
        "compacted": compacted,
        "new_rows": new_rows,
        "new_pairs": new_pairs,
        "retained": retained,
    }


def merge_corpus_state(
    old_live: DataFrame,
    old_index: DataFrame,
    old_pairs: DataFrame,
    clean: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The pure state-merge plan: (old_live, old_index, old_pairs) × a
    CLEANED batch → (live, band_index, pairs). No I/O — this is the
    SEMANTIC spec the delta commit must equal; tests and the shuffle
    ledger audit these plans directly."""
    m = _merge_parts(old_live, old_index, old_pairs, clean)
    band_index = m["compacted"].unionByName(m["new_rows"])
    # join-on-id_b reorders columns; normalize before the union/write
    pairs = m["retained"].select("id_a", "id_b").unionByName(m["new_pairs"])
    return m["live"], band_index, pairs


def refresh_corpus_state(
    spark: SparkSession,
    state_dir: str,
    batch: DataFrame,
    batch_id: int,
    _crash_after: str | None = None,
) -> None:
    """Fold one arriving document batch into the persisted corpus state.

    Runs as a ``foreachBatch`` body (streaming ingestion) or as a plain
    batch call. Commits state version ``state_v{batch_id}`` across the
    five snapshot tables (see module docstring for the commit protocol);
    earlier versions stay readable (copy-on-write time travel) until
    :func:`expire_state_versions` reclaims them.
    """
    # predecessor = latest COMMITTED version with a LOWER batch id — never
    # this batch's own (possibly partial) output: a foreachBatch retry
    # replays with the same batch_id after a crash, and merging against the
    # failed attempt would double-count (idempotence test pins this); a
    # torn commit of an EARLIER batch is equally invisible because only
    # counts-ref-marked versions are listed (torn-version test pins this)
    prior = [v for v in committed_versions(state_dir) if v < int(batch_id)]

    nonempty = batch.where(F.length(F.trim("text")) > 0)
    # ONE scan for both manifest tallies (raw + clean predicates ride it).
    # Tallies are ARRIVAL history: counted before the tombstone filter —
    # erasure suppresses content from the live set, not from the record
    # that it arrived
    tallies = nonempty.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.coalesce(F.sum(c4_core_pass("text").cast("long")), F.lit(0)).alias(
            "n_clean"
        ),
    ).collect()[0]
    clean = nonempty.where(c4_core_pass("text")).select(*_DOC_COLS)

    if prior:
        old_live = read_state_part(spark, state_dir, "live", prior[-1])
        old_index = read_state_part(spark, state_dir, "band_index", prior[-1])
        old_pairs = read_state_part(spark, state_dir, "pairs", prior[-1])
        old_counts = read_state_part(spark, state_dir, "counts", prior[-1])
        old_tombstones = read_state_part(spark, state_dir, "tombstones", prior[-1])
    else:
        # bootstrap: empty state with the computed frames' own schemas —
        # the unified path below then IS the full run on the first batch
        old_live = clean.limit(0)
        old_index = dedup.minhash_band_rows(clean.limit(0))
        old_pairs = clean.select(
            F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
        ).limit(0)
        old_counts = None
        old_tombstones = spark.createDataFrame([], _TOMBSTONE_SCHEMA)

    # tombstone door: content whose fingerprint was ever taken down never
    # re-enters the live set, whatever doc_id it arrives under
    clean = clean.join(
        old_tombstones,
        dedup.fingerprint_col("text") == F.col("_fp"),
        "left_anti",
    )

    m = _merge_parts(old_live, old_index, old_pairs, clean)
    live = m["live"].persist()  # the delta frames (newly_live, evicted,
    # new_rows, new_pairs) all reference this plan subtree — Spark's
    # cache matches by logical plan, so they reuse the one materialization;
    # unpersisted after the state commit

    # precondition guard (see module docstring): a doc_id re-used for
    # DIFFERENT text lands in two fingerprint groups and both keepers carry
    # the same id — the band index would keep the stale version's rows, so
    # fail the tick loudly before anything commits. One aggregation over
    # the persisted live frame.
    reused = (
        live.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if reused:
        live.unpersist()
        raise ValueError(
            f"doc_id {reused[0].doc_id} arrived with different content than "
            "the resident version — doc_ids must be stable per content "
            "(re-delivering an identical (doc_id, text) row is fine)"
        )

    batch_counts = spark.createDataFrame(
        [(int(batch_id), int(tallies.n_raw), int(tallies.n_clean))],
        "batch_id long, n_raw long, n_clean long",
    )

    try:
        if not prior:
            # bootstrap: delta == full state; replace also resets any torn
            # bootstrap attempt (there is no committed predecessor to
            # rebase onto)
            ops: dict[str, _StateOp] = {
                "live": ("replace", live),
                "band_index": ("replace", m["compacted"].unionByName(m["new_rows"])),
                "pairs": (
                    "replace",
                    m["retained"].select("id_a", "id_b").unionByName(m["new_pairs"]),
                ),
                "counts": ("replace", batch_counts),
                "tombstones": ("replace", old_tombstones.select("_fp")),
            }
            _commit_state_version(
                spark, state_dir, batch_id, ops, None, _crash_after=_crash_after
            )
        else:
            # delta commit: O(batch) appends + merge-on-read equality
            # deletes for the (rare) eviction cascade — the state is never
            # rewritten in full
            evicted = m["evicted"].persist()
            try:
                ev: list[tuple[DataFrame, list[str]]] = []
                ev_pairs: list[tuple[DataFrame, list[str]]] = []
                if not evicted.isEmpty():
                    ev = [(evicted, ["doc_id"])]
                    ev_pairs = [
                        (evicted.withColumnRenamed("doc_id", "id_a"), ["id_a"]),
                        (evicted.withColumnRenamed("doc_id", "id_b"), ["id_b"]),
                    ]
                ops = {
                    "live": ("delta", ev, m["newly_live"].select(*_DOC_COLS)),
                    "band_index": ("delta", ev, m["new_rows"]),
                    "pairs": ("delta", ev_pairs, m["new_pairs"]),
                    "counts": ("delta", [], batch_counts),
                    "tombstones": ("delta", [], None),
                }
                _commit_state_version(
                    spark,
                    state_dir,
                    batch_id,
                    ops,
                    prior[-1],
                    _crash_after=_crash_after,
                )
            finally:
                evicted.unpersist()
    finally:
        live.unpersist()


def takedown_state_plan(
    old_live: DataFrame,
    old_index: DataFrame,
    old_pairs: DataFrame,
    old_tombstones: DataFrame,
    takedown: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The pure takedown plan: state × a takedown request set →
    (live, band_index, pairs, tombstones). No I/O — the plan-audit sweep
    and tests inspect these frames directly (the registry query
    materializes them, which would otherwise hide the per-tick shuffles
    from the shuffle ledger)."""
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
    tombstones = old_tombstones.select("_fp").unionByName(td_fps).distinct()
    return live, band_index, pairs, tombstones


def takedown_corpus_state(
    spark: SparkSession,
    state_dir: str,
    takedown: DataFrame,
    batch_id: int,
    _crash_after: str | None = None,
) -> None:
    """Content-based TAKEDOWN tick (GDPR erasure / opt-out / license
    removal): remove every live document whose normalized-text
    FINGERPRINT matches a takedown request, cascade into the band index
    and pair state exactly like an eviction, and record the fingerprints
    as TOMBSTONES so a later refresh re-ingesting the same content is
    filtered at the door (erasure is durable, not
    until-the-next-crawl-tick).

    Takedowns are content-keyed, not id-keyed, because exact duplicates
    of removed content must go too — a request names text the corpus may
    hold under any doc_id (including ids deduped away and never stored).
    Removing by fingerprint keeps the provable-collapse contract: the
    state equals the one-shot pipeline over (all arrived docs minus every
    doc carrying a tombstoned fingerprint). The ingest tallies
    (``counts``) are historical arrival records and are deliberately NOT
    rewritten.

    Scale shape: one fingerprint semi-join over live to find the removed
    ids, then O(keys) merge-on-read equality-delete commits cascade the
    removal into the index and pair state — nothing is re-shingled and NO
    data file is rewritten (compaction happens in maintenance).
    """
    prior = [v for v in committed_versions(state_dir) if v < int(batch_id)]
    if not prior:
        raise ValueError("takedown requires existing corpus state")
    old_live = read_state_part(spark, state_dir, "live", prior[-1])
    old_tombstones = read_state_part(spark, state_dir, "tombstones", prior[-1])

    # delta decomposition of takedown_state_plan (the pure spec): removal
    # is the id set of live docs whose fingerprint matches a request —
    # merge-on-read equality deletes cascade it into the index and pairs,
    # and only the NEW fingerprints append to the tombstone set
    td_fps = takedown.select(dedup.fingerprint_col("text").alias("_fp")).distinct()
    removed = (
        old_live.join(
            td_fps, dedup.fingerprint_col("text") == F.col("_fp"), "left_semi"
        )
        .select("doc_id")
        .persist()
    )
    new_fps = td_fps.join(old_tombstones.select("_fp"), "_fp", "left_anti")

    try:
        rm: list[tuple[DataFrame, list[str]]] = []
        rm_pairs: list[tuple[DataFrame, list[str]]] = []
        if not removed.isEmpty():
            rm = [(removed, ["doc_id"])]
            rm_pairs = [
                (removed.withColumnRenamed("doc_id", "id_a"), ["id_a"]),
                (removed.withColumnRenamed("doc_id", "id_b"), ["id_b"]),
            ]
        ops: dict[str, _StateOp] = {
            "live": ("delta", rm, None),
            "band_index": ("delta", rm, None),
            "pairs": ("delta", rm_pairs, None),
            "counts": ("delta", [], None),
            "tombstones": ("delta", [], new_fps),
        }
        _commit_state_version(
            spark, state_dir, batch_id, ops, prior[-1], _crash_after=_crash_after
        )
    finally:
        removed.unpersist()


def expire_state_versions(
    state_dir: str, keep_last: int = 2, spark: SparkSession | None = None
) -> list[str]:
    """Expire old copy-on-write state versions (the M3 expire_snapshots
    analog for incremental-pipeline state): every committed version before
    the last ``keep_last`` is removed. Commits are deltas, so versions
    SHARE unchanged files by reference; the snapshot layer's
    reference-counting expiry only reclaims files no surviving version
    needs, and named refs pin surviving versions against it — expiry
    never breaks a later read. keep_last >= 2 (the
    default) also keeps the latest batch's predecessor, so a foreachBatch
    retry of the CURRENT batch — the only batch the checkpoint can replay
    — still finds its true prior state after expiry.

    Mechanism: drop the version's refs (``counts`` FIRST, so a crash
    mid-expiry leaves the version invisible, never torn), then run the
    snapshot layer's own ``expire_snapshots`` per part table — which also
    garbage-collects the unreferenced snapshots a torn commit left
    behind. Returns the removed version names."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    ids = committed_versions(state_dir)
    doomed = ids[:-keep_last]
    for b in doomed:
        ref = _ref(b)
        for part in reversed(_REF_ORDER):  # counts first
            _table(spark, state_dir, part).drop_ref(ref)
    for part in _PARTS:
        t = _table(spark, state_dir, part)
        if t.versions():
            t.expire_snapshots(keep_last=1)
    return [_ref(b) for b in doomed]


def compact_state_deletes(spark: SparkSession, state_dir: str) -> list[str]:
    """Materialize accumulated merge-on-read delete files (the read-side
    anti-joins delta commits leave behind) into rewritten data — the
    compaction step that keeps state reads O(data). Only runs on a part
    whose current version IS the latest committed ref (a crashed tick's
    torn head must be rebased by the next tick, not compacted), and
    re-points the latest ref at the materialized version (same rows, so
    the state version's meaning is unchanged — without the re-point, the
    next tick's rebase would roll the compaction back). Returns the parts
    compacted."""
    ids = committed_versions(state_dir)
    if not ids:
        return []
    ref = _ref(ids[-1])
    done: list[str] = []
    for part in _PARTS:
        t = _table(spark, state_dir, part)
        head = t.current_version()
        if head is None or t.resolve_ref(ref) != head:
            continue
        if not t.snapshot(head).delete_files:
            continue
        new_head = t.apply_deletes()
        t.set_ref(ref, new_head)
        done.append(part)
    return done


def representative_merge_plans(
    spark: SparkSession, sf_dir: str, with_tombstones: bool = False
) -> list[tuple[str, DataFrame]]:
    """Un-materialized representative REFRESH-tick plans for the shuffle
    ledger and plan-audit sweep: old state = the even-id half of the
    documents table (cleaned + exact-deduped + its band rows), batch = the
    odd half — the same construction tests/test_incremental_pipeline.py
    audits. ``with_tombstones`` adds the ingest-door anti-join (the
    tombstone-reingest query's tick shape)."""
    from analytics_data_platform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    old = (
        docs.where(F.col("doc_id") % 2 == 0)
        .where(c4_core_pass("text"))
        .select(*_DOC_COLS)
    )
    old_live = dedup.dedup_exact(old)
    old_index = dedup.minhash_band_rows(old_live)
    old_pairs = old_live.select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    ).limit(0)
    batch = (
        docs.where(F.col("doc_id") % 2 == 1)
        .where(c4_core_pass("text"))
        .select(*_DOC_COLS)
    )
    if with_tombstones:
        tombstones = (
            docs.where(F.col("doc_id") % 97 == 0)
            .select(dedup.fingerprint_col("text").alias("_fp"))
            .distinct()
        )
        batch = batch.join(
            tombstones, dedup.fingerprint_col("text") == F.col("_fp"), "left_anti"
        )
    live, band_index, pairs = merge_corpus_state(old_live, old_index, old_pairs, batch)
    return [("live", live), ("band_index", band_index), ("pairs", pairs)]


def representative_takedown_plans(
    spark: SparkSession, sf_dir: str
) -> list[tuple[str, DataFrame]]:
    """Un-materialized representative TAKEDOWN-tick plans: state = the
    cleaned + exact-deduped documents table with its band rows, request =
    the doc_id % 97 content set (the registry query's request rule)."""
    from analytics_data_platform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    clean = docs.where(c4_core_pass("text")).select(*_DOC_COLS)
    old_live = dedup.dedup_exact(clean)
    old_index = dedup.minhash_band_rows(old_live)
    old_pairs = old_live.select(
        F.col("doc_id").alias("id_a"), F.col("doc_id").alias("id_b")
    ).limit(0)
    old_tombstones = spark.createDataFrame([], _TOMBSTONE_SCHEMA)
    takedown = docs.where(F.col("doc_id") % 97 == 0)
    live, band_index, pairs, tombstones = takedown_state_plan(
        old_live, old_index, old_pairs, old_tombstones, takedown
    )
    return [
        ("live", live),
        ("band_index", band_index),
        ("pairs", pairs),
        ("tombstones", tombstones),
    ]


def corpus_split_manifest(spark: SparkSession, state_dir: str) -> list[tuple[str, int]]:
    """Stage manifest of the CURRENT committed state: raw/clean tallies,
    live doc count, and the leakage-safe split counts (near-dup components
    hash to one split; the same rule as the one-shot pipeline)."""
    live = read_state_part(spark, state_dir, "live")
    pairs = read_state_part(spark, state_dir, "pairs")
    counts = read_state_part(spark, state_dir, "counts")

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
