"""Streaming sinks into the lakehouse table layer.

``upsert_sink`` closes the loop between Structured Streaming and TableIO:
each micro-batch MERGEs into a catalog table on the given keys, giving an
exactly-once continuously-maintained table (late/replayed events update in
place instead of duplicating — the streaming twin of the batch runner's
merge mode). On an Iceberg catalog each micro-batch is one atomic MERGE
INTO snapshot commit.

Plain-catalog caveat: a parquet-backed merge is a whole-table rewrite, so
OTHER sessions holding a resolved relation must ``REFRESH TABLE`` (or
``TableIO.invalidate_caches``) before reading — per-session relation
caches cannot be invalidated remotely. Iceberg's snapshot metadata removes
this requirement, which is precisely why the cluster deployment pairs this
sink with an Iceberg catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from analytics_data_platform_spark.tables.io import TableIO


def upsert_sink(
    stream_df: DataFrame,
    table: str,
    keys: list[str],
    checkpoint: str,
    available_now: bool = True,
    partition_spec: dict[str, str] | None = None,
):
    """Start a foreachBatch MERGE writer; returns the StreamingQuery.

    With ``available_now`` the query drains current data and stops — the
    incremental-tick mode; pass False for a continuous query.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        io = TableIO(batch_df.sparkSession)
        # replays of a micro-batch (checkpoint recovery) re-merge the same
        # keys — idempotent by construction
        io.write_table(
            batch_df.dropDuplicates(keys),
            table,
            mode="merge",
            merge_on=keys,
            partition_spec=partition_spec,
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_append_sink(
    stream_df: DataFrame,
    table,
    checkpoint: str,
    app_id: str = "stream",
    available_now: bool = True,
):
    """Exactly-once streaming APPEND into a manifest SnapshotTable.

    Structured Streaming's foreachBatch is at-least-once: after a crash
    between sink commit and checkpoint advance, the SAME micro-batch id is
    replayed. Transactional sinks deduplicate by recording a transactional
    watermark inside their own commit (Delta's ``txnAppId``/``txnVersion``
    pattern) — this sink does the same with the manifest layer: each
    append commits with op ``stream-append:<app_id>:<batchId>``; a
    replayed (app_id, batch) already in the snapshot lineage is skipped,
    so rows land EXACTLY once no matter where the crash fell — including
    full checkpoint loss, as long as the caller keeps ``app_id`` stable.
    (`tables/snapshots.py` commits are atomic, so the op marker and the
    data files appear together or not at all.) Start a logically new
    stream into the same table with a NEW app_id.
    """

    def committed_batch_ids(t) -> set[int]:
        ids = set()
        prefix = f"stream-append:{app_id}:"
        for h in t.history():
            if h["op"].startswith(prefix):
                ids.add(int(h["op"].rsplit(":", 1)[1]))
        return ids

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table):
            return  # replayed micro-batch: already in the table lineage
        new = table._write_files(batch_df)
        parent = table.snapshot().files if table.current_version() else []
        table._commit(parent + new, f"stream-append:{app_id}:{batch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def snapshot_upsert_sink(
    stream_df: DataFrame,
    table,
    keys: list[str],
    checkpoint: str,
    app_id: str = "stream",
    available_now: bool = True,
):
    """Exactly-once streaming UPSERT into a manifest SnapshotTable: each
    micro-batch is deduplicated on ``keys`` then copy-on-write MERGEd —
    only key-range-intersecting files rewrite — in one atomic commit
    tagged ``stream-merge:<app_id>:<batchId>``. Replayed batches (crash,
    checkpoint loss with a stable app_id) are skipped; since merge is
    also idempotent on keys, the guard makes replays free rather than
    merely harmless."""

    def committed(t) -> set[int]:
        prefix = f"stream-merge:{app_id}:"
        return {
            int(h["op"].rsplit(":", 1)[1])
            for h in t.history()
            if h["op"].startswith(prefix)
        }

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed(table):
            return
        table.merge(
            batch_df.dropDuplicates(keys), keys,
            op=f"stream-merge:{app_id}:{batch_id}",
        )

    writer = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
