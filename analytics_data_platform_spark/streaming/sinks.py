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
