"""Incremental ingestion runner.

Re-implements the reference's runner semantics
(reference: elt-common/src/elt_common/runner.py:41-133), which its unit
tests pin down (tests/unit_tests/test_runner.py:76-205):

- write-mode routing append/merge/replace per resource;
- replace mode: the FIRST non-empty chunk overwrites, subsequent chunks
  append (runner.py:79-84);
- empty chunks are skipped entirely (io.py:86-88);
- watermark lifecycle: read ``ingest.watermark`` from table properties,
  hand it to the extractor (which filters ``col > value``), track the max
  over ALL chunks, and persist the true max after the run even when chunks
  arrive out of order (runner.py:100-107);
- per-chunk max uses an aggregate over the chunk (pc.max in the reference
  → ``F.max`` here, computed distributed). Each chunk is persisted and its
  count + watermark max come from ONE scan (the write then reads the
  cache), so skip-check, watermark and written rows share a snapshot even
  on live JDBC/REST sources.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

from analytics_data_platform_spark.elt.extract import Extract, ResourceProperties, Watermark
from analytics_data_platform_spark.tables.io import ROWS_OBSERVED, TableIO, WriteResult


@dataclass
class ResourceStats:
    table: str
    chunks: int = 0
    rows: int = 0
    watermark: Watermark | None = None


@dataclass
class RunStats:
    namespace: str
    resources: dict[str, ResourceStats] = field(default_factory=dict)


def _chunk_stats(chunk: DataFrame, wm_column: str | None) -> tuple[int, object]:
    """(row count, watermark max) in ONE aggregation job.

    Merge-mode path only: the chunk is persisted by the caller (MERGE
    evaluates the source more than once, so the cache is load-bearing) and
    this single scan both materializes the cache and takes count + max from
    the same snapshot; a live JDBC/REST extract re-queried per action could
    otherwise persist a watermark for rows that were never written.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if wm_column:
        aggs.append(F.max(F.col(wm_column)).alias("m"))
    row = chunk.agg(*aggs).collect()[0]
    return row["n"], (row["m"] if wm_column else None)


def _observed_write(
    io: TableIO,
    chunk: DataFrame,
    table: str,
    mode: str,
    props: ResourceProperties,
) -> tuple[WriteResult, object]:
    """Write a non-empty append/replace chunk, collecting (rows, wm max)
    from the WRITE JOB ITSELF via ``Dataset.observe``.

    This is the scale path: no ``persist()`` of the chunk (at large chunk
    sizes caching terabytes just to learn count+max writes the data twice)
    and no second aggregation scan — ``CollectMetrics`` rides the single
    write action, and Spark applies in-action accumulator updates
    exactly once even under task retries. The watermark max is therefore
    consistent BY CONSTRUCTION with the rows actually written — stronger
    than the snapshot-via-cache argument the merge path needs.
    """
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("n")]
    if props.watermark_column:
        aggs.append(F.max(F.col(props.watermark_column)).alias("m"))
    result = io.write_table(
        chunk.observe(obs, *aggs),
        table,
        mode=mode,
        merge_on=props.merge_on,
        partition_spec=props.partition,
        sort_spec=props.sort,
        known_rows=ROWS_OBSERVED,
    )
    metrics = obs.get  # blocks until the write action's metrics arrive
    if result.rows < 0:
        result = dataclasses.replace(result, rows=metrics["n"])
    return result, (metrics["m"] if props.watermark_column else None)


def _wm_greater(a, b) -> bool:
    """a > b with ISO-string/datetime mixed comparison (JSON round-trip)."""
    if b is None:
        return True
    if isinstance(a, (dt.datetime, dt.date)) and isinstance(b, str):
        b = type(a).fromisoformat(b) if not isinstance(a, dt.datetime) else dt.datetime.fromisoformat(b)
    return a > b


def run_ingest(
    spark: SparkSession,
    extract: Extract,
    namespace: str,
    io: TableIO | None = None,
) -> RunStats:
    io = io or TableIO(spark)
    io.ensure_namespace(namespace)
    stats = RunStats(namespace)

    for table_name, props in extract.extract_resource_properties():
        full = f"{namespace}.{table_name}"
        stats.resources[table_name] = _run_resource(io, full, props)
    return stats


def _run_resource(io: TableIO, table: str, props: ResourceProperties) -> ResourceStats:
    rstats = ResourceStats(table)

    watermark: Watermark | None = None
    if props.watermark_column:
        payload = io.get_watermark_json(table)
        if payload:
            watermark = Watermark.from_json(payload)

    max_seen = watermark.value if watermark else None
    wrote_first = False

    for chunk in props.extractor(watermark):
        if props.write_mode == "merge":
            # MERGE evaluates the source repeatedly → persist + one-scan
            # stats keep skip-check, watermark and merged rows on one
            # source snapshot (reference runner.py:100-107).
            chunk = chunk.persist()
            try:
                nrows, cmax = _chunk_stats(chunk, props.watermark_column)
                if nrows == 0:
                    continue  # reference io.py:86-88
                result = io.write_table(
                    chunk,
                    table,
                    mode="merge",
                    merge_on=props.merge_on,
                    partition_spec=props.partition,
                    sort_spec=props.sort,
                    known_rows=nrows,
                )
            finally:
                chunk.unpersist()
        else:
            # append/replace: single-action writes → stats ride the write
            # job via observe; the only extra work is a LIMIT-1 emptiness
            # probe (reference io.py:86-88 empty-batch skip + the
            # replace-first-chunk routing both need it BEFORE the write).
            if chunk.isEmpty():
                continue
            # replace-first-chunk rule (runner.py:79-84)
            mode = props.write_mode
            if mode == "replace" and wrote_first:
                mode = "append"
            result, cmax = _observed_write(io, chunk, table, mode, props)

        if cmax is not None and _wm_greater(cmax, max_seen):
            max_seen = cmax  # out-of-order safe: global max (runner.py:100-107)
        wrote_first = True
        rstats.chunks += 1
        rstats.rows += result.rows

    if props.watermark_column and max_seen is not None and io.table_exists(table):
        wm = Watermark(props.watermark_column, max_seen)
        io.set_watermark_json(table, wm.to_json())
        rstats.watermark = wm

    return rstats
