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
  → ``F.max`` here, computed distributed).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.elt.extract import Extract, ResourceProperties, Watermark
from analytics_data_platform_spark.tables.io import TableIO


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


def _chunk_max(chunk: DataFrame, column: str):
    row = chunk.agg(F.max(F.col(column)).alias("m")).collect()[0]
    return row["m"]


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
        if chunk.isEmpty():
            continue  # reference io.py:86-88

        if props.watermark_column:
            cmax = _chunk_max(chunk, props.watermark_column)
            if cmax is not None and _wm_greater(cmax, max_seen):
                max_seen = cmax  # out-of-order safe: global max (runner.py:100-107)

        # replace-first-chunk rule (runner.py:79-84)
        mode = props.write_mode
        if mode == "replace" and wrote_first:
            mode = "append"

        result = io.write_table(
            chunk,
            table,
            mode=mode,
            merge_on=props.merge_on,
            partition_spec=props.partition,
            sort_spec=props.sort,
        )
        wrote_first = True
        rstats.chunks += 1
        rstats.rows += result.rows

    if props.watermark_column and max_seen is not None and io.table_exists(table):
        wm = Watermark(props.watermark_column, max_seen)
        io.set_watermark_json(table, wm.to_json())
        rstats.watermark = wm

    return rstats
