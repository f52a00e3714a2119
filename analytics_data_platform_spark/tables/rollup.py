"""Incremental continuous aggregate: a materialized time-bucket rollup
maintained by watermark-driven partial refresh.

The hypertable feature the batch query ``time_bucket_rollup`` only
samples: keep an aggregate table over an append-only event table and, on
each refresh tick, recompute ONLY the buckets that new (or acceptably
late) rows could have touched, then MERGE them into the target — never a
full rescan.

Refresh contract:
- watermark = max event time processed so far, persisted in the target's
  table properties (the same state store the ingest runner uses).
- a refresh recomputes every bucket ≥ bucket_floor(watermark − lateness):
  rows later than that horizon are the reason recompute-buckets beats
  delta-aggregation (a bucket is always rebuilt from ALL its source rows,
  so double-counting is structurally impossible — the merge is
  idempotent).
- rows arriving with event time older than the lateness horizon are NOT
  folded in (exactly Structured Streaming's watermark semantics; pick
  ``lateness`` accordingly or run a periodic full refresh).

At 100 TB: the source scan is bounded by the lateness horizon (partition
prune on the time column), the aggregation is partial/map-side combined,
and the MERGE touches only the recomputed buckets' files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from analytics_data_platform_spark.tables.io import TableIO

_UNITS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _seconds(duration: str) -> int:
    n, unit = duration.strip().split()
    return int(n) * _UNITS[unit.lower()]


def refresh_time_bucket_rollup(
    io: TableIO,
    source_table: str,
    target_table: str,
    ts_col: str = "ts",
    bucket: str = "15 minutes",
    group_cols: list[str] | None = None,
    value_col: str = "value",
    lateness: str = "1 hour",
) -> int:
    """One refresh tick; returns the number of bucket rows merged."""
    spark = io.spark
    group_cols = list(group_cols or [])
    src = io.read(source_table)

    state = io.get_watermark_json(target_table) if io.table_exists(target_table) else None
    if state and state.get("max_ts"):
        # horizon = bucket_floor(watermark - lateness), via epoch math so
        # the boundary matches window()'s 1970-aligned buckets exactly
        b = _seconds(bucket)
        horizon_start = F.from_unixtime(
            F.floor(
                (
                    F.unix_timestamp(F.lit(state["max_ts"]).cast("timestamp"))
                    - F.lit(_seconds(lateness))
                )
                / b
            )
            * b
        ).cast("timestamp")
        src = src.where(F.col(ts_col) >= horizon_start)

    agg = (
        src.groupBy(F.window(ts_col, bucket).alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("value_sum"),
            F.max(ts_col).alias("_max_ts"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            *group_cols,
            "n_events",
            "value_sum",
            "_max_ts",
        )
    )
    agg = agg.persist()
    try:
        merged_rows = agg.count()
        if merged_rows == 0:
            return 0
        new_max = agg.agg(F.max("_max_ts")).collect()[0][0]
        result = io.write_table(
            agg.drop("_max_ts"),
            target_table,
            mode="merge",
            merge_on=["bucket_start", *group_cols],
            known_rows=merged_rows,
        )
        prev = (state or {}).get("max_ts")
        max_ts = max(prev, str(new_max)) if prev else str(new_max)
        io.set_watermark_json(target_table, {"max_ts": max_ts})
        # record the rollup's grain so answer_from_rollup can validate
        # rewrite requests without seeing the refresh call
        io.set_properties(
            target_table,
            {
                "rollup.bucket_seconds": str(_seconds(bucket)),
                "rollup.group_cols": ",".join(group_cols),
            },
        )
        return result.rows
    finally:
        agg.unpersist()


def answer_from_rollup(
    io: TableIO,
    rollup_table: str,
    bucket: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Materialized-view rewrite: answer a COARSER time-bucket aggregate
    from the maintained rollup instead of rescanning raw events.

    Valid when the requested bucket is an integer multiple of the
    rollup's grain (recorded in table properties at refresh time) and the
    requested grouping is a subset of the rollup's — then counts and sums
    re-aggregate associatively, so the answer is EXACTLY what the raw
    scan would produce while reading |rollup| rows instead of |events|
    (the aggregate-navigator feature of every OLAP engine, done as a
    checked helper instead of silent planner magic).
    """
    grain = io.get_property(rollup_table, "rollup.bucket_seconds")
    if grain is None:
        raise ValueError(f"{rollup_table} has no rollup.bucket_seconds property")
    grain_s, want_s = int(grain), _seconds(bucket)
    if want_s % grain_s:
        raise ValueError(
            f"bucket {bucket!r} ({want_s}s) is not a multiple of the rollup "
            f"grain ({grain_s}s); answer from the raw table instead"
        )
    mv_groups = [c for c in (io.get_property(rollup_table, "rollup.group_cols") or "").split(",") if c]
    group_cols = list(group_cols or mv_groups)
    missing = set(group_cols) - set(mv_groups)
    if missing:
        raise ValueError(f"group cols {sorted(missing)} not present in rollup {mv_groups}")
    mv = io.read(rollup_table)
    coarse = F.timestamp_seconds(
        F.floor(F.unix_timestamp("bucket_start") / want_s) * want_s
    )
    return (
        mv.groupBy(coarse.alias("bucket_start"), *group_cols)
        .agg(F.sum("n_events").alias("n_events"), F.sum("value_sum").alias("value_sum"))
    )
