"""Interval algebra: merge overlapping intervals, measure coverage.

The sweep-line classic as a two-window plan: order intervals per key by
start, carry the running max of previous ends, open a new group whenever
a start exceeds it, and aggregate each group to its hull. One
sort-shuffle per key serves both windows; everything is integer epoch
math, so downstream measures (covered time, gap time) are exact.

Used for sessionized activity coverage, sensor uptime, SLA windows —
anywhere raw intervals overlap and double-counting would corrupt sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def merge_intervals(
    df: DataFrame, key: str, start: str = "start", end: str = "end"
) -> DataFrame:
    """Coalesce overlapping/touching [start, end] intervals per key.

    Returns (key, start, end, n_source) — each output row is the hull of
    one maximal overlapping run, with the count of source intervals it
    absorbed. Interval columns must be comparable + max-able (integers
    recommended); touching intervals (next.start == prev.end) merge.
    """
    w = Window.partitionBy(key).orderBy(start, end)
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.select(key, start, end).withColumn(
        "_new",
        F.when(prev_max_end.isNull() | (F.col(start) > prev_max_end), 1).otherwise(0),
    )
    grouped = flagged.withColumn(
        "_grp",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        grouped.groupBy(key, "_grp")
        .agg(
            F.min(start).alias(start),
            F.max(end).alias(end),
            F.count(F.lit(1)).alias("n_source"),
        )
        .drop("_grp")
    )
