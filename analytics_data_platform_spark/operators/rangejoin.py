"""Binned point-in-interval (range) join.

Spark's only native physical plan for a non-equi ``p >= lo AND p < hi``
join is BroadcastNestedLoopJoin — fine when one side broadcasts
(queries/relational.py::interval_join_tiers), a scale-killer when both
sides are large (O(|points| x |intervals|) comparisons on one stream).

This operator rewrites the range join as an EQUI-join on a bin id
(the standard range-bucketing rewrite; Databricks exposes the same idea
as a range-join hint): each interval is exploded to every bin of width
``bin_width`` it overlaps, points map to exactly one bin, and the
residual predicate filters within the hash-joined candidates. Cost is
O(|points| + |intervals| x avg_span/bin_width) shuffled rows — linear,
partitioned, AQE-skew-splittable. Each (point, interval) match is found
exactly once (in the point's own bin), so no dedup pass is needed.

Reference parity: the same J4 point-in-interval shape as
`mcr_equipment_downtime_records.sql:52-53`, re-expressed for the case
where the interval side outgrows a broadcast.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with lo <= point < hi.

    Both inputs may be arbitrarily large; the join is a hash/sort-merge
    equi-join on the bin id. ``bin_width`` trades shuffle volume
    (intervals duplicate per overlapped bin) against candidate-filter
    selectivity — pick it near the median interval span.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def bin_of(c: Column) -> Column:
        return F.floor(c / F.lit(float(bin_width))).cast("long")

    pb = points.withColumn("__bin", bin_of(F.col(point_col)))
    ib = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
    )
    matched = (
        pb.join(ib, "__bin", "inner")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bin")
    )
    if how == "inner":
        return matched
    if how == "left":
        # left semantics: points with no containing interval surface with
        # NULL interval columns, mirroring a broadcast left range join
        unmatched = points.join(
            matched.select(*points.columns).distinct(), points.columns, "left_anti"
        )
        for c in intervals.columns:
            unmatched = unmatched.withColumn(c, F.lit(None))
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}; use 'inner' or 'left'")
