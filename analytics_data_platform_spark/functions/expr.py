"""Expression-level utilities.

``bind`` — a let-binding for Catalyst expressions. The optimizer's
CollapseProject merges adjacent projections by INLINING the defining
expression into every reference: a column defined as an expensive
deterministic expression (e.g. a nested higher-order MinHash signature,
one md5 per array element) and referenced N times downstream gets
evaluated N times per row, silently. Higher-order-function lambdas are
the one place Catalyst guarantees single evaluation of a bound value —
so wrapping the expensive expression as the sole element of an array and
``transform``-ing over it turns every downstream reference into a lambda
variable, restoring evaluate-once semantics regardless of how the
projections collapse.

Measured on the MinHash-LSH candidate plan (16 band expressions over one
32-hash signature): unbound, the signature — and the md5 of every
shingle under it — re-evaluated 16x per row and the sf0.1 query ran for
minutes; bound, it runs in seconds.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def bind(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once per row; reference it via lambda variable
    in ``body(value)``."""
    return F.element_at(F.transform(F.array(value), body), 1)


def spread(df: "DataFrame", factor: int = 1, probe: "DataFrame | None" = None) -> "DataFrame":
    """Guarantee compute parallelism for expression-heavy projections.

    A small parquet file scans as ONE split even when the per-row compute
    (interpreted higher-order functions: shingling, MinHash, sign-bit
    signatures) is thousands of times the IO cost — the whole operator
    then runs on one core. When the scan is narrower than
    defaultParallelism × factor, repartition round-robin; a no-op on real
    100 TB scans, which already arrive thousands of splits wide.

    The partition-count check physically plans ``df`` (``.rdd`` →
    ``toRdd``), which costs hundreds of driver milliseconds on a tree
    carrying a broadcast join or a large expression forest. ``probe``
    lets the caller hand over a frame whose partition count EQUALS
    ``df``'s by construction — e.g. the stream side feeding a
    broadcast/semi join (broadcast joins add no exchange, so the join
    output inherits the stream side's partitioning) — so the cheap-to-
    plan frame is probed instead. Only pass it when the equality is
    structural; when in doubt, omit it and pay the exact probe.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if (df if probe is None else probe).rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
