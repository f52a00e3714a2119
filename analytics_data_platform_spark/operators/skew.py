"""Skew-handling helpers: salted aggregation and salted broadcast-less joins.

AQE's skew-join splitting handles sort-merge join skew automatically, but
two shapes still need manual salting at 100 TB:

- **hot-key aggregation**: a groupBy where one key holds a large fraction
  of all rows bottlenecks one reducer. ``salted_aggregate`` runs the
  aggregation in two stages over an added salt column; algebraic
  aggregates (sum/count/min/max) recombine exactly.
- **hot-key join**: joining a large fact against a medium dimension that
  is too big to broadcast, with skewed keys. ``salted_join`` salts the
  fact side deterministically and explodes the dimension side across the
  salt domain, spreading each hot key over ``salt`` reducers.

Both are semantics-preserving rewrites — tests assert equality against
the unsalted plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SALT = "_salt"

# two-stage recombination for algebraic aggregates: stage1 runs the
# aggregate per (keys, salt); stage2 merges partials per keys
_MERGE_FN = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column → (fn, input column) with fn in
    sum|count|min|max. ``avg`` callers compose sum/count.
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_MERGE_FN)
    if unknown:
        raise ValueError(f"unsupported aggregate(s) for salting: {sorted(unknown)}")

    salted = df.withColumn(_SALT, F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt)))
    stage1 = salted.groupBy(*keys, _SALT).agg(
        *[
            (F.count(col) if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[_MERGE_FN[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    )
    return stage2


def salted_join(
    large: DataFrame,
    medium: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the large side, explode the medium side.

    Each hot key's rows spread across ``salt`` partitions; the medium side
    is replicated ×salt (choose salt so medium×salt still shuffles
    comfortably). Join result is identical to ``large.join(medium, on,
    how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    lg = large.withColumn(_SALT, F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    md = medium.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = lg.join(md, on=on + [_SALT], how=how)
    return out.drop(_SALT)


def top_frequent_keys(df: DataFrame, keys: list[str], n: int = 20) -> DataFrame:
    """Diagnostic: the n heaviest key groups (what to salt / AQE-watch)."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"))
        .limit(n)
    )


def key_skew_factor(df: DataFrame, keys: list[str]) -> float:
    """max group size / mean group size — >10 suggests salting."""
    stats = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("mean"))
        .collect()[0]
    )
    return float(stats["mx"]) / float(stats["mean"]) if stats["mean"] else 0.0
