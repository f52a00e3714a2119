"""As-of (point-in-time) join — the canonical custom temporal operator.

``asof_join(left, right, on, left_ts, right_ts)`` attaches to every left
row the LATEST right row with ``right_ts <= left_ts`` within the same key
group (backward as-of, ties take the right row; DuckDB/pandas semantics).

Scalable formulation: instead of an inequality join (which Catalyst can
only execute as a nested loop or a range-bucketed join), both sides are
UNIONed with a side tag, sorted once per key by (ts, side-priority), and
the right payload is carried forward with ``last(..., ignorenulls=True)``
over the ordered window. Cost: ONE shuffle on the key + one window pass —
O((|L|+|R|) log) per key group, no row explosion, skew handled by AQE.
This is the same plan shape Flink's temporal join and QuestDB/kdb as-of
execute.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_SIDE = "_asof_side"  # 0 = right (sorts first on ts ties → tie takes right), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join; left rows with no prior right row get NULLs.

    ``tolerance_seconds`` drops matches older than the tolerance (pandas
    ``merge_asof(tolerance=...)`` semantics).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in set(on) | {right_ts}]

    carried = [f"{c}{suffix}" for c in value_cols]
    lefts = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    rights = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(lefts.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    unioned = lefts.unionByName(rights)

    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried],
        F.last("_rts", ignorenulls=True).over(w).alias("_f_rts"),
    )
    out = filled.where(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.unix_micros(F.col("_ts").cast("timestamp")) - F.unix_micros(F.col("_f_rts"))
        ) <= tolerance_seconds * 1_000_000
        picked = [
            F.when(in_tol, F.col(f"_f_{c}")).alias(c) for c in carried
        ]
    else:
        picked = [F.col(f"_f_{c}").alias(c) for c in carried]

    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *picked,
    )
