"""One-pass column profiler (dbt-style table health audit).

Null counts, exact distinct counts, and string-cast min/max for every
column, computed in a SINGLE aggregation pass: Catalyst plans the
multi-column distinct aggregate with one Expand (input rows replicated
once per distinct column) feeding one shuffle — not one scan per column.
The per-column results are then unpivoted to rows with an
explode(array(struct…)) projection over the one-row aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) → rows of
    (col_name, n_nulls, n_distinct, min_val, max_val)."""
    cols = list(cols or df.columns)
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"mx_{c}"),
        ]
    one = df.agg(*aggs)
    packed = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"nn_{c}").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_val"),
                F.col(f"mx_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(packed).alias("p")).select("p.*")
