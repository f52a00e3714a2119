"""Operator-parity query registry.

Every implemented operator from SURVEY.md §2 (plus the large-scale
training-data operators) is exposed here as a :class:`QuerySpec`:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-native implementation,
- ``oracle`` — an equivalent ANSI SQL string DuckDB can run over the same
  parquet tables (None for genuinely non-SQL-expressible operators → the
  driver records a weaker rows-only check),
- ``cites`` — reference file:line the operator mirrors,
- ``bench`` — whether it is part of the bench.py headline set.

Column names are aligned between the Spark result and the oracle result
(the correctness driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    cites: str = ""
    bench: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in REGISTRY:
        raise ValueError(f"duplicate query name {spec.name}")
    REGISTRY[spec.name] = spec
    return spec


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect populates REGISTRY exactly once
    from analytics_data_platform_spark.queries import (  # noqa: F401
        analytics_ops,
        corpus_ops,
        extended,
        graph_ops,
        relational,
        scale_ops,
        search_ops,
        sketch_ops,
        text_ops,
        tpch,
        training_ops,
        warehouse_ops,
        vector_ops,
    )

    return REGISTRY
