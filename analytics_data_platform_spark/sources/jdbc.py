"""Incremental JDBC source (SURVEY §2.1 S4/S5, §2.2 P2/P3).

Re-expresses the reference's SQLAlchemy chunked extractor
(reference: elt-common/src/elt_common/sources/sqldatabase/__init__.py:163-195)
as a Spark JDBC read:

- watermark predicate compiled into the pushed query (P2) — the filter
  executes in the source database, not in Spark;
- arbitrary extra predicates and row limit (P3, O4);
- chunking becomes JDBC partitioned reads: ``partition_column`` +
  bounds + ``num_partitions`` replaces the reference's 5000-row
  ``yield_per`` cursor (the Spark reads are parallel, the cursor wasn't);
- the reference's IN-batch filtering (500 ids/clause,
  elt-pipelines/.../opralogweb.py:69) maps to ``in_batch_predicates`` —
  one predicate per batch → one parallel JDBC partition per batch.

No JDBC driver jars ship in this container, so tests cover SQL/option
construction; ``load`` is the thin spark.read.jdbc call.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def sql_literal(value: Any) -> str:
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if value is None:
        return "NULL"
    if hasattr(value, "isoformat"):  # datetime/date
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    return str(value)


def in_batch_predicates(column: str, ids: list, batch_size: int = 500) -> list[str]:
    """['id IN (…500…)', …] — one predicate per parallel JDBC partition."""
    preds = []
    for i in range(0, len(ids), batch_size):
        chunk = ", ".join(sql_literal(v) for v in ids[i : i + batch_size])
        preds.append(f"{column} IN ({chunk})")
    return preds or ["1 = 0"]


@dataclass
class IncrementalJdbcSource:
    url: str
    table: str
    watermark_column: str | None = None
    extra_predicates: list[str] = field(default_factory=list)
    row_limit: int | None = None
    fetchsize: int = 5000  # reference default chunk_size (sqldatabase/__init__.py:32-33)
    partition_column: str | None = None
    num_partitions: int | None = None
    lower_bound: Any = None
    upper_bound: Any = None
    properties: dict[str, str] = field(default_factory=dict)

    def predicates(self, watermark_value: Any = None) -> list[str]:
        preds = list(self.extra_predicates)
        if self.watermark_column is not None and watermark_value is not None:
            preds.append(f"{self.watermark_column} > {sql_literal(watermark_value)}")
        return preds

    def query_sql(self, watermark_value: Any = None) -> str:
        """The pushed-down source query (what the remote DB executes)."""
        sql = f"SELECT * FROM {self.table}"
        preds = self.predicates(watermark_value)
        if preds:
            sql += " WHERE " + " AND ".join(f"({p})" for p in preds)
        if self.row_limit is not None:
            sql += f" LIMIT {self.row_limit}"
        return sql

    def reader_options(self, watermark_value: Any = None) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": f"({self.query_sql(watermark_value)}) src",
            "fetchsize": str(self.fetchsize),
            **self.properties,
        }
        if self.partition_column:
            if self.lower_bound is None or self.upper_bound is None or not self.num_partitions:
                raise ValueError(
                    "partition_column requires lower_bound, upper_bound and num_partitions"
                )
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts

    def load(self, spark: SparkSession, watermark_value: Any = None) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.reader_options(watermark_value).items():
            reader = reader.option(k, v)
        return reader.load()
