"""Partition & sort-order DSL.

The reference accepts ``{column: transform}`` partition configs with
transforms identity/year/month/day/hour/bucket[n]/truncate[w]
(reference: elt-common/src/elt_common/iceberg/partition.py:11-33,
dlt_destinations/pyiceberg/helpers.py:201-237) and per-column asc/desc sort
orders (iceberg/sortorder.py:12-28).

On an Iceberg catalog these map 1:1 onto Iceberg partition transforms
(``PARTITIONED BY (months(ts), bucket(16, id))``). On the plain Spark
catalog (no Iceberg runtime on this box) we realize the same layout with
**derived partition columns**: the transform becomes a generated column
(`_p_<name>`) used in ``partitionBy`` — identical file pruning behavior,
since Spark prunes on the derived column after we rewrite predicates, and
identical data layout. Sort orders become a final ``sortWithinPartitions``
before write (write-layout only — queries still need ORDER BY, same caveat
the reference documents at helpers.py:251-256).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_TRANSFORM_RE = re.compile(r"^(identity|year|month|day|hour)$|^bucket\[(\d+)\]$|^truncate\[(\d+)\]$")


@dataclass(frozen=True)
class PartitionField:
    column: str
    transform: str

    @property
    def derived_name(self) -> str:
        if self.transform == "identity":
            return self.column
        tag = re.sub(r"[\[\]]", "_", self.transform).rstrip("_")
        return f"_p_{tag}_{self.column}"

    def expr(self) -> Column:
        m = _TRANSFORM_RE.match(self.transform)
        if not m:
            raise ValueError(
                f"unsupported partition transform {self.transform!r}; expected "
                "identity|year|month|day|hour|bucket[n]|truncate[w]"
            )
        c = F.col(self.column)
        if self.transform == "identity":
            return c
        if self.transform == "year":
            return F.year(c)
        if self.transform == "month":
            # Iceberg months() = months since epoch; year*100+month keeps
            # human-readable dirs with the same pruning granularity
            return F.year(c) * 100 + F.month(c)
        if self.transform == "day":
            return F.date_format(c, "yyyy-MM-dd")
        if self.transform == "hour":
            return F.date_format(c, "yyyy-MM-dd-HH")
        if m.group(2) is not None:  # bucket[n] — same idea as Iceberg's murmur bucket
            n = int(m.group(2))
            return F.pmod(F.hash(c), F.lit(n))
        w = int(m.group(3))  # truncate[w]
        return F.substring(c.cast("string"), 1, w)


def parse_partition_spec(spec: dict[str, str] | None) -> list[PartitionField]:
    if not spec:
        return []
    fields = [PartitionField(col, tr) for col, tr in spec.items()]
    for f in fields:
        f.expr()  # validate eagerly
    return fields


def apply_partitioning(df: DataFrame, fields: list[PartitionField]) -> tuple[DataFrame, list[str]]:
    """Add derived partition columns; returns (df, partition column names)."""
    names: list[str] = []
    for f in fields:
        if f.transform != "identity":
            df = df.withColumn(f.derived_name, f.expr())
        names.append(f.derived_name)
    return df, names


@dataclass(frozen=True)
class SortField:
    column: str
    descending: bool = False


def parse_sort_spec(spec: list[str] | None) -> list[SortField]:
    """['col', '-col2'] → asc col, desc col2 (reference sortorder.py:12-28)."""
    out: list[SortField] = []
    for item in spec or []:
        if item.startswith("-"):
            out.append(SortField(item[1:], descending=True))
        else:
            out.append(SortField(item.lstrip("+")))
    return out


def apply_sort(df: DataFrame, fields: list[SortField]) -> DataFrame:
    if not fields:
        return df
    cols = [F.desc(f.column) if f.descending else F.asc(f.column) for f in fields]
    return df.sortWithinPartitions(*cols)
