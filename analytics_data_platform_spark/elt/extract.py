"""Extract contract + watermark model.

Mirrors the reference's minimal ingestion framework
(reference: elt-common/src/elt_common/extract.py:22-141):

- :class:`Watermark` — (column, value) persisted as JSON in the target
  table's properties under ``ingest.watermark`` (same JSON shape).
- :class:`ResourceProperties` — per-table write config + extractor.
- :class:`Extract` — a job yields ``(table_name, ResourceProperties)``
  pairs; extractors are generators of DataFrames (the reference yields
  pyarrow chunks; here each chunk is a lazy DataFrame so Spark parallelizes
  within the chunk).
"""

from __future__ import annotations

import abc
import datetime as dt
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

DataChunks = Iterator[DataFrame]
Extractor = Callable[["Watermark | None"], DataChunks]


@dataclass
class Watermark:
    """Incremental cursor: highest seen value of ``column``.

    JSON round-trip matches the reference's format (extract.py:31-60):
    datetimes serialize as ISO-8601 strings and are restored by the
    consumer that knows the column type.
    """

    column: str
    value: Any

    def to_json(self) -> dict:
        v = self.value
        if isinstance(v, (dt.datetime, dt.date)):
            v = v.isoformat()
        return {"column": self.column, "value": v}

    @classmethod
    def from_json(cls, payload: dict) -> "Watermark":
        return cls(column=payload["column"], value=payload["value"])


@dataclass
class ResourceProperties:
    """Write configuration for one extracted table
    (reference extract.py:93-141)."""

    extractor: Extractor
    write_mode: str = "append"  # append | merge | replace
    merge_on: list[str] | None = None
    watermark_column: str | None = None
    partition: dict[str, str] | None = field(default=None)  # {col: transform}
    sort: list[str] | None = None


class Extract(abc.ABC):
    """Base class for ingestion jobs.

    Subclasses yield ``(table_name, ResourceProperties)`` per resource;
    the runner handles watermark lifecycle and write-mode routing.
    """

    @abc.abstractmethod
    def extract_resource_properties(self) -> Iterator[tuple[str, ResourceProperties]]:
        ...
