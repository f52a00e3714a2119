"""PySpark-native REST data source (SURVEY §2.1 S6 as a first-class format).

The reference ingests paginated REST endpoints with a driver-side page
crawl (elt-pipelines/facility_ops/ingest/accelerator/statusdisplay/
statusdisplay.py:23-56 — requests + pyarrow, one process). Re-expressed on
Spark's Python DataSource API (pyspark 4.x), the same endpoint becomes a
registered format:

    spark.dataSource.register(RestDataSource)
    df = (spark.read.format("rest_api")
          .schema("id INT, phase STRING, updated TIMESTAMP")
          .option("url", "https://host/api/cycles")
          .option("pages", "64")            # known page count
          .option("num_partitions", "16")   # parallel fetch fan-out
          .load())

Why this shape wins at scale:

- **partition-parallel fetch**: ``partitions()`` splits the page range into
  ``num_partitions`` input splits, so a 100k-page backfill fans out across
  the cluster instead of crawling sequentially on the driver;
- **watermark pushdown through the engine** (SURVEY P2): ``pushFilters``
  consumes ``GreaterThan``/``EqualTo``/``In`` filters on columns declared
  in ``pushdown_params`` and turns them into API query parameters, so
  ``df.where(col("updated") > lit(wm))`` ships the cursor to the server —
  the engine-native version of the reference's hand-built watermark query;
- **incremental streaming**: :class:`RestCursorStream` exposes the same
  endpoint as a Structured Streaming source whose offset IS the cursor —
  micro-batches resume from the checkpointed cursor exactly once.

Transport is overridable (subclass ``fetch_page``) — tests inject a
deterministic fake; Spark cloudpickles the subclass to executors.
"""

from __future__ import annotations

import datetime as dt
import json
import math
import time
import urllib.parse
import urllib.request
from collections.abc import Iterator
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    In,
    InputPartition,
    LessThan,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DateType,
    StructType,
    TimestampType,
)

RETRYABLE = {429, 500, 502, 503, 504}


class PageRange(InputPartition):
    def __init__(self, start: int, end: int, params: dict[str, str]):
        self.start = start  # inclusive, 1-based
        self.end = end  # exclusive
        self.params = params


def _convert(value: Any, dtype) -> Any:
    """JSON scalar → Arrow-compatible Python value for the declared type."""
    if value is None:
        return None
    if isinstance(dtype, TimestampType) and isinstance(value, str):
        return dt.datetime.fromisoformat(value.replace("Z", "+00:00"))
    if isinstance(dtype, DateType) and isinstance(value, str):
        return dt.date.fromisoformat(value[:10])
    return value


class RestDataSource(DataSource):
    """Paginated JSON-over-HTTP endpoints as a Spark batch/stream source."""

    @classmethod
    def name(cls) -> str:
        return "rest_api"

    def schema(self) -> str:
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError(
                "rest_api needs a schema: pass .schema(...) on the reader "
                "or the schema_ddl option"
            )
        return ddl

    def reader(self, schema: StructType) -> RestReader:
        return RestReader(type(self), schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> RestCursorStream:
        return RestCursorStream(type(self), schema, dict(self.options))

    # -- transport (overridable; executors get the subclass via pickle) ----

    @classmethod
    def fetch_page(cls, url: str, params: dict[str, str], timeout: int = 30) -> list[dict]:
        """GET one page; retry 429/5xx with backoff honoring Retry-After
        (same policy as sources/m365.py, reference S7)."""
        qs = urllib.parse.urlencode(params)
        full = f"{url}?{qs}" if qs else url
        delay = 1.0
        for attempt in range(5):
            try:
                with urllib.request.urlopen(full, timeout=timeout) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                    return payload if isinstance(payload, list) else [payload]
            except urllib.error.HTTPError as e:  # pragma: no cover - net path
                if e.code not in RETRYABLE or attempt == 4:
                    raise
                retry_after = e.headers.get("Retry-After")
                time.sleep(float(retry_after) if retry_after else delay)
                delay *= 2
        raise RuntimeError("unreachable")


class RestReader(DataSourceReader):
    def __init__(self, source_cls: type[RestDataSource], schema: StructType, options: dict[str, str]):
        self.source_cls = source_cls
        self.schema = schema
        self.url = options["url"]
        self.pages = int(options.get("pages", "0"))  # 0 = crawl-until-empty
        self.page_param = options.get("page_param", "page")
        self.size_param = options.get("size_param", "page_size")
        self.page_size = int(options.get("page_size", "100"))
        self.num_partitions = int(options.get("num_partitions", "8"))
        # {"column": {"gt": "param", "lt": "param", "eq": "param", "in": "param"}}
        self.pushdown_params: dict[str, dict[str, str]] = json.loads(
            options.get("pushdown_params", "{}")
        )
        self.extra_params: dict[str, str] = json.loads(options.get("params", "{}"))

    # -- engine-native watermark pushdown (SURVEY P2) ----------------------

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            ops = self.pushdown_params.get(col or "", {})
            if isinstance(f, GreaterThan) and "gt" in ops:
                self.extra_params[ops["gt"]] = str(f.value)
            elif isinstance(f, LessThan) and "lt" in ops:
                self.extra_params[ops["lt"]] = str(f.value)
            elif isinstance(f, EqualTo) and "eq" in ops:
                self.extra_params[ops["eq"]] = str(f.value)
            elif isinstance(f, In) and "in" in ops:
                self.extra_params[ops["in"]] = ",".join(str(v) for v in f.values)
            else:
                # not translatable → Spark keeps evaluating it post-scan
                yield f

    # -- parallel page-range splits ----------------------------------------

    def partitions(self) -> list[PageRange]:
        if self.pages <= 0:
            # unknown extent: one sequential crawl partition (end=0 marks
            # crawl-until-empty); bounded feeds should set pages
            return [PageRange(1, 0, self.extra_params)]
        n = max(1, min(self.num_partitions, self.pages))
        per = math.ceil(self.pages / n)
        return [
            PageRange(lo, min(lo + per, self.pages + 1), self.extra_params)
            for lo in range(1, self.pages + 1, per)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        page = partition.start
        while partition.end == 0 or page < partition.end:
            params = {
                **partition.params,
                self.page_param: str(page),
                self.size_param: str(self.page_size),
            }
            records = self.source_cls.fetch_page(self.url, params)
            if not records:
                break  # crawl mode: an empty page ends the feed
            for rec in records:
                yield tuple(_convert(rec.get(name), dtype) for name, dtype in fields)
            if partition.end == 0 and len(records) < self.page_size:
                break  # short page = last page
            page += 1


class RestCursorStream(SimpleDataSourceStreamReader):
    """Cursor-paginated feed as a streaming source: the offset IS the
    cursor, so checkpoint recovery replays exactly the unread suffix.

    A cursor feed is inherently sequential (each response hands you the
    next cursor), which is exactly the simple-stream-reader contract
    (driver-side prefetch, engine redistributes rows) — parallelism comes
    from everything DOWNSTREAM of the scan, and bounded batches keep the
    driver's share O(max_records_per_batch)."""

    def __init__(self, source_cls: type[RestDataSource], schema: StructType, options: dict[str, str]):
        self.source_cls = source_cls
        self.schema = schema
        self.url = options["url"]
        self.cursor_param = options.get("cursor_param", "after")
        self.size_param = options.get("size_param", "page_size")
        self.page_size = int(options.get("page_size", "100"))
        self.cursor_field = options.get("cursor_field", "id")
        self.start_cursor = options.get("start_cursor", "0")
        self.max_pages_per_batch = int(options.get("max_pages_per_batch", "10"))
        self.extra_params: dict[str, str] = json.loads(options.get("params", "{}"))

    def initialOffset(self) -> dict:
        return {"cursor": self.start_cursor}

    def _fetch_from(
        self, cursor: str, *, page_cap: int, stop_cursor: str | None = None
    ) -> tuple[list[tuple], str]:
        fields = [(f.name, f.dataType) for f in self.schema.fields]
        rows: list[tuple] = []
        for _ in range(page_cap):
            if stop_cursor is not None and cursor == stop_cursor:
                break
            params = {
                **self.extra_params,
                self.cursor_param: cursor,
                self.size_param: str(self.page_size),
            }
            records = self.source_cls.fetch_page(self.url, params)
            if not records:
                break
            for rec in records:
                rows.append(tuple(_convert(rec.get(name), dtype) for name, dtype in fields))
            cursor = str(records[-1][self.cursor_field])
            if len(records) < self.page_size and stop_cursor is None:
                break  # short page = caught up (live read only)
        return rows, cursor

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows, cursor = self._fetch_from(start["cursor"], page_cap=self.max_pages_per_batch)
        return iter(rows), {"cursor": cursor}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay for recovery: re-crawl [start, end) and STOP
        # at the recorded end cursor — rows the feed gained since the
        # original batch belong to the NEXT offset range, not this replay
        rows, _ = self._fetch_from(
            start["cursor"], page_cap=1_000_000, stop_cursor=end["cursor"]
        )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean server-side


class ParquetRestSource(RestDataSource):
    """Network-free transport: serves a local parquet file through the
    paginated-REST protocol (rows in file order; the ``path`` entry of
    ``params`` names the file). Lets the oracle-backed registry exercise
    the ENTIRE DataSource path — partition planning, executor-side fetch,
    filter pushdown, Arrow conversion — deterministically."""

    @classmethod
    def name(cls) -> str:
        return "parquet_rest"

    @classmethod
    def fetch_page(cls, url: str, params: dict[str, str], timeout: int = 30) -> list[dict]:
        import pyarrow.parquet as pq

        size = int(params.get("page_size", 100))
        table = pq.read_table(params["path"])
        records = table.to_pylist()
        if "segment" in params:  # pushdown demo: EqualTo → query param
            records = [r for r in records if r.get("c_mktsegment") == params["segment"]]
        page = int(params["page"])
        return records[(page - 1) * size : page * size]
