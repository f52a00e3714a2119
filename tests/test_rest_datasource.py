"""Python DataSource REST format: partition-parallel fetch, engine-native
filter pushdown (SURVEY P2 via pushFilters), and cursor-offset streaming.

The fake transport is a PURE function of the request params (no shared
state), so it behaves identically on driver and executor workers.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from analytics_data_platform_spark.sources.rest_datasource import (
    PageRange,
    RestCursorStream,
    RestDataSource,
    RestReader,
)

N_RECORDS = 157
PHASES = ["setup", "physics", "shutdown", "maintenance"]


def _record(i: int) -> dict:
    return {
        "id": i,
        "phase": PHASES[i % len(PHASES)],
        "updated": (
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)
        ).isoformat(),
    }


def make_fake_source() -> type[RestDataSource]:
    # defined dynamically AND self-contained (no test-module globals) so
    # cloudpickle ships the whole class by value to python workers
    class FakeRestSource(RestDataSource):
        @classmethod
        def name(cls) -> str:
            return "fake_rest"

        @classmethod
        def fetch_page(cls, url: str, params: dict, timeout: int = 30) -> list[dict]:
            import datetime as _dt

            phases = ["setup", "physics", "shutdown", "maintenance"]
            size = int(params.get("page_size", 100))
            records = [
                {
                    "id": i,
                    "phase": phases[i % 4],
                    "updated": (
                        _dt.datetime(2024, 1, 1) + _dt.timedelta(minutes=i)
                    ).isoformat(),
                }
                for i in range(1, 158)
            ]
            if "id_after" in params:  # pushdown target (gt)
                records = [r for r in records if r["id"] > int(params["id_after"])]
            if "phase_eq" in params:  # pushdown target (eq)
                records = [r for r in records if r["phase"] == params["phase_eq"]]
            if "after" in params:  # cursor mode
                records = [r for r in records if r["id"] > int(params["after"])]
                return records[:size]
            page = int(params["page"])
            return records[(page - 1) * size : page * size]

    return FakeRestSource


SCHEMA = "id INT, phase STRING, updated TIMESTAMP"


@pytest.fixture()
def fake_registered(spark):
    # required whenever a python reader implements pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    src = make_fake_source()
    spark.dataSource.register(src)
    return src


def _reader(spark, **opts):
    base = {"url": "http://fake/api", "page_size": "20", "pages": "8"}
    base.update({k: str(v) for k, v in opts.items()})
    r = spark.read.format("fake_rest").schema(SCHEMA)
    for k, v in base.items():
        r = r.option(k, v)
    return r


def test_batch_read_partition_parallel(spark, fake_registered):
    df = _reader(spark, num_partitions=4).load()
    assert df.rdd.getNumPartitions() == 4  # page ranges became input splits
    rows = df.collect()
    assert len(rows) == N_RECORDS
    assert {r.id for r in rows} == set(range(1, N_RECORDS + 1))
    ts = {r.updated for r in rows if r.id == 90}
    assert ts == {dt.datetime(2024, 1, 1, 1, 30)}  # ISO string → timestamp


def test_crawl_until_empty_without_pages_option(spark, fake_registered):
    df = _reader(spark, pages=0).load()
    assert df.count() == N_RECORDS  # short final page terminates the crawl


def test_where_results_identical_with_pushdown(spark, fake_registered):
    pd_map = '{"id": {"gt": "id_after"}, "phase": {"eq": "phase_eq"}}'
    plain = _reader(spark).load()
    pushed = _reader(spark, pushdown_params=pd_map).load()
    cond = (F.col("id") > 150) & (F.col("phase") == "physics")
    expect = sorted(r.id for r in plain.where(cond).collect())
    got = sorted(r.id for r in pushed.where(cond).collect())
    assert got == expect and len(got) > 0


def test_push_filters_translate_to_query_params(spark):
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan

    src = make_fake_source()
    reader = RestReader(
        src,
        spark.createDataFrame([], SCHEMA).schema,
        {
            "url": "http://fake/api",
            "pages": "8",
            "page_size": "20",
            "pushdown_params": '{"id": {"gt": "id_after"}, "phase": {"eq": "phase_eq"}}',
        },
    )
    unsupported = list(
        reader.pushFilters(
            [
                GreaterThan(("id",), 150),
                EqualTo(("phase",), "physics"),
                LessThan(("id",), 10_000),  # no mapping → stays with Spark
            ]
        )
    )
    assert [type(f).__name__ for f in unsupported] == ["LessThan"]
    assert reader.extra_params == {"id_after": "150", "phase_eq": "physics"}
    # the accepted filters now constrain every partition's fetch
    parts = reader.partitions()
    rows = [r for p in parts for r in reader.read(p)]
    assert sorted(r[0] for r in rows) == [153, 157]  # physics ∩ id>150


def test_partitions_split_page_range():
    src = make_fake_source()
    reader = RestReader.__new__(RestReader)
    reader.pages, reader.num_partitions, reader.extra_params = 157, 10, {}
    parts = reader.partitions()
    assert len(parts) == 10
    covered = [p for pr in parts for p in range(pr.start, pr.end)]
    assert covered == list(range(1, 158))  # disjoint, complete, ordered


def _stream_reader(spark, **opts):
    base = {
        "url": "http://fake/api",
        "page_size": "25",
        "cursor_param": "after",
        "cursor_field": "id",
        "max_pages_per_batch": "2",
    }
    base.update({k: str(v) for k, v in opts.items()})
    return RestCursorStream(
        make_fake_source(), spark.createDataFrame([], SCHEMA).schema, base
    )


def test_cursor_stream_offsets_advance_and_replay_exactly(spark):
    sr = _stream_reader(spark)
    start = sr.initialOffset()
    assert start == {"cursor": "0"}
    rows1, off1 = sr.read(start)
    rows1 = list(rows1)
    assert len(rows1) == 50  # 2 pages × 25
    assert off1 == {"cursor": "50"}
    # recovery replay of [start, off1) returns EXACTLY the same rows
    replay = list(sr.readBetweenOffsets(start, off1))
    assert replay == rows1
    # next batch resumes from the cursor, no overlap
    rows2, off2 = sr.read(off1)
    ids2 = [r[0] for r in rows2]
    assert min(ids2) == 51 and off2 == {"cursor": "100"}


def test_cursor_stream_catches_up_and_idles(spark):
    sr = _stream_reader(spark, max_pages_per_batch=100)
    rows, off = sr.read(sr.initialOffset())
    assert len(list(rows)) == N_RECORDS
    assert off == {"cursor": str(N_RECORDS)}
    again, off2 = sr.read(off)
    assert list(again) == [] and off2 == off  # idle: offset stable


def test_streaming_e2e_through_engine(spark, fake_registered, tmp_path):
    q = (
        spark.readStream.format("fake_rest")
        .schema(SCHEMA)
        .option("url", "http://fake/api")
        .option("page_size", "40")
        .option("max_pages_per_batch", "100")
        .load()
        .writeStream.format("memory")
        .queryName("rest_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.sql("select count(*) n, count(distinct id) d from rest_stream_sink").first()
    assert (got.n, got.d) == (N_RECORDS, N_RECORDS)
