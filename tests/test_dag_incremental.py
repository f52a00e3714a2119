"""Incremental model materialization in the transform DAG
(plans/dag.py) — dbt's ``materialized='incremental'`` semantics on
TableIO, the scale replacement for the reference's rebuild-every-run
view/table layer (dbt_project.yml:33-42).

Covers: first-run full build, delta-append via is_incremental() +
high_water() (the canonical dbt ``WHERE col > (SELECT max(col) FROM
this)`` pattern), MERGE with unique_key (late re-statements update in
place), full_refresh override, and the no-namespace degradation (full
per-run build, is_incremental() False).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from analytics_data_platform_spark.plans.dag import Model, TransformDag
from analytics_data_platform_spark.tables.io import TableIO

NS = "dag_inc_test"


@pytest.fixture()
def io(spark):
    io = TableIO(spark)
    io.drop_namespace(NS)
    io.ensure_namespace(NS)
    yield io
    io.drop_namespace(NS)


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, ts long, value double")


def _dag(seen: list[bool]) -> TransformDag:
    dag = TransformDag()

    def build(spark, refs):
        seen.append(refs.is_incremental())
        src = refs.source("land", "events")
        if refs.is_incremental():
            src = src.where(F.col("ts") > F.lit(refs.high_water("ts")))
        return src.select("event_id", "ts", (F.col("value") * 2).alias("doubled"))

    dag.add(
        Model(
            "fct_events",
            build,
            sources=(("land", "events"),),
            materialization="incremental",
        )
    )
    return dag


def test_incremental_first_run_then_delta_append(spark, io):
    seen: list[bool] = []
    dag = _dag(seen)
    src1 = _events(spark, [(1, 10, 1.0), (2, 20, 2.0)])
    dag.run(spark, sources={("land", "events"): src1}, target_namespace=NS, io=io)
    assert seen == [False]
    assert io.read(f"{NS}.fct_events").count() == 2

    # second run: one genuinely new row + one already-ingested row the
    # watermark filter must exclude — only the delta lands
    src2 = _events(spark, [(2, 20, 2.0), (3, 30, 3.0)])
    out = dag.run(spark, sources={("land", "events"): src2}, target_namespace=NS, io=io)
    assert seen == [False, True]
    got = {(r["event_id"], r["doubled"]) for r in out["fct_events"].collect()}
    assert got == {(1, 2.0), (2, 4.0), (3, 6.0)}


def test_incremental_merge_with_unique_key(spark, io):
    dag = TransformDag()

    def build(spark_, refs):
        src = refs.source("land", "events")
        if refs.is_incremental():
            src = src.where(F.col("ts") >= F.lit(refs.high_water("ts")))  # re-statements allowed
        return src.select("event_id", "ts", "value")

    dag.add(
        Model(
            "dim_events",
            build,
            sources=(("land", "events"),),
            materialization="incremental",
            unique_key=("event_id",),
        )
    )
    dag.run(
        spark,
        sources={("land", "events"): _events(spark, [(1, 10, 1.0), (2, 20, 2.0)])},
        target_namespace=NS, io=io,
    )
    # event 2 re-stated with a new value, event 3 new: MERGE must update
    # in place, never duplicate the key
    dag.run(
        spark,
        sources={("land", "events"): _events(spark, [(2, 20, 9.0), (3, 30, 3.0)])},
        target_namespace=NS, io=io,
    )
    rows = {r["event_id"]: r["value"] for r in io.read(f"{NS}.dim_events").collect()}
    assert rows == {1: 1.0, 2: 9.0, 3: 3.0}
    assert io.read(f"{NS}.dim_events").count() == 3


def test_full_refresh_rebuilds_from_scratch(spark, io):
    seen: list[bool] = []
    dag = _dag(seen)
    dag.run(
        spark,
        sources={("land", "events"): _events(spark, [(1, 10, 1.0), (2, 20, 2.0)])},
        target_namespace=NS, io=io,
    )
    # full refresh with a smaller source: stale rows must disappear
    dag.run(
        spark,
        sources={("land", "events"): _events(spark, [(5, 50, 5.0)])},
        target_namespace=NS, io=io, full_refresh=True,
    )
    assert seen == [False, False]
    got = [r["event_id"] for r in io.read(f"{NS}.fct_events").collect()]
    assert got == [5]


def test_incremental_without_namespace_degrades_to_full_build(spark):
    seen: list[bool] = []
    dag = _dag(seen)
    src = _events(spark, [(1, 10, 1.0)])
    out = dag.run(spark, sources={("land", "events"): src})
    assert seen == [False]
    assert out["fct_events"].count() == 1
    # run again: still a plain rebuild, no incremental context
    dag.run(spark, sources={("land", "events"): src})
    assert seen == [False, False]


def test_incremental_merge_on_snapshot_warehouse(spark, tmp_path):
    """The same incremental model runs unchanged against the
    manifest-snapshot warehouse (SnapshotTableIO is duck-type compatible
    with TableIO): MERGE commits are snapshots, so the model's history is
    time-travelable."""
    from analytics_data_platform_spark.tables.snapshot_io import SnapshotTableIO

    sio = SnapshotTableIO(spark, str(tmp_path / "wh"))
    dag = TransformDag()

    def build(spark_, refs):
        src = refs.source("land", "events")
        if refs.is_incremental():
            src = src.where(F.col("ts") >= F.lit(refs.high_water("ts")))
        return src.select("event_id", "ts", "value")

    dag.add(
        Model(
            "dim_events",
            build,
            sources=(("land", "events"),),
            materialization="incremental",
            unique_key=("event_id",),
        )
    )
    dag.run(
        spark,
        sources={("land", "events"): _events(spark, [(1, 10, 1.0), (2, 20, 2.0)])},
        target_namespace="m", io=sio,
    )
    dag.run(
        spark,
        sources={("land", "events"): _events(spark, [(2, 20, 9.0), (3, 30, 3.0)])},
        target_namespace="m", io=sio,
    )
    rows = {r["event_id"]: r["value"] for r in sio.read("m.dim_events").collect()}
    assert rows == {1: 1.0, 2: 9.0, 3: 3.0}
    # snapshot history: the pre-merge version still reads the old value
    t = sio.table("m.dim_events")
    versions = sorted(s for s in (t.current_version(),) if s is not None)
    first = {r["event_id"]: r["value"] for r in t.read(versions[0] - 1).collect()}
    assert first == {1: 1.0, 2: 2.0}
