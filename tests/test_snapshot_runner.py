"""ELT runner on manifest snapshot tables (tables/snapshot_io.py): the
same runner-semantics fakes as tests/test_runner.py, but every chunk is
one atomic snapshot commit and the watermark rides the manifest — so
rollback restores data AND watermark together."""

from __future__ import annotations

import pytest

from analytics_data_platform_spark.elt.runner import run_ingest
from analytics_data_platform_spark.tables.snapshot_io import SnapshotTableIO
from tests.test_runner import AllWriteModes, MergeIncremental, WatermarkHandling


@pytest.fixture()
def sio(spark, tmp_path):
    return SnapshotTableIO(spark, str(tmp_path / "wh"))


def test_write_mode_routing_on_snapshots(spark, sio):
    stats = run_ingest(spark, AllWriteModes(spark), "ns", io=sio)
    assert sio.read("ns.appended").count() == 2
    assert sio.read("ns.replaced").count() == 1
    assert not sio.table_exists("ns.skipped")
    assert stats.resources["skipped"].chunks == 0
    # two appended chunks = two snapshot commits, each atomic
    ops = [h["op"] for h in sio.table("ns.appended").history()]
    assert len([o for o in ops if o in ("append", "replace")]) == 2


def test_watermark_rides_the_manifest(spark, sio):
    ex1 = WatermarkHandling(spark, run=1)
    s1 = run_ingest(spark, ex1, "ns", io=sio)
    assert ex1.seen_watermark is None
    assert sio.get_watermark_json("ns.wm_items") == {"column": "id", "value": 1000}
    assert s1.resources["wm_items"].rows == 1000

    ex2 = WatermarkHandling(spark, run=2)
    run_ingest(spark, ex2, "ns", io=sio)
    assert ex2.seen_watermark is not None and ex2.seen_watermark.value == 1000
    assert sio.get_watermark_json("ns.wm_items") == {"column": "id", "value": 1020}
    assert sio.read("ns.wm_items").count() == 1020


def test_rollback_restores_data_and_watermark_together(spark, sio):
    t = "ns.wm_items"
    run_ingest(spark, WatermarkHandling(spark, run=1), "ns", io=sio)
    v_after_run1 = sio.table(t).current_version()
    run_ingest(spark, WatermarkHandling(spark, run=2), "ns", io=sio)
    assert sio.get_watermark_json(t)["value"] == 1020

    sio.table(t).rollback(v_after_run1)
    # the manifest-resident watermark rolled back WITH the data: the next
    # incremental run re-extracts from 1000, not 1020 (TBLPROPERTIES on a
    # catalog table cannot do this — state and data desync on restore)
    assert sio.get_watermark_json(t)["value"] == 1000
    assert sio.read(t).count() == 1000
    run_ingest(spark, WatermarkHandling(spark, run=2), "ns", io=sio)
    assert sio.read(t).count() == 1020
    assert sio.get_watermark_json(t)["value"] == 1020


def test_merge_incremental_on_snapshots_keeps_keys_unique(spark, sio):
    run_ingest(spark, MergeIncremental(spark, run=1), "ns", io=sio)
    run_ingest(spark, MergeIncremental(spark, run=2), "ns", io=sio)
    rows = {r.entry_id: r.comment for r in sio.read("ns.entries").collect()}
    assert rows == {1: "v1", 2: "v2", 3: "v3-updated", 4: "v4", 5: "v5", 6: "v6"}
    assert sio.get_watermark_json("ns.entries")["value"] == 8
    # pre-merge state remains time-travelable
    t = sio.table("ns.entries")
    merges = [h["version"] for h in t.history() if h["op"] == "merge"]
    old = {r.entry_id: r.comment for r in t.read(version=merges[0] - 1).collect()}
    assert old[3] == "v3"


def test_cli_maintain_snapshot_warehouse(spark, sio, capsys, monkeypatch):
    """`elt maintain --snapshot-warehouse <dir>` runs the four procedures
    over every ingested snapshot table and reports per-table lines."""
    from analytics_data_platform_spark.elt import cli
    from analytics_data_platform_spark.tables.snapshot_io import (
        discover_snapshot_tables,
        maintain_snapshot_warehouse,
    )

    run_ingest(spark, AllWriteModes(spark), "ns", io=sio)
    assert discover_snapshot_tables(sio.warehouse) == ["ns.appended", "ns.replaced"]
    lines = maintain_snapshot_warehouse(spark, sio.warehouse, keep_last=1)
    assert len(lines) == 2 and all("ERROR" not in l for l in lines)
    # data intact post-maintenance
    assert sio.read("ns.appended").count() == 2

    monkeypatch.setattr(cli, "get_spark", lambda **kw: spark)
    rc = cli.main(["maintain", "--snapshot-warehouse", sio.warehouse, "--keep-last", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ns.appended" in out and "ns.replaced" in out
