"""Transform DAG golden-row tests — ports the reference's dbt unit tests
(reference: stg_opralogweb__mcr_equipment_downtime.yml:8-41 with
tests/fixtures/*.sql, stg_statusdisplay__cycles.yml:8-25) plus an
end-to-end DAG run with data tests (cycles.yml:5-21 etc.)."""

from __future__ import annotations

import datetime as dt
import uuid

import pytest
import pyspark.sql.functions as F
from pyspark.sql import Row

from analytics_data_platform_spark.plans.dag import DataTestError
from analytics_data_platform_spark.plans.facility_ops import dag
from analytics_data_platform_spark.tables.io import TableIO


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def opralog_fixtures(spark):
    """The reference's SQL fixtures (tests/fixtures/base_opralogweb__*.sql)
    as override DataFrames for the base models."""
    entries = spark.createDataFrame(
        [
            (100, ts("2017-04-25 23:59:59"), dt.date(2017, 4, 24), "Comment 100", False),
            (101, ts("2024-01-01 00:00:01"), dt.date(2024, 1, 1), "Comment 101", False),
            (102, ts("2024-01-01 00:01:03"), dt.date(2024, 1, 1), "Deleted 102", True),
        ],
        "entry_id int, fault_occurred_at timestamp, fault_date date, "
        "fault_description string, logically_deleted boolean",
    )
    chapter_entry = spark.createDataFrame(
        [(100, 24, 1, 24), (101, 24, 2, 24), (102, 24, 2, 24)],
        "entry_id int, principal_logbook int, logbook_chapter_no int, logbook_id int",
    )
    logbook_chapter = spark.createDataFrame([(1,), (2,)], "logbook_chapter_no int")
    logbooks = spark.createDataFrame([(24, "MCR Running Log")], "logbook_id int, logbook_name string")
    mec_rows = [
        (100, "Equipment 100", None, 1),
        (100, "Group 100", None, 2),
        (100, None, 4.2, 3),
        (101, "Equipment 101", None, 1),
        (101, "Group 101", None, 2),
        (101, None, 5.3, 3),
        (102, "Equipment 102", None, 1),
        (102, "Group 102", None, 2),
        (102, None, 6.1, 3),
    ]
    more_entry_columns = spark.createDataFrame(
        mec_rows, "entry_id int, string_data string, number_data double, additional_column_id int"
    )
    additional_columns = spark.createDataFrame(
        [(1, "Equipment"), (2, "Group"), (3, "Lost Time"), (4, "Group Leader comments")],
        "additional_column_id int, column_title string",
    )
    return {
        "base_opralogweb__entries": entries,
        "base_opralogweb__chapter_entry": chapter_entry,
        "base_opralogweb__logbook_chapter": logbook_chapter,
        "base_opralogweb__logbooks": logbooks,
        "base_opralogweb__more_entry_columns": more_entry_columns,
        "base_opralogweb__additional_columns": additional_columns,
    }


def test_stg_mcr_equipment_downtime_golden_row(spark, opralog_fixtures):
    """Null & pre-epoch entries discarded; exactly the reference's expected
    row survives (stg_opralogweb__mcr_equipment_downtime.yml:31-41)."""
    built = dag.run(
        spark,
        overrides=opralog_fixtures,
        select=["stg_opralogweb__mcr_equipment_downtime"],
        downstream=False,
    )
    rows = built["stg_opralogweb__mcr_equipment_downtime"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["equipment"] == "Equipment 101"
    assert r["downtime_mins"] == 5.3
    assert r["fault_date"] == dt.date(2024, 1, 1)
    assert r["fault_occurred_at"] == ts("2024-01-01 00:00:01")
    assert r["group"] == "Group 101"
    assert r["fault_description"] == "Comment 101"
    assert r["managers_comments"] is None


def test_stg_statusdisplay_cycles_golden_row(spark):
    """Parent/child denormalization (stg_statusdisplay__cycles.yml:8-25)."""
    cycles = spark.createDataFrame([Row(dlt_id="abc", name="2024/2")])
    phases = spark.createDataFrame(
        [
            Row(
                phase="user-time",
                target=1,
                started_at=ts("2024-07-09 07:30:00"),
                ended_at=ts("2024-07-24 07:30:00"),
                dlt_cycles_id="abc",
            ),
            Row(
                phase="run-up",
                target=2,
                started_at=ts("2024-07-01 07:30:00"),
                ended_at=ts("2024-07-09 07:30:00"),
                dlt_cycles_id="zzz",  # no matching parent → dropped by inner join
            ),
        ]
    )
    built = dag.run(
        spark,
        overrides={
            "base_statusdisplay__cycles": cycles,
            "base_statusdisplay__cycles__phases": phases,
        },
        select=["stg_statusdisplay__cycles"],
        downstream=False,
    )
    rows = built["stg_statusdisplay__cycles"].collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["name"], r["target"]) == ("2024/2", 1)
    assert r["started_at"] == ts("2024-07-09 07:30:00")
    assert r["ended_at"] == ts("2024-07-24 07:30:00")


def test_sharepoint_downtime_string_surgery(spark):
    """F4-F8 + F11: date/time cropping, century fix, London→UTC
    (stg_accelerator_sharepoint__equipment_downtime_data_11_08_24.sql)."""
    src = spark.createDataFrame(
        [
            # BST date (UTC+1): 12:30 local → 11:30 UTC
            ("Septum", ".98", 10.0, "1998-07-01 00:00:00", "somejunk12:30:00", "Grp", "d1", None),
            # GMT date: local == UTC
            ("Kicker", "04", 3.5, "2004-01-15", "08:00:00", "Grp", "d2", "mc"),
        ],
        "equipment string, user_run string, downtime_minutesx double, fault_date string, "
        "fault_time string, group string, fault_description string, managerscomments string",
    )
    built = dag.run(
        spark,
        sources={("accelerator_accelerator_sharepoint", "equipment_downtime_data_11_08_24"): src},
        select=["stg_accelerator_sharepoint__equipment_downtime_data_11_08_24"],
        downstream=False,
    )
    out = {r["equipment"]: r for r in built[
        "stg_accelerator_sharepoint__equipment_downtime_data_11_08_24"
    ].collect()}
    assert out["Septum"]["cycle_name"] == "1998"
    assert out["Kicker"]["cycle_name"] == "2004"
    assert out["Septum"]["fault_date"] == dt.date(1998, 7, 1)
    assert out["Septum"]["fault_occurred_at"] == ts("1998-07-01 11:30:00")  # BST shift
    assert out["Kicker"]["fault_occurred_at"] == ts("2004-01-15 08:00:00")  # GMT no shift


def test_edr_mapping_dedup_by_normalized_key(spark):
    src = spark.createDataFrame(
        [("  Main   Magnet ", "magnets"), ("main magnet", "magnets"), ("RF Cavity", "rf")],
        "equipment_name string, equipment_category string",
    )
    built = dag.run(
        spark,
        sources={("accelerator_accelerator_sharepoint", "edr_equipment_mapping"): src},
        select=["stg_accelerator_sharepoint__edr_equipment_mapping"],
        downstream=False,
    )
    rows = {r["equipment"]: r["equipment_category"] for r in built[
        "stg_accelerator_sharepoint__edr_equipment_mapping"
    ].collect()}
    assert rows == {"main magnet": "magnets", "rf cavity": "rf"}


@pytest.fixture()
def full_sources(spark, opralog_fixtures):
    """Synthetic landing tables for an end-to-end DAG run."""
    del opralog_fixtures  # base fixtures are per-model; e2e uses raw sources
    entries_src = spark.createDataFrame(
        [
            (101, ts("2024-07-10 10:00:00"), "  fault A  ", "N"),
            (102, ts("2024-07-10 11:00:00"), "fault B", "N"),
            (103, ts("2024-07-10 12:00:00"), "deleted", "Y"),
        ],
        "entry_id int, entry_timestamp timestamp, additional_comment string, logically_deleted string",
    )
    chapter_entry = spark.createDataFrame(
        [(101, 24, 1, 24), (102, 24, 1, 24), (103, 24, 1, 24)],
        "entry_id int, principal_logbook int, logbook_chapter_no int, logbook_id int",
    )
    logbook_chapter = spark.createDataFrame([(1,)], "logbook_chapter_no int")
    logbooks = spark.createDataFrame([(24, " MCR Running Log ")], "logbook_id int, logbook_name string")
    mec = spark.createDataFrame(
        [
            (101, "Main  Magnet", None, 1),
            (101, "Grp1", None, 2),
            (101, None, 5.3, 3),
            (102, "Main Magnet", None, 1),
            (102, "Grp1", None, 2),
            (102, None, 2.0, 3),
            (103, "X", None, 1),
        ],
        "entry_id int, col_data string, number_value double, additional_column_id int",
    )
    additional_columns = spark.createDataFrame(
        [(1, "Equipment"), (2, "Group"), (3, "Lost Time"), (4, "Group Leader comments")],
        "additional_column_id int, col_title string",
    )
    cycles_src = spark.createDataFrame([Row(_dlt_id="c1", label="2024/2")])
    phases_src = spark.createDataFrame(
        [
            Row(type="user-time", target=1, start=ts("2024-07-09 07:30:00"),
                end=ts("2024-07-24 07:30:00"), _dlt_parent_id="c1"),
        ]
    )
    sp_downtime = spark.createDataFrame(
        [("Old Kit", "04", 3.5, "2004-01-15", "08:00:00", "G", "old fault", None)],
        "equipment string, user_run string, downtime_minutesx double, fault_date string, "
        "fault_time string, group string, fault_description string, managerscomments string",
    )
    edr = spark.createDataFrame(
        [("Main Magnet", "magnets")], "equipment_name string, equipment_category string"
    )
    rdm = spark.createDataFrame(
        [(ts("2024-07-10 10:00:00"), 2.5), (ts("2023-07-10 10:00:00"), 2.1)],
        "date_time timestamp, isis_elec_total_power_mw double",
    )
    peaks = spark.createDataFrame(
        [("mari", 1001, "2024/2", ts("2024-07-10 09:00:00"), 90.0, 4.5, 0.1, 10.0, 0.5, 1.1, 0.05)],
        "beamline string, run_number bigint, cycle_name string, run_start timestamp, "
        "proton_charge double, peak_centre double, peak_centre_error double, peak_amplitude double, "
        "peak_amplitude_error double, peak_sigma double, peak_sigma_error double",
    )
    # NB logbook name has stray spaces at source; base model does NOT trim
    # logbook_name (reference base_opralogweb__logbooks.sql) — fix the input
    logbooks = spark.createDataFrame([(24, "MCR Running Log")], "logbook_id int, logbook_name string")
    return {
        ("accelerator_opralogweb", "entries"): entries_src,
        ("accelerator_opralogweb", "chapter_entry"): chapter_entry,
        ("accelerator_opralogweb", "logbook_chapter"): logbook_chapter,
        ("accelerator_opralogweb", "logbooks"): logbooks,
        ("accelerator_opralogweb", "more_entry_columns"): mec,
        ("accelerator_opralogweb", "additional_columns"): additional_columns,
        ("accelerator_statusdisplay", "cycles"): cycles_src,
        ("accelerator_statusdisplay", "cycles__phases"): phases_src,
        ("accelerator_accelerator_sharepoint", "equipment_downtime_data_11_08_24"): sp_downtime,
        ("accelerator_accelerator_sharepoint", "edr_equipment_mapping"): edr,
        ("estates_electricity_sharepoint", "rdm_data"): rdm,
        ("beamlines_moderator_performance", "monitor_peaks"): peaks,
    }


def test_full_dag_end_to_end(spark, full_sources):
    """Build every model, materialize marts, run all data tests, verify the
    flagship mart's window/interval/category logic end-to-end."""
    ns = f"mart_{uuid.uuid4().hex[:8]}"
    io = TableIO(spark)
    try:
        built = dag.run(spark, sources=full_sources, target_namespace=ns, io=io)
        assert set(built) >= {
            "cycles",
            "mcr_equipment_downtime_records",
            "power_consumption",
            "incident_monitor_peaks",
            "mcr_equipment_downtime_uncategorized_equipment",
        }
        # marts are real catalog tables
        assert io.table_exists(f"{ns}.mcr_equipment_downtime_records")
        assert io.table_exists(f"{ns}.cycles")

        recs = {
            (r["equipment"], r["fault_description"]): r
            for r in built["mcr_equipment_downtime_records"].collect()
        }
        # sharepoint-era row: NULL cycle_phase, kept verbatim
        old = recs[("Old Kit", "old fault")]
        assert old["cycle_phase"] is None and old["cycle_name"] == "2004"
        # opralog rows: enriched with cycle + phase via interval join
        a = recs[("Main Magnet", "fault A")]
        assert (a["cycle_name"], a["cycle_phase"]) == ("2024/2", "user-time")
        assert a["equipment_category"] == "magnets"  # J2 normalized-key join
        # equipment_up_at = fault + 5.3 min = 10:05:18 (F13 fractional)
        assert a["equipment_up_at"] == ts("2024-07-10 10:05:18")
        assert a["uptime_before_fault_mins"] is None  # first fault in window
        b = recs[("Main Magnet", "fault B")]
        # lag window: 10:05:18 → 11:00:00 = 54.7 min → 54 (F12 truncation)
        assert b["uptime_before_fault_mins"] == 54
        # A4 view: every equipment categorized except Old Kit
        unc = built["mcr_equipment_downtime_uncategorized_equipment"].collect()
        assert {r["uncategorized_equipment"] for r in unc} == {"Old Kit"}
        # partition layout: identity(cycle_name) / year(power_measured_at)
        assert "_p_year_power_measured_at" in built["power_consumption"].columns
    finally:
        io.drop_namespace(ns)


def test_data_test_failure_raises(spark, full_sources):
    bad_phases = spark.createDataFrame(
        [Row(type="espresso-break", target=1, start=ts("2024-07-09 07:30:00"),
             end=ts("2024-07-24 07:30:00"), _dlt_parent_id="c1")]
    )
    sources = dict(full_sources)
    sources[("accelerator_statusdisplay", "cycles__phases")] = bad_phases
    with pytest.raises(DataTestError, match="accepted_values"):
        dag.run(spark, sources=sources, select=["cycles"], downstream=False)


def test_dag_selection_closure(spark):
    order = dag.order(select=["base_opralogweb__entries"], downstream=True)
    assert "stg_opralogweb__mcr_equipment_downtime" in order
    assert "mcr_equipment_downtime_records" in order  # transitive downstream
    assert "power_consumption" not in order
    up_only = dag.order(select=["cycles"], downstream=False)
    assert up_only[-1] == "cycles"
    assert "stg_statusdisplay__cycles" in up_only


# --- relationships / expression tests + test_report -----------------------


def test_relationships_and_expression_tests(spark):
    from analytics_data_platform_spark.plans.dag import (
        Model,
        TransformDag,
        expression,
        relationships,
    )

    d = TransformDag()
    d.add(Model(name="dim", build=lambda s, r: s.createDataFrame([(1,), (2,)], "k long")))
    d.add(
        Model(
            name="fact",
            build=lambda s, r: s.createDataFrame(
                [(1, 5.0), (2, -1.0), (9, 3.0)], "k long, v double"
            ),
            deps=("dim",),
            tests=[relationships("k", "dim", "k"), expression("v_positive", "v > 0")],
        )
    )
    with pytest.raises(DataTestError) as ei:
        d.run(spark)
    msgs = str(ei.value)
    assert "relationships" in msgs and "1 failing" in msgs  # k=9 orphan
    assert "v_positive" in msgs  # v=-1 violation


def test_test_report_includes_passes(spark):
    from analytics_data_platform_spark.plans.dag import (
        TransformDag,
        not_null,
        relationships,
        unique,
    )

    tables = {
        "dim": spark.createDataFrame([(1,), (2,)], "k long"),
        "fact": spark.createDataFrame([(1,), (1,), (7,)], "k long"),
    }
    tests = {
        "dim": [unique("k"), not_null("k")],
        "fact": [unique("k"), relationships("k", "dim", "k")],
    }
    rep = {
        (r["model"], r["check"]): r["violations"]
        for r in TransformDag().test_report(tables, tests).collect()
    }
    assert rep[("dim", "unique")] == 0
    assert rep[("dim", "not_null")] == 0
    assert rep[("fact", "unique")] == 1  # duplicated k=1
    assert rep[("fact", "relationships")] == 1  # k=7 orphan
