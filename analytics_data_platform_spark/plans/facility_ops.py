"""The facility_ops transform DAG — every dbt model of the reference's
``warehouses/facility_ops/transform`` re-expressed as a Spark model.

Model-by-model parity (citations into /root/reference/):

staging (views):
- base_opralogweb__* .................. models/staging/accelerator/base_opralogweb__*.sql
- stg_opralogweb__mcr_equipment_downtime
    J1 join chain + A1 EAV pivot + P5 filters
    (stg_opralogweb__mcr_equipment_downtime.sql)
- base/stg_statusdisplay__cycles ...... parent/child denormalization (J3)
- stg_accelerator_sharepoint__equipment_downtime_data_11_08_24
    F4-F8 string surgery + F11 Europe/London → UTC
- stg_accelerator_sharepoint__edr_equipment_mapping (A3 dedup by key)
- stg_electricity_sharepoint_rdm_data / stg_moderator_performance__monitor_peaks

marts (tables):
- cycles .............................. A2 group-by dedup (drop target)
- mcr_equipment_downtime_records ...... U1 union-dedup + J4 interval join +
    J5 scalar subquery + W1 lag window + F12/F13 interval math + J2
    computed-key join + O1 write-sort; partitioned by cycle_name
- mcr_equipment_downtime_uncategorized_equipment (A4 view)
- power_consumption ................... partitioned year(power_measured_at)
- incident_monitor_peaks .............. partitioned identity(beamline)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from analytics_data_platform_spark.functions.dialect import (
    add_fractional_minutes,
    date_diff_minutes,
    equipment_category_key,
    normalize_whitespace,
    parse_utc_timestamp,
)
from analytics_data_platform_spark.plans.dag import (
    Refs,
    TransformDag,
    accepted_values,
    not_null,
    unique,
)

OPRALOG_EPOCH = "2017-04-25"
MCR_LOGBOOK = "MCR Running Log"

dag = TransformDag()


# --------------------------------------------------------------------------
# staging: opralogweb base models (rename/trim/cast views)
# --------------------------------------------------------------------------


@dag.model("base_opralogweb__entries", sources=(("accelerator_opralogweb", "entries"),))
def base_entries(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_opralogweb", "entries")
    return src.select(
        "entry_id",
        # with_timezone(ts,'UTC'): engine-wide UTC session tz makes the
        # naive timestamp already UTC-instant (SURVEY §2.8 F10)
        F.col("entry_timestamp").alias("fault_occurred_at"),
        F.col("entry_timestamp").cast("date").alias("fault_date"),
        F.trim("additional_comment").alias("fault_description"),
        (F.col("logically_deleted") == "Y").alias("logically_deleted"),
    )


@dag.model(
    "base_opralogweb__additional_columns",
    sources=(("accelerator_opralogweb", "additional_columns"),),
)
def base_additional_columns(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_opralogweb", "additional_columns")
    return src.select("additional_column_id", F.trim("col_title").alias("column_title"))


@dag.model(
    "base_opralogweb__more_entry_columns",
    sources=(("accelerator_opralogweb", "more_entry_columns"),),
)
def base_more_entry_columns(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_opralogweb", "more_entry_columns")
    return src.select(
        "entry_id",
        normalize_whitespace("col_data").alias("string_data"),
        F.col("number_value").alias("number_data"),
        "additional_column_id",
    )


@dag.model("base_opralogweb__logbooks", sources=(("accelerator_opralogweb", "logbooks"),))
def base_logbooks(spark: SparkSession, r: Refs) -> DataFrame:
    return r.source("accelerator_opralogweb", "logbooks").select("logbook_id", "logbook_name")


@dag.model(
    "base_opralogweb__logbook_chapter", sources=(("accelerator_opralogweb", "logbook_chapter"),)
)
def base_logbook_chapter(spark: SparkSession, r: Refs) -> DataFrame:
    return r.source("accelerator_opralogweb", "logbook_chapter").select("logbook_chapter_no")


@dag.model(
    "base_opralogweb__chapter_entry", sources=(("accelerator_opralogweb", "chapter_entry"),)
)
def base_chapter_entry(spark: SparkSession, r: Refs) -> DataFrame:
    return r.source("accelerator_opralogweb", "chapter_entry").select(
        "entry_id", "principal_logbook", "logbook_chapter_no", "logbook_id"
    )


# --------------------------------------------------------------------------
# staging: the J1+A1 showcase — MCR equipment downtime
# --------------------------------------------------------------------------


@dag.model(
    "stg_opralogweb__mcr_equipment_downtime",
    deps=(
        "base_opralogweb__entries",
        "base_opralogweb__chapter_entry",
        "base_opralogweb__logbook_chapter",
        "base_opralogweb__logbooks",
        "base_opralogweb__more_entry_columns",
        "base_opralogweb__additional_columns",
    ),
)
def stg_mcr_equipment_downtime(spark: SparkSession, r: Refs) -> DataFrame:
    """Denormalize the logbook snowflake, pivot the EAV columns, and keep
    complete rows after the Opralog epoch
    (stg_opralogweb__mcr_equipment_downtime.sql:29-95)."""
    e = r.ref("base_opralogweb__entries").alias("e")
    ce = r.ref("base_opralogweb__chapter_entry").alias("ce")
    lc = r.ref("base_opralogweb__logbook_chapter").alias("lc")
    lb = r.ref("base_opralogweb__logbooks").alias("lb")
    mec = r.ref("base_opralogweb__more_entry_columns").alias("mec")
    ac = r.ref("base_opralogweb__additional_columns").alias("ac")

    denormalized = (
        e.join(ce, F.col("ce.entry_id") == F.col("e.entry_id"))
        .join(lc, F.col("lc.logbook_chapter_no") == F.col("ce.logbook_chapter_no"))
        .join(lb, F.col("lb.logbook_id") == F.col("ce.logbook_id"))
        .join(mec, F.col("mec.entry_id") == F.col("e.entry_id"), "left")
        .join(ac, F.col("ac.additional_column_id") == F.col("mec.additional_column_id"), "left")
        .where(
            (F.col("e.logically_deleted") == False)  # noqa: E712 — tri-state SQL equality
            & (F.col("e.fault_date") >= F.to_date(F.lit(OPRALOG_EPOCH)))
            & (F.col("lb.logbook_name") == MCR_LOGBOOK)
            & (F.col("ce.logbook_id") == F.col("ce.principal_logbook"))
            & F.col("ac.column_title").isin("Equipment", "Group", "Lost Time", "Group Leader comments")
            & (F.col("mec.string_data").isNotNull() | F.col("mec.number_data").isNotNull())
        )
        .select(
            F.col("e.entry_id").alias("entry_id"),
            F.col("e.fault_occurred_at").alias("fault_occurred_at"),
            F.col("e.fault_date").alias("fault_date"),
            F.col("ac.column_title").alias("column_title"),
            F.col("mec.string_data").alias("string_data"),
            F.col("mec.number_data").alias("number_data"),
            F.col("e.fault_description").alias("fault_description"),
        )
    )

    def pick(title: str, col: str):
        return F.min(F.when(F.col("column_title") == title, F.col(col)))

    pivoted = denormalized.groupBy("fault_occurred_at", "fault_date", "fault_description").agg(
        pick("Equipment", "string_data").alias("equipment"),
        pick("Lost Time", "number_data").alias("downtime_mins"),
        pick("Group", "string_data").alias("group"),
        pick("Group Leader comments", "string_data").alias("managers_comments"),
    )
    return pivoted.where(
        F.col("equipment").isNotNull()
        & F.col("downtime_mins").isNotNull()
        & F.col("group").isNotNull()
    ).select(
        "equipment",
        "downtime_mins",
        "fault_date",
        "fault_occurred_at",
        "group",
        "fault_description",
        "managers_comments",
    )


# --------------------------------------------------------------------------
# staging: statusdisplay cycles (parent/child J3)
# --------------------------------------------------------------------------


@dag.model("base_statusdisplay__cycles", sources=(("accelerator_statusdisplay", "cycles"),))
def base_cycles(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_statusdisplay", "cycles")
    return src.select(F.col("_dlt_id").alias("dlt_id"), F.col("label").alias("name"))


@dag.model(
    "base_statusdisplay__cycles__phases",
    sources=(("accelerator_statusdisplay", "cycles__phases"),),
)
def base_cycles_phases(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_statusdisplay", "cycles__phases")
    return src.select(
        F.col("type").alias("phase"),
        "target",
        F.col("start").alias("started_at"),
        F.col("end").alias("ended_at"),
        F.col("_dlt_parent_id").alias("dlt_cycles_id"),
    )


@dag.model(
    "stg_statusdisplay__cycles",
    deps=("base_statusdisplay__cycles", "base_statusdisplay__cycles__phases"),
)
def stg_cycles(spark: SparkSession, r: Refs) -> DataFrame:
    c = r.ref("base_statusdisplay__cycles")
    p = r.ref("base_statusdisplay__cycles__phases")
    return c.join(p, c.dlt_id == p.dlt_cycles_id).select(
        "name", "started_at", "ended_at", "phase", "target"
    )


# --------------------------------------------------------------------------
# staging: sharepoint-era downtime + equipment mapping
# --------------------------------------------------------------------------


@dag.model(
    "stg_accelerator_sharepoint__equipment_downtime_data_11_08_24",
    sources=(("accelerator_accelerator_sharepoint", "equipment_downtime_data_11_08_24"),),
)
def stg_sharepoint_downtime(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_accelerator_sharepoint", "equipment_downtime_data_11_08_24")
    fault_date_str = F.substring("fault_date", 1, 10)
    fault_time_str = F.substring(F.col("fault_time"), -8, 8)
    cycle_name = F.when(
        F.col("user_run").like(".%"), F.regexp_replace("user_run", r"\.", "19")
    ).otherwise(F.concat(F.lit("20"), F.col("user_run")))
    return src.select(
        "equipment",
        cycle_name.alias("cycle_name"),
        F.col("downtime_minutesx").alias("downtime_mins"),
        F.to_date(fault_date_str).alias("fault_date"),
        parse_utc_timestamp(fault_date_str, fault_time_str, "Europe/London").alias(
            "fault_occurred_at"
        ),
        "group",
        "fault_description",
        F.col("managerscomments").alias("managers_comments"),
    )


@dag.model(
    "stg_accelerator_sharepoint__edr_equipment_mapping",
    sources=(("accelerator_accelerator_sharepoint", "edr_equipment_mapping"),),
)
def stg_edr_mapping(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("accelerator_accelerator_sharepoint", "edr_equipment_mapping")
    # any_value in the reference; min() is a deterministic any_value
    return (
        src.groupBy(equipment_category_key("equipment_name").alias("equipment"))
        .agg(F.min("equipment_category").alias("equipment_category"))
    )


# --------------------------------------------------------------------------
# staging: estates / beamlines pass-throughs
# --------------------------------------------------------------------------


@dag.model(
    "stg_electricity_sharepoint_rdm_data",
    sources=(("estates_electricity_sharepoint", "rdm_data"),),
)
def stg_rdm_data(spark: SparkSession, r: Refs) -> DataFrame:
    src = r.source("estates_electricity_sharepoint", "rdm_data")
    return src.select(
        F.col("date_time").alias("power_measured_at"),
        F.col("isis_elec_total_power_mw").alias("total_isis_power_mw"),
    )


@dag.model(
    "stg_moderator_performance__monitor_peaks",
    sources=(("beamlines_moderator_performance", "monitor_peaks"),),
)
def stg_monitor_peaks(spark: SparkSession, r: Refs) -> DataFrame:
    return r.source("beamlines_moderator_performance", "monitor_peaks").select(
        "beamline",
        "run_number",
        "cycle_name",
        "run_start",
        "proton_charge",
        "peak_centre",
        "peak_centre_error",
        "peak_amplitude",
        "peak_amplitude_error",
        "peak_sigma",
        "peak_sigma_error",
    )


# --------------------------------------------------------------------------
# marts
# --------------------------------------------------------------------------


@dag.model(
    "cycles",
    deps=("stg_statusdisplay__cycles",),
    materialization="table",
    tests=[
        not_null("name"),
        unique("name"),
        accepted_values("phase", ["run-up", "user-time", "machine-physics"]),
        not_null("started_at"),
        not_null("ended_at"),
    ],
)
def mart_cycles(spark: SparkSession, r: Refs) -> DataFrame:
    """Drop target column and dedup phases (cycles.sql:15-27, A2)."""
    return (
        r.ref("stg_statusdisplay__cycles")
        .groupBy("name", "started_at", "ended_at", "phase")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )


@dag.model(
    "mcr_equipment_downtime_records",
    deps=(
        "stg_accelerator_sharepoint__equipment_downtime_data_11_08_24",
        "stg_opralogweb__mcr_equipment_downtime",
        "stg_accelerator_sharepoint__edr_equipment_mapping",
        "cycles",
    ),
    materialization="table",
    partition={"cycle_name": "identity"},
    sort=["fault_occurred_at"],
)
def mart_downtime_records(spark: SparkSession, r: Refs) -> DataFrame:
    """The flagship mart (mcr_equipment_downtime_records.sql):
    sharepoint-era ∪ opralog-era records, cycle interval-join enrichment,
    equipment uptime lag window, category computed-key join, write-sorted."""
    sp = r.ref("stg_accelerator_sharepoint__equipment_downtime_data_11_08_24")
    op = r.ref("stg_opralogweb__mcr_equipment_downtime")
    mapping = r.ref("stg_accelerator_sharepoint__edr_equipment_mapping")
    cycles = r.ref("cycles")

    cols = [
        "equipment",
        "fault_date",
        "cycle_name",
        "cycle_phase",
        "downtime_mins",
        "fault_occurred_at",
        "group",
        "fault_description",
        "managers_comments",
    ]

    sp_rows = sp.select(
        "equipment",
        "fault_date",
        "cycle_name",
        F.lit(None).cast("string").alias("cycle_phase"),
        "downtime_mins",
        "fault_occurred_at",
        "group",
        "fault_description",
        "managers_comments",
    )

    # J5 scalar subquery: only opralog rows after the sharepoint era
    sp_max = sp_rows.agg(F.max("fault_occurred_at").alias("_m"))
    op_rows = (
        op.join(F.broadcast(sp_max))
        .where(F.col("fault_occurred_at") > F.col("_m"))
        .drop("_m")
        # J4 point-in-interval join against the (tiny) cycles dim
        .join(
            F.broadcast(cycles),
            F.col("fault_occurred_at").between(cycles.started_at, cycles.ended_at),
            "left",
        )
        .select(
            "equipment",
            "fault_date",
            F.col("name").alias("cycle_name"),
            F.col("phase").alias("cycle_phase"),
            "downtime_mins",
            "fault_occurred_at",
            "group",
            "fault_description",
            "managers_comments",
        )
    )

    # U1: Trino UNION deduplicates
    all_records = sp_rows.select(cols).unionByName(op_rows.select(cols)).dropDuplicates()

    # F13: equipment_up_at = fault + downtime_mins (fractional minutes)
    with_up = all_records.withColumn(
        "equipment_up_at", add_fractional_minutes(F.col("fault_occurred_at"), F.col("downtime_mins"))
    )

    # W1+F12: minutes of uptime since previous fault's recovery
    w = Window.partitionBy("cycle_name", "equipment").orderBy("fault_occurred_at")
    with_uptime = with_up.withColumn(
        "uptime_before_fault_mins",
        date_diff_minutes(F.lag("equipment_up_at", 1).over(w), F.col("fault_occurred_at")),
    )

    # J2: computed-key category join (mapping keys are already normalized)
    u = with_uptime.alias("u")
    m = mapping.alias("m")
    return (
        u.join(F.broadcast(m), equipment_category_key(F.col("u.equipment")) == F.col("m.equipment"), "left")
        .select(
            normalize_whitespace(F.col("u.equipment")).alias("equipment"),
            F.col("m.equipment_category").alias("equipment_category"),
            F.col("u.fault_date").alias("fault_date"),
            F.col("u.cycle_name").alias("cycle_name"),
            F.col("u.cycle_phase").alias("cycle_phase"),
            F.col("u.downtime_mins").alias("downtime_mins"),
            F.col("u.fault_occurred_at").alias("fault_occurred_at"),
            F.col("u.equipment_up_at").alias("equipment_up_at"),
            F.col("u.uptime_before_fault_mins").alias("uptime_before_fault_mins"),
            F.col("u.group").alias("group"),
            F.col("u.fault_description").alias("fault_description"),
            F.col("u.managers_comments").alias("managers_comments"),
        )
        .orderBy("fault_occurred_at")
    )


@dag.model(
    "mcr_equipment_downtime_uncategorized_equipment",
    deps=("mcr_equipment_downtime_records",),
)
def mart_uncategorized(spark: SparkSession, r: Refs) -> DataFrame:
    """A4 distinct view (mcr_equipment_downtime_uncategorized_equipment.sql:8-17)."""
    return (
        r.ref("mcr_equipment_downtime_records")
        .where(F.col("equipment_category").isNull())
        .select(F.col("equipment").alias("uncategorized_equipment"))
        .distinct()
    )


@dag.model(
    "power_consumption",
    deps=("stg_electricity_sharepoint_rdm_data",),
    materialization="table",
    partition={"power_measured_at": "year"},
    tests=[not_null("power_measured_at"), not_null("total_isis_power_mw")],
)
def mart_power_consumption(spark: SparkSession, r: Refs) -> DataFrame:
    return r.ref("stg_electricity_sharepoint_rdm_data").select(
        "power_measured_at", "total_isis_power_mw"
    )


@dag.model(
    "incident_monitor_peaks",
    deps=("stg_moderator_performance__monitor_peaks",),
    materialization="table",
    partition={"beamline": "identity"},
    tests=[not_null("beamline"), not_null("run_start"), not_null("peak_centre")],
)
def mart_incident_monitor_peaks(spark: SparkSession, r: Refs) -> DataFrame:
    return r.ref("stg_moderator_performance__monitor_peaks").select(
        "beamline", "run_number", "cycle_name", "run_start", "peak_centre"
    )
