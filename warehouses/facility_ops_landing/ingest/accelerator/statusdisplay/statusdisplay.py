"""Status-display cycles ingestion job.

REST → dlt-style normalized parent/child tables (S6 + J3 parity;
reference: elt-pipelines/facility_ops/ingest/accelerator/statusdisplay/
statusdisplay.py:23-56). ``STATUSDISPLAY__URL`` points at the cycles
endpoint in production; without it a deterministic canned payload is used
so the job runs offline (same canned-response strategy as the reference's
Graph tests).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from analytics_data_platform_spark.elt.extract import Extract, ResourceProperties
from analytics_data_platform_spark.sources.rest import fetch_records, normalize_nested

# One phase row per cycle label, duplicated per running target — the A2
# dedup (drop target) collapses the duplicates and the cycles mart keeps
# `name` unique, matching the reference's cycles.yml data tests.
CANNED_CYCLES = [
    {
        "label": "2024/1",
        "phases": [
            {"type": "run-up", "target": 1,
             "start": "2024-01-01T07:30:00", "end": "2024-02-10T07:30:00"},
            {"type": "run-up", "target": 2,
             "start": "2024-01-01T07:30:00", "end": "2024-02-10T07:30:00"},
        ],
    },
    {
        "label": "2024/2",
        "phases": [
            {"type": "user-time", "target": 1,
             "start": "2024-07-09T07:30:00", "end": "2024-07-24T07:30:00"},
        ],
    },
]


class StatusdisplayExtract(Extract):
    def __init__(self, url: str = ""):
        self.url = url

    def _records(self) -> list[dict]:
        if self.url:
            return fetch_records(self.url)
        return CANNED_CYCLES

    def extract_resource_properties(self):
        spark = SparkSession.getActiveSession()
        assert spark is not None
        tables = normalize_nested(spark, self._records(), "cycles")
        # ISO strings → timestamps on the child table (F17: Spark
        # to_timestamp handles ISO directly, no strftime reformatting)
        phases = tables["cycles__phases"].withColumns(
            {"start": F.to_timestamp("start"), "end": F.to_timestamp("end")}
        )

        yield "cycles", ResourceProperties(
            lambda wm, df=tables["cycles"]: iter([df]), write_mode="replace"
        )
        yield "cycles__phases", ResourceProperties(
            lambda wm, df=phases: iter([df]), write_mode="replace"
        )
