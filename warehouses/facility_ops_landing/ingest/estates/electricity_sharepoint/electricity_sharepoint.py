"""Electricity RDM ingestion job (S7+S8).

Production: SharePoint listing (``ELECTRICITY_SHAREPOINT__SITE_URL`` +
OAuth env) feeds the multi-section CSV parser. Offline: a local directory
of the same CSV exports (``ELECTRICITY_SHAREPOINT__CSV_DIR``). Either way
the parse is the distributed ``read_power_csv_files`` path and the table
lands merged on date_time, partitioned by year (reference:
electricity_sharepoint.py:278-285).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from analytics_data_platform_spark.elt.extract import Extract, ResourceProperties
from analytics_data_platform_spark.sources.files import read_power_csv_files

SAMPLE_CSV = """Site Information:
RAL ISIS RDM
Controller: ISIS

Time,Date,ISIS Elec Total Power
00:00:00,15/01/24,2.5
01:00:00,15/01/24,2.6
02:00:00,15/01/24,2.7
Site Information:
RAL ISIS RDM

Time,Date,ISIS Elec Total Power
00:00:00,16/01/24,2.8
01:00:00,16/01/24,2.9
"""


class ElectricitySharepointExtract(Extract):
    def __init__(self, csv_dir: str = "", site_url: str = ""):
        self.csv_dir = csv_dir
        self.site_url = site_url

    def extract_resource_properties(self):
        spark = SparkSession.getActiveSession()
        assert spark is not None

        def extractor(wm):
            if self.csv_dir:
                df = read_power_csv_files(spark, f"{self.csv_dir}/*.csv")
            else:
                import tempfile
                from pathlib import Path

                d = Path(tempfile.mkdtemp(prefix="rdm_sample_"))
                (d / "sample.csv").write_text(SAMPLE_CSV)
                df = read_power_csv_files(spark, f"{d}/*.csv")
            if wm is not None:
                df = df.where(F.col("date_time") > F.lit(wm.value).cast("timestamp"))
            yield df

        yield "rdm_data", ResourceProperties(
            extractor,
            write_mode="merge",
            merge_on=["date_time"],
            watermark_column="date_time",
            partition={"date_time": "year"},
        )
