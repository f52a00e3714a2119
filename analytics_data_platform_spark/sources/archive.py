"""Scientific-archive source: cycle discovery + distributed monitor-peak
fitting (SURVEY §2.1 S10/S11, §2.9 X2).

Discovery mirrors the reference's archive walk
(reference: warehouses/facility_ops_landing/ingest/beamlines/
moderator_performance/moderator_performance.py:97-161): ``cycle_YY_N``
directories with century-padded sort (9x→199x else 20xx), incremental mode
= latest cycle only, run numbers parsed from ``<beamline><run>.nxs`` stems,
skip-list filtering.

The per-run Gaussian peak fit (fit_monitor.py:72-175) becomes a
``mapInPandas`` stage over the discovered (cycle, run, path) work items —
the canonical "driver enumerates, executors compute" shape for archive
pipelines. The curve fit itself is a weighted Levenberg–Marquardt in pure
numpy (scipy is not in this container): same model (amplitude, centre,
sigma), same sigma-weighted absolute errors from the covariance diagonal,
same proton-charge < 1 µA skip rule. The HDF5/NeXus reader is injectable
(h5py gated) — tests use synthetic spectra.
"""

from __future__ import annotations

import datetime as dt
import re
from collections.abc import Callable, Iterator
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CYCLE_DIR_PREFIX = "cycle_"

MONITOR_PEAKS_SCHEMA = (
    "beamline string, run_number long, cycle_name string, run_start timestamp, "
    "proton_charge double, peak_centre double, peak_centre_error double, "
    "peak_amplitude double, peak_amplitude_error double, "
    "peak_sigma double, peak_sigma_error double"
)


@dataclass(frozen=True)
class MonitorFitConfig:
    """Per-beamline fit window and initial guess (moderator_performance.py:43-60)."""

    x_range: tuple[float, float]
    p0: tuple[float, float, float]  # amplitude, centre, sigma
    bounds_lo: tuple[float, float, float] = (0.0, -np.inf, 1e-9)
    bounds_hi: tuple[float, float, float] = (np.inf, np.inf, np.inf)


def pad_century(two_digit_year: str) -> str:
    """'98'→'1998', '24'→'2024' (reference century rule)."""
    return f"19{two_digit_year}" if two_digit_year.startswith("9") else f"20{two_digit_year}"


def discover_runs(
    archive_mount: str | Path,
    beamline: str,
    mode: str = "incremental",
    cycle_start: str | None = None,
    skip: tuple[int, ...] = (),
) -> list[tuple[str, int, str]]:
    """[(cycle_dir, run_number, path)] — newest cycle first.

    incremental mode looks only at the most recent cycle; full mode walks
    back to ``cycle_start`` (inclusive) when given.
    """
    data_dir = Path(archive_mount) / f"NDX{beamline}" / "Instrument" / "data"
    if not data_dir.exists():
        raise ValueError(f"Data directory does not exist: {data_dir}")

    suffixes = [
        d.name[len(CYCLE_DIR_PREFIX):]
        for d in data_dir.iterdir()
        if d.is_dir() and d.name.startswith(CYCLE_DIR_PREFIX)
    ]
    # sort by (century-padded year, cycle number) descending
    def sort_key(s: str):
        year, _, num = s.partition("_")
        return (pad_century(year), int(num) if num.isdigit() else 0)

    ordered = sorted(suffixes, key=sort_key, reverse=True)
    if mode == "incremental":
        ordered = ordered[:1]

    out: list[tuple[str, int, str]] = []
    run_re = re.compile(rf"^{re.escape(beamline)}(\d+)$")
    for suffix in ordered:
        cycle_dir = f"{CYCLE_DIR_PREFIX}{suffix}"
        for f in sorted((data_dir / cycle_dir).glob(f"{beamline}*.nxs")):
            m = run_re.match(f.stem)
            if not m:
                continue
            run = int(m.group(1))
            if run not in skip:
                out.append((cycle_dir, run, str(f)))
        if cycle_start and cycle_start in cycle_dir:
            break
    return out


# --- weighted Gaussian fit (numpy Levenberg–Marquardt) --------------------


def gaussian(x: np.ndarray, amplitude: float, centre: float, sigma: float) -> np.ndarray:
    return amplitude * np.exp(-((x - centre) ** 2) / (2.0 * sigma**2))


def fit_gaussian(
    x: np.ndarray,
    y: np.ndarray,
    ye: np.ndarray,
    p0: tuple[float, float, float],
    bounds_lo: tuple[float, float, float] = (0.0, -np.inf, 1e-9),
    bounds_hi: tuple[float, float, float] = (np.inf, np.inf, np.inf),
    max_iter: int = 200,
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted LM fit of a Gaussian; returns (params, errors).

    Absolute-sigma semantics (like the reference's curve_fit call): the
    covariance is (JᵀWJ)⁻¹ with W = 1/ye², not rescaled by reduced χ².
    """
    p = np.array(p0, dtype=np.float64)
    lo, hi = np.array(bounds_lo), np.array(bounds_hi)
    w = 1.0 / np.where(ye > 0, ye, np.inf)
    lam = 1e-3
    prev_cost = np.inf
    for _ in range(max_iter):
        a, c, s = p
        e = np.exp(-((x - c) ** 2) / (2 * s**2))
        f = a * e
        r = (y - f) * w
        cost = float(r @ r)
        jac = np.column_stack(
            [e, a * e * (x - c) / s**2, a * e * (x - c) ** 2 / s**3]
        ) * w[:, None]
        jtj = jac.T @ jac
        g = jac.T @ r
        try:
            delta = np.linalg.solve(jtj + lam * np.diag(np.diag(jtj)), g)
        except np.linalg.LinAlgError:
            break
        p_new = np.clip(p + delta, lo, hi)
        a2, c2, s2 = p_new
        f2 = a2 * np.exp(-((x - c2) ** 2) / (2 * s2**2))
        new_cost = float(((y - f2) * w) @ ((y - f2) * w))
        if new_cost < cost:
            p, lam = p_new, max(lam / 3, 1e-12)
            if abs(prev_cost - new_cost) <= 1e-12 * max(new_cost, 1.0):
                break
            prev_cost = new_cost
        else:
            lam *= 10
            if lam > 1e12:
                break
    a, c, s = p
    e = np.exp(-((x - c) ** 2) / (2 * s**2))
    jac = np.column_stack([e, a * e * (x - c) / s**2, a * e * (x - c) ** 2 / s**3]) * w[:, None]
    try:
        cov = np.linalg.inv(jac.T @ jac)
        perr = np.sqrt(np.clip(np.diag(cov), 0, None))
    except np.linalg.LinAlgError:
        perr = np.full(3, np.nan)
    return p, perr


# --- distributed fit pipeline ---------------------------------------------

MonitorReader = Callable[[str], dict]
"""path → {run_number:int, run_start:datetime, proton_charge:float,
tof:ndarray (bin edges, len n+1), counts:ndarray (len n)}"""


def read_monitor_h5(path: str) -> dict:
    """ISIS NeXus monitor read (fit_monitor.py:89-130); needs h5py."""
    try:
        import h5py
    except ImportError as exc:
        raise NotImplementedError(
            "HDF5/NeXus reading needs h5py on the cluster image; inject a "
            "reader for environments without it"
        ) from exc
    with h5py.File(path, "r") as hf:
        raw = hf["raw_data_1"]
        counts = np.array(raw["monitor_1/data"][0, 0, :])
        return {
            "run_number": int(raw["run_number"][0]),
            "run_start": dt.datetime.fromisoformat(raw["start_time"][0].decode()),
            "proton_charge": float(raw["proton_charge"][0]),
            "tof": np.array(raw["monitor_1/time_of_flight"][:]),
            "counts": counts,
        }


def fit_monitor_peaks(
    spark: SparkSession,
    runs: list[tuple[str, str, int, str]],
    fit_configs: dict[str, MonitorFitConfig],
    reader: MonitorReader = read_monitor_h5,
    min_proton_charge: float = 1.0,
) -> DataFrame:
    """(beamline, cycle_name, run_number, path) work items → monitor_peaks.

    Executors read + fit each run (mapInPandas); rows for runs below the
    proton-charge floor or with failed fits are dropped (reference
    fit_monitor.py:139-141,168-175). Output schema matches the landing
    table FIXTURES.md §3 expects.
    """
    work = spark.createDataFrame(
        runs, "beamline string, cycle_name string, run_number long, path string"
    ).repartition(max(1, min(len(runs), spark.sparkContext.defaultParallelism)))

    def run_fits(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for beamline, cycle_name, run_number, path in zip(
                pdf["beamline"], pdf["cycle_name"], pdf["run_number"], pdf["path"]
            ):
                cfg = fit_configs[beamline]
                ws = reader(path)
                pcharge = ws["proton_charge"]
                if pcharge < min_proton_charge:
                    continue
                tof, counts = np.asarray(ws["tof"], float), np.asarray(ws["counts"], float)
                widths = np.diff(tof)
                x = 0.5 * (tof[:-1] + tof[1:])
                y = counts / widths / pcharge  # frequencies, charge-normalized
                ye = np.sqrt(counts) / widths / pcharge
                mask = (x >= cfg.x_range[0]) & (x <= cfg.x_range[1])
                try:
                    popt, perr = fit_gaussian(
                        x[mask], y[mask], ye[mask], cfg.p0, cfg.bounds_lo, cfg.bounds_hi
                    )
                except Exception:
                    continue  # failed fit → skip run (reference behavior)
                if not np.all(np.isfinite(popt)) or not np.all(np.isfinite(perr)):
                    continue
                rows.append(
                    {
                        "beamline": beamline,
                        "run_number": int(run_number),
                        "cycle_name": cycle_name,
                        "run_start": ws["run_start"],
                        "proton_charge": float(pcharge),
                        "peak_centre": float(popt[1]),
                        "peak_centre_error": float(perr[1]),
                        "peak_amplitude": float(popt[0]),
                        "peak_amplitude_error": float(perr[0]),
                        "peak_sigma": float(popt[2]),
                        "peak_sigma_error": float(perr[2]),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "beamline", "run_number", "cycle_name", "run_start", "proton_charge",
                    "peak_centre", "peak_centre_error", "peak_amplitude",
                    "peak_amplitude_error", "peak_sigma", "peak_sigma_error",
                ],
            )

    return work.mapInPandas(run_fits, schema=MONITOR_PEAKS_SCHEMA)
