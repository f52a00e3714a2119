"""File sources: multi-section CSV (S8) and spreadsheet (S9).

The electricity RDM exports are concatenated CSVs with repeated preambles;
sections start at a header line beginning with "time" and metadata blocks
begin with "site information"
(reference: warehouses/facility_ops_landing/ingest/estates/
electricity_sharepoint/electricity_sharepoint.py:35-165). Two column
layouts exist (automated: Time,Date,Power; manual: "DD/mm/YY HH:MM:SS"
combined) — both in Europe/London civil time converted to UTC, and a
section whose times hit a DST fold/gap is REJECTED whole (the reference's
explicit ambiguity policy, F16 — Spark's to_utc_timestamp would silently
pick an offset).

Scale shape: parsing is per-file and driver-independent — files stream
through Spark's binaryFile source and parse inside ``mapInPandas`` on
executors; a 100k-file archive parses with full cluster parallelism.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CSV_PREAMBLE_ANCHOR = "time"
METADATA_ANCHOR = "site information"
COL_DATE_TIME = "date_time"
COL_TOTAL_POWER = "isis_elec_total_power_mw"
RDM_TIMEZONE = "Europe/London"

POWER_SCHEMA = f"{COL_DATE_TIME} timestamp, {COL_TOTAL_POWER} double, file_name string"


def _to_utc(ts: pd.Series) -> pd.Series:
    return ts.dt.tz_localize(RDM_TIMEZONE).dt.tz_convert("UTC")


def csv_section_to_df(file_name: str, lines: list[str]) -> pd.DataFrame | None:
    """One header-anchored section → rows, or None when DST-ambiguous."""
    raw = pd.read_csv(io.StringIO("\n".join(lines)))
    raw.columns = raw.columns.str.strip()
    cols = list(raw.columns)
    if len(cols) != 3:
        raise ValueError(f"{file_name}: expected 3 columns, got {cols}")
    try:
        if cols[1].strip() == "Date":  # automated export: Time + Date split
            ts = _to_utc(pd.to_datetime(raw["Date"] + " " + raw["Time"], format="%d/%m/%y %H:%M:%S"))
        else:  # manual export: combined timestamp in col 0
            ts = _to_utc(pd.to_datetime(raw["Time"], format="%d/%m/%y %H:%M:%S"))
    except Exception as exc:  # pandas raises pytz errors / ValueError by version
        msg = str(exc).lower()
        if "ambiguous" in msg or "nonexistent" in msg or "non-existent" in msg:
            return None  # reject the section (reference policy)
        raise
    if "power" not in cols[2].lower():
        raise ValueError(f"{file_name}: third column {cols[2]!r} is not a power column")
    out = ts.dt.tz_localize(None).to_frame(name=COL_DATE_TIME)
    out[COL_TOTAL_POWER] = raw[cols[2]]
    return out


def parse_power_csv(content: str, file_name: str) -> pd.DataFrame | None:
    """Split concatenated export into sections and parse each."""
    sections: list[pd.DataFrame] = []
    current: list[str] = []
    in_data = False
    for line in content.splitlines():
        line = line.strip()
        lower = line.lower()
        if lower.startswith(CSV_PREAMBLE_ANCHOR):
            if current and (df := csv_section_to_df(file_name, current)) is not None:
                sections.append(df)
            current = [line]
            in_data = True
        elif in_data:
            if lower.startswith(METADATA_ANCHOR):
                in_data = False
            elif line:
                current.append(line)
    if current and (df := csv_section_to_df(file_name, current)) is not None:
        sections.append(df)
    if not sections:
        return None
    out = pd.concat(sections, ignore_index=True)
    out["file_name"] = file_name
    return out


def read_power_csv_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed parse: binaryFile scan → per-file parse on executors."""
    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for path, content in zip(pdf["path"], pdf["content"]):
                parsed = parse_power_csv(bytes(content).decode("utf-8"), path)
                if parsed is not None:
                    frames.append(parsed)
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {COL_DATE_TIME: pd.Series(dtype="datetime64[us]"),
                     COL_TOTAL_POWER: pd.Series(dtype="float64"),
                     "file_name": pd.Series(dtype="object")}
                )

    return files.mapInPandas(parse, schema=POWER_SCHEMA)


def read_excel_table(
    content: bytes,
    skiprows: int = 0,
    dtype_overrides: dict | None = None,
    renames: dict[str, str] | None = None,
) -> pd.DataFrame:
    """Excel reader (S9) — engine gated: this container ships no
    openpyxl/calamine, so the call raises with a clear action."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Excel parsing needs openpyxl (or calamine) on the cluster image; "
            "not available in this environment"
        ) from exc
    df = pd.read_excel(io.BytesIO(content), skiprows=skiprows, dtype=dtype_overrides)
    if renames:
        df = df.rename(columns=renames)
    return df
