"""Local DuckDB-oracle parity harness — mirrors the driver's correctness gate.

For each registered query with an oracle, run the Spark implementation and
the DuckDB SQL over the same parquet tables, then compare row counts, column
names, and cell values after sorting columns by name and rows by all columns
(the driver hashes exactly that ordering). Strict equality is used so any
float divergence that could break the driver's value-hash is surfaced here.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from analytics_data_platform_spark.queries import all_queries
from analytics_data_platform_spark.sources.testdata import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b


def compare_frames(s: pd.DataFrame, o: pd.DataFrame) -> str:
    """Return '' when equal, else a description of the first difference."""
    if sorted(s.columns) != sorted(o.columns):
        return f"column mismatch: spark={sorted(s.columns)} oracle={sorted(o.columns)}"
    s, o = _normalize(s), _normalize(o)
    for c in s.columns:
        s_num = pd.api.types.is_numeric_dtype(s[c])
        o_num = pd.api.types.is_numeric_dtype(o[c])
        if s_num != o_num:
            return f"dtype family mismatch col={c}: spark={s[c].dtype} oracle={o[c].dtype}"
        # int-vs-float drift hashes differently in the driver (5 vs 5.0) even
        # though lenient == comparison passes — e.g. DuckDB SUM(int) -> HUGEINT
        # -> float64. Require the same int/float family on both sides.
        if s_num and (pd.api.types.is_float_dtype(s[c]) != pd.api.types.is_float_dtype(o[c])):
            return f"int/float drift col={c}: spark={s[c].dtype} oracle={o[c].dtype}"
    if len(s) != len(o):
        return f"row count mismatch: spark={len(s)} oracle={len(o)}"
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if not _cells_equal(x, y):
                return f"value mismatch col={c} row={i}: spark={x!r} oracle={y!r}"
    return ""


def check_query(spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, sf_dir: str) -> ParityResult:
    spec = all_queries()[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return ParityResult(name, True, "rows-only (no oracle)", len(sdf), -1)
    odf = con.sql(spec.oracle).df()
    diff = compare_frames(sdf, odf)
    return ParityResult(name, diff == "", diff, len(sdf), len(odf))


def check_all(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[ParityResult]:
    con = duckdb_connection(sf_dir)
    results = []
    for name in names or sorted(all_queries()):
        try:
            results.append(check_query(spark, con, name, sf_dir))
        except Exception as exc:  # noqa: BLE001 — harness reports, caller decides
            results.append(ParityResult(name, False, f"EXCEPTION: {exc}"))
    return results
