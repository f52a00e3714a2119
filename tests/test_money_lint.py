"""DECIMAL money contract lint (no Spark session needed).

The r02 hash-flake class: double SUM of on-grid currency values is
summation-order dependent, and a ±1-ulp drift can flip round() across
engines. Every money aggregate must therefore route through
queries/exact.py (DECIMAL) or exact integer cents. This grep-based gate
fails if any NEW query sums a known currency column as a raw double —
on either the Spark side (``F.sum("o_totalprice")``) or the oracle side
(``SUM(o_totalprice)`` without a DECIMAL/cents cast) — so the flake
class cannot reappear via a future query.
"""

from __future__ import annotations

import re
from pathlib import Path

QUERIES_DIR = Path(__file__).resolve().parent.parent / (
    "analytics_data_platform_spark/queries"
)

# columns whose values sit on the 2-dp currency grid
MONEY_COLS = r"(?:o_totalprice|l_extendedprice|p_retailprice|ps_supplycost)"

# Spark side: F.sum("col") / F.sum(F.col("col")) with no cast in between
# (a .cast(...) between F.col and the closing paren does not match)
SPARK_RAW_SUM = re.compile(
    rf'F\.sum\(\s*"{MONEY_COLS}"\s*\)'
    rf'|F\.sum\(\s*F\.col\(\s*"{MONEY_COLS}"\s*\)\s*\)'
)

# Oracle side: SUM(col) directly on the raw column (exact-path oracles
# write SUM(CAST(col AS DECIMAL...)) or SUM(CAST(ROUND(col*100) AS BIGINT)))
SQL_RAW_SUM = re.compile(rf"SUM\(\s*{MONEY_COLS}\s*\)", re.IGNORECASE)


def test_no_raw_double_money_sums():
    offenders: list[str] = []
    for path in sorted(QUERIES_DIR.glob("*.py")):
        text = path.read_text()
        for lineno, line in enumerate(text.splitlines(), 1):
            if SPARK_RAW_SUM.search(line):
                offenders.append(f"{path.name}:{lineno} spark: {line.strip()[:100]}")
            if SQL_RAW_SUM.search(line):
                offenders.append(f"{path.name}:{lineno} oracle: {line.strip()[:100]}")
    assert not offenders, (
        "raw double SUM over currency columns (route through queries/exact.py "
        "or integer cents — see SCALE.md decision record):\n" + "\n".join(offenders)
    )


# Dialect trap (the r04 pq_adc_topk bug class): DuckDB CAST(x AS INT)
# ROUNDS half-away-from-zero while Spark's .cast("int") TRUNCATES — so a
# division inside a CAST(... AS INT/INTEGER/BIGINT) in oracle SQL silently
# desynchronizes the engines. Oracle SQL must use `//` (integer division)
# or FLOOR() before the cast.
SQL_CAST_DIV = re.compile(
    r"CAST\s*\((?![^()]*//)[^()]*(?<!/)/(?!/)[^()]*AS\s+(?:INT|INTEGER|BIGINT)\b",
    re.IGNORECASE,
)


def test_no_rounding_cast_over_division_in_oracle_sql():
    offenders: list[str] = []
    for path in sorted(QUERIES_DIR.glob("*.py")):
        for lineno, line in enumerate(path.read_text().splitlines(), 1):
            m = SQL_CAST_DIV.search(line)
            if m and "FLOOR" not in line.upper():
                offenders.append(f"{path.name}:{lineno}: {line.strip()[:100]}")
    assert not offenders, (
        "CAST(... x / y ... AS INT*) in oracle SQL: DuckDB rounds, Spark "
        "truncates — use `//` or FLOOR() (the pq_adc_topk r04 bug class):\n"
        + "\n".join(offenders)
    )


def test_exact_helpers_exist():
    # the contract the lint points to must keep existing
    from analytics_data_platform_spark.queries import exact

    for name in ("money", "sum_money", "avg_money", "sum_disc_price"):
        assert callable(getattr(exact, name))
