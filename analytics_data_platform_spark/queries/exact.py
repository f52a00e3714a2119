"""Order-independent currency aggregation helpers.

Double-precision SUM depends on summation order, which in Spark depends on
partition layout, shuffle block arrival order, and AQE decisions — none of
which are stable across environments. When the true sum lies ON the rounding
grid (2-dp currency values, 4-dp discount products), a ±1-ulp drift flips
``round()`` differently in Spark (shortest-repr HALF_UP via BigDecimal) and
DuckDB (multiply/nearbyint), so a value-hash comparison can flake even though
both engines are "correct".

The fix is to do the arithmetic in DECIMAL: casting a 2-dp currency double to
DECIMAL(18,2) recovers the exact grid value (both engines use shortest-repr
conversion — verified tie-behavior parity), decimal sums are exact and
associative, and the final cast back to DOUBLE is deterministic. Oracles
mirror the same casts textually, e.g.::

    CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)
    CAST(ROUND(SUM(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))), 2) AS DOUBLE)

Used by the TPC-H family and the event/revenue analytics queries whose
aggregates are on-grid. Aggregates whose true value is irrational (averages
over large groups, chi-square stats, tf-idf scores) are left on the double
path: their rounding boundaries are measure-zero and drift cannot flip them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

_DEC2 = "decimal(18,2)"


def money(col: str | Column) -> Column:
    """Exact DECIMAL(18,2) view of a 2-dp currency double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_DEC2)


def sum_money(col: str | Column) -> Column:
    """Exact order-independent SUM of a 2-dp currency column, as DOUBLE."""
    return F.sum(money(col)).cast("double")


def avg_money(col: str | Column, scale: int = 4) -> Column:
    """AVG built from the exact decimal sum (order-independent numerator).

    The division happens in DOUBLE — both engines divide the same two exact
    values, so the quotient is bit-identical; its true value is non-grid, so
    rounding cannot tie-flip.
    """
    return F.round(F.sum(money(col)).cast("double") / F.count(F.lit(1)), scale)


def sum_disc_price(price: str | Column = "l_extendedprice",
                   disc: str | Column = "l_discount") -> Column:
    """Exact SUM(price * (1 - disc)) — DECIMAL scale-4 product — rounded to 2dp."""
    return F.round(F.sum(money(price) * (F.lit(1) - money(disc))), 2).cast("double")


def sum_promo_price(price: str | Column = "l_extendedprice",
                    disc: str | Column = "l_discount") -> Column:
    """Exact SUM(price * disc) rounded to 2dp, as DOUBLE."""
    return F.round(F.sum(money(price) * money(disc)), 2).cast("double")


# Textual oracle fragments (DuckDB side of the same arithmetic).
def sql_sum_money(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_avg_money(col: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), {scale})"


def sql_sum_disc_price(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (f"CAST(ROUND(SUM(CAST({price} AS DECIMAL(18,2))"
            f" * (1 - CAST({disc} AS DECIMAL(18,2)))), 2) AS DOUBLE)")


def sql_sum_promo_price(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (f"CAST(ROUND(SUM(CAST({price} AS DECIMAL(18,2))"
            f" * CAST({disc} AS DECIMAL(18,2))), 2) AS DOUBLE)")
