"""Exact money arithmetic — sums that don't depend on addition order.

Double-typed money columns are exact cents underneath; summing them as
doubles makes the result depend on partition/frame evaluation order
(Spark sums sequentially per partition, DuckDB's window aggregation uses
a segment tree — low-order bits differ, and with cent-precise data the
true sums sit exactly on rounding ties). Casting to DECIMAL(18,2) first
makes every sum exact and associative: identical in any engine, at any
partition count — which is also the right call at 100 TB, where fp drift
grows with row count. Final results are cast back to double (exact →
deterministic) and displayed via the portable ``pround``.

int64-range note: DECIMAL(38,x) sums hold ~1e(38-x) — ample headroom for
100 TB fact tables (a 1e14-row sum of 1e5-scale values is 1e19 « 1e32).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def money(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount), exact (scale 4)."""
    return money("l_extendedprice") * (F.lit(1.0).cast(DEC) - money("l_discount"))


def charge() -> Column:
    """revenue * (1 + l_tax), exact (scale 6)."""
    return revenue() * (F.lit(1.0).cast(DEC) + money("l_tax"))


def sql_money(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


SQL_REVENUE = f"({sql_money('l_extendedprice')} * (CAST(1.0 AS DECIMAL(18,2)) - {sql_money('l_discount')}))"
SQL_CHARGE = f"({SQL_REVENUE} * (CAST(1.0 AS DECIMAL(18,2)) + {sql_money('l_tax')}))"


def dsum(col: Column) -> Column:
    """Exact decimal sum, surfaced as double."""
    return F.sum(col).cast("double")


def davg(col: Column) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    return F.sum(col).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    return f"CAST(sum({expr}) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(sum({expr}) AS DOUBLE) / count({expr}))"
