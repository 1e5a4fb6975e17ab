"""Portable rounding — identical bit behavior in Spark and DuckDB.

Native ``round(double, n)`` differs across engines at ties (Spark
rounds the shortest decimal repr HALF_UP via BigDecimal; DuckDB rounds
the scaled binary value), so a value whose shortest repr ends in ``..5``
rounds differently. Every float this engine emits goes through
``pround`` instead: ``floor(x * 10^n + 0.5) / 10^n`` — one formula, one
answer in any engine.

(Half-up toward +inf for negatives, applied consistently on both sides.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column, n: int = 2) -> Column:
    scale = float(10**n)
    return (F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).cast("double")


def sql_pround(expr: str, n: int = 2) -> str:
    scale = float(10**n)
    return f"(floor(({expr}) * {scale} + 0.5) / {scale})"


def sql_pround_spark(expr: str, n: int = 2) -> str:
    """Spark-SQL dialect of :func:`sql_pround`.

    In Spark SQL a bare literal like ``100.0`` parses as DECIMAL(4,1),
    so ``floor(x)/100.0`` is *decimal* division and the query emits
    DECIMAL — which hash-mismatches a DuckDB oracle emitting DOUBLE
    even when the values are equal (VERDICT r2 items 1–2). The ``d``
    suffix forces DOUBLE literals so the whole expression stays DOUBLE.
    """
    scale = float(10**n)
    return f"(floor(({expr}) * {scale}d + 0.5d) / {scale}d)"


def iunits(col: Column, n: int = 6) -> Column:
    """Arbitrary double → exact integer units of 10^-n (portable floor
    formula). Summing these BIGINTs is exact and order-independent —
    the non-cents analog of the DECIMAL money path (double→decimal casts
    are NOT portable across engines; this formula is)."""
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def sql_iunits(expr: str, n: int = 6) -> str:
    scale = float(10**n)
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def from_iunits(col: Column, n: int = 6) -> Column:
    return (col / F.lit(float(10**n))).cast("double")


def sql_from_iunits(expr: str, n: int = 6) -> str:
    return f"(CAST({expr} AS DOUBLE) / {float(10 ** n)})"
