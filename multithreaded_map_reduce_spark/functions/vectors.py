"""Vector math over ARRAY<FLOAT/DOUBLE> columns — codegen'd Column
expressions with exact DuckDB SQL twins.

Both sides fold left-to-right over ascending indices, so IEEE double
arithmetic produces bit-identical results — which is what lets even
similarity queries have exact differential oracles (after ``pround``).

Scale note: these are per-row O(dim) expressions inside whole-stage
codegen; for 1e9-row × 1e3-dim workloads the same expressions apply —
the scaling lever is candidate pruning (LSH/IVF in
``operators/similarity.py``), not the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """dot / sqrt(|a|²·|b|²) — single-sqrt form, mirrored in SQL."""
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def sql_as_double(expr: str) -> str:
    return f"CAST({expr} AS DOUBLE[])"


def sql_dot(a: str, b: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        "(x, y) -> x + y)"
    )


def sql_norm_sq(a: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform({a}, x -> x * x)), (x, y) -> x + y)"
    )


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / sqrt({sql_norm_sq(a)} * {sql_norm_sq(b)}))"
