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


# ---------------------------------------------------------- int8 quantization
# Symmetric per-vector int8 quantization: scale = max|v|/127, q = round
# (portable floor form) and clamp to [-127, 127]. The quantized dot
# product is exact BIGINT math, so the whole quantized-retrieval path
# is differentially testable; only the final rescale touches doubles.


def int8_scale(v: Column) -> Column:
    return F.array_max(F.transform(v, F.abs)) / F.lit(127.0)


def quantize_int8(v: Column, scale: Column) -> Column:
    return F.transform(
        v,
        lambda x: F.when(scale == F.lit(0.0), F.lit(0).cast("long")).otherwise(
            F.greatest(
                F.lit(-127).cast("long"),
                F.least(F.lit(127).cast("long"), F.floor(x / scale + F.lit(0.5)).cast("long")),
            )
        ),
    )


def idot(a: Column, b: Column) -> Column:
    """Exact BIGINT dot product of two integer arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sql_int8_scale(v: str) -> str:
    return f"(list_max(list_transform({v}, x -> abs(x))) / 127.0)"


def sql_quantize_int8(v: str, scale: str) -> str:
    return (
        f"list_transform({v}, x -> CASE WHEN {scale} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), "
        f"CAST(floor(x / {scale} + 0.5) AS BIGINT))) END)"
    )


def sql_idot(a: str, b: str) -> str:
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])), "
        "(x, y) -> x + y)"
    )

# NOTE on unrolling: a dim-term ``element_at`` sum (no lambdas) was
# benchmarked as a replacement for the ``dot`` fold on the k-NN pair
# hot path and measured ~4× SLOWER on Spark 4 at dim 64 — the giant
# nested Add tree falls out of efficient codegen, while the HOF fold
# evaluates tight. Keep the folds; optimize by hoisting per-VECTOR
# work (norms) out of per-PAIR expressions instead.
