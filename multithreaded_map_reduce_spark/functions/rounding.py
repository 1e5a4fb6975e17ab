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


def ratio_units(num: str, den: str, mult: int = 1_000_000) -> Column:
    """``round(mult * num/den)`` half-up as BIGINT — pure integer
    rational arithmetic, zero doubles (see :func:`ratio_micros` for the
    full rationale). ``mult`` generalizes the output scale: 1 yields
    the rounded quotient of two unit-integers (e.g. mean of micro-unit
    sums stays in micros). Non-negative domain; NULL on den=0."""
    n = f"CAST(({num}) AS BIGINT)"
    d = f"CAST(({den}) AS BIGINT)"
    return F.expr(f"(2 * {mult} * {n} + {d}) div (2 * {d})")


def sql_ratio_units(num: str, den: str, mult: int = 1_000_000) -> str:
    n = f"CAST(({num}) AS BIGINT)"
    d = f"CAST(({den}) AS BIGINT)"
    return f"(CASE WHEN {d} = 0 THEN NULL ELSE (2 * {mult} * {n} + {d}) // (2 * {d}) END)"


def ratio_units_dec(num: str, den: str, mult: int = 1_000_000) -> Column:
    """``round(mult * num/den)`` half-up as BIGINT with the rational
    evaluated in DECIMAL(38,0) — the wide-intermediate twin of
    :func:`ratio_units` for second-moment rationals (ADVICE r7:
    ``n·Σg² − (Σg)²`` times the 2·mult factor exceeds int64 well inside
    plausible data domains; Spark non-ANSI then WRAPS silently while
    DuckDB raises — a cross-engine divergence, not just a wrong
    number). DECIMAL(38,0) holds ±10^38 ≈ 2^126: a moment product of
    two 2^60 sums times 2·10^6 still fits. Spark ``div`` on decimals
    returns the integral BIGINT quotient, so only the FINAL quotient
    must fit int64 — true by construction when mult·num/den is a
    bounded ratio (CV²·mult ≤ mult·n_gaps, AUC·mult ≤ mult).
    Non-negative domain; NULL on den=0 (Spark div-by-zero is NULL)."""
    n = f"CAST(({num}) AS DECIMAL(38,0))"
    d = f"CAST(({den}) AS DECIMAL(38,0))"
    return F.expr(
        f"(CAST(2 * {mult} AS DECIMAL(38,0)) * {n} + {d}) div (2 * {d})"
    )


def ratio_units_dec_signed(
    num: str, den: str, mult: int = 1_000_000, off: int = 1_000
) -> Column:
    """Signed twin of :func:`ratio_units_dec` — half-up-toward-+∞
    rounding of ``mult·num/den`` where ``num`` may be NEGATIVE
    (``den`` must be > 0; NULL on den=0). The non-signed helpers are
    positive-domain only because Spark ``div`` truncates toward zero
    while DuckDB ``//`` floors — divergent on negatives. The classic
    OFFSET shift fixes it: evaluate on ``num + off·den`` (positive by
    construction when |mult·num/den| < off·mult, i.e. the result
    magnitude in output units is < off·mult), floor there where both
    engines agree, subtract ``off·mult`` back — the shift term is an
    exact multiple of the divisor so it passes through the floor
    untouched. Keep ``off`` as small as the bound allows: the shifted
    numerator must still fit DECIMAL(38,0)."""
    shifted = ratio_units_dec(f"(({num}) + {off} * ({den}))", den, mult)
    return (shifted - F.lit(off * mult)).cast("long")


def sql_ratio_units_dec_signed(
    num: str, den: str, mult: int = 1_000_000, off: int = 1_000
) -> str:
    """DuckDB twin of :func:`ratio_units_dec_signed` (HUGEINT)."""
    shifted = sql_ratio_units_dec(f"(({num}) + {off} * ({den}))", den, mult)
    return f"CAST(({shifted}) - {off * mult} AS BIGINT)"


def sql_ratio_units_dec(num: str, den: str, mult: int = 1_000_000) -> str:
    """DuckDB twin of :func:`ratio_units_dec` — evaluates in HUGEINT
    (int128, same ±2^127 headroom class) and CASTs the bounded final
    quotient back to BIGINT so the oracle output type stays vetted
    (tests/test_oracle_types.py)."""
    n = f"CAST(({num}) AS HUGEINT)"
    d = f"CAST(({den}) AS HUGEINT)"
    return (
        f"(CASE WHEN {d} = 0 THEN NULL ELSE "
        f"CAST((2 * {mult} * {n} + {d}) // (2 * {d}) AS BIGINT) END)"
    )


def pround_dec(col: Column, n: int = 2) -> Column:
    """Exact half-up rounding of a DECIMAL column to ``n`` digits,
    emitted as DOUBLE.

    The ``pround`` double formula is boundary-fragile when its input is
    a decimal-exact quantity whose true value ties at digit ``n+1``
    (sum of scale-4 money rounded to cents: x.xx50 is a REAL tie, and
    the double image of x.xx50 sits within an ulp of the snap boundary
    — the round-7 jitter audit flagged every such query). Here the
    multiply-add-floor runs in EXACT decimal arithmetic, so ties
    resolve exactly; the single final division is one correctly-rounded
    IEEE op — deterministic on any FMA/libm build (fused contraction
    can only alter multi-op chains, never a lone division).

    Domain contract: |x·10^n| < 2^53 (the snapped integer must be
    exactly representable as a double — hypothesis-pinned in
    tests/test_properties.py). Money sums stay far inside: 2^53 cents
    ≈ $90 trillion."""
    scale = 10**n
    half = F.expr("CAST(0.5 AS DECIMAL(2,1))")
    return (F.floor(col * F.lit(scale) + half).cast("double") / F.lit(float(scale))).cast(
        "double"
    )


def sql_pround_dec(expr: str, n: int = 2) -> str:
    """DuckDB twin of :func:`pround_dec` — exact decimal snap, one
    final double division."""
    scale = 10**n
    return (
        f"(CAST(floor(({expr}) * {scale} + CAST(0.5 AS DECIMAL(2,1))) AS DOUBLE)"
        f" / CAST({scale} AS DOUBLE))"
    )


def ratio_micros(num: str, den: str) -> Column:
    """Exact integer ratio in 10^-6 units, half-up — ZERO doubles.

    ``round(1e6 * num/den)`` computed as pure BIGINT rational
    arithmetic: ``(2*1e6*num + den) div (2*den)``. Bit-identical in any
    IEEE/FMA/libm environment because no float ever exists —
    ``pround(num/den, 6)`` snaps a double that can land within an ulp
    of the rounding boundary on a different libm/FMA build; this
    formula cannot. Historical record (VERDICT r7): the r5-r7 driver
    reds that motivated the FP-free sweep turned out to be a DIFFERENT
    defect — DuckDB ``sum()`` over integers widening the ORACLE's
    output column to HUGEINT, which the driver's hasher canonicalizes
    unlike the local ``fetchall()`` path (fixed by CAST AS BIGINT at
    the output; linted by tests/test_oracle_types.py). The FP
    hypothesis was disproven for those rows, but the jitter audit it
    spawned (tests/boundary_audit.py) independently found and fixed 7
    genuinely boundary-fragile queries — both rails stay.
    Spark's ``div`` is INTEGRAL division
    (long in, long out) — ``/`` on longs would promote to DOUBLE and
    lose exactness past 2^53, so it must not appear here.

    ``num``/``den`` are Spark-SQL expression strings (typically column
    names available at the call site — the only way to reach the
    ``div`` operator without a double detour). Contract: non-negative
    BIGINTs with ``num <= 4.6e12`` (2_000_000*num must fit int64 —
    true for per-GROUP counts/sums even at 100 TB). ``den > 0``
    upstream, else NULL propagates (``div`` by 0 is NULL in Spark;
    callers coalesce — the DuckDB twin guards with CASE for the same
    NULL).
    """
    return F.expr(
        f"(2000000 * CAST(({num}) AS BIGINT) + CAST(({den}) AS BIGINT))"
        f" div (2 * CAST(({den}) AS BIGINT))"
    )


def sql_ratio_micros(num: str, den: str) -> str:
    """DuckDB twin of :func:`ratio_micros` — BIGINT-only half-up ratio.

    DuckDB ``//`` on BIGINT operands is integer division; on the
    non-negative domain this is contracted to it matches Spark ``div``
    exactly. ``CASE`` mirrors Spark's NULL-on-zero-denominator (DuckDB
    ``//`` raises on /0 instead)."""
    n = f"CAST(({num}) AS BIGINT)"
    d = f"CAST(({den}) AS BIGINT)"
    return f"(CASE WHEN {d} = 0 THEN NULL ELSE (2000000 * {n} + {d}) // (2 * {d}) END)"


def iunits_grid(col: Column, n: int = 6, guard: int = 1) -> Column:
    """Float input → exact integer units of 10^-n for inputs whose TRUE
    decimal granularity is finer than 10^-n but no finer than
    10^-(n+guard) — the round-9 fix for the REAL-tie class the jitter
    audit caught on the embeddings fixture (values like -0.0170775 tie
    exactly at the micro half-grid, so ``iunits`` floor(x·1e6 + 0.5)
    sits within float32-noise of its boundary). Two stages: the
    FLOAT-domain snap runs at the guard scale, where grid data lands
    ~0.5 away from any floor boundary (robust under FMA/libm ulp), and
    the 10^guard→1 reduction is PURE-INTEGER half-up via an offset
    truncating division (offset makes the operand positive, where
    Spark ``div`` and DuckDB ``//`` agree; floor==truncate there).
    Domain: |value·10^(n+guard)| < 10^9 (embeddings are unit-scale)."""
    g = 10**guard
    off = 10_000_000_000
    v7 = F.floor(col * F.lit(float(10 ** (n + guard))) + F.lit(0.5)).cast("long")
    # offset-shifted reduction: the operand is a positive exact integer
    # < 1.1e11 (< 2^53, exactly representable), the /g quotient is
    # correctly rounded and its floor boundaries fall only on exact
    # multiples — deterministic on any IEEE build
    return (
        F.floor((v7 + F.lit(g // 2) + F.lit(off * g)) / F.lit(float(g))).cast(
            "long"
        )
        - F.lit(off)
    )


def sql_iunits_grid(expr: str, n: int = 6, guard: int = 1) -> str:
    g = 10**guard
    off = 10_000_000_000
    v7 = f"CAST(floor(({expr}) * {float(10 ** (n + guard))} + 0.5) AS BIGINT)"
    return (
        f"(CAST(floor((({v7}) + {g // 2} + {off * g}) / {float(g)}) AS BIGINT)"
        f" - {off})"
    )
