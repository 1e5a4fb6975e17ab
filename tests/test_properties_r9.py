"""Property tests for round-5 algorithmic constructions (pure-Python
models — no Spark session, so hypothesis can afford many examples)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st


@st.composite
def _hash_doc_sets(draw):
    """Small corpus of docs-as-integer-hash-sets over a narrow universe
    (forces overlaps and shared 'rare' tokens)."""
    n_docs = draw(st.integers(min_value=2, max_value=8))
    return [
        frozenset(
            draw(
                st.sets(
                    st.integers(min_value=0, max_value=40), min_size=1, max_size=25
                )
            )
        )
        for _ in range(n_docs)
    ]


@given(_hash_doc_sets())
@settings(max_examples=300, deadline=None)
def test_containment_prefix_filter_lossless_python_model(docs):
    """Model of queries/dedup.dedup_containment's candidate rule: if
    |A∩B| ≥ ⌈0.9·|A|⌉ (A the smaller set), then A's (|A| − ⌈0.9·|A|⌉
    + 1) rarest tokens — ascending global (df, h) — MUST intersect B.
    Pure pigeonhole; this guards the prefix-length formula (the +1 and
    the ceil) against off-by-one edits."""
    import math

    df: dict[int, int] = {}
    for s in docs:
        for h in s:
            df[h] = df.get(h, 0) + 1

    def prefix(a: frozenset) -> list[int]:
        f = len(a) - math.ceil(0.9 * len(a))
        ordered = sorted(a, key=lambda h: (df[h], h))
        return ordered[: f + 1]

    for i, a in enumerate(docs):
        for j, b in enumerate(docs):
            if i == j:
                continue
            small, big = (a, b) if (len(a), i) < (len(b), j) else (b, a)
            if len(small & big) * 10 >= len(small) * 9:
                assert set(prefix(small)) & big, (small, big)


def test_holt_truncated_filter_equals_direct_recursion():
    """The integer filter weights (queries/timeseries._holt_int_weights)
    must reproduce the DIRECT zero-initialized Holt recursion exactly
    (Fraction arithmetic) on any input of length == HOLT_TAPS — i.e.
    the weights are the recursion, not an approximation of it."""
    import random

    from multithreaded_map_reduce_spark.queries.timeseries import (
        HOLT_TAPS,
        _holt_int_weights,
    )

    rng = random.Random(7)
    weights, den = _holt_int_weights()
    for _ in range(25):
        xs = [rng.randint(-1000, 1000) for _ in range(HOLT_TAPS)]
        # direct recursion, a = g = 1/2, zero init
        a = g = Fraction(1, 2)
        l = b = Fraction(0)
        for x in xs:  # oldest first
            l_new = a * x + (1 - a) * (l + b)
            b = g * (l_new - l) + (1 - g) * b
            l = l_new
        forecast = l + b
        # filter: weight j multiplies x_{t-j} (newest first)
        fold = sum(Fraction(w, den) * x for w, x in zip(weights, reversed(xs)))
        assert fold == forecast


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_ks_integer_gap_equals_float_definition(values):
    """The integer KS numerator max|ca·nb − cb·na| over distinct values
    equals na·nb·D for the float ECDF definition D = sup|Fa − Fb| —
    guarding the cross-multiplied form used in quality_ks_test."""
    a = values
    b = [v + 1 for v in values][: max(1, len(values) // 2)]
    na, nb = len(a), len(b)
    pts = sorted(set(a) | set(b))
    best_int = 0
    best_float = 0.0
    for v in pts:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best_int = max(best_int, abs(ca * nb - cb * na))
        best_float = max(best_float, abs(ca / na - cb / nb))
    assert best_int == round(best_float * na * nb)


def test_quality_psi_gate_and_selfzero(spark):
    """PSI matches its oracle; PSI of a distribution against itself is
    exactly 0 (smoothing cancels when ca==cb and na==nb)."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["quality_psi"], ALL_ORACLES["quality_psi"], SF_SMOKE
    ) > 0
    import multithreaded_map_reduce_spark.queries.quality as qm

    li = qm.load_table(spark, SF_SMOKE, "lineitem")
    # feed the SAME cohort as both flags: duplicate rows under R and N
    doubled = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.explode(F.array(F.lit("R"), F.lit("N"))).alias("l_returnflag"),
        "l_extendedprice",
    )
    orig = qm.load_table
    try:
        qm.load_table = lambda spark, sf_dir, name: doubled
        row = qm.quality_psi(spark, "unused").collect()[0]
    finally:
        qm.load_table = orig
    assert row["psi"] == 0.0 and row["na"] == row["nb"]
