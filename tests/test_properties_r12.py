"""Round-8 property tests: the DECIMAL(38,0)/HUGEINT wide-rational
rails and the EG mixture algebra — Python models (no Spark session)
plus one batched Spark/DuckDB cross-check over the hypothesis corpus.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# the ratio_units_dec domain: non-negative num, positive den, both
# potentially FAR past int64 after the internal 2·mult multiply
_WIDE = st.integers(min_value=0, max_value=10**30)
_WIDE_POS = st.integers(min_value=1, max_value=10**30)
_MULT = st.sampled_from([1, 1000, 1_000_000, 10**9])


def _halfup(num: int, den: int, mult: int) -> int:
    return (2 * mult * num + den) // (2 * den)


@given(_WIDE, _WIDE_POS, _MULT)
@settings(max_examples=500, deadline=None)
def test_halfup_rational_model(num, den, mult):
    """The (2·m·n + d) // (2·d) formula IS round-half-up of m·n/d on
    the non-negative domain — guard against sign/offset edits."""
    from fractions import Fraction

    q = Fraction(mult * num, den)
    floor_q = q.numerator // q.denominator
    frac = q - floor_q
    expected = floor_q + (1 if frac * 2 >= 1 else 0)
    assert _halfup(num, den, mult) == expected


def test_ratio_units_dec_spark_duckdb_batch(spark):
    """One batched cross-engine run over a corpus of wide rationals:
    Spark's DECIMAL(38,0) `div` formula and DuckDB's HUGEINT `//`
    twin must both equal the Python big-int model, including values
    where the old BIGINT rail wrapped (> 2^63 intermediates)."""
    import duckdb

    from multithreaded_map_reduce_spark.functions.rounding import (
        ratio_units_dec,
        sql_ratio_units_dec,
    )

    # Contract (rounding.py): intermediates may exceed int64 — that is
    # the rail's whole point — but the FINAL quotient mult·num/den must
    # fit BIGINT (Spark `div` emits long; DuckDB side CASTs back).
    cases = [
        (0, 1, 1),
        (1, 1, 10**9),
        (2**62, 10**6, 1000),  # 2000·num ≈ 9.2e21 >> 2^63; quotient ~4.6e15
        (10**27, 10**15, 1_000_000),  # quotient exactly 1e18, intermediates 1e33
        (123456789012345678901234567, 987654321098765432109, 1000),
        (5, 2, 1),  # exact tie: 2.5 -> 3 half-up
        (7, 2, 1),  # 3.5 -> 4
        (10**30, 10**30, 1_000_000),
    ]
    for n, d, m in cases:
        assert _halfup(n, d, m) < 2**63  # stay inside the documented contract
    df = spark.createDataFrame(
        [(str(n), str(d), m) for n, d, m in cases],
        "n string, d string, m int",
    )
    outs = []
    for i, (n, d, m) in enumerate(cases):
        outs.append(
            ratio_units_dec(
                f"CAST('{n}' AS DECIMAL(38,0))",
                f"CAST('{d}' AS DECIMAL(38,0))",
                m,
            ).alias(f"r{i}")
        )
    row = spark.range(1).select(*outs).collect()[0]
    con = duckdb.connect()
    for i, (n, d, m) in enumerate(cases):
        expected = _halfup(n, d, m)
        assert row[f"r{i}"] == expected, (i, n, d, m)
        duck = con.sql(
            "SELECT "
            + sql_ratio_units_dec(
                f"CAST('{n}' AS HUGEINT)", f"CAST('{d}' AS HUGEINT)", m
            )
        ).fetchone()[0]
        assert duck == expected, (i, n, d, m)
    con.close()


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1_000_000),  # loss_micros
            st.integers(min_value=1, max_value=10**6),  # n_docs
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_doremi_eg_model(domains):
    """Python model of the curation_doremi_weights update: weights stay
    a (rounded) distribution every iterate, and when one domain's loss
    strictly dominates, its weight is non-decreasing across iterates."""
    import math

    losses = [l for l, _ in domains]
    k = len(domains)
    w = [(2 * 10**9 * 1 + k) // (2 * k) for _ in domains]
    hist = [list(w)]
    for _ in range(5):
        tw = sum(w)
        wl = sum(wi * li for wi, li in zip(w, losses))
        mix = (2 * 1 * wl + tw) // (2 * tw)
        raw = [
            math.floor((wi / 1e9) * math.exp((li - mix) / 1e6) * 1e9 + 0.5)
            for wi, li in zip(w, losses)
        ]
        tot = sum(raw)
        if tot == 0:
            break
        w = [(2 * 10**9 * r + tot) // (2 * tot) for r in raw]
        hist.append(list(w))
    assert abs(sum(w) - 10**9) <= k  # rounding slack only
    mx = max(losses)
    if losses.count(mx) == 1 and mx > min(losses):
        j = losses.index(mx)
        ws = [h[j] for h in hist]
        assert all(b >= a - k for a, b in zip(ws, ws[1:]))  # non-decreasing
