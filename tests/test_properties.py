"""Cross-engine property tests: the portable primitives (tokenizer,
polynomial hash, rounding) must agree between Spark and DuckDB on
randomized inputs, not just the fixture corpus. Hypothesis generates
the corpus once per test; both engines evaluate in one batch."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multithreaded_map_reduce_spark.functions.hashing import (  # noqa: E402
    POLY_BASE,
    POLY_MOD,
    sql_poly_hash,
    sql_tokens,
)

# printable ASCII without backslash/quote headaches for SQL literals
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters="'\\"),
    min_size=0,
    max_size=80,
)


def _python_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * POLY_BASE + ord(ch)) % POLY_MOD
    return h


@settings(max_examples=30, deadline=None)
@given(_ascii_text.filter(lambda s: s != ""))
def test_poly_hash_duckdb_matches_python(s):
    con = duckdb.connect()
    got = con.execute("SELECT " + sql_poly_hash(f"'{s}'")).fetchone()[0]
    con.close()
    assert got == _python_poly_hash(s)


@settings(max_examples=30, deadline=None)
@given(_ascii_text)
def test_tokenizer_duckdb_matches_python(s):
    con = duckdb.connect()
    got = con.execute("SELECT " + sql_tokens(f"'{s}'")).fetchone()[0]
    con.close()
    assert got == s.split()


def test_poly_hash_spark_matches_python_batch(spark):
    """One Spark job over a deterministic sample of tricky strings."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.functions.hashing import poly_hash

    samples = [
        "a",
        "abc",
        "hello world",
        " " * 5 + "x",
        "Zz!~" * 20,
        "punct,.;:!?",
        "0123456789" * 8,
        "The quick brown fox",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", poly_hash(F.col("s")).alias("h")).collect()}
    for s in samples:
        assert got[s] == _python_poly_hash(s), s


def test_pround_parity_random_doubles(spark):
    """Portable rounding agrees across engines on adversarial doubles
    (values engineered near .xx5 ties included)."""
    import random

    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.functions.rounding import pround, sql_pround

    rng = random.Random(7)
    vals = [round(rng.uniform(0, 1e6), 3) for _ in range(500)]
    vals += [x + 0.005 for x in range(100)]  # tie-adjacent
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r["p"] for r in df.select(pround(F.col("v"), 2).alias("p")).orderBy("v").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = [r[0] for r in con.execute(f"SELECT {sql_pround('v', 2)} FROM t ORDER BY v").fetchall()]
    con.close()
    assert got == want


def test_canon_distinguishes_decimal_from_float():
    """The local gate must be as strict as the driver's exact value hash:
    a Spark DECIMAL result vs a DuckDB DOUBLE oracle is a type bug even
    when numerically equal (VERDICT r2: q6_forecast_revenue shipped red
    because the old _canon coerced Decimal->float and rounded to 9
    digits)."""
    import decimal

    from tests.oracle import _canon

    assert _canon(decimal.Decimal("5615626.680000")) != _canon(5615626.68)
    # equal decimals at different scales still match each other
    assert _canon(decimal.Decimal("123.4500")) == _canon(decimal.Decimal("123.45"))
    assert _canon(decimal.Decimal("120")) == _canon(decimal.Decimal("120.000"))
    # floats canonicalize by exact repr -- no rounding window
    assert _canon(0.1 + 0.2) != _canon(0.3)
    assert _canon(5615626.68) == "5615626.68"


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=400),
)
def test_chunk_count_formula_covers_all_tokens(n):
    """The chunk-count closed form 1 + ceil((n-C)/S) (n > C) covers
    token indices [0, n) exactly with stride-S starts."""
    from multithreaded_map_reduce_spark.queries.curation import (
        CHUNK_STRIDE as S,
        CHUNK_TOKENS as C,
    )

    k = 1 if n <= C else (n - C + S - 1) // S + 1
    covered = set()
    for i in range(k):
        covered.update(range(i * S, min(i * S + C, n)))
    assert covered == set(range(n))
    # no chunk is empty
    assert (k - 1) * S < n


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_pareto_two_pass_equals_dominance_def(points):
    """The running-max frontier rewrite (after per-x max pre-agg)
    equals the NOT-EXISTS dominance definition on arbitrary points."""
    best: dict[int, int] = {}
    for x, y in points:
        best[x] = max(best.get(x, -1), y)
    pts = sorted(best.items())
    # two-pass: running max over strictly-smaller x
    frontier = []
    runmax = -1
    for x, y in pts:
        if y > runmax:
            frontier.append((x, y))
        runmax = max(runmax, y)
    brute = {
        (x, y)
        for (x, y) in pts
        if not any((a < x and b >= y) or (a <= x and b > y) for (a, b) in pts)
    }
    assert set(frontier) == brute


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2000), min_size=2, max_size=60),
    st.integers(min_value=1, max_value=60),
)
def test_bucketized_overlap_candidates_are_lossless(days, w):
    """Bucket width == overlap horizon: any pair with |Δ| ≤ w differs
    by ≤ 1 bucket, and the ±1 explode contains each candidate bucket
    exactly once (the interval_overlap_orders join contract)."""
    for i, a in enumerate(days):
        for b in days[i + 1:]:
            if abs(a - b) <= w:
                assert abs(a // w - b // w) <= 1
            # exactly-once: the three exploded buckets are distinct
            assert len({b // w - 1, b // w, b // w + 1}) == 3


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_lossless_python_model(docs):
    """Pure-Python model of the PPJoin candidate rules (df-ascending
    prefix, length filter, positional filter) vs brute-force J ≥ 4/5
    pairs: the filter chain must never drop a qualifying pair."""
    sets = []
    for d in docs:
        toks = list(dict.fromkeys("".join(p) for p in zip(d, d[1:]))) or ["".join(d)]
        sets.append(set(toks))
    from collections import Counter

    df = Counter()
    for s in sets:
        df.update(s)
    order = {t: (df[t], t) for s in sets for t in s}
    brute = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter * 9 >= 4 * (len(sets[i]) + len(sets[j])):
                brute.add((i, j))
    cand = set()
    ordered = [sorted(s, key=order.get) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = ordered[i], ordered[j]
            pa = len(a) - (4 * len(a) + 4) // 5 + 1
            pb = len(b) - (4 * len(b) + 4) // 5 + 1
            if 5 * len(a) < 4 * len(b) or 5 * len(b) < 4 * len(a):
                continue
            common = set(a[:pa]) & set(b[:pb])
            if not common:
                continue
            fa = min(a.index(t) for t in common) + 1
            fb = min(b.index(t) for t in common) + 1
            ub = 1 + min(len(a) - fa, len(b) - fb)
            if 9 * ub >= 4 * (len(a) + len(b)):
                cand.add((i, j))
    assert brute <= cand  # lossless: every true pair survives


# ---------------------------------------------------------------------------
# Round-7 rational-rounding helpers: DuckDB evaluation must equal the
# Fraction-exact half-up reference on random inputs (the Spark side is
# pinned against DuckDB in test_new_ops_r11; this closes the
# helper-vs-mathematics leg without a SparkSession per example).


@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(min_value=0, max_value=4_000_000_000_000),
    den=st.integers(min_value=1, max_value=1_000_000_000),
    mult=st.sampled_from([1, 1000, 10_000, 1_000_000]),
)
def test_sql_ratio_units_is_exact_half_up(num, den, mult):
    from fractions import Fraction

    from multithreaded_map_reduce_spark.functions.rounding import sql_ratio_units

    got = duckdb.sql(f"SELECT {sql_ratio_units(str(num), str(den), mult)}").fetchone()[0]
    x = Fraction(mult * num, den)
    want = (x + Fraction(1, 2)).__floor__()  # half-up
    assert got == want, (num, den, mult)


@settings(max_examples=200, deadline=None)
@given(
    # pround_dec's documented domain: the SNAPPED integer |x·10^n| must
    # fit in 2^53 (hypothesis originally found units=-1.48e16, n=6 —
    # beyond double-exact cents, outside any money sum the queries
    # produce; the docstring now carries the contract)
    units=st.integers(min_value=-(8 * 10**15), max_value=8 * 10**15),
    n=st.sampled_from([0, 1, 2, 4, 6]),
)
def test_sql_pround_dec_matches_decimal_half_up(units, n):
    """pround_dec on a DECIMAL(38,6) value == exact half-up (toward
    +inf) rounding of the true rational, for any sign, within the
    documented |x·10^n| < 2^53 domain."""
    from decimal import Decimal
    from fractions import Fraction

    from multithreaded_map_reduce_spark.functions.rounding import sql_pround_dec

    d = Decimal(units).scaleb(-6)  # exact 6-decimal value
    got = duckdb.sql(
        f"SELECT {sql_pround_dec(f'CAST({d} AS DECIMAL(38,6))', n)}"
    ).fetchone()[0]
    x = Fraction(units, 10**6)
    scale = 10**n
    want = float((x * scale + Fraction(1, 2)).__floor__()) / scale
    assert got == want, (units, n)
