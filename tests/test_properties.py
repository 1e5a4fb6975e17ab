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
