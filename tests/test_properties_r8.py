"""Property tests for the round-4-continuation primitives: the A-ES
sampling key and Benford digit extraction must agree with a pure-Python
reference on randomized inputs (DuckDB side, cheap per-example), and
the Spark-side structural ops must be invariant to incidental choices
(input partitioning, salt) on GENERATED data, not just fixtures."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multithreaded_map_reduce_spark.functions.hashing import (  # noqa: E402
    POLY_MOD,
    sql_token_hash,
)


def _py_token_hash(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16) % POLY_MOD


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=1, max_value=10**4))
def test_aes_key_duckdb_matches_python(doc_id, n_chars):
    """The -ln(u)/w ranking key evaluates identically in DuckDB and
    Python's libm on the same portable-hash u."""
    h = _py_token_hash(str(doc_id))
    expected = -math.log((h + 1) / float(POLY_MOD)) / n_chars
    th = sql_token_hash(f"CAST({doc_id} AS VARCHAR)")
    key = (
        f"(-ln(CAST(({th}) + 1 AS DOUBLE)"
        f" / {float(POLY_MOD)}) / CAST({n_chars} AS DOUBLE))"
    )
    con = duckdb.connect()
    got = con.execute(f"SELECT {key}").fetchone()[0]
    con.close()
    assert got == expected


@settings(max_examples=50, deadline=None)
@given(st.decimals(min_value="0.01", max_value="99999999.99", places=2))
def test_benford_digit_extraction_matches_python(price):
    """First significant digit via exact-cents string — no log10."""
    cents = int(round(float(price) * 100))
    expected = int(str(cents)[0])
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST(substring(CAST(CAST(floor(CAST(? AS DOUBLE) * 100 + 0.5)"
        " AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)",
        [float(price)],
    ).fetchone()[0]
    con.close()
    assert got == expected


def test_simhash_fingerprints_partitioning_invariant(spark):
    """fan_out (and any other repartitioning) must never change
    fingerprint VALUES — aggregation order independence on generated
    docs, 1 partition vs 16."""
    from multithreaded_map_reduce_spark.operators.dedup import simhash_fingerprints

    rows = [(i, f"tok{i % 7} tok{(i * 3) % 11} shared word {i % 2}") for i in range(200)]
    one = spark.createDataFrame(rows, "id long, text string").coalesce(1)
    many = spark.createDataFrame(rows, "id long, text string").repartition(16)
    a = {(r["id"], r["simhash"]) for r in simhash_fingerprints(one, "id", "text").collect()}
    b = {(r["id"], r["simhash"]) for r in simhash_fingerprints(many, "id", "text").collect()}
    assert a == b


def test_connected_components_matches_union_find(spark):
    """Distributed label propagation vs a pure-Python union-find on a
    deterministic pseudo-random edge set (chains, cliques, singletons)."""
    from multithreaded_map_reduce_spark.operators.graph import connected_components

    edges = []
    # chain 0-1-2-...-9, clique 100..104, stars around 200 and 300
    edges += [(i, i + 1) for i in range(9)]
    edges += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(200, 200 + i) for i in range(1, 6)]
    edges += [(300 + i, 300) for i in range(1, 4)]
    # pseudo-random extra edges, deterministic
    edges += [((i * 37) % 50 + 400, (i * 91) % 50 + 400) for i in range(30) if (i * 37) % 50 != (i * 91) % 50]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["root"] for r in connected_components(df).collect()}
    assert got == expected
