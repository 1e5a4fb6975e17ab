"""Portable Bloom-filter semi-join pruning.

The scale story this operator demonstrates: a semi join against a big
dim normally shuffles the fact table on the key. A Bloom filter built
from the dim's keys is a few KB, broadcasts to every executor, and
prunes most non-matching fact rows AT THE SCAN (map-side, codegen'd
bit tests — the same idea as Spark's own runtime row-level filtering,
but deterministic and cross-engine replayable here). The exact
semi-join then runs over the surviving sliver only.

Everything is integer arithmetic from functions/hashing.py's universal
family h(x) = (a·x + b) mod P (P = 2^31−1), so the DuckDB oracle can
rebuild the identical filter bit-for-bit: word index, bit masks, and
the false-positive set are all part of the differential contract.

Layout: M_BITS bits as 32-bit words stored in BIGINTs (bit shifts stay
< 2^31 — no overflow semantics to reconcile between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import POLY_MOD

M_BITS = 4096
WORD_BITS = 32
N_WORDS = M_BITS // WORD_BITS
# fixed (a, b) pairs of the two probe hashes — mirrored in sql_probes()
PROBES = ((976369, 1982627), (1299721, 557113))


def _bit(key, a: int, b: int):
    return ((key % F.lit(POLY_MOD)) * F.lit(a) + F.lit(b)) % F.lit(POLY_MOD) % F.lit(
        M_BITS
    )


def build_bloom_words(dim: DataFrame, key_col: str) -> DataFrame:
    """(word_idx, word) rows — the Bloom bitset of the dim's key set."""
    key = F.col(key_col).cast("long")
    bits = dim.select(
        F.explode(F.array(*[_bit(key, a, b) for a, b in PROBES])).alias("bit")
    )
    return (
        bits.select(
            F.floor(F.col("bit") / F.lit(WORD_BITS)).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, CAST(bit % {WORD_BITS} AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_prune(fact: DataFrame, words: DataFrame, key_col: str) -> DataFrame:
    """Fact rows whose key passes every Bloom probe (contains all true
    matches plus deterministic false positives). ``words`` is joined
    broadcast — at most N_WORDS rows — so both probe tests are
    map-side; no shuffle of the fact table happens here."""
    key = F.col(key_col).cast("long")
    out = fact
    for i, (a, b) in enumerate(PROBES):
        bit = _bit(key, a, b)
        widx = F.floor(bit / F.lit(WORD_BITS)).cast("long")
        mask = F.expr(
            f"shiftleft(1L, CAST(((CAST({key_col} AS BIGINT) % {POLY_MOD}) * {a} + {b})"
            f" % {POLY_MOD} % {M_BITS} % {WORD_BITS} AS INT))"
        )
        w = words.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_w{i}")
        )
        out = out.join(
            F.broadcast(w), widx == F.col(f"_wi{i}"), "left"
        ).filter(
            F.coalesce(F.col(f"_w{i}"), F.lit(0)).bitwiseAND(mask) != 0
        ).drop(f"_wi{i}", f"_w{i}")
    return out


def sql_bloom_words(dim_keys_sql: str) -> str:
    """DuckDB CTE body rebuilding the identical (word_idx, word) set.

    ``dim_keys_sql`` must select one column named ``k`` (BIGINT)."""
    probes = " UNION ALL ".join(
        f"""SELECT ((k % {POLY_MOD}) * {a} + {b}) % {POLY_MOD} % {M_BITS} AS bit
            FROM dim_keys"""
        for a, b in PROBES
    )
    return f"""
        dim_keys AS ({dim_keys_sql}),
        bloom_bits AS ({probes}),
        bloom_words AS (
            SELECT bit // {WORD_BITS} AS word_idx,
                   bit_or(CAST(1 AS BIGINT) << CAST(bit % {WORD_BITS} AS INTEGER)) AS word
            FROM bloom_bits GROUP BY 1
        )"""


def sql_bloom_pass(key_expr: str) -> str:
    """WHERE-clause fragment: key passes both probes against bloom_words
    (correlated scalar subqueries — the words table is tiny)."""
    tests = []
    for a, b in PROBES:
        bit = f"((({key_expr}) % {POLY_MOD}) * {a} + {b}) % {POLY_MOD} % {M_BITS}"
        tests.append(
            f"""COALESCE((SELECT word FROM bloom_words
                 WHERE word_idx = ({bit}) // {WORD_BITS}), 0)
                & (CAST(1 AS BIGINT) << CAST(({bit}) % {WORD_BITS} AS INTEGER)) != 0"""
        )
    return " AND ".join(tests)
