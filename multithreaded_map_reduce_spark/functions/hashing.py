"""Portable deterministic hashing — identical in Spark and ANSI-ish SQL.

The reference shuffles on ``std::hash<string> % K``
(``include/MapReduceMaster.h:434-440``) — an implementation detail we do
NOT need to reproduce (Spark's shuffle partitioner replaces it). What we
DO need deterministic hashing for is the *algorithmic* operators (minhash
/ simhash dedup, LSH similarity buckets, fingerprints), where the test
oracle (DuckDB) must compute bit-identical values. Spark's ``hash()`` /
``xxhash64()`` are not portable, so everything here is built from a
31-base polynomial rolling hash mod (2^31 - 1) — expressible as a left
fold in any engine with higher-order functions, and overflow-safe in
int64 arithmetic (max intermediate < 2^62).

Every builder has a Spark form (``Column``) and a DuckDB-SQL form
(string); both are generated from the same module-level constants.

Scale note: all of this is pure Catalyst expression work (codegen'd,
no Python in the executor hot path).
"""

from __future__ import annotations

import random
from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_BASE = 31
POLY_MOD = 2_147_483_647  # 2^31 - 1 (prime)

# (a, b) coefficients for the universal-hash family h_i(x) = (a*x + b) % POLY_MOD,
# fixed by seed so Spark and the SQL oracle share them.
_rng = random.Random(42)
NUM_MINHASH = 32
MINHASH_COEFFS: list[tuple[int, int]] = [
    (_rng.randrange(1, POLY_MOD), _rng.randrange(0, POLY_MOD)) for _ in range(NUM_MINHASH)
]

SIMHASH_BITS = 32


# ---------------------------------------------------------------- Spark side
def poly_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string → BIGINT in [0, POLY_MOD).

    NOTE: only defined for non-empty ASCII-ish strings (the SQL twin
    differs on ``''`` because DuckDB's ord('') = -1); callers filter
    empties first.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.split(c, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(POLY_BASE) + F.ascii(ch)) % F.lit(POLY_MOD),
    )


def hash_array(strings: Column) -> Column:
    """ARRAY<STRING> → ARRAY<BIGINT> of poly_hash values."""
    return F.transform(
        strings,
        lambda s: F.aggregate(
            F.split(s, ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * F.lit(POLY_BASE) + F.ascii(ch)) % F.lit(POLY_MOD),
        ),
    )


def token_hash(col: Column | str) -> Column:
    """Codegen'd portable token hash: first 48 bits of md5, mod POLY_MOD.

    Unlike ``poly_hash`` (a per-character higher-order-function fold,
    which Catalyst evaluates INTERPRETED per element), this is a single
    chain of codegen'd built-ins — md5 → substring → conv → % — so it
    stays inside whole-stage codegen. DuckDB computes the identical
    value (``sql_token_hash``); both engines emit lowercase hex md5.
    This is the hash for the high-volume dedup paths (minhash/simhash);
    ``poly_hash`` remains for rolling-hash fingerprints.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast("long") % F.lit(POLY_MOD)


def _perm(a: int, b: int):
    # closure factory: keeps the lambda unary (PySpark infers higher-order
    # function arity from the Python signature)
    return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(POLY_MOD)


def shingle_hashes_from_token_hashes(token_hashes: Column, n: int = 2) -> Column:
    """Distinct n-gram shingle hashes composed from per-token hashes.

    Hash each token's characters ONCE (O(text chars)), then combine the
    n token hashes of each window with the same polynomial fold —
    O(tokens · n) instead of re-hashing every character of every
    shingle (O(chars · shingles)). This is the scale path for minhash:
    at sf0.1 it cut signature computation ~10×.
    """
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(POLY_BASE) + h) % F.lit(POLY_MOD),
    )
    full = F.transform(
        F.sequence(F.lit(1), F.size(token_hashes) - F.lit(n - 1)),
        lambda i: fold(F.slice(token_hashes, i, n)),
    )
    short = F.array(fold(token_hashes))
    return F.array_distinct(
        F.when(F.size(token_hashes) < n, short).otherwise(full)
    )


def minhash_signature(hashes: Column, num: int = NUM_MINHASH) -> Column:
    """ARRAY<BIGINT> of element hashes → ARRAY<BIGINT> minhash signature."""
    sig = [F.array_min(F.transform(hashes, _perm(a, b))) for a, b in MINHASH_COEFFS[:num]]
    return F.array(*sig)


def band_hashes(signature: Column, bands: int, rows: int) -> Column:
    """Fold each band of ``rows`` signature values into one BIGINT bucket key.

    Returns ARRAY<BIGINT> of length ``bands``. Docs sharing any band value
    are LSH candidates — the join key for the candidate-pair stage.
    """
    out = []
    for band in range(bands):
        vals = [F.element_at(signature, band * rows + r + 1) for r in range(rows)]
        h = F.lit(band).cast("long")
        for v in vals:
            h = (h * F.lit(POLY_BASE) + v % F.lit(POLY_MOD)) % F.lit(POLY_MOD)
        out.append(h)
    return F.array(*out)


def simhash32(hashes: Column) -> Column:
    """ARRAY<BIGINT> of element hashes → 32-bit SimHash as BIGINT.

    Bit b is set iff the majority of elements have bit b set (weight 1
    per distinct element; sum of ±1 >= 0).
    """
    def _vote_fn(lo: int, hi: int):
        return lambda acc, h: acc + F.when(
            (h % F.lit(hi)) >= F.lit(lo), F.lit(1)
        ).otherwise(F.lit(-1))

    bit_cols = []
    for b in range(SIMHASH_BITS):
        lo, hi = 1 << b, 1 << (b + 1)
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _vote_fn(lo, hi))
        bit_cols.append(F.when(vote >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long")))
    return reduce(add, bit_cols)


# --------------------------------------------------------------- DuckDB side
# SQL fragments that compute the exact same values, for oracle_sql().
def sql_tokens(expr: str) -> str:
    """DuckDB: reference tokenizer (quirk Q2) over a string expr."""
    return f"list_filter(string_split_regex({expr}, '\\s+'), t -> t != '')"


def sql_poly_hash(expr: str) -> str:
    """DuckDB: poly_hash of a non-empty string expr."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), ch -> CAST(ord(ch) AS BIGINT))), "
        f"(acc, ch) -> (acc * {POLY_BASE} + ch) % {POLY_MOD})"
    )


def sql_token_hash(expr: str) -> str:
    """DuckDB twin of ``token_hash``."""
    return f"(CAST(('0x' || substring(md5({expr}), 1, 12)) AS BIGINT) % {POLY_MOD})"


def sql_token_hash_array(list_expr: str) -> str:
    """DuckDB: ARRAY<STRING> → ARRAY<BIGINT> of token_hash values."""
    return f"list_transform({list_expr}, s -> {sql_token_hash('s')})"


def sql_hash_array(list_expr: str) -> str:
    """DuckDB: ARRAY<STRING> → ARRAY<BIGINT> poly hashes."""
    return f"list_transform({list_expr}, s -> {sql_poly_hash('s')})"


def sql_minhash_signature(hashes_expr: str, num: int = NUM_MINHASH) -> str:
    parts = [
        f"list_min(list_transform({hashes_expr}, h -> (h * {a} + {b}) % {POLY_MOD}))"
        for a, b in MINHASH_COEFFS[:num]
    ]
    return "[" + ", ".join(parts) + "]"


def sql_band_hashes(sig_expr: str, bands: int, rows: int) -> str:
    out = []
    for band in range(bands):
        h = f"CAST({band} AS BIGINT)"
        for r in range(rows):
            v = f"({sig_expr}[{band * rows + r + 1}] % {POLY_MOD})"
            h = f"(({h}) * {POLY_BASE} + {v}) % {POLY_MOD}"
        out.append(h)
    return "[" + ", ".join(out) + "]"


def sql_simhash32(hashes_expr: str) -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        lo, hi = 1 << b, 1 << (b + 1)
        vote = (
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({hashes_expr}, h -> CASE WHEN (h % {hi}) >= {lo} "
            "THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END)), (x, y) -> x + y)"
        )
        terms.append(f"CASE WHEN {vote} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
    return "(" + " + ".join(terms) + ")"


def sql_char_shingles(expr: str, k: int = 8) -> str:
    """DuckDB twin of functions.text.char_shingles (distinct k-grams)."""
    full = f"list_transform(range(1, length({expr}) - {k - 2}), i -> {expr}[i:i+{k - 1}])"
    return (
        f"list_distinct(CASE WHEN length({expr}) < {k} THEN [{expr}] ELSE {full} END)"
    )


def sql_shingle_hashes_from_token_hashes(th_expr: str, n: int = 2) -> str:
    """DuckDB twin of shingle_hashes_from_token_hashes."""
    fold = (
        lambda arr: "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        + arr
        + f"), (acc, h) -> (acc * {POLY_BASE} + h) % {POLY_MOD})"
    )
    full = (
        f"list_transform(range(1, len({th_expr}) - {n - 2}), "
        f"i -> {fold(f'list_slice({th_expr}, i, i + {n - 1})')})"
    )
    short = f"[{fold(th_expr)}]"
    return (
        f"list_distinct(CASE WHEN len({th_expr}) < {n} THEN {short} ELSE {full} END)"
    )


def sql_word_shingles(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of functions.text.word_shingles (distinct, space-joined)."""
    full = (
        f"list_transform(range(1, len({tokens_expr}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' '))"
    )
    short = f"[array_to_string({tokens_expr}, ' ')]"
    return (
        f"list_distinct(CASE WHEN len({tokens_expr}) < {n} THEN {short} ELSE {full} END)"
    )
