"""Deduplication operators for training-data pipelines — the §2d
capability tier: exact, MinHash+LSH, SimHash, blocked n-gram Jaccard,
and embedding-cosine near-dup.

100 TB design notes, per operator:

- **exact_dedup**: groupBy on the dedup key with ``min(id)`` as the
  deterministic survivor (``dropDuplicates`` keeps an arbitrary row —
  unacceptable for reproducible pipelines). One shuffle on the key;
  at scale, dedup on a 64-char digest of the payload instead of the
  payload itself to keep shuffle rows small.
- **minhash**: shingle → 32-perm signature → 16 bands × 2 rows.
  Candidate generation is a self-equi-join on band hash — shuffle is
  O(docs × bands), never O(docs²); only band-colliding pairs get the
  exact Jaccard verify. Skewed buckets (boilerplate docs) are the
  hazard → AQE skew-join handles moderate skew, and a bucket-size cap
  (drop buckets > N) is the industrial fix for degenerate ones.
- **simhash**: 32-bit weighted fingerprint, banded into 4 bytes.
  Pigeonhole: hamming ≤ 3 ⇒ at least one intact byte ⇒ the band join
  is LOSSLESS for ≤ 3 — brute-force-equivalent results at
  O(docs × 4) shuffle cost.
- **blocked jaccard / embedding near-dup**: exact O(n²) *within
  blocks* — right when a natural blocking key (lang, label, IVF
  cell) bounds block size; LSH is the fallback when none exists.

All hashing uses the portable polynomial family (functions/hashing.py)
so the DuckDB oracle reproduces candidates bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    band_hashes,
    hash_array,
    minhash_signature,
    shingle_hashes_from_token_hashes,
    simhash32,
)
from ..functions.rounding import pround
from ..functions.text import char_shingles, tokenize
from ..functions.vectors import as_double, cosine


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Deterministic exact dedup: per duplicate group keep min(id)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def with_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """(id, hashes): distinct word-n-gram shingle hashes per document.

    Tokens are char-hashed once, shingle hashes composed from token
    hashes (see shingle_hashes_from_token_hashes) — O(chars + tokens·n)
    per document, the 100 TB-viable formulation."""
    token_hashes = hash_array(tokenize(F.col(text_col)))
    return (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col).alias("id"), token_hashes.alias("th"))
        .select(
            "id", shingle_hashes_from_token_hashes(F.col("th"), n).alias("hashes")
        )
    )


def minhash_signatures_agg(hashed: DataFrame, num: int | None = None) -> DataFrame:
    """(id, sig): minhash signatures via explode + 32 min() aggregates.

    The Column-expression form (functions.hashing.minhash_signature)
    evaluates higher-order-function lambdas INTERPRETED, per element —
    at sf0.1 that was ~40 s of pure permutation math. Exploding the
    hash sets and computing 32 codegen'd ``min((h*a+b) % M)`` aggregates
    keeps everything in whole-stage codegen with map-side partial mins:
    the shuffle carries one 32-long row per (partition, id). ~10× faster
    locally and the right shape at 100 TB."""
    from ..functions.hashing import MINHASH_COEFFS, NUM_MINHASH, POLY_MOD

    coeffs = MINHASH_COEFFS[: (num or NUM_MINHASH)]
    ex = hashed.select("id", F.explode("hashes").alias("h"))
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(POLY_MOD)).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = ex.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"_m{i}") for i in range(len(coeffs))]).alias("sig")
    )


def minhash_candidates(hashed: DataFrame, bands: int = 16, rows: int = 2) -> DataFrame:
    """LSH band join → distinct candidate pairs (id_a < id_b)."""
    sigs = minhash_signatures_agg(hashed, num=bands * rows)
    banded = sigs.select(
        "id", F.explode(band_hashes(F.col("sig"), bands, rows)).alias("bh")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.bh") == F.col("b.bh")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_of(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    bands: int = 16,
    rows: int = 2,
    threshold: float = 0.1,
) -> DataFrame:
    """Candidates via LSH, then exact shingle-set Jaccard ≥ threshold.

    The shingle-hash relation feeds four plan branches (two candidate
    sides, two verify sides); persist it so the interpreted-lambda
    shingle construction runs once, spilling to disk if it outgrows
    memory (MEMORY_AND_DISK is the 100 TB-safe level)."""
    from pyspark import StorageLevel

    hashed = with_shingle_hashes(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = minhash_candidates(hashed, bands, rows)
    ha = hashed.select(F.col("id").alias("id_a"), F.col("hashes").alias("h_a"))
    hb = hashed.select(F.col("id").alias("id_b"), F.col("hashes").alias("h_b"))
    return (
        pairs.join(ha, "id_a")
        .join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            pround(jaccard_of(F.col("h_a"), F.col("h_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 32-bit weighted fingerprint (token multiplicity =
    weight, because the token array is NOT deduped before voting).

    Computed as explode + 32 codegen'd conditional-sum aggregates (the
    Column-expression ``simhash32`` evaluates its per-bit votes through
    interpreted higher-order lambdas — same hotspot as minhash; the
    exploded form was ~4× faster at sf0.1 and shuffles one 32-vote row
    per (partition, id) thanks to partial aggregation)."""
    from functools import reduce
    from operator import add

    token_hashes = hash_array(tokenize(F.col(text_col)))
    ex = df.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("id"), F.explode(token_hashes).alias("h")
    )
    votes = [
        F.sum(
            F.when((F.col("h") % F.lit(1 << (b + 1))) >= F.lit(1 << b), F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"_v{b}")
        for b in range(32)
    ]
    agg = ex.groupBy("id").agg(*votes)
    bits = [
        F.when(F.col(f"_v{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(32)
    ]
    return agg.select("id", reduce(add, bits).alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 2
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming (≤ 3
    for losslessness of the 4-byte banding)."""
    if max_hamming > 3:
        raise ValueError("4-byte banding is only lossless for hamming <= 3")
    fp = simhash_fingerprints(df, id_col, text_col)
    blocks = fp.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(*[(F.shiftright(F.col("simhash"), 8 * i) % 256) for i in range(4)])
        ).alias("block_idx", "block_val"),
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact char-k-gram Jaccard over pairs within a blocking key."""
    sh = df.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        char_shingles(F.col(text_col), k).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            pround(jaccard_of(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    min_cosine: float = 0.35,
) -> DataFrame:
    """Cosine near-dup pairs within a blocking key (label / IVF cell)."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        as_double(vec_col).alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.blk").alias("blk"),
            pround(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cosine)
    )
