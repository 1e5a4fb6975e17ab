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
  hazard → AQE skew-join handles moderate skew, and the implemented
  ``max_bucket`` cap drops degenerate buckets before the self-join
  (see ``minhash_candidates``).
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
    POLY_BASE,
    POLY_MOD,
    band_hashes,
    hash_array,
    token_hash,
)
from ..functions.rounding import pround
from ..functions.text import char_shingles
from ..functions.vectors import as_double, cosine
from ..sources.catalog import fan_out

# Degenerate-bucket cap shared by the LSH index BUILD and every probe
# (batch day-2 + streaming): a band bucket holding more than this many
# ids is boilerplate-driven and would explode the candidate join.
# Probes must filter the persisted ``_bn`` with THIS constant so a
# build-default change can never silently diverge them (ADVICE r6).
DEFAULT_MAX_BUCKET = 100


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Deterministic exact dedup: per duplicate group keep min(id)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def _unique_view(df: DataFrame, id_col: str, text_col: str) -> str:
    """Register ``(id, text)`` under a per-call unique temp view name.

    A fixed name ('__minhash_src') is shared session state: two calls
    racing from different threads cross-wire inputs, and the view leaks
    into the caller's session (ADVICE r2). The uuid suffix makes each
    call self-contained; callers drop the view after ``spark.sql``
    returns — safe because view resolution happens at analysis time, so
    the returned DataFrame's plan no longer references the name."""
    import uuid

    view = f"__dedup_src_{uuid.uuid4().hex}"
    fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    ).createOrReplaceTempView(view)
    return view


def shingle_hash_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """(id, h) rows: word-n-gram shingle hashes per document, computed
    END-TO-END in whole-stage codegen (no interpreted HOF lambdas):

    split → zip-at-explode (``arrays_zip`` of the shifted token array)
    → codegen'd md5 token hash fold. NO shuffle and no window in this
    relation itself — shingle adjacency comes from the zip; each
    downstream per-id aggregation (signature min()s, collect_set)
    shuffles on id once, and AQE may share the exchange (ReusedExchange)
    when both consume the same persisted rows.
    Documents with fewer than ``n`` tokens contribute the fold of all
    their tokens; documents with zero tokens drop out. Duplicate shingle
    hashes may repeat — consumers take ``min`` (dup-insensitive) or
    ``collect_set``."""
    # Tokenize without a HOF filter: trim outer whitespace first, then
    # split on runs — no empty tokens can appear (quirk Q2 semantics:
    # empties dropped, order kept), and every expression is codegen'd.
    cleaned = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    base = (
        fan_out(df.filter(F.length(text_col) > 0))
        .select(F.col(id_col).alias("id"), F.split(cleaned, r"\s+").alias("_toks"))
        .filter((F.size("_toks") > 1) | (F.element_at("_toks", 1) != ""))
    )
    # The n-token window at position i is zipped in at EXPLODE time:
    # arrays_zip(toks, toks[2:], …, toks[n:]) — no id-partitioned window,
    # no sort, no shuffle; shingle adjacency comes from the zip itself.
    shifted = [
        F.slice(
            "_toks", i + 1, F.greatest(F.size("_toks") - i, F.lit(0))
        ).alias(f"t{i}")
        for i in range(1, n)
    ]
    ex = base.select(
        "id",
        F.size("_toks").alias("_k"),
        F.posexplode(F.arrays_zip(F.col("_toks").alias("t0"), *shifted)).alias(
            "pos", "z"
        ),
    )
    # Fold the zipped tokens, stopping at the null padding — for full
    # windows that's the n-token shingle fold; for a document with k < n
    # tokens, row 0 folds all k of them.
    h: Column = token_hash(F.col("z.t0"))
    for i in range(1, n):
        nxt = F.col(f"z.t{i}")
        h = F.when(nxt.isNull(), h).otherwise(
            (h * F.lit(POLY_BASE) + token_hash(nxt)) % F.lit(POLY_MOD)
        )
    keep = (F.col("pos") + n <= F.col("_k")) | (
        (F.col("_k") < n) & (F.col("pos") == 0)
    )
    return ex.filter(keep).select("id", h.alias("h"))


def with_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """(id, hashes): distinct shingle-hash set per document (the exact
    Jaccard-verify relation), built from ``shingle_hash_rows``."""
    return (
        shingle_hash_rows(df, id_col, text_col, n)
        .groupBy("id")
        .agg(F.collect_set("h").alias("hashes"))
    )




def minhash_signatures_agg(rows: DataFrame, num: int | None = None) -> DataFrame:
    """(id, sig): minhash signatures via 32 codegen'd min() aggregates
    over (id, h) shingle-hash rows.

    The Column-expression form (functions.hashing.minhash_signature)
    evaluates higher-order-function lambdas INTERPRETED, per element —
    at sf0.1 that was ~40 s of pure permutation math. Aggregating the
    exploded rows with ``min((h*a+b) % M)`` keeps everything in
    whole-stage codegen with map-side partial mins: the shuffle carries
    one 32-long row per (partition, id). ~10× faster locally and the
    right shape at 100 TB."""
    from ..functions.hashing import MINHASH_COEFFS, NUM_MINHASH

    coeffs = MINHASH_COEFFS[: (num or NUM_MINHASH)]
    mins = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(POLY_MOD)).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = rows.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"_m{i}") for i in range(len(coeffs))]).alias("sig")
    )


def minhash_candidates(
    rows: DataFrame,
    bands: int = 16,
    rows_per_band: int = 2,
    max_bucket: int | None = 100,
) -> DataFrame:
    """LSH band join → distinct candidate pairs (id_a < id_b).

    ``max_bucket`` is the degenerate-bucket cap: a band bucket holding
    B docs yields B² candidate pairs, so one boilerplate bucket (every
    page sharing a banner) can go quadratic at 100 TB. Buckets larger
    than the cap are dropped BEFORE pair expansion — identical documents
    are the exact-dedup pass's job, not LSH's. The oracle applies the
    same cap, so recall stays part of the differential contract.

    Pair generation is ONE shuffle: groupBy(bh) → collect_set(id) →
    in-bucket pair expansion (two explodes). The classic banded
    self-equi-join computes the banded relation twice and adds a second
    shuffle + join stage; with the cap bounding every bucket at
    ``max_bucket`` ids, in-bucket expansion is strictly cheaper and
    Σ|bucket|² stays linear in docs × bands."""
    sigs = minhash_signatures_agg(rows, num=bands * rows_per_band)
    return candidates_from_signatures(sigs, bands, rows_per_band, max_bucket)


def candidates_from_signatures(
    sigs: DataFrame,
    bands: int,
    rows_per_band: int,
    max_bucket: int | None,
) -> DataFrame:
    """Band → bucket → in-bucket pair expansion over an (id, sig) relation."""
    banded = sigs.select(
        "id", F.explode(band_hashes(F.col("sig"), bands, rows_per_band)).alias("bh")
    )
    buckets = banded.groupBy("bh").agg(F.collect_set("id").alias("ids"))
    buckets = buckets.filter(F.size("ids") >= 2)
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    return (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select(
            "id_a",
            F.explode(F.filter("ids", lambda y: y > F.col("id_a"))).alias("id_b"),
        )
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
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int | None = 100,
    rows_rel: DataFrame | None = None,
) -> DataFrame:
    """Candidates via LSH, then exact shingle-set Jaccard ≥ threshold.

    Banding must MATCH the threshold: b bands × r rows puts the
    s-curve midpoint at (1/b)^(1/r). 8×4 → 0.59, right for a 0.5
    near-dup threshold — planted ~0.98-jaccard dups collide with
    probability 1-(1-0.98⁴)^8 ≈ 1, while j≈0.05 background pairs almost
    never do. (16 bands × 2 rows — midpoint 0.25 — floods the verify
    join with tens of thousands of low-jaccard candidates per 5k docs:
    measured 174k candidates at sf0.1, the round-1 bottleneck.)

    The persisted shingle rows feed two per-id aggregations, each with
    its own id-keyed shuffle (partial map-side aggregation first, so the
    exchanges carry one row per (partition, id)): the signature
    aggregation — 32 codegen'd ``min`` exprs in a hash aggregate — and
    the ``collect_set`` verify relation. Keeping them
    SEPARATE matters: collect_set is a typed-imperative aggregate, so a
    merged agg runs on ObjectHashAggregateExec where the 32 min exprs
    evaluate interpreted per row (~25 s of CPU at sf0.1 measured vs ~1 s
    codegen'd).

    Materialization is ``localCheckpoint`` rather than ``persist``
    (VERDICT r9 item 1): a checkpointed relation never registers in the
    CacheManager, so it can't be substituted into OTHER queries' plans
    (run-order plan determinism), and its blocks are GC-released when
    the relation goes out of scope instead of leaking MEMORY_AND_DISK
    storage for the life of a multi-hundred-query session.

    ``rows_rel``: optional prebuilt (id, h) shingle-hash relation —
    pass the module-level shared artifact (queries/dedup.py
    ``_shared_shingle_rows``) to skip the per-call scan+checkpoint
    entirely. Duplicate rows don't matter: both consumers (min-per-
    permutation signatures, collect_set verify sets) are
    duplicate-insensitive, so the distinct shared relation is
    value-identical to the raw one."""
    if rows_rel is None:
        rows_rel = shingle_hash_rows(df, id_col, text_col, n).localCheckpoint(
            eager=False
        )
    sigs = minhash_signatures_agg(rows_rel, num=bands * rows)
    pairs = candidates_from_signatures(sigs, bands, rows, max_bucket)
    hashed = (
        rows_rel.groupBy("id")
        .agg(F.collect_set("h").alias("hashes"))
        .localCheckpoint(eager=False)  # read by both verify sides
    )
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


def minhash_dedup_pairs_sql(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 100,
) -> DataFrame:
    """``minhash_dedup_pairs`` as ONE generated Spark-SQL string — the
    identical pipeline (same constants, same shapes, differentially
    equal: tests/test_dedup.py asserts set-equality with the DataFrame
    builder), built for driver-side latency.

    Why: the DataFrame builder materializes hundreds of Column objects
    (32 permutation aggregates, 8 band folds), each a py4j round-trip —
    measured ~2.5 s of plan CONSTRUCTION cold / ~0.8 s warm at any SF,
    before Spark executes anything. String generation is Python-side
    (~1 ms) plus one ``spark.sql`` parse (~0.15 s). Trade-off: Catalyst
    inlines CTEs, so the shingle relation is computed once per
    consumer instead of persisted — a few hundred ms of extra executor
    CPU at sf0.1 (linear, distributed) for ~2 s less driver latency;
    the verify join's two ``hashed`` sides dedupe via ReusedExchange.
    At cluster scale with huge corpora, prefer ``minhash_dedup_pairs``
    (persisted shingles); for interactive/driver-bound use, this one.

    Float note: SQL literals like ``1000000.0`` parse as DECIMAL in
    Spark SQL — the rounding uses int * double (``+ 0.5d``) literals so
    the jaccard stays a DOUBLE, bit-equal with the DataFrame pround.

    The verify joins carry SHUFFLE_MERGE hints: AQE would broadcast the
    tiny pair relation into two independent probe joins, recomputing
    the ``hashed`` aggregation per side; pinned to sort-merge the two
    hashed exchanges are identical and one is reused (warm median
    1.64 s → 1.50 s at sf0.1).
    """
    from ..functions.hashing import MINHASH_COEFFS

    M = POLY_MOD
    num = bands * rows

    def th(x: str) -> str:
        return f"CAST(conv(substring(md5({x}), 1, 12), 16, 10) AS BIGINT) % {M}"

    mins = ", ".join(
        f"min((h * {a} + {b}) % {M}) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_COEFFS[:num])
    )

    def band_expr(j: int) -> str:
        h = f"CAST({j} AS BIGINT)"
        for r in range(rows):
            h = f"(({h}) * {POLY_BASE} + (m{j * rows + r} % {M})) % {M}"
        return h

    bands_arr = "array(" + ", ".join(band_expr(j) for j in range(bands)) + ")"

    slices = ", ".join(
        f"slice(toks, {i + 1}, greatest(size(toks) - {i}, 0)) AS t{i}"
        for i in range(1, n)
    )
    zip_args = ", ".join(["toks"] + [f"t{i}" for i in range(1, n)])
    z_cols = ", ".join(
        ["z.toks AS t0"] + [f"z.t{i} AS t{i}" for i in range(1, n)]
    )
    h_expr = th("t0")
    for i in range(1, n):
        h_expr = (
            f"CASE WHEN t{i} IS NULL THEN {h_expr} "
            f"ELSE (({h_expr}) * {POLY_BASE} + ({th(f't{i}')})) % {M} END"
        )

    view = _unique_view(df, id_col, text_col)
    sql = f"""
WITH base AS (
    SELECT id, split(regexp_replace(text, '^\\\\s+|\\\\s+$', ''), '\\\\s+') AS toks
    FROM {view} WHERE length(text) > 0
), base2 AS (
    SELECT id, toks, size(toks) AS k, {slices}
    FROM base WHERE size(toks) > 1 OR element_at(toks, 1) != ''
), ex AS (
    SELECT id, k, pos, {z_cols}
    FROM base2 LATERAL VIEW posexplode(arrays_zip({zip_args})) t AS pos, z
), rows_rel AS (
    SELECT id, {h_expr} AS h
    FROM ex WHERE pos + {n} <= k OR (k < {n} AND pos = 0)
), sigs AS (
    SELECT id, {mins} FROM rows_rel GROUP BY id
), banded AS (
    SELECT id, bh FROM sigs LATERAL VIEW explode({bands_arr}) t AS bh
), buckets AS (
    SELECT bh, ids FROM (SELECT bh, collect_set(id) AS ids FROM banded GROUP BY bh)
    WHERE size(ids) BETWEEN 2 AND {max_bucket}
), pairs AS (
    SELECT DISTINCT id_a, id_b FROM buckets
    LATERAL VIEW explode(ids) ta AS id_a
    LATERAL VIEW explode(filter(ids, y -> y > id_a)) tb AS id_b
), hashed AS (
    SELECT id, collect_set(h) AS hashes FROM rows_rel GROUP BY id
)
SELECT id_a, id_b, jaccard FROM (
    SELECT /*+ SHUFFLE_MERGE(a), SHUFFLE_MERGE(b) */ p.id_a, p.id_b,
           floor((size(array_intersect(a.hashes, b.hashes))
                  / (size(a.hashes) + size(b.hashes)
                     - size(array_intersect(a.hashes, b.hashes)))) * 1000000 + 0.5d)
               / 1000000 AS jaccard
    FROM pairs p JOIN hashed a ON p.id_a = a.id JOIN hashed b ON p.id_b = b.id
) WHERE jaccard >= {threshold}
"""
    out = df.sparkSession.sql(sql)
    df.sparkSession.catalog.dropTempView(view)
    return out


def simhash_fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 32-bit weighted fingerprint (token multiplicity =
    weight, because the token array is NOT deduped before voting).

    Computed as explode + 32 codegen'd conditional-sum aggregates (the
    Column-expression ``simhash32`` evaluates its per-bit votes through
    interpreted higher-order lambdas — same hotspot as minhash; the
    exploded form was ~4× faster at sf0.1 and shuffles one 32-vote row
    per (partition, id) thanks to partial aggregation). Token hashing
    is the codegen'd md5 ``token_hash`` applied AFTER the explode, so
    no per-character interpreted fold runs anywhere."""
    from functools import reduce
    from operator import add

    ex = (
        fan_out(df.filter(F.length(text_col) > 0))
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("id", token_hash(F.col("tok")).alias("h"))
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


def simhash_fingerprints_wide(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, simhash): 64-bit weighted fingerprint — the 100 TB
    configuration (SCALE.md). Two independent 32-bit md5 slices drive
    bits 0–31 and 32–63 (the 48-bit ``token_hash`` can't feed 64
    unbiased votes); bit recombination is bitwise-OR of disjoint
    shifted bits, so bit 63 never overflows a signed BIGINT the way a
    ``+`` fold would under ANSI mode."""
    from functools import reduce

    ex = (
        fan_out(df.filter(F.length(text_col) > 0))
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "id",
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("h0"),
            F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long").alias("h1"),
        )
    )
    votes = [
        F.sum(
            F.when(
                (F.col("h0" if b < 32 else "h1") % F.lit(1 << ((b % 32) + 1)))
                >= F.lit(1 << (b % 32)),
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"_v{b}")
        for b in range(64)
    ]
    agg = ex.groupBy("id").agg(*votes)
    bits = [
        F.when(
            F.col(f"_v{b}") >= 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    return agg.select("id", reduce(lambda x, y: x.bitwiseOR(y), bits).alias("simhash"))


def simhash_blocks(fp: DataFrame, bits: int = 32) -> DataFrame:
    """Explode a fingerprint into its 4 pigeonhole bands of bits/4 bits
    (8-bit bands for the 32-bit fixture config, 16-bit for the 64-bit
    scale config — 4 × 65,536 buckets, so one band bucket holds a
    ~2^-18 fraction of the corpus instead of 32-bit banding's ~2^-10)."""
    block_bits = bits // 4
    mask = (1 << block_bits) - 1
    return fp.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), block_bits * i).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(4)
                ]
            )
        ).alias("block_idx", "block_val"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 2,
    max_bucket: int | None = 10_000,
    bits: int = 32,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming (≤ 3
    for losslessness of the 4-band pigeonhole).

    Pair generation is a banded self-equi-join whose two sides are the
    IDENTICAL plan (blocks → window bucket-count → cap filter), so
    Spark's ReuseExchange computes the fingerprint pipeline and its
    shuffle ONCE and feeds both join sides from the same exchange. The
    r3 alternative (collect_set per bucket → in-bucket expansion via an
    interpreted ``filter(items, ...)`` lambda) was measured 2.1× slower
    at sf0.1: with 8-bit bands there are ≤ 1,024 buckets total, the
    largest holds ~1,495 ids, and the per-bucket O(B²) lambda expansion
    runs single-row with no codegen. The window count piggybacks on the
    same (block_idx, block_val) hash partitioning the join needs, so
    the cap costs one sort, not an extra shuffle.

    ``max_bucket`` is the degenerate-bucket cap (VERDICT r2 item 4): a
    band value shared by B docs yields B²/2 candidate pairs, and with
    32-bit banding there are at most 4 × 256 buckets TOTAL, so one
    boilerplate-heavy corpus slice goes quadratic without a rail.
    Buckets above the cap are dropped whole before the join — the
    deterministic rule the differential oracle can replay. A pair lost
    this way is only truly lost if ALL of its ≥ 1 shared bands are
    oversized; identical documents are exact-dedup's job, not
    SimHash's. The fixture's largest bucket is 1,495 ids (sf0.1), so
    the 10k default is a no-op there and the brute-force oracle still
    proves the banding lossless; shrink it (or move to ``bits=64``,
    whose 16-bit bands are 256× finer) at real scale."""
    from pyspark.sql.window import Window

    if max_hamming > 3:
        raise ValueError("4-band pigeonhole is only lossless for hamming <= 3")
    if bits == 32:
        fp = simhash_fingerprints(df, id_col, text_col)
    elif bits == 64:
        fp = simhash_fingerprints_wide(df, id_col, text_col)
    else:
        raise ValueError("bits must be 32 or 64")
    blocks = simhash_blocks(fp, bits)
    sized = blocks.withColumn(
        "_bn", F.count("*").over(Window.partitionBy("block_idx", "block_val"))
    )
    pruned = sized.filter(F.col("_bn") >= 2)
    if max_bucket is not None:
        pruned = pruned.filter(F.col("_bn") <= max_bucket)
    pruned = pruned.drop("_bn")
    # SHUFFLE_MERGE pins the join to sort-merge: both sides then demand
    # the same (block_idx, block_val) hash partitioning, the subplans
    # are identical, and AQE reuses ONE exchange — fingerprints computed
    # once. Without the hint AQE broadcasts the (small-at-test-scale)
    # side and the whole fingerprint pipeline runs twice — measured 18%
    # slower at sf0.1 even with the broadcast.
    pruned = pruned.hint("shuffle_merge")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.block_idx") == F.col("b.block_idx"),
                F.col("a.block_val") == F.col("b.block_val"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_sql(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 2,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """``simhash_pairs`` as one generated Spark-SQL string — same
    rationale and same equivalence contract as
    ``minhash_dedup_pairs_sql``: the 32 vote aggregates + 32 bit
    recombinations are ~130 py4j Column constructions in the DataFrame
    form (~1 s of driver latency); one SQL parse replaces them. Results
    are set-equal (tested) and share the brute-force oracle.

    Same ReuseExchange-friendly banded self-join with a window-count
    ``max_bucket`` degenerate-bucket cap as the DataFrame twin (see
    ``simhash_pairs`` for why this beats per-bucket collect_set
    expansion and why 10k is a fixture no-op). Measured warm medians at
    sf0.1, local[32]: collect_set+lambda 2.8 s, plain sized-CTE join
    1.9 s, identical-sides window form 1.35 s, + SHUFFLE_MERGE hint
    (forces the reused-exchange sort-merge plan over AQE's broadcast)
    1.1 s."""
    if max_hamming > 3:
        raise ValueError("4-band pigeonhole is only lossless for hamming <= 3")
    M = POLY_MOD
    votes = ", ".join(
        f"sum(CASE WHEN (h % {1 << (b + 1)}) >= {1 << b} THEN 1 ELSE -1 END) AS v{b}"
        for b in range(32)
    )
    bits = " + ".join(
        f"CASE WHEN v{b} >= 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(32)
    )
    blocks_arr = ", ".join(f"shiftright(simhash, {8 * i}) % 256" for i in range(4))
    cap = 1 << 62 if max_bucket is None else max_bucket

    view = _unique_view(df, id_col, text_col)
    sql = f"""
WITH ex AS (
    SELECT id, CAST(conv(substring(md5(tok), 1, 12), 16, 10) AS BIGINT) % {M} AS h
    FROM (
        SELECT id, tok
        FROM {view} LATERAL VIEW explode(split(text, '\\\\s+')) t AS tok
        WHERE length(text) > 0 AND tok != ''
    )
), votes AS (
    SELECT id, {votes} FROM ex GROUP BY id
), fp AS (
    SELECT id, ({bits}) AS simhash FROM votes
), blocks AS (
    SELECT id, simhash, block_idx, block_val
    FROM fp LATERAL VIEW posexplode(array({blocks_arr})) t AS block_idx, block_val
), pruned AS (
    SELECT id, simhash, block_idx, block_val FROM (
        SELECT id, simhash, block_idx, block_val,
               count(*) OVER (PARTITION BY block_idx, block_val) AS bn
        FROM blocks
    ) WHERE bn BETWEEN 2 AND {cap}
)
SELECT /*+ SHUFFLE_MERGE(a) */ DISTINCT a.id AS id_a, b.id AS id_b,
       bit_count(a.simhash ^ b.simhash) AS hamming
FROM pruned a JOIN pruned b
  ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.id < b.id
WHERE bit_count(a.simhash ^ b.simhash) <= {max_hamming}
"""
    out = df.sparkSession.sql(sql)
    df.sparkSession.catalog.dropTempView(view)
    return out


def _block_size_rail(rel: DataFrame, max_block: int | None) -> DataFrame:
    """Fail-fast rail on blocking-key cardinality (VERDICT r2 item 6).

    The blocked pair operators are exact O(B²) *within* a block — their
    contract is that a natural key (lang, label, IVF cell) bounds B. A
    hot key silently breaks that contract at scale, so rather than cap
    (which would silently change results for a semantic blocking key),
    oversized blocks RAISE at execution time: a window count over blk
    piggybacks on the same hash partitioning the self-join needs anyway,
    and ``raise_error`` fires inside a filter predicate so the check
    cannot be pruned as an unused column."""
    if max_block is None:
        return rel
    from pyspark.sql.window import Window

    sized = rel.withColumn("_bn", F.count("*").over(Window.partitionBy("blk")))
    guard = F.when(
        F.col("_bn") > F.lit(max_block),
        F.raise_error(
            F.concat(
                F.lit("blocked pair operator: block '"),
                F.col("blk").cast("string"),
                F.lit(f"' exceeds max_block={max_block} (got "),
                F.col("_bn").cast("string"),
                F.lit(" rows) — use LSH/minhash for unbounded blocks"),
            )
        ),
    )
    return sized.filter(guard.isNull()).drop("_bn")


def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    k: int = 8,
    threshold: float = 0.5,
    max_block: int | None = 100_000,
) -> DataFrame:
    """Exact char-k-gram Jaccard over pairs within a blocking key.

    ``max_block`` bounds the quadratic: a 100k-row block is ~5·10⁹
    candidate pairs — beyond that the right tool is LSH, and this
    operator raises instead of silently melting the cluster.

    Perf shape (sf0.1: 430 s → single-digit seconds): shingles are
    HASHED to BIGINT before the pair join (array_intersect on longs,
    never on ~300 k-char strings — the oracle hashes identically so
    collisions, if any, are shared), the intersection size is computed
    ONCE into a checkpointed pair-feature relation (projection collapse
    + filter pushdown would otherwise re-inline the O(|a|·|b|)
    intersection into ~4 evaluations per pair — the CaseWhen/filter
    re-evaluation hazard), and the jaccard + threshold run over the
    materialized sizes."""
    sh = fan_out(df.filter(F.length(text_col) > 0)).select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        F.array_distinct(hash_array(char_shingles(F.col(text_col), k))).alias("sh"),
    )
    sh = _block_size_rail(sh, max_block)
    a, b = sh.alias("a"), sh.alias("b")
    feat = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.size(F.array_intersect("a.sh", "b.sh")).alias("i"),
            F.size("a.sh").alias("na"),
            F.size("b.sh").alias("nb"),
        )
        .localCheckpoint(eager=False)
    )
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        feat.select("id_a", "id_b", pround(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    min_cosine: float = 0.35,
    max_block: int | None = 100_000,
) -> DataFrame:
    """Cosine near-dup pairs within a blocking key (label / IVF cell).

    ``max_block`` raises on hot blocks before the O(B²) self-join —
    see ``_block_size_rail``; re-cluster (finer IVF cells) instead."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("blk"),
        as_double(vec_col).alias("v"),
    )
    e = _block_size_rail(e, max_block)
    a, b = e.alias("a"), e.alias("b")
    # NOTE: no checkpoint barrier here, deliberately — the O(dim=64)
    # cosine fold is cheap enough that re-evaluation under filter
    # pushdown beats materializing the pair relation (measured 4.8 s
    # vs 7.8 s at sf0.1); the barrier only pays for expensive
    # per-pair expressions (see blocked_jaccard_pairs / editdistance).
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


def minhash_incremental_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int | None = 100,
) -> DataFrame:
    """Incremental near-dedup: match a NEW batch against an existing
    (already-deduped) corpus plus itself, never pairing corpus×corpus.

    This is the daily-ingest shape at 100 TB: the corpus side is
    banded into an LSH bucket index (in production, persisted once and
    reused across ingests); each round then (a) probes batch band
    hashes against corpus buckets — an equi-join keyed on the bucket
    hash whose cost is O(batch×bands) probe rows, independent of how
    many corpus pairs exist — and (b) expands batch-internal buckets
    the normal way. The quadratic corpus×corpus work the full-corpus
    pipeline would redo every day simply never appears.

    Cap discipline: cross-candidates drop buckets whose CORPUS side
    exceeds ``max_bucket`` distinct ids (a boilerplate bucket would
    attach every new doc to up to B old ones); batch-internal pairs
    reuse the standard in-bucket cap. Both caps are replayed by the
    oracle, keeping recall inside the differential contract.

    Returns (new_id, match_id, match_in ∈ {'corpus','batch'}, jaccard)
    with exact shingle-set jaccard ≥ threshold; for batch-internal
    pairs new_id is the LARGER id (the younger doc is the duplicate —
    deterministic survivor discipline, dedup_exact's rule).
    """
    # two consumers (band index + verify sets) — localCheckpoint for
    # CacheManager-free determinism + GC release (VERDICT r9 item 1)
    c_rows = shingle_hash_rows(corpus, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    num = bands * rows
    c_band = minhash_signatures_agg(c_rows, num=num).select(
        "id", F.explode(band_hashes(F.col("sig"), bands, rows)).alias("bh")
    )
    c_hashed = c_rows.groupBy("id").agg(F.collect_set("h").alias("hashes"))
    return minhash_probe_pairs(
        c_band, c_hashed, batch, id_col, text_col, n, bands, rows, threshold, max_bucket
    )


def minhash_probe_pairs(
    c_band: DataFrame,
    c_hashed: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int | None = 100,
) -> DataFrame:
    """The probe core of incremental dedup, taking the corpus side as
    PREPARED relations — ``c_band`` (id, bh) band rows and ``c_hashed``
    (id, hashes) verify sets — so the same code serves both the
    inline path (``minhash_incremental_pairs``) and the persisted-index
    path (``minhash_probe_index``), where both relations are parquet
    scans of a day-1 artifact. Semantics identical either way; the two
    share the ``dedup_incremental`` oracle family."""
    b_rows = shingle_hash_rows(batch, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    b_sigs = minhash_signatures_agg(b_rows, num=bands * rows)
    b_band = b_sigs.select(
        "id", F.explode(band_hashes(F.col("sig"), bands, rows)).alias("bh")
    )

    if max_bucket is None:
        c_capped = c_band
    elif "_bn" in c_band.columns:
        # Persisted-index path: the bucket population was precomputed
        # at build time, so the hot-bucket cap is a pushable filter —
        # zero corpus-side aggregation per ingest.
        c_capped = c_band.filter(F.col("_bn") <= max_bucket)
    else:
        c_sizes = c_band.groupBy("bh").agg(F.countDistinct("id").alias("_bn"))
        c_capped = c_band.join(
            c_sizes.filter(F.col("_bn") <= max_bucket).select("bh"), "bh"
        )
    cross = (
        b_band.select(F.col("id").alias("new_id"), "bh")
        .join(c_capped.select(F.col("id").alias("match_id"), "bh"), "bh")
        .select("new_id", "match_id")
        .distinct()
        .withColumn("match_in", F.lit("corpus"))
    )
    internal = (
        candidates_from_signatures(b_sigs, bands, rows, max_bucket)
        .select(
            F.col("id_b").alias("new_id"),
            F.col("id_a").alias("match_id"),
        )
        .withColumn("match_in", F.lit("batch"))
    )

    b_hashed = (
        b_rows.groupBy("id")
        .agg(F.collect_set("h").alias("hashes"))
        .localCheckpoint(eager=False)  # probed by both verify sides
    )
    new_side = b_hashed.select(F.col("id").alias("new_id"), F.col("hashes").alias("h_n"))
    old_corpus = c_hashed.select(F.col("id").alias("match_id"), F.col("hashes").alias("h_m"))
    old_batch = b_hashed.select(F.col("id").alias("match_id"), F.col("hashes").alias("h_m"))
    scored = (
        cross.join(old_corpus, "match_id")
        .unionByName(internal.join(old_batch, "match_id"))
        .join(new_side, "new_id")
        .select(
            "new_id",
            "match_id",
            "match_in",
            pround(jaccard_of(F.col("h_n"), F.col("h_m")), 6).alias("jaccard"),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold)


def _hadoop_delete(spark, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API resolved from
    the path's scheme — works on local fs, HDFS, and object stores
    alike (ADVICE r6: ``shutil.rmtree`` silently no-ops on any
    non-local URI, leaving stale bucket files beside the new
    ``saveAsTable`` output)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(jpath, True)  # returns False when absent — no error


def _buckets_table_name(path: str) -> str:
    """Catalog name for the bucketed LSH index at ``path`` — derived
    from the artifact location so build and probe agree without passing
    a name around (and two indexes at different paths never collide).

    Single-writer contract (ADVICE r6): the name is path-derived, NOT
    session-scoped, so two sessions sharing a persistent metastore and
    the same ``path`` race on DROP TABLE/saveAsTable — same staleness
    contract as the artifact files themselves (see
    ``_minhash_index_path``): one builder owns an index path; probes
    are read-only."""
    import hashlib

    return "mh_buckets_" + hashlib.sha1(path.encode()).hexdigest()[:12]


def build_minhash_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n: int = 2,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    num_buckets: int = 8,
) -> None:
    """Materialize the day-1 dedup artifacts to parquet — the piece of
    the 100 TB story ``SCALE.md`` claimed but nothing demonstrated
    (VERDICT r4 item 3): at scale the LSH bucket index and the
    canonical-id map are PERSISTED incremental state, rebuilt never and
    probed daily, not recomputed from the raw corpus per query.

    Three artifacts under ``path``:

    - ``buckets``:   (bh, id, _bn) corpus band rows, written
                     ``bucketBy(num_buckets, bh)`` as an EXTERNAL
                     catalog table (name: ``_buckets_table_name(path)``)
                     so every daily probe join on ``bh`` is co-located
                     — no corpus-side Exchange, ever (VERDICT r5 item
                     3). ``_bn`` is the bucket's distinct-id population
                     PRECOMPUTED at build time, turning the probe-side
                     hot-bucket cap into a pushable filter instead of a
                     per-ingest aggregation. The files are plain
                     parquet, so path-based readers (streaming
                     stream-static joins, a fresh session without the
                     catalog entry) still work — they just don't get
                     the co-location metadata.
    - ``hashes``:    (id, hashes) distinct shingle-hash sets — the
                     exact-jaccard verify side.
    - ``canonical``: (id, root) connected-component labels over the
                     corpus's own near-dup pairs (min-id canonical per
                     cluster; docs in no cluster are absent — readers
                     coalesce to the doc's own id).

    One shingle scan feeds all three (persisted until the writes
    complete). Everything is deterministic, so the artifacts are
    reproducible; the oracle replays build + probe from the raw tables.
    """
    from pyspark import StorageLevel

    from .graph import connected_components

    c_rows = shingle_hash_rows(corpus, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        num = bands * rows
        c_band = minhash_signatures_agg(c_rows, num=num).select(
            "id", F.explode(band_hashes(F.col("sig"), bands, rows)).alias("bh")
        )
        spark = corpus.sparkSession
        tbl = _buckets_table_name(path)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        _hadoop_delete(spark, f"{path}/buckets")
        # _bn via a shuffle join, NOT broadcast: distinct-bh cardinality
        # is O(docs*bands) — a one-time build shuffle is fine, a
        # driver-side broadcast of it at 100 TB is not.
        sizes = c_band.groupBy("bh").agg(F.countDistinct("id").alias("_bn"))
        (
            c_band.join(sizes, "bh")
            .write.mode("overwrite")
            .bucketBy(num_buckets, "bh")
            .sortBy("bh")
            .option("path", f"{path}/buckets")
            .saveAsTable(tbl)
        )
        c_hashed = c_rows.groupBy("id").agg(F.collect_set("h").alias("hashes"))
        c_hashed.write.mode("overwrite").parquet(f"{path}/hashes")

        c_band_r = spark.table(tbl)
        c_hashed_r = spark.read.parquet(f"{path}/hashes")
        buckets = (
            c_band_r.groupBy("bh").agg(F.collect_set("id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        if max_bucket is not None:
            buckets = buckets.filter(F.size("ids") <= max_bucket)
        cand = (
            buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
            .select(
                "id_a",
                F.explode(F.filter("ids", lambda y: y > F.col("id_a"))).alias("id_b"),
            )
            .distinct()
        )
        ha = c_hashed_r.select(F.col("id").alias("id_a"), F.col("hashes").alias("h_a"))
        hb = c_hashed_r.select(F.col("id").alias("id_b"), F.col("hashes").alias("h_b"))
        pairs = (
            cand.join(ha, "id_a")
            .join(hb, "id_b")
            .filter(pround(jaccard_of(F.col("h_a"), F.col("h_b")), 6) >= threshold)
            .select("id_a", "id_b")
        )
        connected_components(pairs).write.mode("overwrite").parquet(
            f"{path}/canonical"
        )
    finally:
        c_rows.unpersist()


def minhash_probe_index(
    batch: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    n: int = 2,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int | None = 100,
) -> DataFrame:
    """Day-2 ingest against a PERSISTED index (``build_minhash_index``):
    the corpus side is two parquet scans — no corpus text is read, no
    corpus shingle is re-hashed. Returns the incremental pair relation
    enriched with the corpus canonical map: (new_id, match_id, match_in,
    canonical_id, jaccard), where canonical_id folds the new doc into
    the existing cluster of its match (the match's own id when the
    match belongs to no cluster).

    The buckets side prefers the bucketed CATALOG table the build
    registered (co-located probe join on ``bh`` — only the small batch
    side shuffles; the stored ``_bn`` makes the hot-bucket cap a pushed
    filter), falling back to the raw parquet path for sessions that
    never ran the build (same rows, no co-location metadata)."""
    spark = batch.sparkSession
    tbl = _buckets_table_name(path)
    c_band = (
        spark.table(tbl)
        if spark.catalog.tableExists(tbl)
        else spark.read.parquet(f"{path}/buckets")
    )
    c_hashed = spark.read.parquet(f"{path}/hashes")
    canon = spark.read.parquet(f"{path}/canonical").select(
        F.col("id").alias("match_id"), F.col("root").alias("_root")
    )
    pairs = minhash_probe_pairs(
        c_band, c_hashed, batch, id_col, text_col, n, bands, rows, threshold, max_bucket
    )
    return (
        pairs.join(F.broadcast(canon), "match_id", "left")
        .select(
            "new_id",
            "match_id",
            "match_in",
            F.coalesce(F.col("_root"), F.col("match_id")).alias("canonical_id"),
            "jaccard",
        )
    )
