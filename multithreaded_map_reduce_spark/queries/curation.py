"""Data-curation operators (§2d tier): the selection steps an LLM
training-data pipeline runs after cleaning/dedup — deterministic
train/holdout splitting, uniform hash sampling, weighted and stratified
sampling, quality-ranked per-language selection, and benchmark
decontamination. All deterministic (hash-based, no rand()), so every
one has an exact DuckDB oracle.

Scale notes: splitting and sampling are stateless scan work — the hash
IS the assignment, so the split is stable under reruns, retries, and
cluster resizes (the property rand()-based splits lack). Bottom-k
sampling uses orderBy+limit, which Spark executes as per-partition
top-k + merge, never a global sort of the corpus. Decontamination
broadcasts the benchmark shingle set (a benchmark is small by
definition) so the corpus-side scan never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import (
    sql_shingle_hashes_from_token_hashes,
    sql_token_hash,
    sql_token_hash_array,
    sql_tokens,
    token_hash,
)
from ..operators.dedup import shingle_hash_rows
from ..sources.catalog import load_table
from .textstats import text_quality

SAMPLE_K = 100
WEIGHT_MOD = 1000  # weighted Bernoulli: P(keep) = n_chars / WEIGHT_MOD
STRATUM_K = 5  # stratified sample size per language
DECON_N = 5  # word-n-gram length for benchmark-overlap decontamination
BENCH_MOD = 10  # docs with doc_id-hash % BENCH_MOD == 0 form the benchmark
_SPLIT = "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END"


def curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment from the md5
    hash of doc_id; per (split, lang) doc counts + char volume."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", F.length("text").alias("_nc"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("_nc").alias("sum_chars"))
    )


def curation_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform deterministic sample: the SAMPLE_K docs with the smallest
    doc_id hash (bottom-k of a uniform hash = a fixed-size uniform
    sample that is stable across runs and mergeable across shards)."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", h.alias("sample_hash"))
        .orderBy(F.asc("sample_hash"), F.asc("doc_id"))
        .limit(SAMPLE_K)
    )


def curation_topk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 documents per language by the composite quality score
    (deterministic doc_id tiebreak) — quality-based corpus selection."""
    q = text_quality(spark, sf_dir).select("doc_id", "quality")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        docs.join(q, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "rank", "doc_id", "quality")
    )


def curation_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sampling: keep a doc with probability
    proportional to its length (``n_chars / WEIGHT_MOD``), decided by
    the doc's own hash — the distributed form of importance-weighted
    corpus sampling. No rand(): the draw is ``hash(doc_id) %
    WEIGHT_MOD``, so the sample is reproducible under retries and
    mergeable across shards (pure scan work, zero shuffles)."""
    docs = load_table(spark, sf_dir, "documents")
    draw = token_hash(F.col("doc_id").cast("string")) % F.lit(WEIGHT_MOD)
    return (
        docs.select("doc_id", "lang", "n_chars", draw.alias("draw"))
        .filter(F.col("draw") < F.col("n_chars"))
    )


def curation_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: exactly ``STRATUM_K`` docs per language —
    the per-stratum bottom-k of a uniform hash (deterministic doc_id
    tiebreak). One shuffle on the stratum key; per-partition top-k
    keeps the sort local."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = token_hash(F.col("doc_id").cast("string"))
    w = W.partitionBy("lang").orderBy(F.asc("sample_hash"), F.asc("doc_id"))
    return (
        docs.withColumn("sample_hash", h)
        .withColumn("strat_rank", F.row_number().over(w))
        .filter(F.col("strat_rank") <= STRATUM_K)
        .select("lang", "strat_rank", "doc_id", "sample_hash")
    )


def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    ``DECON_N``-gram with a held-out benchmark set (docs whose id-hash
    lands in bucket 0) — the n-gram-overlap check LLM pipelines run
    before training. Per corpus doc: distinct shingle count, how many
    of those shingles appear anywhere in the benchmark, and the 0/1
    contamination flag.

    Scale: the benchmark shingle set is broadcast (benchmarks are tiny
    vs the corpus), so the corpus side is a single scan + broadcast
    hash join + per-doc aggregation — no shuffle of corpus text. The
    shingle stage is the same fully-codegen'd zip-at-explode pipeline
    minhash uses (operators/dedup.py shingle_hash_rows)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % F.lit(BENCH_MOD)
    bench_sh = (
        shingle_hash_rows(docs.filter(bucket == 0), "doc_id", "text", n=DECON_N)
        .select("h")
        .distinct()
        .withColumn("_hit", F.lit(1).cast("long"))
    )
    corpus_sh = shingle_hash_rows(
        docs.filter(bucket != 0), "doc_id", "text", n=DECON_N
    ).distinct()
    return (
        corpus_sh.join(F.broadcast(bench_sh), "h", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0).cast("long"))).alias("n_overlap"),
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap") > 0).cast("int").alias("contaminated"),
        )
    )


PACK_BUDGET = 512  # tokens per packed sequence bin


def curation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign docs to fixed-token-budget bins for
    pretraining batch construction. Deterministic streaming form: docs
    in doc_id order, each bin is the docs whose running-token-total
    starts in the same ``PACK_BUDGET`` window (docs may straddle a
    boundary — the tokenizer's BOS/EOS handling truncates, as in
    packed-sequence pipelines). Pure integer math: one token-count
    scan + one running-sum window.

    Scale: a single global ordering window is a scale anti-pattern; at
    100 TB the same construction runs per shard/partition (pack within
    partitions, one partial bin per partition boundary) — packing needs
    no global order, only determinism, so partition-local windows with
    the partition id in the bin key scale linearly. The query keeps the
    global form because the gate compares totals exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .alias("n_tokens"),
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    packed = toks.withColumn("cum", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "n_tokens",
        # integer division, NOT double-div + cast: Spark casts truncate
        # but DuckDB CAST rounds-to-nearest — div/" // " agree exactly
        F.expr(f"(cum - n_tokens) div {PACK_BUDGET}").alias("bin"),
    )
    return packed.groupBy("bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


QUERIES = {
    "curation_split": curation_split,
    "curation_sample_bottomk": curation_sample_bottomk,
    "curation_topk_quality": curation_topk_quality,
    "curation_sample_weighted": curation_sample_weighted,
    "curation_stratified": curation_stratified,
    "curation_decontaminate": curation_decontaminate,
    "curation_pack": curation_pack,
}

_H = sql_token_hash("CAST(doc_id AS VARCHAR)")

ORACLES = {
    "curation_split": f"""
        SELECT {_SPLIT} AS split, lang,
               count(*) AS n_docs,
               CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_chars
        FROM (SELECT ({_H}) % 100 AS bucket, lang, text FROM documents)
        GROUP BY 1, 2
    """,
    "curation_sample_bottomk": f"""
        SELECT doc_id, {_H} AS sample_hash
        FROM documents
        ORDER BY sample_hash ASC, doc_id ASC
        LIMIT {SAMPLE_K}
    """,
    # reuses the text_quality oracle pipeline, joined back to lang
    "curation_topk_quality": None,  # filled below from textstats
    "curation_sample_weighted": f"""
        SELECT doc_id, lang, n_chars, draw FROM (
            SELECT doc_id, lang, n_chars, ({_H}) % {WEIGHT_MOD} AS draw
            FROM documents
        ) WHERE draw < n_chars
    """,
    "curation_stratified": f"""
        SELECT lang, strat_rank, doc_id, sample_hash FROM (
            SELECT lang,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY sample_hash ASC, doc_id ASC
                   ) AS INTEGER) AS strat_rank,
                   doc_id, sample_hash
            FROM (SELECT doc_id, lang, {_H} AS sample_hash FROM documents)
        ) WHERE strat_rank <= {STRATUM_K}
    """,
    "curation_decontaminate": f"""
        WITH th AS (
            SELECT doc_id AS id, ({_H}) % {BENCH_MOD} AS bucket,
                   {sql_token_hash_array(sql_tokens('text'))} AS th
            FROM documents
            WHERE length(text) > 0 AND len({sql_tokens('text')}) > 0
        ), sh AS (
            SELECT id, bucket,
                   unnest({sql_shingle_hashes_from_token_hashes('th', DECON_N)}) AS h
            FROM th
        ), bench AS (
            SELECT DISTINCT h FROM sh WHERE bucket = 0
        )
        SELECT c.id AS doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_overlap,
               CAST(CASE WHEN sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) > 0
                    THEN 1 ELSE 0 END AS INTEGER) AS contaminated
        FROM (SELECT id, h FROM sh WHERE bucket != 0) c
        LEFT JOIN bench b ON c.h = b.h
        GROUP BY c.id
    """,
    "curation_pack": rf"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                        t -> t != '')) AS INTEGER) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT doc_id, n_tokens,
                   (CAST(sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    - n_tokens) // {PACK_BUDGET} AS bin
            FROM toks
        )
        SELECT bin, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM packed GROUP BY bin
    """,
}

from .textstats import ORACLES as _TS_ORACLES  # noqa: E402

ORACLES["curation_topk_quality"] = f"""
    WITH quality AS ({_TS_ORACLES["text_quality"]})
    SELECT lang, rank, doc_id, quality FROM (
        SELECT d.lang,
               CAST(row_number() OVER (
                   PARTITION BY d.lang ORDER BY q.quality DESC, q.doc_id ASC
               ) AS INTEGER) AS rank,
               q.doc_id, q.quality
        FROM quality q JOIN documents d ON q.doc_id = d.doc_id
    ) WHERE rank <= 3
"""


NEG_POOL = 64  # in-batch negative pool size
NEG_K = 4      # negatives per anchor
# affine mixers for the per-(anchor, slot) pool pick — fixed, shared
NEG_A = 48_271
NEG_C = 16_807


def curation_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive
    training: a NEG_POOL-doc pool (bottom-k by portable hash — the
    mergeable uniform sample) is ranked and BROADCAST; every anchor doc
    then picks NEG_K pool slots by exact integer mixing of
    (anchor id, slot), shifting by one when the pick collides with the
    anchor itself. (anchor, slot, negative) triples are fully
    replayable — sampling with a hash, not rand(), so retries and
    resizes can never change the training set.

    Scale: the pool build sorts NEG_POOL winners (a TakeOrdered, no
    global sort); anchors never shuffle — one broadcast join on the
    computed slot, one scan over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash(F.col("doc_id").cast("string"))
    pool = (
        docs.select("doc_id", h.alias("_h"))
        .orderBy(F.asc("_h"), F.asc("doc_id"))
        .limit(NEG_POOL)
    )
    w = W.orderBy(F.asc("_h"), F.asc("doc_id"))
    ranked = pool.select(
        (F.row_number().over(w) - 1).alias("slot"),
        F.col("doc_id").alias("neg_id"),
    )
    anchors = docs.select(F.col("doc_id").alias("anchor_id")).withColumn(
        "j", F.explode(F.array(*[F.lit(j) for j in range(NEG_K)]))
    )
    slot = F.pmod(
        F.col("anchor_id") * F.lit(NEG_A) + F.col("j") * F.lit(NEG_C) + F.lit(7),
        F.lit(NEG_POOL),
    )
    picked = anchors.withColumn("slot", slot).join(F.broadcast(ranked), "slot")
    # collision with the anchor → take the next slot (mod pool)
    fixed = (
        picked.withColumn(
            "slot2", F.when(F.col("neg_id") == F.col("anchor_id"),
                            (F.col("slot") + 1) % F.lit(NEG_POOL))
        )
        .drop("neg_id")
        .join(
            F.broadcast(ranked.select(F.col("slot").alias("slot2"),
                                      F.col("neg_id").alias("neg2"))),
            "slot2",
            "left",
        )
    )
    base = picked.filter(F.col("neg_id") != F.col("anchor_id")).select(
        "anchor_id", "j", "neg_id"
    )
    shifted = fixed.filter(F.col("slot2").isNotNull()).select(
        "anchor_id", "j", F.col("neg2").alias("neg_id")
    )
    return base.unionByName(shifted)


QUERIES["curation_negatives"] = curation_negatives

ORACLES["curation_negatives"] = f"""
    WITH pool AS (
        SELECT doc_id, {_H} AS _h FROM documents
        ORDER BY _h ASC, doc_id ASC LIMIT {NEG_POOL}
    ), ranked AS (
        SELECT row_number() OVER (ORDER BY _h ASC, doc_id ASC) - 1 AS slot,
               doc_id AS neg_id
        FROM pool
    ), anchors AS (
        SELECT doc_id AS anchor_id, j
        FROM documents, (SELECT unnest(range({NEG_K})) AS j)
    ), picked AS (
        SELECT a.anchor_id, a.j,
               ((a.anchor_id * {NEG_A} + a.j * {NEG_C} + 7) % {NEG_POOL}
                + {NEG_POOL}) % {NEG_POOL} AS slot
        FROM anchors a
    ), joined AS (
        SELECT p.anchor_id, p.j, p.slot, r.neg_id
        FROM picked p JOIN ranked r USING (slot)
    )
    SELECT anchor_id, CAST(j AS INTEGER) AS j, neg_id FROM joined
    WHERE neg_id != anchor_id
    UNION ALL
    SELECT jo.anchor_id, CAST(jo.j AS INTEGER) AS j, r2.neg_id
    FROM joined jo JOIN ranked r2 ON r2.slot = (jo.slot + 1) % {NEG_POOL}
    WHERE jo.neg_id = jo.anchor_id
"""


# --- temperature-scaled source mixing ----------------------------------------

MIX_ALPHA_NUM, MIX_ALPHA_DEN = 1, 2  # alpha = 1/2 (temperature sampling)
MIX_BUDGET_PCT = 30  # total sample budget = 30% of corpus


def curation_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing (the Pile / multilingual-LM
    recipe): per-source quotas m_s ∝ n_s^alpha with alpha = 1/2, so
    small sources are up-weighted relative to proportional sampling,
    then an exact-quota deterministic draw per source.

    Exactness: n^(1/2) is computed as floor(sqrt(n)) — IEEE sqrt is
    correctly rounded and n ≪ 2^52, so the floor is the true integer
    sqrt on both engines; everything downstream (quota = B·w_s/Σw
    integer division, per-source bottom-m_s by md5 hash) is pure
    integer/hash arithmetic. No float ever crosses an engine boundary.

    Scale: source stats are one tiny map-side-combined aggregate; the
    quota table (|sources| rows) broadcasts back; the draw is a
    per-source bottom-k window — one shuffle on the source key, with
    the same skew characteristics as any stratified sample (a giant
    source means a giant stratum; cap or salt if a single source
    dominates a 100 TB corpus)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = stats.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long").alias("w"),
    )
    totals = w.agg(
        F.sum("w").alias("sum_w"), F.sum("n_docs").alias("n_total")
    )
    # integer `div` end to end: Spark cast(long) truncates while DuckDB
    # CAST AS BIGINT rounds, so float-then-cast would diverge on .5s
    quota = w.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        F.expr(
            f"(n_total * {MIX_BUDGET_PCT} div 100) * w div sum_w"
        ).alias("quota"),
    )
    win = W.partitionBy("source").orderBy(F.asc("draw_hash"), F.asc("doc_id"))
    drawn = (
        docs.withColumn(
            "draw_hash", token_hash(F.concat(F.lit("mix"), F.col("doc_id").cast("string")))
        )
        .join(F.broadcast(quota), "source")
        .withColumn("draw_rank", F.row_number().over(win))
        .filter(F.col("draw_rank") <= F.col("quota"))
    )
    return drawn.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("n_docs").alias("n_docs"),
        F.min("quota").alias("quota"),
        F.sum("doc_id").alias("id_checksum"),
    )


QUERIES["curation_mixture"] = curation_mixture

_MIX_H = sql_token_hash("'mix' || CAST(doc_id AS VARCHAR)")

ORACLES["curation_mixture"] = f"""
    WITH stats AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
    ), w AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w
        FROM stats
    ), totals AS (
        SELECT CAST(sum(w) AS BIGINT) AS sum_w,
               CAST(sum(n_docs) AS BIGINT) AS n_total
        FROM w
    ), quota AS (
        SELECT source, n_docs,
               (n_total * {MIX_BUDGET_PCT} // 100) * w // sum_w AS quota
        FROM w, totals
    ), drawn AS (
        SELECT d.source, d.doc_id, q.n_docs, q.quota,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY {_MIX_H} ASC, d.doc_id ASC) AS draw_rank
        FROM documents d JOIN quota q USING (source)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sampled,
           min(n_docs) AS n_docs,
           min(quota) AS quota,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM drawn WHERE draw_rank <= quota GROUP BY 1
"""


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def curation_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split every document into overlapping
    fixed-token-budget chunks (64 tokens, stride 48 → 16-token overlap)
    — the step that turns a raw corpus into model-ingestible sequences
    when documents exceed the training context length. Chunk count is
    pure integer math (``1 + ceil((n-C)/S)`` for n > C, else 1), chunk
    boundaries come from sequence+slice (codegen'd, no UDF), and the
    chunk text itself is under the gate, not just counts.

    100 TB: embarrassingly parallel — one projection per doc, no
    shuffle at all (the explode multiplies rows in place); output size
    is bounded by ``n/S`` chunks per doc. The oracle replays the same
    slicing with DuckDB list_slice/generate_series.
    """
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    t = (
        docs.select("doc_id", tokenize(F.col("text")).alias("toks"))
        .filter(F.size("toks") > 0)
    )
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    n_chunks = F.expr(
        f"CASE WHEN size(toks) <= {c} THEN 1"
        f" ELSE (size(toks) - {c} + {s - 1}) div {s} + 1 END"
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    exploded = t.select(
        "doc_id",
        F.posexplode(
            F.transform(starts, lambda i: F.slice(F.col("toks"), i * s + 1, c))
        ).alias("chunk_idx", "chunk"),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("chunk").cast("long").alias("n_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


QUERIES["curation_chunk"] = curation_chunk

ORACLES["curation_chunk"] = f"""
    WITH t AS (
        SELECT doc_id, {sql_tokens('text')} AS toks
        FROM documents WHERE len({sql_tokens('text')}) > 0
    ), n AS (
        SELECT doc_id, toks,
               CASE WHEN len(toks) <= {CHUNK_TOKENS} THEN 1
                    ELSE (len(toks) - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1})
                         // {CHUNK_STRIDE} + 1 END AS k
        FROM t
    ), e AS (
        SELECT doc_id, toks, unnest(generate_series(0, k - 1)) AS i FROM n
    )
    SELECT doc_id,
           i AS chunk_idx,
           len(list_slice(toks, i * {CHUNK_STRIDE} + 1,
                          i * {CHUNK_STRIDE} + {CHUNK_TOKENS})) AS n_tokens,
           array_to_string(list_slice(toks, i * {CHUNK_STRIDE} + 1,
                                      i * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
               AS chunk_text
    FROM e
"""


CB_PER_CLUSTER = 40  # exact per-cluster budget


def curation_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced selection — the diversity-preserving subset a
    training mix wants when one mode dominates: k-means clusters the
    embedding space (the exact-integer trainer from operators/kmeans),
    then EXACTLY ``CB_PER_CLUSTER`` vectors are drawn per cluster by
    deterministic hash rank (clusters smaller than the budget
    contribute everything). Output: per cluster, the draw count and an
    order-independent id checksum of the selection — the manifest a
    downstream dataloader consumes.

    Scale: the draw is one row_number window per cluster over hash
    order (same rail as curation_stratified); the clustering cost is
    kmeans itself. Composes two verified pipelines into one — the
    oracle replays the full chain (unrolled Lloyd CTEs + hash ranking),
    so the COMPOSITION is differentially pinned too."""
    from ..operators.kmeans import kmeans_assign
    from .similarity import KM_ITERS, KM_K

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb, "vec_id", "embedding", k=KM_K, iters=KM_ITERS)
    drawn = (
        assigned.withColumn(
            "draw_hash",
            token_hash(F.concat(F.lit("cb"), F.col("id").cast("string"))),
        )
        .withColumn(
            "draw_rank",
            F.row_number().over(
                W.partitionBy("cluster").orderBy(F.asc("draw_hash"), F.asc("id"))
            ),
        )
        .filter(F.col("draw_rank") <= CB_PER_CLUSTER)
    )
    return drawn.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_drawn"),
        F.sum(F.col("id") % 1_000_003).alias("id_checksum"),
    )


QUERIES["curation_cluster_balanced"] = curation_cluster_balanced


def _cb_oracle() -> str:
    from .similarity import KM_ITERS, KM_K, _sql_kmeans

    base = _sql_kmeans(KM_K, KM_ITERS)
    tail = f"""
        SELECT vec_id, cluster, dist AS dist_sq_iu FROM s{KM_ITERS}"""
    assert base.endswith(tail)
    h = sql_token_hash("'cb' || CAST(vec_id AS VARCHAR)")
    return base[: -len(tail)] + f""", ranked AS (
            SELECT vec_id, cluster,
                   row_number() OVER (
                       PARTITION BY cluster
                       ORDER BY {h} ASC, vec_id ASC) AS draw_rank
            FROM s{KM_ITERS}
        )
        SELECT cluster, count(*) AS n_drawn,
               CAST(sum(vec_id % 1000003) AS BIGINT) AS id_checksum
        FROM ranked WHERE draw_rank <= {CB_PER_CLUSTER}
        GROUP BY 1
    """


ORACLES["curation_cluster_balanced"] = _cb_oracle()


# ------------------------------------------------------- leak-proof split
# A plain hash-of-doc_id split (curation_split) leaks: two near-duplicate
# documents can land one in train, one in test, and the eval is
# contaminated. The leak-proof split assigns WHOLE near-dup clusters:
# every doc is labeled with its minhash-LSH connected-component canonical
# id (docs with no near-dup are their own cluster), and the train/valid/
# test hash is taken over the CANONICAL id — so a cluster can never
# straddle a split boundary. 100 TB: reuses the minhash pipeline +
# O(log n) label propagation verbatim; the extra cost over curation_split
# is one left join of docs against the (small) clustered-doc relation.


def curation_split_leakproof(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 OPT: the near-dup labeling is the IDENTICAL pairs→closure
    # chain dedup_clusters runs (same shingle/band/threshold params) —
    # ride the shared _dup_components artifact instead of re-running
    # the full minhash + iterative closure per call
    from .dedup import _dup_components

    docs = load_table(spark, sf_dir, "documents")
    cc = _dup_components(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("canonical_id").alias("root")
    )
    labeled = (
        docs.select("doc_id")
        .join(cc, docs.doc_id == cc.id, "left")
        .select(
            "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("canonical_id")
        )
    )
    bucket = token_hash(F.col("canonical_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return labeled.select("doc_id", "canonical_id", split.alias("split"))


QUERIES["curation_split_leakproof"] = curation_split_leakproof

from .dedup import _MH_CTES as _MH  # noqa: E402

_CANON_H = sql_token_hash("CAST(canonical_id AS VARCHAR)")

ORACLES["curation_split_leakproof"] = f"""
    WITH RECURSIVE {_MH}, nodes AS (
        SELECT id_a AS id FROM mh_pairs UNION SELECT id_b FROM mh_pairs
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM mh_pairs
        UNION SELECT id_b, id_a FROM mh_pairs
    ), reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), roots AS (
        SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a
    ), labeled AS (
        SELECT d.doc_id, coalesce(r.canonical_id, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN roots r ON d.doc_id = r.doc_id
    )
    SELECT doc_id, canonical_id,
           CASE WHEN ({_CANON_H}) % 100 < 80 THEN 'train'
                WHEN ({_CANON_H}) % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM labeled
"""


# --------------------------------------- A-ES weighted sample (exact k)
# curation_sample_weighted is Bernoulli (random SIZE, one pass);
# Efraimidis–Spirakis gives the other contract a curation pipeline
# needs: EXACTLY k docs, each with probability proportional to its
# weight, WITHOUT replacement — rank every doc by -ln(u)/w for a
# uniform u and keep the k smallest. u comes from the portable doc-id
# hash ((h+1)/M ∈ (0, 1]), so the draw is deterministic, mergeable
# across shards (a TakeOrdered of per-shard top-ks — no global sort),
# and bit-replayable by the oracle: both engines evaluate the identical
# double expression, and the output snaps the key to integer 1e-9
# units. Weight = n_chars (longer docs proportionally likelier).

AES_K = 50


def curation_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits
    from ..functions.hashing import POLY_MOD

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (token_hash(F.col("doc_id").cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(POLY_MOD))
    key = -F.log(u) / F.col("n_chars").cast("double")
    ranked = docs.select(
        "doc_id", "n_chars", key.alias("_key")
    ).orderBy(F.asc("_key"), F.asc("doc_id")).limit(AES_K)
    w = W.orderBy(F.asc("_key"), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "n_chars", iunits(F.col("_key"), 9).alias("key_units"), "rank")
    )


QUERIES["curation_sample_aes"] = curation_sample_aes

from ..functions.hashing import POLY_MOD as _PM  # noqa: E402

_AES_KEY = (
    f"(-ln(CAST(({_H}) + 1 AS DOUBLE) / {float(_PM)})"
    " / CAST(n_chars AS DOUBLE))"
)

ORACLES["curation_sample_aes"] = f"""
    SELECT doc_id, n_chars,
           CAST(floor(({_AES_KEY}) * 1000000000.0 + 0.5) AS BIGINT) AS key_units,
           rank
    FROM (
        SELECT doc_id, n_chars,
               CAST(row_number() OVER (ORDER BY {_AES_KEY} ASC, doc_id ASC)
                    AS INTEGER) AS rank
        FROM documents WHERE n_chars > 0
    ) WHERE rank <= {AES_K}
"""


# --------------------------------------------- round-robin interleave
# Training-ORDER scheduling: mixture quotas (curation_mixture) say how
# MUCH of each source to take; the interleave says in what ORDER — a
# deterministic 1:1 round-robin so no long single-source run biases
# early training. Within each source docs are ranked by the portable
# doc-id hash (a shuffled-but-reproducible order); global slot =
# within-source-rank × n_sources + source-index. Exhausted sources
# leave gaps that the final dense re-rank closes. All integer
# arithmetic; the oracle replays slot assignment exactly. 100 TB: one
# per-source window (key = source, the natural partition), a broadcast
# source-index relation, and a TakeOrdered head — no global sort.

INTERLEAVE_TOPK = 60


def curation_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    srcs = (
        docs.select("source")
        .distinct()
        .withColumn(
            "src_idx",
            F.row_number().over(W.orderBy(F.asc("source"))) - F.lit(1),
        )
    )
    n_src = srcs.count()
    h = token_hash(F.col("doc_id").cast("string"))
    wr = W.partitionBy("source").orderBy(F.asc("_h"), F.asc("doc_id"))
    ranked = (
        docs.select("doc_id", "source", h.alias("_h"))
        .withColumn("src_rank", F.row_number().over(wr) - F.lit(1))
        .join(F.broadcast(srcs), "source")
        .withColumn(
            "slot", F.col("src_rank") * F.lit(n_src) + F.col("src_idx")
        )
    )
    head = ranked.orderBy(F.asc("slot")).limit(INTERLEAVE_TOPK)
    wo = W.orderBy(F.asc("slot"))
    return head.select(
        F.row_number().over(wo).cast("int").alias("position"),
        "doc_id",
        "source",
        F.col("src_rank").cast("long").alias("src_rank"),
    )


QUERIES["curation_interleave"] = curation_interleave

ORACLES["curation_interleave"] = f"""
    WITH srcs AS (
        SELECT source,
               CAST(row_number() OVER (ORDER BY source ASC) AS BIGINT) - 1
                   AS src_idx,
               (SELECT count(DISTINCT source) FROM documents) AS n_src
        FROM (SELECT DISTINCT source FROM documents)
    ), ranked AS (
        SELECT d.doc_id, d.source,
               CAST(row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY ({_H}) ASC, d.doc_id ASC
               ) AS BIGINT) - 1 AS src_rank
        FROM documents d
    ), slotted AS (
        SELECT ranked.doc_id, ranked.source, ranked.src_rank,
               ranked.src_rank * srcs.n_src + srcs.src_idx AS slot
        FROM ranked JOIN srcs USING (source)
    )
    SELECT CAST(row_number() OVER (ORDER BY slot ASC) AS INTEGER) AS position,
           doc_id, source, src_rank
    FROM (SELECT * FROM slotted ORDER BY slot ASC LIMIT {INTERLEAVE_TOPK})
"""


# ---------------------------------------------- end-to-end pipeline
# The whole curation run as ONE differentially-verified gate entry —
# the "a user can run their actual pipeline" demonstration:
#   1. exact dedup (min-doc_id survivor per identical text),
#   2. quality filter (text_quality's composite score ≥ 0.5 — the raw
#      double, bit-equal across engines since every input is an exact
#      integer ratio),
#   3. leak-proof split (near-dup clusters from the FULL corpus, so
#      filtering can never split a duplicate family across train/test),
#   4. per-split accounting: docs, exact token and char volumes.
# The oracle chains all four stages (dedup CTE → quality CTEs → the
# minhash + recursive-closure CTEs → split hash → aggregate), so the
# COMPOSITION is under the hash check, not just each stage. Scale: the
# union of rails already argued for the pieces; no new shuffle shapes.

PIPE_QUALITY_MIN = 0.5


def curation_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize
    from .dedup import _dup_components
    from .textstats import _PUNCT_RE, _ALL_STOPS, _stop_count

    docs = load_table(spark, sf_dir, "documents")
    survivors = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    kept = docs.join(survivors.select("doc_id"), "doc_id")

    toks = tokenize(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    stop_ratio = F.when(
        n_tokens > 0, _stop_count(toks, _ALL_STOPS).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0,
        F.regexp_count("text", F.lit(_PUNCT_RE)).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
    )
    filtered = kept.withColumn("_q", quality).filter(
        F.col("_q") >= PIPE_QUALITY_MIN
    )

    # r13 OPT: ride the shared _dup_components artifact (the identical
    # dedup_clusters chain) instead of re-running pairs + closure
    cc = _dup_components(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("canonical_id").alias("root")
    )
    labeled = filtered.join(cc, filtered.doc_id == cc.id, "left").select(
        "doc_id",
        "text",
        F.coalesce(F.col("root"), F.col("doc_id")).alias("canonical_id"),
    )
    bucket = token_hash(F.col("canonical_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        labeled.select(
            split.alias("split"),
            F.size(tokenize(F.col("text"))).cast("long").alias("_nt"),
            F.length("text").cast("long").alias("_nc"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("sum_tokens"),
            F.sum("_nc").alias("sum_chars"),
        )
    )


QUERIES["curation_pipeline_report"] = curation_pipeline_report

from .textstats import _ALL_STOPS as _AS  # noqa: E402
from .textstats import _PUNCT_RE as _PR  # noqa: E402
from .textstats import _sql_stop_count as _ssc  # noqa: E402

ORACLES["curation_pipeline_report"] = f"""
    WITH RECURSIVE {_MH}, nodes AS (
        SELECT id_a AS id FROM mh_pairs UNION SELECT id_b FROM mh_pairs
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM mh_pairs
        UNION SELECT id_b, id_a FROM mh_pairs
    ), reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), roots AS (
        SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a
    ), survivors AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    ), kept AS (
        SELECT d.* FROM documents d JOIN survivors USING (doc_id)
    ), scored AS (
        SELECT doc_id, text,
               CASE WHEN len({sql_tokens('text')}) > 0
                    THEN CAST({_ssc(_AS)} AS DOUBLE) / len({sql_tokens('text')})
                    ELSE 0.0 END AS stop_ratio,
               CASE WHEN length(text) > 0
                    THEN CAST(len(regexp_extract_all(text, '{_PR}')) AS DOUBLE)
                         / length(text)
                    ELSE 0.0 END AS punct_ratio,
               len({sql_tokens('text')}) AS n_tokens
        FROM kept
    ), filtered AS (
        SELECT doc_id, text, n_tokens FROM scored
        WHERE 0.4 * stop_ratio + 0.3 * (1.0 - punct_ratio)
              + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)
              >= {PIPE_QUALITY_MIN}
    ), labeled AS (
        SELECT f.doc_id, f.text, f.n_tokens,
               coalesce(r.canonical_id, f.doc_id) AS canonical_id
        FROM filtered f LEFT JOIN roots r ON f.doc_id = r.doc_id
    )
    SELECT CASE WHEN ({_CANON_H}) % 100 < 80 THEN 'train'
                WHEN ({_CANON_H}) % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars
    FROM labeled
    GROUP BY 1
"""


# ----------------------------------- leak-proof split, persisted canon
# The day-2 face of curation_split_leakproof (VERDICT r4 item 3): at
# 100 TB the canonical-id map is a maintained artifact — rebuilt when
# the corpus changes, not per split job. This query consumes the map
# from the persisted full-corpus dedup index (queries/dedup.py
# _minhash_index_path(scope='full'); one parquet scan + broadcast-size
# left join) and must produce BIT-IDENTICAL splits to the inline
# recompute — it shares curation_split_leakproof's oracle, so the
# storage round trip itself is under the differential gate.


def curation_split_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _minhash_index_path

    path = _minhash_index_path(spark, sf_dir, scope="full")
    canon = spark.read.parquet(f"{path}/canonical")
    docs = load_table(spark, sf_dir, "documents")
    labeled = (
        docs.select("doc_id")
        .join(canon, docs.doc_id == canon.id, "left")
        .select(
            "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("canonical_id")
        )
    )
    bucket = token_hash(F.col("canonical_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return labeled.select("doc_id", "canonical_id", split.alias("split"))


QUERIES["curation_split_persisted"] = curation_split_persisted

ORACLES["curation_split_persisted"] = ORACLES["curation_split_leakproof"]


# --------------------------------------- DSIR importance resampling
# Data Selection with Importance Resampling (Xie et al. 2023): pick raw
# docs whose hashed-n-gram feature distribution looks like a TARGET
# domain. Target here = source 'src0'; raw pool = everything else;
# features = hashed UNIGRAMS (token_hash % DSIR_BUCKETS). Two add-one-
# smoothed bucket LMs (target p, raw q) give each raw doc a log
# importance weight Σ_tokens [ln p(b) − ln q(b)]; Gumbel-top-k on the
# weight (deterministic Gumbel from the doc-id hash — the same
# portable-u trick as A-ES) draws DSIR_K docs ∝ softmax(log w) without
# replacement. Determinism discipline: per-BUCKET log-ratio snapped to
# integer nano-units once (B rows), per-doc weight is an exact integer
# sum; the only doubles are the final key = logw + gumbel, snapped to
# units for the output. Scale: the bucket LMs are two B-row broadcast
# relations built by one token scan each; per-doc scoring is one
# map-side join + integer agg; top-k is TakeOrdered — no global sort,
# and B (not vocabulary size) bounds every dense relation, which is the
# entire point of DSIR's hashed features at 100 TB.

DSIR_TARGET_SRC = "src0"
DSIR_BUCKETS = 64
DSIR_K = 40


def curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import POLY_MOD
    from ..functions.rounding import from_iunits, iunits
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    b = token_hash(F.col("tok")) % F.lit(DSIR_BUCKETS)
    terms = docs.select(
        "doc_id",
        "source",
        F.explode(tokenize(F.col("text"))).alias("tok"),
    ).select("doc_id", "source", b.alias("b"))
    # r13 OPT: THREE consumers (target LM, non-target LM, per-doc
    # weight sum) each re-ran the tokenize explode. One (doc, source,
    # bucket)-grain count aggregate feeds all three exactly: bucket
    # counts are Σc, token totals are Σc, and the per-doc log-weight
    # Σ lr over occurrences equals Σ c·lr over buckets (integer
    # multiply — bit-identical).
    docb = (
        terms.groupBy("doc_id", "source", "b")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )

    spine = spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))

    def bucket_lm(t: DataFrame, name: str) -> DataFrame:
        cnt = t.groupBy("b").agg(F.sum("c").alias("c"))
        tot = t.select(F.coalesce(F.sum("c"), F.lit(0)).alias("n"))
        return (
            spine.join(cnt, "b", "left")
            .crossJoin(tot)
            .select(
                "b",
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("n") + F.lit(DSIR_BUCKETS)).cast("double")
                ).alias(name),
            )
        )

    p = bucket_lm(docb.filter(F.col("source") == DSIR_TARGET_SRC), "lp")
    q = bucket_lm(docb.filter(F.col("source") != DSIR_TARGET_SRC), "lq")
    ratio = p.join(q, "b").select(
        "b", iunits(F.col("lp") - F.col("lq"), 9).alias("lr_units")
    )

    raw_terms = docb.filter(F.col("source") != DSIR_TARGET_SRC)
    logw = (
        raw_terms.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("lr_units")).alias("logw_units"),
            F.sum("c").alias("n_tokens"),
        )
    )
    u = (token_hash(F.concat(F.lit("dsir"), F.col("doc_id").cast("string"))) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(POLY_MOD))
    key = from_iunits(F.col("logw_units"), 9) - F.log(-F.log(u))
    ranked = (
        logw.select("doc_id", "logw_units", "n_tokens", key.alias("_key"))
        .orderBy(F.desc("_key"), F.asc("doc_id"))
        .limit(DSIR_K)
    )
    w = W.orderBy(F.desc("_key"), F.asc("doc_id"))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id",
        "n_tokens",
        "logw_units",
        iunits(F.col("_key"), 9).alias("key_units"),
        "rank",
    )


QUERIES["curation_dsir"] = curation_dsir

from ..functions.rounding import (  # noqa: E402
    sql_from_iunits as _sql_from_iu,
    sql_iunits as _sql_iu,
)
from ..functions.hashing import POLY_MOD as _POLY_MOD  # noqa: E402

_DSIR_B = f"({sql_token_hash('tok')} % {DSIR_BUCKETS})"
_DSIR_U = (
    f"(CAST({sql_token_hash(chr(39) + 'dsir' + chr(39) + ' || CAST(doc_id AS VARCHAR)')}"
    f" + 1 AS DOUBLE) / {float(_POLY_MOD)})"
)

ORACLES["curation_dsir"] = f"""
    WITH terms AS (
        SELECT doc_id, source, {_DSIR_B} AS b FROM (
            SELECT doc_id, source, unnest({sql_tokens('text')}) AS tok
            FROM documents
        )
    ), spine AS (
        SELECT unnest(range(0, {DSIR_BUCKETS})) AS b
    ), pc AS (
        SELECT b, count(*) AS c FROM terms
        WHERE source = '{DSIR_TARGET_SRC}' GROUP BY b
    ), pn AS (
        SELECT count(*) AS n FROM terms WHERE source = '{DSIR_TARGET_SRC}'
    ), qc AS (
        SELECT b, count(*) AS c FROM terms
        WHERE source != '{DSIR_TARGET_SRC}' GROUP BY b
    ), qn AS (
        SELECT count(*) AS n FROM terms WHERE source != '{DSIR_TARGET_SRC}'
    ), lm AS (
        SELECT spine.b,
               {_sql_iu(
                   f"ln(CAST(coalesce(pc.c, 0) + 1 AS DOUBLE)"
                   f" / CAST(pn.n + {DSIR_BUCKETS} AS DOUBLE))"
                   f" - ln(CAST(coalesce(qc.c, 0) + 1 AS DOUBLE)"
                   f" / CAST(qn.n + {DSIR_BUCKETS} AS DOUBLE))", 9)} AS lr_units
        FROM spine LEFT JOIN pc USING (b) LEFT JOIN qc USING (b), pn, qn
    ), logw AS (
        SELECT doc_id,
               CAST(sum(lr_units) AS BIGINT) AS logw_units,
               count(*) AS n_tokens
        FROM terms JOIN lm USING (b)
        WHERE source != '{DSIR_TARGET_SRC}'
        GROUP BY doc_id
    ), keyed AS (
        SELECT doc_id, n_tokens, logw_units,
               {_sql_from_iu('logw_units', 9)} - ln(-ln({_DSIR_U})) AS _key
        FROM logw
    )
    SELECT doc_id, n_tokens, logw_units,
           {_sql_iu('_key', 9)} AS key_units, rank
    FROM (
        SELECT *, CAST(row_number() OVER (ORDER BY _key DESC, doc_id ASC)
                       AS INTEGER) AS rank
        FROM keyed
    ) WHERE rank <= {DSIR_K}
"""


# --------------------------------------- greedy coverage coreset
# Submodular data selection (facility-location/max-coverage family):
# pick GREEDY_K docs, each round taking the doc with the largest number
# of shingle hashes NOT yet covered by earlier picks — the classic
# (1 − 1/e) greedy for max coverage, i.e. "which k docs summarize the
# corpus best". Iterative-operator discipline (bpe_train precedent):
# fixed rounds, ONE scalar argmax collected per round, exact integer
# gains, and an oracle that unrolls the identical chain as CTEs —
# tie-break min doc_id, docs with zero marginal gain drop out of the
# argmax on both engines by construction (no rows survive the
# anti-join). 100 TB: the shingle relation is computed once and
# persisted; each round is one anti-join + count per doc (broadcast
# covered-set, bounded by k · max-doc-shingles) + a TakeOrdered(1).

GREEDY_K = 5


def curation_coverage_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shared distinct (id, h) bigram-shingle artifact — the same
    # relation the dedup prefix-filter family starts from (VERDICT r9
    # item 1: ONE deliberate module-level materialization instead of a
    # per-query persist leak)
    from .dedup import _shared_shingle_rows

    h = _shared_shingle_rows(spark, sf_dir)
    covered = h.select("h").filter(F.lit(False))  # empty, typed
    picks: list[tuple[int, int, int, int]] = []
    n_covered = 0
    for rnd in range(1, GREEDY_K + 1):
        gains = (
            h.join(covered, "h", "left_anti")
            .groupBy("id")
            .agg(F.count("*").alias("gain"))
        )
        top = gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()
        if not top:  # corpus fully covered — return picks so far
            break
        pick_id, gain = top[0]["id"], top[0]["gain"]
        n_covered += gain
        picks.append((rnd, pick_id, gain, n_covered))
        covered = (
            covered.union(h.filter(F.col("id") == pick_id).select("h"))
            .distinct()
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(
        picks, "round int, doc_id long, gain long, covered_total long"
    )


QUERIES["curation_coverage_greedy"] = curation_coverage_greedy


def _coverage_greedy_oracle(k: int = GREEDY_K) -> str:
    toks = sql_tokens("text")
    hashes = sql_shingle_hashes_from_token_hashes(sql_token_hash_array(toks), 2)
    ctes = [
        f"""h AS (
            SELECT doc_id AS id, unnest(hashes) AS sh FROM (
                SELECT doc_id, {hashes} AS hashes FROM documents
                WHERE length(text) > 0 AND len({toks}) > 0
            )
        )"""
    ]
    prev_cov = None
    selects = []
    for r in range(1, k + 1):
        not_covered = (
            f"WHERE sh NOT IN (SELECT sh FROM {prev_cov})" if prev_cov else ""
        )
        ctes.append(
            f"""g{r} AS (
            SELECT id, count(*) AS gain FROM h {not_covered} GROUP BY id
        )"""
        )
        ctes.append(
            f"""p{r} AS (
            SELECT id, gain FROM g{r} ORDER BY gain DESC, id ASC LIMIT 1
        )"""
        )
        new_cov = f"c{r}"
        union_prev = f"SELECT sh FROM {prev_cov} UNION " if prev_cov else ""
        ctes.append(
            f"""{new_cov} AS (
            {union_prev}SELECT DISTINCT h.sh FROM h JOIN p{r} ON h.id = p{r}.id
        )"""
        )
        selects.append(
            f"SELECT {r} AS round, id AS doc_id, gain,"
            f" (SELECT count(*) FROM c{r}) AS covered_total FROM p{r}"
        )
        prev_cov = new_cov
    body = " UNION ALL ".join(selects)
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(round AS INTEGER) AS round, doc_id,
           CAST(gain AS BIGINT) AS gain,
           CAST(covered_total AS BIGINT) AS covered_total
    FROM ({body})
    """


ORACLES["curation_coverage_greedy"] = _coverage_greedy_oracle()


# ----------------------------- persisted DSIR LM + day-2 scoring artifact
# The DSIR twin of the LSH-index story: the bucket log-ratio relation is
# a TRAINED ARTIFACT — built once from the day-1 corpus (doc_id % 10
# != 0, target = src0 vs the raw rest), written to parquet, and probed
# by every subsequent scoring pass (batch below; streaming in
# queries/streaming_gate.py) without touching day-1 text again.

_DSIR_LM_PATHS: dict[str, str] = {}


def _dsir_lm_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once-per-process parquet artifact: (b, lr_units) — the
    add-one-smoothed target/raw log-ratio per hashed bucket, trained on
    the day-1 slice."""
    from .connectors import _fixture_path
    from ..functions.rounding import iunits
    from ..functions.text import tokenize
    from ..session import path_cached

    def build() -> str:
        path = _fixture_path("dsir_lm")
        docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0)
        b = token_hash(F.col("tok")) % F.lit(DSIR_BUCKETS)
        terms = docs.select(
            "source", F.explode(tokenize(F.col("text"))).alias("tok")
        ).select("source", b.alias("b"))
        spine = spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))

        def lm(t: DataFrame, name: str) -> DataFrame:
            cnt = t.groupBy("b").agg(F.count("*").alias("c"))
            tot = t.select(F.count("*").alias("n"))
            return (
                spine.join(cnt, "b", "left")
                .crossJoin(tot)
                .select(
                    "b",
                    F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                        / (F.col("n") + F.lit(DSIR_BUCKETS)).cast("double")
                    ).alias(name),
                )
            )

        p = lm(terms.filter(F.col("source") == DSIR_TARGET_SRC), "lp")
        q = lm(terms.filter(F.col("source") != DSIR_TARGET_SRC), "lq")
        p.join(q, "b").select(
            "b", iunits(F.col("lp") - F.col("lq"), 9).alias("lr_units")
        ).write.mode("overwrite").parquet(path)
        return path

    return path_cached(_DSIR_LM_PATHS, sf_dir, build)


# ------------------------------------------ deterministic training order
# The last step before tokenization at 100 TB: fix the global example
# order for N epochs, reproducibly. rand()-shuffles are neither stable
# under retries nor resumable mid-epoch; the standard production answer
# is a salted-hash permutation — shard = h(epoch, id) % S routes each
# doc to a write-shard, position = rank of h within the shard orders it
# — so any worker can recompute any shard of any epoch independently
# (resume, retry, elastic re-run all free). Epochs differ only in the
# hash salt: each is an independent permutation with zero extra state.
# Scale: one shuffle on (epoch, shard); ordering is per-shard
# (~n/S rows), never a global sort; S scales with the cluster.

TRAIN_EPOCHS = 2
TRAIN_SHARDS = 8


def curation_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(e) for e in range(TRAIN_EPOCHS)])).alias("epoch"),
    )
    h = token_hash(
        F.concat(
            F.lit("ep"),
            F.col("epoch").cast("string"),
            F.lit(":"),
            F.col("doc_id").cast("string"),
        )
    )
    w = W.partitionBy("epoch", "shard").orderBy(F.asc("_h"), F.asc("doc_id"))
    return (
        base.withColumn("_h", h)
        .withColumn("shard", (F.col("_h") % F.lit(TRAIN_SHARDS)).cast("int"))
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            "shard",
            (F.row_number().over(w) - F.lit(1)).cast("long").alias("position"),
            "doc_id",
        )
    )


QUERIES["curation_training_order"] = curation_training_order

_EPOCH_H = sql_token_hash(
    "'ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)"
)

ORACLES["curation_training_order"] = f"""
    WITH base AS (
        SELECT d.doc_id, ep.epoch
        FROM documents d CROSS JOIN (SELECT unnest(range(0, {TRAIN_EPOCHS})) AS epoch) ep
    ), hashed AS (
        SELECT doc_id, epoch, {_EPOCH_H} AS h FROM base
    )
    SELECT CAST(epoch AS INTEGER) AS epoch,
           CAST(h % {TRAIN_SHARDS} AS INTEGER) AS shard,
           CAST(row_number() OVER (
               PARTITION BY epoch, h % {TRAIN_SHARDS}
               ORDER BY h ASC, doc_id ASC
           ) AS BIGINT) - 1 AS position,
           doc_id
    FROM hashed
"""


# ------------------------------------------------- per-domain doc caps
# The C4/RefinedWeb anti-spam rule: no domain may contribute more than
# CAP documents, chosen deterministically (bottom-CAP of the salted doc
# hash — a stable uniform draw, the same discipline as every sampler
# here). The naive plan is one window over each source's full row set —
# at 100 TB a mega-domain makes that partition-sort the straggler. This
# implementation is the SKEW-PROOF two-stage bottom-k: stage 1 takes a
# local bottom-CAP within each (source, input-partition) slice — each
# window partition is bounded by the Spark partition size — and stage 2
# re-ranks only the <= CAP * n_partitions survivors per source. The
# final result is layout-independent (global bottom-CAP per source), so
# the physical-partition salt never leaks into the answer; the oracle
# computes the single-stage rank directly.

DOMAIN_CAP = 20


def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    base = docs.select("source", "doc_id", h.alias("_h")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w1 = W.partitionBy("source", "_pid").orderBy(F.asc("_h"), F.asc("doc_id"))
    local = (
        base.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= DOMAIN_CAP)
        .drop("_rn", "_pid")
    )
    w2 = W.partitionBy("source").orderBy(F.asc("_h"), F.asc("doc_id"))
    return (
        local.withColumn("rk", F.row_number().over(w2).cast("int"))
        .filter(F.col("rk") <= DOMAIN_CAP)
        .select("source", "rk", "doc_id")
    )


QUERIES["curation_domain_cap"] = curation_domain_cap

_CAP_H = sql_token_hash("'cap:' || CAST(doc_id AS VARCHAR)")

ORACLES["curation_domain_cap"] = f"""
    SELECT source, rk, doc_id FROM (
        SELECT source, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY ({_CAP_H}) ASC, doc_id ASC
               ) AS INTEGER) AS rk
        FROM documents
    ) WHERE rk <= {DOMAIN_CAP}
"""


# --------------------------------------------- shard token budgeting
# The pre-launch check on the training order: per (epoch, shard), how
# many docs and tokens land there, and each shard's token mass relative
# to its epoch's mean — the balance report that tells you whether the
# hash sharding produced even work BEFORE the training job starts
# (unbalanced shards = straggler steps). Composition of
# curation_training_order with per-doc token accounting; one join on
# doc_id + one aggregate; the balance ratio is integer-exact until the
# final division.

def curation_shard_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround
    from ..functions.text import tokenize

    order = curation_training_order(spark, sf_dir)
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_toks")
    )
    per = (
        order.join(toks, "doc_id")
        .groupBy("epoch", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("sum_tokens"),
        )
    )
    we = W.partitionBy("epoch")
    total = F.sum("sum_tokens").over(we)
    cnt = F.count(F.lit(1)).over(we)
    return per.select(
        "epoch",
        "shard",
        "n_docs",
        "sum_tokens",
        pround(
            (F.col("sum_tokens").cast("double") * cnt.cast("double"))
            / total.cast("double"),
            6,
        ).alias("balance_ratio"),
    )


QUERIES["curation_shard_budget"] = curation_shard_budget

from ..functions.rounding import sql_pround as _sql_pr  # noqa: E402

ORACLES["curation_shard_budget"] = f"""
    WITH ord AS ({ORACLES['curation_training_order']}),
    toks AS (
        SELECT doc_id, CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks
        FROM documents
    ), per AS (
        SELECT epoch, shard, count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS sum_tokens
        FROM ord JOIN toks USING (doc_id)
        GROUP BY epoch, shard
    )
    SELECT epoch, shard, n_docs, sum_tokens,
           {_sql_pr(
               '(CAST(sum_tokens AS DOUBLE)'
               ' * CAST(count(*) OVER (PARTITION BY epoch) AS DOUBLE))'
               ' / CAST(sum(sum_tokens) OVER (PARTITION BY epoch) AS DOUBLE)',
               6)} AS balance_ratio
    FROM per
"""


# ------------------------------------------- token-budget mixture fill
# "Fill a B-token training budget at these mixture weights" — the
# actual quantity a pretraining run is provisioned in. Per-source token
# quotas follow the same temperature rule as curation_mixture but over
# TOKEN mass (w_s = isqrt(sum_tokens_s), quota_s = B*w_s div Σw), and
# each source's quota fills greedily in salted-hash order: a doc is
# kept iff the cumulative token count INCLUDING it stays within quota
# (strict budget — never overshoots). All integer arithmetic; the fill
# is one per-source cumulative-sum window over the hash order — one
# shuffle on source, same stratum-skew profile as any per-source draw.

TOKEN_BUDGET = 20_000


def curation_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokenize(F.col("text"))).cast("long").alias("n_toks"),
    )
    stats = docs.groupBy("source").agg(F.sum("n_toks").alias("src_toks"))
    w = stats.select(
        "source",
        "src_toks",
        F.floor(F.sqrt(F.col("src_toks").cast("double"))).cast("long").alias("w"),
    )
    totals = w.agg(F.sum("w").alias("sum_w"))
    quota = w.crossJoin(F.broadcast(totals)).select(
        "source",
        "src_toks",
        F.expr(f"{TOKEN_BUDGET} * w div sum_w").alias("quota"),
    )
    h = token_hash(F.concat(F.lit("tb:"), F.col("doc_id").cast("string")))
    wc = W.partitionBy("source").orderBy(F.asc("_h"), F.asc("doc_id")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    filled = (
        docs.withColumn("_h", h)
        .withColumn("cum", F.sum("n_toks").over(wc))
        .join(F.broadcast(quota), "source")
        .filter(F.col("cum") <= F.col("quota"))
    )
    return filled.groupBy("source", "src_toks", "quota").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_toks").alias("kept_tokens"),
    )


QUERIES["curation_token_budget"] = curation_token_budget

_TB_H = sql_token_hash("'tb:' || CAST(doc_id AS VARCHAR)")

ORACLES["curation_token_budget"] = f"""
    WITH docs AS (
        SELECT doc_id, source,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks
        FROM documents
    ), stats AS (
        SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks
        FROM docs GROUP BY source
    ), w AS (
        SELECT source, src_toks,
               CAST(floor(sqrt(CAST(src_toks AS DOUBLE))) AS BIGINT) AS w
        FROM stats
    ), quota AS (
        SELECT source, src_toks,
               CAST({TOKEN_BUDGET} * w // (SELECT sum(w) FROM w) AS BIGINT) AS quota
        FROM w
    ), filled AS (
        SELECT d.source, d.n_toks, q.src_toks, q.quota,
               sum(d.n_toks) OVER (
                   PARTITION BY d.source
                   ORDER BY ({_TB_H}) ASC, d.doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM docs d JOIN quota q USING (source)
    )
    SELECT source, src_toks, quota,
           count(*) AS n_kept,
           CAST(sum(n_toks) AS BIGINT) AS kept_tokens
    FROM filled WHERE cum <= quota
    GROUP BY source, src_toks, quota
"""


# ------------------------------------- semantic benchmark decontamination
# curation_decontaminate catches LEXICAL overlap (shared 5-grams); this
# is its embedding-space twin — the paraphrase leak n-grams miss. The
# benchmark's embedding slice (vec_id % BENCH_MOD == 0, small by
# definition) broadcasts; every corpus vector scores cosine against it
# and is flagged when its best match reaches DECON_SEM_TAU. The argmax
# is a map-side-combinable max(struct) — no window, no shuffle of the
# pair relation; at 100 TB this is one broadcast-nested-loop scan of
# the corpus embeddings, the same plan family as sim_topk_bruteforce
# (for benchmark slices beyond broadcast size, route through the IVF
# rungs instead — same candidate discipline as embedding_neardup_ivf).

DECON_SEM_TAU = 0.35


def curation_decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import pround as _pr
    from ..functions.vectors import as_double, cosine

    emb = load_table(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("vec_id") % BENCH_MOD == 0).select(
        F.col("vec_id").alias("bench_id"), as_double("embedding").alias("bv")
    )
    corp = emb.filter(F.col("vec_id") % BENCH_MOD != 0).select(
        "vec_id", as_double("embedding").alias("cv")
    )
    scored = corp.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "bench_id",
        _pr(cosine(F.col("cv"), F.col("bv")), 6).alias("cos"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), F.col("bench_id"))).alias("m")
    )
    return best.filter(F.col("m.cos") >= F.lit(DECON_SEM_TAU)).select(
        "vec_id",
        F.col("m.bench_id").alias("match_id"),
        F.col("m.cos").alias("cos_sim"),
    )


QUERIES["curation_decontaminate_semantic"] = curation_decontaminate_semantic


def _decon_sem_oracle() -> str:
    from ..functions.rounding import sql_pround as _spr
    from ..functions.vectors import sql_as_double, sql_cosine

    return f"""
    WITH bench AS (
        SELECT vec_id AS bench_id, {sql_as_double('embedding')} AS bv
        FROM embeddings WHERE vec_id % {BENCH_MOD} = 0
    ), corp AS (
        SELECT vec_id, {sql_as_double('embedding')} AS cv
        FROM embeddings WHERE vec_id % {BENCH_MOD} != 0
    ), scored AS (
        SELECT vec_id, bench_id,
               {_spr(sql_cosine('corp.cv', 'bench.bv'), 6)} AS cos
        FROM corp, bench
    ), best AS (
        SELECT vec_id, bench_id AS match_id, cos AS cos_sim,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, bench_id DESC
               ) AS rn
        FROM scored
    )
    SELECT vec_id, match_id, cos_sim FROM best
    WHERE rn = 1 AND cos_sim >= CAST({DECON_SEM_TAU} AS DOUBLE)
"""


ORACLES["curation_decontaminate_semantic"] = _decon_sem_oracle()


# ----------------------------------------------------- annealed mixture plan
# Temperature ANNEALING over epochs (the decay-phase upsampling recipe:
# start diversity-heavy, end proportional — MiniCPM/Llama-style data
# scheduling, the dynamic twin of curation_mixture's static n^alpha):
# epoch 0 samples with alpha = 1/2, epoch 1 with 3/4, epoch 2 with 1.
# All three weights are exact integers cross-engine:
#   n^(1/2)  -> floor(sqrt(n))           (IEEE sqrt correctly rounded)
#   n^(3/4)  -> floor(sqrt(n*floor(sqrt(n))))   (two single sqrts)
#   n^1      -> n
# Quotas and draws reuse the curation_mixture rails (integer div,
# epoch-salted md5 bottom-k per source). Scale: stats are one tiny
# aggregate; the draw is one shuffle on (epoch, source) over
# |docs| x |epochs| rows — at 100 TB you run one epoch's draw at a
# time, same plan, no cross-epoch state.

ANNEAL_EPOCHS = 3
ANNEAL_BUDGET_PCT = 20  # per-epoch sample budget as % of corpus


def curation_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    ep = F.explode(F.array(*[F.lit(i) for i in range(ANNEAL_EPOCHS)])).alias(
        "epoch"
    )
    sq = F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long")
    w34 = F.floor(F.sqrt((F.col("n_docs") * sq).cast("double"))).cast("long")
    weights = stats.select("source", "n_docs", ep).withColumn(
        "w",
        F.when(F.col("epoch") == 0, sq)
        .when(F.col("epoch") == 1, w34)
        .otherwise(F.col("n_docs").cast("long")),
    )
    totals = weights.groupBy("epoch").agg(
        F.sum("w").alias("sum_w"), F.sum("n_docs").alias("n_total")
    )
    quota = weights.join(F.broadcast(totals), "epoch").select(
        "epoch",
        "source",
        "n_docs",
        "w",
        F.expr(
            f"(n_total * {ANNEAL_BUDGET_PCT} div 100) * w div sum_w"
        ).alias("quota"),
    )
    drawn = (
        docs.select("doc_id", "source", ep)
        .withColumn(
            "draw_hash",
            token_hash(
                F.concat(
                    F.lit("an"),
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
        )
        .join(F.broadcast(quota), ["epoch", "source"])
        .withColumn(
            "draw_rank",
            F.row_number().over(
                W.partitionBy("epoch", "source").orderBy(
                    F.asc("draw_hash"), F.asc("doc_id")
                )
            ),
        )
        .filter(F.col("draw_rank") <= F.col("quota"))
    )
    return drawn.groupBy("epoch", "source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.min("n_docs").alias("n_docs"),
        F.min("w").alias("weight"),
        F.min("quota").alias("quota"),
        F.sum("doc_id").alias("id_checksum"),
    )


QUERIES["curation_anneal_schedule"] = curation_anneal_schedule

_AN_H = sql_token_hash("'an' || CAST(d.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)")

ORACLES["curation_anneal_schedule"] = f"""
    WITH stats AS (
        SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
    ), weights AS (
        SELECT source, n_docs, e.epoch,
               CASE e.epoch
                   WHEN 0 THEN CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
                   WHEN 1 THEN CAST(floor(sqrt(CAST(
                        n_docs * CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
                        AS DOUBLE))) AS BIGINT)
                   ELSE CAST(n_docs AS BIGINT)
               END AS w
        FROM stats, (SELECT unnest(range({ANNEAL_EPOCHS})) AS epoch) e
    ), totals AS (
        SELECT epoch, CAST(sum(w) AS BIGINT) AS sum_w,
               CAST(sum(n_docs) AS BIGINT) AS n_total
        FROM weights GROUP BY 1
    ), quota AS (
        SELECT w.epoch, w.source, w.n_docs, w.w,
               (n_total * {ANNEAL_BUDGET_PCT} // 100) * w.w // sum_w AS quota
        FROM weights w JOIN totals USING (epoch)
    ), d AS (
        SELECT doc_id, source, e.epoch
        FROM documents, (SELECT unnest(range({ANNEAL_EPOCHS})) AS epoch) e
    ), drawn AS (
        SELECT d.epoch, d.source, d.doc_id, q.n_docs, q.w, q.quota,
               row_number() OVER (
                   PARTITION BY d.epoch, d.source
                   ORDER BY {_AN_H} ASC, d.doc_id ASC) AS draw_rank
        FROM d JOIN quota q ON d.epoch = q.epoch AND d.source = q.source
    )
    SELECT epoch, source,
           CAST(count(*) AS BIGINT) AS n_sampled,
           min(n_docs) AS n_docs,
           min(w) AS weight,
           min(quota) AS quota,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM drawn WHERE draw_rank <= quota GROUP BY 1, 2
"""


# --------------------------------------------------- DoReMi-style weights
# Domain-mixture reweighting by exponentiated gradient (round 8): the
# group-DRO outer loop of DoReMi (Xie et al. 2023, "DoReMi: Optimizing
# Data Mixtures Speeds Up Language Model Pretraining") with a FROZEN
# per-domain difficulty proxy standing in for the trained reference/
# proxy model pair (proxy training is a GPU job, out of scope for the
# engine; the mixture algebra is not). Proxy: mean type-token ratio
# per source — lexically diverse domains read as "hard" (higher
# excess loss), repetitive ones as "easy".
#
# Update (all snapped integers, logreg exp discipline):
#   mix_t   = round(Σ w_d·l_d / Σ w_d)                 (BIGINT rational)
#   raw_d   = snap9( w_d · exp(η · (l_d − mix_t)/1e6) ) (one exp, 1e-9)
#   w_{t+1} = round(1e9 · raw_d / Σ raw)               (BIGINT rational)
# iterated DOREMI_ITERS times from uniform nano-weights. Mass flows
# monotonically toward above-average-loss domains; with frozen losses
# this converges toward the argmax set — exactly EG on the minimax
# objective, the verifiable engine-side contract.
#
# Scale: per-doc proxy is one scan (map-side combine into the per-
# source agg); the EG loop runs on a |domains|-row relation (tiny,
# broadcast either way) — corpus size only touches the first scan.

DOREMI_ITERS = 5
DOREMI_ETA = 1.0


def curation_doremi_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import (
        from_iunits,
        iunits,
        ratio_micros,
        ratio_units,
    )
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    perdoc = docs.select(
        "source",
        F.size(toks).alias("_nt"),
        F.size(F.array_distinct(toks)).alias("_nd"),
    ).filter(F.col("_nt") > 0)
    dom = perdoc.select(
        "source", ratio_micros("_nd", "_nt").alias("_ttr")
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ttr").alias("_sum_ttr"),
    ).select(
        "source", "n_docs", ratio_units("_sum_ttr", "n_docs", 1).alias("loss_micros")
    )
    # one corpus scan total: the per-domain relation is ~|sources|
    # rows — localCheckpoint it (and each EG iterate) so the lazy loop
    # doesn't re-derive the scan per level reference. Without this the
    # final plan re-executes the tokenize+agg subtree 2^ITERS times
    # (first cut measured 132 s at sf0.01; checkpointed: ~2 s).
    dom = dom.localCheckpoint()
    n_dom = dom.agg(F.count(F.lit(1)).alias("_k"))
    w = dom.crossJoin(F.broadcast(n_dom)).select(
        "source",
        "n_docs",
        "loss_micros",
        ratio_units("1", "_k", 10**9).alias("w_nanos"),
    ).localCheckpoint()
    for _ in range(DOREMI_ITERS):
        mix = w.agg(
            F.sum(F.col("w_nanos") * F.col("loss_micros")).alias("_wl"),
            F.sum("w_nanos").alias("_tw"),
        ).select(ratio_units("_wl", "_tw", 1).alias("_mix"))
        raw = w.crossJoin(F.broadcast(mix)).select(
            "source",
            "n_docs",
            "loss_micros",
            iunits(
                from_iunits(F.col("w_nanos"), 9)
                * F.exp(
                    F.lit(DOREMI_ETA)
                    * from_iunits(F.col("loss_micros") - F.col("_mix"), 6)
                ),
                9,
            ).alias("_raw"),
        )
        tot = raw.agg(F.sum("_raw").alias("_tot"))
        w = raw.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_docs",
            "loss_micros",
            ratio_units("_raw", "_tot", 10**9).alias("w_nanos"),
        ).localCheckpoint()
    return w.select("source", "n_docs", "loss_micros", F.col("w_nanos").alias("weight_nanos"))


QUERIES["curation_doremi_weights"] = curation_doremi_weights


def _sql_doremi_ctes() -> str:
    """Linear CTE chain: every level references its predecessor exactly
    ONCE, with the cross-domain scalars (mixture loss, normalizer,
    domain count) as ``OVER ()`` window aggregates instead of scalar
    subqueries — DuckDB INLINES non-materialized CTEs, so a chain
    whose levels reference the previous level twice expands the base
    parquet scan exponentially in DOREMI_ITERS (observed: "Too many
    open files" at 5 iterations)."""
    from ..functions.rounding import (
        sql_from_iunits,
        sql_iunits,
        sql_ratio_micros,
        sql_ratio_units,
    )

    ttr = sql_ratio_micros("len(list_distinct(t))", "len(t)")
    ctes = [
        f"""perdoc AS (
            SELECT source, {ttr} AS ttr FROM (
                SELECT source, {sql_tokens('text')} AS t FROM documents
            ) WHERE len(t) > 0
        )""",
        f"""dom AS (
            SELECT source, count(*) AS n_docs,
                   {sql_ratio_units('sum(ttr)', 'count(*)', 1)} AS loss
            FROM perdoc GROUP BY 1
        )""",
        f"""w0 AS (
            SELECT source, n_docs, loss,
                   {sql_ratio_units('1', 'count(*) OVER ()', 10**9)} AS w
            FROM dom
        )""",
    ]
    mix = sql_ratio_units("sum(w * loss) OVER ()", "sum(w) OVER ()", 1)
    for t in range(DOREMI_ITERS):
        exc = sql_from_iunits("loss - mix", 6)
        raw = sql_iunits(
            f"{sql_from_iunits('w', 9)} * exp({DOREMI_ETA} * {exc})", 9
        )
        ctes.append(
            f"""r{t} AS (
            SELECT source, n_docs, loss, {raw} AS raw FROM (
                SELECT source, n_docs, loss, w, {mix} AS mix FROM w{t}
            )
        )"""
        )
        ctes.append(
            f"""w{t + 1} AS (
            SELECT source, n_docs, loss,
                   {sql_ratio_units('raw', 'sum(raw) OVER ()', 10**9)} AS w
            FROM r{t}
        )"""
        )
    return ",\n    ".join(ctes)


def _sql_doremi() -> str:
    return (
        "WITH "
        + _sql_doremi_ctes()
        + f"""
    SELECT source, n_docs, CAST(loss AS BIGINT) AS loss_micros,
           CAST(w AS BIGINT) AS weight_nanos
    FROM w{DOREMI_ITERS}
"""
    )


ORACLES["curation_doremi_weights"] = _sql_doremi()


# ----------------------------------------------- DoReMi quota draw
# The weights being USED (round 8): turn the EG mixture weights into
# per-source document quotas over a fixed budget and make the exact
# deterministic hash draw — the same bottom-k-by-md5 rail as
# curation_mixture, with quota ∝ weight_nanos instead of isqrt(n).
# Small-but-hard domains get upsampled exactly as DoReMi prescribes;
# a quota exceeding a source's population truncates to the population
# (the draw rank can't exceed n_docs), which is the correct clamp.
# Domain rail: quota arithmetic is (n_total·PCT div 100)·w_nanos with
# w_nanos <= 1e9, so it stays int64 to ~3e10 corpus docs; past that,
# route through ratio_units_dec like the CV^2 rail.

DOREMI_BUDGET_PCT = 30


def curation_doremi_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    weights = curation_doremi_weights(spark, sf_dir)  # tiny, checkpointed
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    totals = weights.agg(
        F.sum("weight_nanos").alias("sum_w"), F.sum("n_docs").alias("n_total")
    )
    quota = weights.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "weight_nanos",
        F.expr(
            f"(n_total * {DOREMI_BUDGET_PCT} div 100) * weight_nanos div sum_w"
        ).alias("quota"),
    )
    win = W.partitionBy("source").orderBy(F.asc("draw_hash"), F.asc("doc_id"))
    drawn = (
        docs.withColumn(
            "draw_hash",
            token_hash(F.concat(F.lit("doremi"), F.col("doc_id").cast("string"))),
        )
        .join(F.broadcast(quota), "source")
        .withColumn("draw_rank", F.row_number().over(win))
        .filter(F.col("draw_rank") <= F.col("quota"))
    )
    return drawn.groupBy("source").agg(
        F.min("n_docs").alias("n_docs"),
        F.min("weight_nanos").alias("weight_nanos"),
        F.min("quota").alias("quota"),
        F.count(F.lit(1)).alias("n_drawn"),
        F.sum("doc_id").alias("id_checksum"),
    )


QUERIES["curation_doremi_draw"] = curation_doremi_draw


def _sql_doremi_draw() -> str:
    from ..functions.hashing import sql_token_hash

    h = sql_token_hash("'doremi' || CAST(doc_id AS VARCHAR)")
    return f"""
    WITH {_sql_doremi_ctes()},
    weights AS (
        SELECT source, n_docs, loss, w AS weight_nanos FROM w{DOREMI_ITERS}
    ),
    totals AS (
        SELECT CAST(sum(weight_nanos) AS BIGINT) AS sum_w,
               CAST(sum(n_docs) AS BIGINT) AS n_total
        FROM weights
    ),
    quota AS (
        SELECT source, n_docs, weight_nanos,
               (n_total * {DOREMI_BUDGET_PCT} // 100)
                   * weight_nanos // sum_w AS quota
        FROM weights CROSS JOIN totals
    ),
    drawn AS (
        SELECT d.source, d.doc_id, q.n_docs, q.weight_nanos, q.quota,
               row_number() OVER (
                   PARTITION BY d.source ORDER BY {h} ASC, d.doc_id ASC
               ) AS draw_rank
        FROM documents d JOIN quota q ON d.source = q.source
    )
    SELECT source,
           CAST(min(n_docs) AS BIGINT) AS n_docs,
           CAST(min(weight_nanos) AS BIGINT) AS weight_nanos,
           CAST(min(quota) AS BIGINT) AS quota,
           count(*) AS n_drawn,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM drawn WHERE draw_rank <= quota GROUP BY 1
"""


ORACLES["curation_doremi_draw"] = _sql_doremi_draw()


# Packing-efficiency report (round 8): the one-row answer to "how much
# of every pretraining batch is real tokens" — bin count, token mass,
# fill ratio vs the PACK_BUDGET capacity, and the under/overfull bin
# split (bins can exceed budget when a doc straddles the boundary —
# the documented truncation semantics). One aggregate over the pack
# relation; exact BIGINT rationals.


def curation_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    bins = curation_pack(spark, sf_dir)
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("bin_tokens").alias("total_tokens"),
        F.min("bin_tokens").alias("min_bin_tokens"),
        F.max("bin_tokens").alias("max_bin_tokens"),
        F.sum(
            F.when(F.col("bin_tokens") < PACK_BUDGET, 1).otherwise(0)
        ).alias("n_underfull"),
        F.sum(
            F.when(F.col("bin_tokens") > PACK_BUDGET, 1).otherwise(0)
        ).alias("n_overfull"),
    ).select(
        "n_bins",
        "total_tokens",
        "min_bin_tokens",
        "max_bin_tokens",
        "n_underfull",
        "n_overfull",
        ratio_micros("total_tokens", f"n_bins * {PACK_BUDGET}").alias(
            "fill_micros"
        ),
    )


QUERIES["curation_pack_efficiency"] = curation_pack_efficiency


def _sql_pack_efficiency() -> str:
    from ..functions.rounding import sql_ratio_micros

    return f"""
    WITH bins AS ({ORACLES['curation_pack']})
    SELECT count(*) AS n_bins,
           CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(min(bin_tokens) AS BIGINT) AS min_bin_tokens,
           CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
           CAST(sum(CASE WHEN bin_tokens < {PACK_BUDGET} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_underfull,
           CAST(sum(CASE WHEN bin_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_overfull,
           {sql_ratio_micros('sum(bin_tokens)', f'count(*) * {PACK_BUDGET}')}
               AS fill_micros
    FROM bins
"""


ORACLES["curation_pack_efficiency"] = _sql_pack_efficiency()


# --------------------------------------------------------------- UniMax
# UniMax sampling (Chung et al. 2023, ICLR — "UniMax: Fairer and More
# Effective Language Sampling for Large-Scale Multilingual
# Pretraining"): spread a token/doc budget as UNIFORMLY as possible
# across sources, but never take more than UNIMAX_EPOCHS passes over
# any source's data — the epoch cap is what stops temperature-style
# upsampling from looping a tiny source hundreds of times. This is
# exact integer waterfilling: sort sources ascending by capacity
# cap_s = E·n_s; the first k sources (those whose capacity sits below
# the shared water level) are fully capped, the rest all get the level
# L = (B − Σ_{j≤k} cap_j) div (S − k), with the division remainder
# handed to the first `rem` uncapped sources in the same (cap, source)
# order — fully deterministic, no floats anywhere. The breakpoint k is
# the largest i whose capacity fits under the level that WOULD hold if
# the first i were capped: cap_i·(S−i) ≤ B − pc_i — a multiplication
# compare, so no negative-division truncation semantics are ever
# exercised (hypothesis-pinned against the sequential greedy reference
# in tests).
#
# Scale: one corpus aggregation to n_s; everything else lives on the
# |sources| relation (bounded vocabulary — the doremi/mixture
# precedent), where a single-partition window over thousands of rows
# is free. Int64 audit: cap·(S−i) ≤ E·total·S — wraps only past
# ~9e18/(E·S) docs per the srm-style wide-rail note; at that corpus
# scale the compare moves to DECIMAL(38,0) unchanged.

UNIMAX_EPOCHS = 2  # per-source epoch cap
UNIMAX_BUDGET_NUM, UNIMAX_BUDGET_DEN = 3, 2  # B = 3·total div 2 (1.5 epochs)


def curation_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus scan: the per-source aggregate is localCheckpointed
    # (the doremi iterate discipline) so the four downstream consumers
    # (tot, ranked, kr, final) reuse the |sources|-row relation instead
    # of re-scanning documents once each — plan-asserted in
    # tests/test_plans.py::test_unimax_single_corpus_scan.
    src = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint()
    )
    tot = src.agg(
        F.sum("n_docs").alias("total"), F.count(F.lit(1)).alias("S")
    )
    wo = W.orderBy("cap", "source")
    ranked = (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            (F.lit(UNIMAX_EPOCHS) * F.col("n_docs")).alias("cap"),
            F.expr(
                f"{UNIMAX_BUDGET_NUM} * total div {UNIMAX_BUDGET_DEN}"
            ).alias("B"),
            "S",
            "total",
        )
        .select(
            "*",
            F.row_number().over(wo).alias("i"),
            F.sum("cap").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("pc"),
        )
    )
    kr = ranked.filter(
        (F.col("i") < F.col("S"))
        & (F.col("cap") * (F.col("S") - F.col("i")) <= F.col("B") - F.col("pc"))
    ).agg(F.max(F.struct(F.col("i"), F.col("pc"))).alias("m"))
    out = ranked.crossJoin(F.broadcast(kr)).select(
        "*",
        F.coalesce(F.col("m.i"), F.lit(0)).alias("k"),
        F.coalesce(F.col("m.pc"), F.lit(0)).alias("pck"),
    )
    L = F.expr("(B - pck) div (S - k)")
    rem = F.col("B") - F.col("pck") - L * (F.col("S") - F.col("k"))
    alloc = (
        F.when(F.col("B") >= F.lit(UNIMAX_EPOCHS) * F.col("total"), F.col("cap"))
        .when(F.col("i") <= F.col("k"), F.col("cap"))
        .otherwise(
            L + F.when(F.col("i") - F.col("k") <= rem, F.lit(1)).otherwise(F.lit(0))
        )
    )
    return (
        out.withColumn("alloc_docs", alloc)
        .select(
            "source",
            "n_docs",
            F.col("cap").alias("cap_docs"),
            "alloc_docs",
            (F.col("alloc_docs") >= F.col("cap"))
            .cast("int")
            .alias("capped"),
            ratio_micros("alloc_docs", "n_docs").alias("epochs_micros"),
        )
    )


QUERIES["curation_unimax"] = curation_unimax


def _sql_unimax() -> str:
    from ..functions.rounding import sql_ratio_micros

    E = UNIMAX_EPOCHS
    return f"""
    WITH src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS S
        FROM src
    ), ranked AS (
        SELECT source, n_docs, {E} * n_docs AS cap,
               {UNIMAX_BUDGET_NUM} * total // {UNIMAX_BUDGET_DEN} AS B,
               S, total,
               row_number() OVER (ORDER BY {E} * n_docs, source) AS i,
               sum({E} * n_docs) OVER (
                   ORDER BY {E} * n_docs, source ROWS UNBOUNDED PRECEDING
               ) AS pc
        FROM src, tot
    ), kr AS (
        SELECT coalesce(max_by(i, i), 0) AS k,
               coalesce(max_by(pc, i), 0) AS pck
        FROM ranked
        WHERE i < S AND cap * (S - i) <= B - pc
    )
    SELECT source, n_docs, CAST(cap AS BIGINT) AS cap_docs,
           CAST(alloc AS BIGINT) AS alloc_docs,
           CAST(CASE WHEN alloc >= cap THEN 1 ELSE 0 END AS INTEGER) AS capped,
           {sql_ratio_micros('alloc', 'n_docs')} AS epochs_micros
    FROM (
        SELECT r.*,
               CASE WHEN B >= {E} * total THEN cap
                    WHEN i <= k THEN cap
                    ELSE (B - pck) // (S - k)
                         + (CASE WHEN i - k <=
                                B - pck - ((B - pck) // (S - k)) * (S - k)
                            THEN 1 ELSE 0 END)
               END AS alloc
        FROM ranked r, kr
    )
"""


ORACLES["curation_unimax"] = _sql_unimax()


# ------------------------------------------- dedup-aware mixture sizing
# curation_mixture's quota rail with DEDUP-AWARE source sizes: a source
# whose volume is mostly copies of earlier sources should not earn
# quota for the copies. Effective size n_eff = number of unique texts
# whose CANONICAL copy (min doc_id corpus-wide — dedup_exact's survivor
# rule) lives in the source; duplicated mass counts once, credited to
# the earliest source (the provenance convention of
# dedup_cross_source_matrix). Weights are isqrt(n_eff) (the mixture
# temperature rail), the budget is MIX_BUDGET_PCT of the UNIQUE corpus,
# and every step is the same integer-div chain as curation_mixture.
# This is the composition a production pipeline actually runs — dedup
# BEFORE mixture sizing — expressed as one declarative plan.
#
# Scale: the canonical-owner relation is dedup_exact's one text-keyed
# aggregate; crediting joins back on doc_id (join key is the survivor
# id — no text column ever shuffles twice); everything after is the
# |sources| relation.


def curation_mixture_dedupaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    canon = docs.groupBy("text").agg(F.min("doc_id").alias("keep_id"))
    eff = (
        canon.select("keep_id")
        .join(docs.select("doc_id", "source"), canon["keep_id"] == docs["doc_id"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_eff"))
    )
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = stats.join(eff, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_eff", F.lit(0)).alias("n_eff"),
        F.floor(
            F.sqrt(F.coalesce("n_eff", F.lit(0)).cast("double"))
        )
        .cast("long")
        .alias("w"),
    )
    totals = w.agg(F.sum("w").alias("sum_w"), F.sum("n_eff").alias("eff_total"))
    return w.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_eff",
        "w",
        F.expr(
            f"(eff_total * {MIX_BUDGET_PCT} div 100) * w div sum_w"
        ).alias("quota"),
    )


QUERIES["curation_mixture_dedupaware"] = curation_mixture_dedupaware

ORACLES["curation_mixture_dedupaware"] = f"""
    WITH canon AS (
        SELECT min(doc_id) AS keep_id FROM documents GROUP BY text
    ), eff AS (
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_eff
        FROM canon c JOIN documents d ON c.keep_id = d.doc_id
        GROUP BY 1
    ), stats AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ), w AS (
        SELECT s.source, s.n_docs,
               CAST(coalesce(e.n_eff, 0) AS BIGINT) AS n_eff,
               CAST(floor(sqrt(CAST(coalesce(e.n_eff, 0) AS DOUBLE)))
                    AS BIGINT) AS w
        FROM stats s LEFT JOIN eff e ON s.source = e.source
    ), totals AS (
        SELECT CAST(sum(w) AS BIGINT) AS sum_w,
               CAST(sum(n_eff) AS BIGINT) AS eff_total
        FROM w
    )
    SELECT source, n_docs, n_eff, w,
           (eff_total * {MIX_BUDGET_PCT} // 100) * w // sum_w AS quota
    FROM w, totals
"""


# ----------------------------------------------------------- dataset card
# The one-row summary every released dataset ships (Gebru et al.
# "Datasheets for Datasets"; HF dataset cards): corpus size, token
# mass, language/source breadth, exact-duplicate rate, and mean doc
# length — each number computed on the SAME rails the dedicated
# operators use (dedup_exact's min-id survivors, the tokenizer
# contract), so the card can never drift from the pipeline it
# describes. All exact integers / half-up micros.
#
# Scale: one tokenize scan (map-side token counts), one text-keyed
# dedup aggregate, two tiny distinct-counts — every stage is an
# aggregation with map-side partials; the card is ONE row.


def curation_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.size(tokenize(F.col("text"))).cast("long").alias("n_toks"),
    )
    base = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    uniq = per.groupBy("text").agg(F.lit(1).alias("_o")).agg(
        F.count(F.lit(1)).alias("n_unique")
    )
    return (
        base.crossJoin(uniq)
        .select(
            "n_docs",
            "n_tokens",
            "n_langs",
            "n_sources",
            "n_unique",
            ratio_micros("n_docs - n_unique", "n_docs").alias(
                "dup_rate_micros"
            ),
            ratio_micros("n_tokens", "n_docs").alias("mean_doc_tokens_micros"),
        )
    )


QUERIES["curation_dataset_card"] = curation_dataset_card


def _dataset_card_oracle() -> str:
    from ..functions.hashing import sql_tokens
    from ..functions.rounding import sql_ratio_micros

    return f"""
    WITH per AS (
        SELECT doc_id, text, lang, source,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS n_toks
        FROM documents
    ), base AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM per
    ), uniq AS (
        SELECT CAST(count(*) AS BIGINT) AS n_unique
        FROM (SELECT 1 FROM per GROUP BY text)
    )
    SELECT n_docs, n_tokens, n_langs, n_sources, n_unique,
           {sql_ratio_micros('n_docs - n_unique', 'n_docs')}
               AS dup_rate_micros,
           {sql_ratio_micros('n_tokens', 'n_docs')}
               AS mean_doc_tokens_micros
    FROM base, uniq
"""


ORACLES["curation_dataset_card"] = _dataset_card_oracle()


# ----------------------------------------- Temperature-scaled mixture
# The multilingual sampling standard between proportional (T=1) and
# uniform (T=∞): source weights ∝ n_s^(1/T) (Conneau & Lample 2019,
# XLM-R's data recipe; T=2 here so the exponent is an exact sqrt —
# IEEE-754 sqrt is CORRECTLY ROUNDED, the one portable transcendental,
# so no grid-snap fragility is possible on the power step). Reported
# next to the raw proportional share so the boost each tail source
# receives is explicit — the quantity a mixture reviewer checks.
#
# Exactness: n_s are BIGINTs; sqrt(n_s) snaps to exact micro-units;
# both share columns are half-up rationals of exact integers. The
# boost ratio divides two already-rounded micro-shares (the contract:
# oracle replays the identical chain).
#
# Scale: one corpus scan → |sources| rows; everything after is
# constant-size arithmetic on the broadcast totals.

def curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    scaled = per.select(
        "lang",
        "n_docs",
        iunits(F.sqrt(F.col("n_docs").cast("double")), 6).alias("w_units"),
    )
    tot = scaled.agg(
        F.sum("n_docs").alias("n_tot"), F.sum("w_units").alias("w_tot")
    )
    return (
        scaled.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            ratio_units_dec("n_docs", "n_tot", 1_000_000).alias(
                "raw_share_micros"
            ),
            ratio_units_dec("w_units", "w_tot", 1_000_000).alias(
                "temp_share_micros"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "raw_share_micros",
            "temp_share_micros",
            F.when(F.col("raw_share_micros") == 0, F.lit(None).cast("long"))
            .otherwise(
                ratio_units_dec(
                    "temp_share_micros * 1000000", "raw_share_micros", 1
                )
            )
            .alias("boost_micros"),
        )
    )


QUERIES["curation_temperature_mixture"] = curation_temperature_mixture

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_temp,
    sql_ratio_units_dec as _sql_rud_temp,
)

ORACLES["curation_temperature_mixture"] = f"""
    WITH per AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ), scaled AS (
        SELECT lang, n_docs,
               {_sql_iu_temp('sqrt(CAST(n_docs AS DOUBLE))', 6)} AS w_units
        FROM per
    ), tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_tot,
               CAST(sum(w_units) AS BIGINT) AS w_tot
        FROM scaled
    ), shares AS (
        SELECT lang, n_docs,
               {_sql_rud_temp('n_docs', 'n_tot', 1_000_000)}
                   AS raw_share_micros,
               {_sql_rud_temp('w_units', 'w_tot', 1_000_000)}
                   AS temp_share_micros
        FROM scaled CROSS JOIN tot
    )
    SELECT lang, n_docs, raw_share_micros, temp_share_micros,
           CASE WHEN raw_share_micros = 0 THEN NULL
                ELSE {_sql_rud_temp('temp_share_micros * 1000000',
                                    'raw_share_micros', 1)}
           END AS boost_micros
    FROM shares
"""


# --------------------------------------- quality/length Pareto frontier
# Round 11: the curation skyline — "the highest-quality document at
# every length budget": a doc is ON the frontier iff no other doc is
# STRICTLY better on both axes (higher distilled-classifier score AND
# fewer tokens; the both-strict dominance contract keeps ties
# symmetric). Selection passes use the frontier as the spend-anything
# anchor set before mixing.
#
# Scale shape: dominance collapses to SCORE GRAIN — P(s) = min tokens
# over all scores > s — so the per-doc check is one broadcast-join
# compare against the exclusive descending prefix-min of per-score
# minima. Scores are near-unique (nano-snapped logreg outputs), so
# the score-grain relation is data-grain: the prefix-min rides the
# distributed rail (operators/ranks.py `mins` support, added this
# round) — bucketed score slices, local cummins, one bucket-grain
# stitch — and the exclusive shift is a row_number self-join at score
# grain, never a single-task sort.


def curation_quality_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize
    from ..operators.ranks import range_bucket, with_global_order
    from .textstats import _lr_scored

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens")
    )
    scored = (
        _lr_scored(spark, sf_dir)
        .select("doc_id", "score_units")
        .join(toks, "doc_id")
    )
    sg = scored.groupBy("score_units").agg(F.min("n_tokens").alias("mt"))
    bounds = sg.agg(
        F.min("score_units").alias("lo"), F.max("score_units").alias("hi")
    )
    ranked = with_global_order(
        sg.crossJoin(F.broadcast(bounds)),
        buckets=[
            -range_bucket(F.col("score_units"), F.col("lo"), F.col("hi"))
        ],
        order=[F.desc("score_units")],
        mins={"icm": F.col("mt")},
        row_number="rn",
    ).select("score_units", "rn", "icm")
    prev = ranked.select(
        (F.col("rn") + 1).alias("rn"), F.col("icm").alias("excl_min")
    )
    pfx = ranked.join(prev, "rn", "left").select("score_units", "excl_min")
    out = scored.join(pfx, "score_units").filter(
        F.col("excl_min").isNull()
        | (F.col("n_tokens") <= F.col("excl_min"))
    )
    return out.select("doc_id", "score_units", "n_tokens")


QUERIES["curation_quality_pareto"] = curation_quality_pareto

from ..functions.hashing import sql_tokens as _sql_tok_qp  # noqa: E402
from .textstats import _sql_logreg as _sql_lr_qp  # noqa: E402

ORACLES["curation_quality_pareto"] = f"""
    WITH perdoc AS ({{_PD}}),
    d AS (
        SELECT p.doc_id, p.score_units,
               CAST(len({_sql_tok_qp('documents.text')}) AS BIGINT)
                   AS n_tokens
        FROM perdoc p JOIN documents ON p.doc_id = documents.doc_id
    )
    SELECT doc_id, score_units, n_tokens
    FROM d
    WHERE NOT EXISTS (
        SELECT 1 FROM d o
        WHERE o.score_units > d.score_units AND o.n_tokens < d.n_tokens
    )
"""

ORACLES["curation_quality_pareto"] = ORACLES["curation_quality_pareto"].replace(
    "{_PD}", _sql_lr_qp(mode="per_doc", score_where="TRUE")
)


# ------------------------------------------- perplexity-band filter
# Round 12: the CCNet/RedPajama-style perplexity gate as a CURATION
# decision (Wenzek et al. 2020 filter "middle" perplexity; the tails
# are junk — too-surprising docs are noise/garbled, too-predictable
# ones are boilerplate): score every document under the corpus's own
# add-one bigram LM (the text_bigram_lm_perplexity model, self-scored
# — the standard bootstrap when no external LM is shippable), then
# keep docs whose per-doc average NLL sits within a SCALE-FREE band
# around the corpus average A: PPL_LO/PPL_DEN·A ≤ avg_d ≤
# PPL_HI/PPL_DEN·A, evaluated as exact cross-multiplied integer
# inequalities (no quantile pass, no doubles — the band adapts to
# corpus scale automatically). The band is a DIAL: ±2% here because
# the synthetic corpus is near-homogeneous (per-doc avg NLL spans
# 0.96–1.06× the mean at sf0.001); a production deployment on web
# text would widen it or swap in CCNet's per-language percentile
# cuts via the exact-quantile rail. Docs with
# no bigram (≤ 1 token) are unscorable and reported, not silently
# kept. Output is the per-source curation report: doc counts, keep
# rate (micros rational), and the kept-mass average NLL (total-ratio,
# not mean-of-ratios — exact). Scale: the LM params are the
# vocabulary-grain relations the perplexity query already builds; the
# per-doc pass is one bigram explode + two vocab-grain equi-joins +
# one doc-grain aggregate — the same shape at any corpus size.


PPL_LO, PPL_HI, PPL_DEN = 49, 51, 50


def curation_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", tokenize(F.col("text")).alias("tk")
    ).localCheckpoint(eager=False)
    k = F.greatest(F.size("tk") - 1, F.lit(0))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("tk", 1, k),
                F.slice("tk", 2, k),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    db = (
        bi.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    gb = db.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=False)
    )
    vt = uni.agg(F.count(F.lit(1)).alias("v"))
    per_doc = (
        db.join(gb, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vt))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("nd"),
            F.sum(
                F.col("n")
                * (
                    iunits(F.log(F.col("c1") + F.col("v")), 9)
                    - iunits(F.log(F.col("c2") + F.lit(1)), 9)
                )
            ).alias("ld"),
        )
    )
    tot = per_doc.agg(
        F.sum("nd").alias("sn"), F.sum("ld").alias("sl")
    )
    dec = "decimal(38,0)"
    scored = (
        toks.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(tot))
    )
    keep = (
        F.col("nd").isNotNull()
        & (
            F.lit(PPL_LO).cast(dec) * F.col("nd") * F.col("sl")
            <= F.lit(PPL_DEN).cast(dec) * F.col("ld") * F.col("sn")
        )
        & (
            F.lit(PPL_DEN).cast(dec) * F.col("ld") * F.col("sn")
            <= F.lit(PPL_HI).cast(dec) * F.col("nd") * F.col("sl")
        )
    )
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("nd").isNull(), 1).otherwise(0)).alias(
            "n_unscorable"
        ),
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(keep, F.col("nd"))).alias("kept_bigrams"),
        F.sum(F.when(keep, F.col("ld"))).alias("kept_nll"),
    )
    return per_src.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_unscorable").cast("long").alias("n_unscorable"),
        F.col("n_kept").cast("long").alias("n_kept"),
        ratio_units("n_kept", "n_docs").alias("keep_rate_micros"),
        F.when(F.coalesce(F.col("kept_bigrams"), F.lit(0)) == 0,
               F.lit(None).cast("long"))
        .otherwise(ratio_units("kept_nll", "kept_bigrams", 1))
        .alias("kept_avg_nll_nanos"),
    ).orderBy("source")


QUERIES["curation_perplexity_filter"] = curation_perplexity_filter

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_ppl,
    sql_ratio_units as _sql_ru_ppl,
)

ORACLES["curation_perplexity_filter"] = f"""
    WITH t AS (
        SELECT doc_id, source, {sql_tokens('text')} AS tk FROM documents
    ), bi AS (
        SELECT doc_id,
               unnest(tk[1:len(tk) - 1]) AS w1,
               unnest(tk[2:len(tk)]) AS w2
        FROM t
    ), db AS (
        SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM bi GROUP BY 1, 2, 3
    ), gb AS (
        SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c2 FROM db GROUP BY 1, 2
    ), uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM (
            SELECT unnest(tk) AS w FROM t
        ) GROUP BY 1
    ), vt AS (
        SELECT CAST(count(*) AS BIGINT) AS v FROM uni
    ), per_doc AS (
        SELECT doc_id,
               CAST(sum(n) AS BIGINT) AS nd,
               CAST(sum(n * ({_sql_iu_ppl('ln(c1 + v)', 9)}
                    - {_sql_iu_ppl('ln(c2 + 1)', 9)})) AS BIGINT) AS ld
        FROM db
        JOIN gb USING (w1, w2)
        JOIN uni ON db.w1 = uni.w
        CROSS JOIN vt
        GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(nd) AS BIGINT) AS sn,
               CAST(sum(ld) AS BIGINT) AS sl
        FROM per_doc
    ), scored AS (
        SELECT t.doc_id, t.source, p.nd, p.ld, sn, sl,
               (p.nd IS NOT NULL
                AND 49 * CAST(p.nd AS HUGEINT) * sl
                    <= 50 * CAST(p.ld AS HUGEINT) * sn
                AND 50 * CAST(p.ld AS HUGEINT) * sn
                    <= 51 * CAST(p.nd AS HUGEINT) * sl) AS keep
        FROM t
        LEFT JOIN per_doc p ON t.doc_id = p.doc_id
        CROSS JOIN tot
    ), rep AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN nd IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unscorable,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN keep THEN nd END) AS BIGINT)
                   AS kept_bigrams,
               CAST(sum(CASE WHEN keep THEN ld END) AS BIGINT) AS kept_nll
        FROM scored GROUP BY 1
    )
    SELECT source, n_docs, n_unscorable, n_kept,
           {_sql_ru_ppl('n_kept', 'n_docs')} AS keep_rate_micros,
           CASE WHEN coalesce(kept_bigrams, 0) = 0 THEN NULL
                ELSE {_sql_ru_ppl('kept_nll', 'kept_bigrams', 1)}
           END AS kept_avg_nll_nanos
    FROM rep
    ORDER BY source
"""
