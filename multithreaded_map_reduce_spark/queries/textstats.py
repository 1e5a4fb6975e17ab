"""Text-analysis operators over the documents fixture (§2d tier):
language-ID heuristic, quality scoring, token counting, fingerprinting,
tf-idf. All pure Column expressions (codegen'd; no Python in the hot
path) with exact DuckDB oracles.

Scale notes:
- every per-document metric is embarrassingly parallel scan work;
- tf-idf is the only shuffling query: one groupBy (doc, term), one
  term-level doc-frequency aggregate joined back (broadcast: vocabulary
  ≪ corpus), one per-doc window for top-k;
- ln() is the one libm call — last-ulp engine differences are possible
  but vanish under pround(6) except on measure-zero boundaries.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import sql_char_shingles, sql_hash_array, sql_poly_hash, sql_token_hash, sql_tokens
from ..functions.hashing import hash_array, poly_hash
from ..functions.rounding import (
    iunits,
    pround,
    ratio_units,
    sql_from_iunits,
    sql_iunits,
    sql_pround,
    sql_ratio_micros,
    sql_ratio_units,
)
from ..functions.text import char_shingles, tokenize
from ..sources.catalog import load_table

# tiny per-language stopword signatures (order = tiebreak priority)
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ein"],
    "en": ["the", "a", "is", "of", "and"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "zh": ["的", "是", "了", "在", "我"],
}
_LANGS = list(STOPWORDS)

_PUNCT_RE = "[.,;:!?]"
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _stop_count(tokens, words: list[str]):
    in_set = F.filter(tokens, lambda t: t.isin(*words))
    return F.size(in_set)


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-signature language ID (argmax, alphabetical tiebreak)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[_stop_count(toks, STOPWORDS[lang]).alias(f"s_{lang}") for lang in _LANGS],
    )
    pred = None
    for i, lang in enumerate(_LANGS):
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"s_{lang}") >= F.col(f"s_{other}") for other in _LANGS[i + 1 :]],
            F.lit(True),
        )
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    scored = scored.withColumn("predicted_lang", pred.otherwise(F.lit(_LANGS[-1])))
    return scored.select(
        "doc_id",
        "lang",
        "predicted_lang",
        F.greatest(*[F.col(f"s_{lang}") for lang in _LANGS]).alias("top_score"),
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristics: token stats + punctuation/stopword ratios and
    a deterministic composite score in [0, 1]."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    stop_all = [w for ws in STOPWORDS.values() for w in ws]
    stop_n = _stop_count(toks, stop_all)
    punct_n = F.regexp_count("text", F.lit(_PUNCT_RE))
    avg_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stop_n.cast("double") / n_tokens).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct_n.cast("double") / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        pround(avg_tok, 6).alias("avg_chars_per_token"),
        pround(stop_ratio, 6).alias("stopword_ratio"),
        pround(punct_ratio, 6).alias("punct_ratio"),
        pround(quality, 6).alias("quality"),
    )


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens vs chars, per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(_BPE_RE)).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: full-text rolling hash + winnowing-style
    min/max char-8-gram hashes (order-insensitive content signature)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    gram_hashes = hash_array(char_shingles(F.col("text"), 8))
    return docs.select(
        "doc_id",
        poly_hash(F.col("text")).alias("fp_full"),
        F.array_min(gram_hashes).alias("fp_min_gram"),
        F.array_max(gram_hashes).alias("fp_max_gram"),
    )


# --- Winnowing (MOSS) fingerprints ------------------------------------------
# Schleimer/Wilkerson/Aiken 2003: positional k-gram hashes, sliding
# window of w, keep each window's MINIMUM hash, dedup — guarantees any
# shared substring of length >= k + w - 1 produces at least one shared
# fingerprint (a coverage guarantee minhash does NOT give), at an
# expected 2/(w+1) sampling density. The per-doc selection is pure
# array expressions (no shuffle); the pair stage is a fingerprint
# equi-join with the same degenerate-bucket cap discipline as LSH —
# O(docs x fps) shuffle, never O(docs^2).

WINNOW_K = 8  # char-gram length
WINNOW_W = 4  # window size; guarantee threshold = K + W - 1 = 11 chars
WINNOW_MAX_BUCKET = 20  # fingerprints shared by more docs are boilerplate
WINNOW_MIN_SHARED = 8  # report pairs sharing at least this many fps


def _winnow_window_mins(hs) -> "Column":
    """Sliding window-W minima of ``hs`` WITHOUT a per-window lambda.

    The naive form — ``transform(sequence(...), i -> array_min(slice(
    hs, i, W)))`` — re-evaluates the ENTIRE interpreted gram-hash fold
    once per window (lambda bodies don't share subexpressions in
    interpreted mode): O(n²·k) per document, measured 170 s for a
    450-doc index build. Chained ``zip_with`` against W-1 shifted
    slices evaluates ``hs`` only W+1 times per row and the lambda body
    is a bare ``least``: m_j[i] = min(hs[i..i+j]) after j steps."""
    n = F.size(hs)
    m = hs
    for j in range(1, WINNOW_W):
        shifted = F.slice(hs, j + 1, F.greatest(n - F.lit(j), F.lit(0)))
        m = F.zip_with(m, shifted, lambda a, b: F.least(a, b))
    return F.slice(m, 1, F.greatest(n - F.lit(WINNOW_W - 1), F.lit(0)))


def winnow_fps_col(c) -> "Column":
    """Winnowing fingerprint set as ONE per-row Column expression
    (streaming-safe — used by the streaming probe; batch consumers go
    through _winnow_fps for the n_grams count)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(WINNOW_K - 1)),
        lambda i: F.substring(c, i, WINNOW_K),
    )
    return F.array_distinct(_winnow_window_mins(hash_array(grams)))


def _winnow_fps(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams INT, fps ARRAY<BIGINT>) — distinct winnowing
    fingerprints per document (docs long enough for >= 1 window).

    The positional char-gram hashes are interpreted HOF lambdas — the
    known slow path — so the input is ``fan_out`` first (one parquet
    split would otherwise pin the fold to one core) and consumers that
    branch over this relation MUST evaluate it once (persist) — see
    dedup_winnowing_pairs, where the unpersisted 4-branch plan
    measured 306 s vs ~8 s persisted."""
    from ..sources.catalog import fan_out

    c = F.col("text")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - F.lit(WINNOW_K - 1)),
        lambda i: F.substring(c, i, WINNOW_K),
    )
    staged = fan_out(
        docs.filter(F.length("text") >= WINNOW_K + WINNOW_W - 1)
    ).select("doc_id", hash_array(grams).alias("hs"))
    return staged.select(
        "doc_id",
        F.size("hs").alias("n_grams"),
        F.array_distinct(_winnow_window_mins(F.col("hs"))).alias("fps"),
    )


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc winnowing fingerprint profile: gram/window/fingerprint
    counts, min/max fingerprint, selection density in micro-units."""
    from ..functions.rounding import ratio_units

    docs = load_table(spark, sf_dir, "documents")
    w = _winnow_fps(docs)
    return w.select(
        "doc_id",
        "n_grams",
        (F.col("n_grams") - F.lit(WINNOW_W - 1)).alias("n_windows"),
        F.size("fps").alias("n_fps"),
        F.array_min("fps").alias("fp_min"),
        F.array_max("fps").alias("fp_max"),
    ).withColumn("density_micros", ratio_units("n_fps", "n_windows"))


def _winnowing_pair_rel(w: DataFrame) -> DataFrame:
    """Lazy (id_a, id_b, shared) pair relation over a (persisted) fps
    frame — fingerprints shared by more than ``WINNOW_MAX_BUCKET`` docs
    are corpus boilerplate and are dropped BEFORE the self-join (the
    LSH ``max_bucket`` discipline)."""
    ex = w.select("doc_id", F.explode("fps").alias("fp"))
    keep_fp = (
        ex.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nb"))
        .filter((F.col("_nb") >= 2) & (F.col("_nb") <= WINNOW_MAX_BUCKET))
        .select("fp")
    )
    exk = ex.join(keep_fp, "fp")
    a = exk.select(F.col("doc_id").alias("id_a"), "fp")
    b = exk.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= WINNOW_MIN_SHARED)
    )


def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by shared winnowing fingerprints, with
    a MOSS-style containment score: shared / min(|fps_a|, |fps_b|)."""
    from pyspark import StorageLevel

    from ..functions.rounding import ratio_units

    docs = load_table(spark, sf_dir, "documents")
    # the interpreted fingerprint fold is branched over FOUR times below
    # (explode ×2 join sides, sizes ×2) — persist so it evaluates once
    w = _winnow_fps(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        pairs = _winnowing_pair_rel(w)
        sizes = w.select("doc_id", F.size("fps").alias("_nf"))
        out = (
            pairs.join(
                sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                    "_nf", "_na"
                ),
                "id_a",
            )
            .join(
                sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                    "_nf", "_nb"
                ),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                "shared",
                ratio_units("shared", "least(_na, _nb)").alias(
                    "containment_micros"
                ),
            )
        )
        # Materialize while the cache is alive WITHOUT routing the pair
        # relation through the driver (VERDICT r7 item 3: at 100 TB the
        # near-dup pair set is millions of rows — the old collect()/
        # createDataFrame finalization was the one unbounded driver-side
        # materialization in the repo). localCheckpoint(eager=True)
        # pins the computed partitions executor-side — the same
        # cache-release pattern connected_components already uses.
        return out.localCheckpoint(eager=True)
    finally:
        w.unpersist()


def dedup_winnowing_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the winnowing pair relation — the
    clusters downstream consumes instead of the clique-quadratic pair
    list (the same pairs→clusters closure as ``dedup_clusters``, on the
    coverage-guaranteed fingerprint rail). ``connected_components``
    localCheckpoints the symmetrized edges at entry, so the fps cache
    can be released as soon as it returns."""
    from pyspark import StorageLevel

    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    w = _winnow_fps(docs).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cc = connected_components(
            _winnowing_pair_rel(w).select("id_a", "id_b")
        )
    finally:
        w.unpersist()
    return cc.select(
        F.col("id").alias("doc_id"), F.col("root").alias("canonical_id")
    )


# (registered at module end - QUERIES/ORACLES dicts are defined later)


# Persisted day-1 winnowing index (streaming probe's static side) —
# same staleness/caching contract as queries/dedup._INDEX_PATHS.
_WINNOW_INDEX_PATHS: dict[str, str] = {}


def _winnow_index_path(spark: SparkSession, sf_dir: str) -> str:
    from ..session import path_cached

    def build() -> str:
        from .connectors import _fixture_path

        path = _fixture_path("winnow_index")
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        w = _winnow_fps(docs)
        ex = w.select(
            F.col("doc_id").alias("match_id"), F.explode("fps").alias("fp")
        )
        sizes = ex.groupBy("fp").agg(F.count(F.lit(1)).alias("_nb"))
        ex.join(sizes, "fp").write.mode("overwrite").parquet(path)
        return path

    return path_cached(_WINNOW_INDEX_PATHS, sf_dir, build)


def _sql_winnow_cte(where: str = "TRUE") -> str:
    """DuckDB CTE ``w(doc_id, n_grams, fps)`` mirroring _winnow_fps."""
    k, win = WINNOW_K, WINNOW_W
    grams = f"list_transform(range(1, length(text) - {k} + 2), i -> text[i:i+{k - 1}])"
    return f"""
        SELECT doc_id, CAST(len(hs) AS INTEGER) AS n_grams,
               list_distinct(list_transform(
                   range(1, len(hs) - {win} + 2),
                   i -> list_min(hs[i:i+{win - 1}]))) AS fps
        FROM (
            SELECT doc_id, {sql_hash_array(grams)} AS hs
            FROM documents WHERE length(text) >= {k + win - 1} AND ({where})
        )
    """


_WINNOW_ORACLES_PLACEHOLDER = None


def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf terms per document (idf = ln(N/df)).

    The doc-frequency relation joins on ``term`` WITHOUT a broadcast
    hint: web-scale vocabulary is unbounded, so an unconditional
    broadcast would eventually OOM the driver. A plain equi-join
    co-partitions tf and df on term, and AQE still converts to a
    runtime broadcast when the measured vocabulary is small — the
    size-gated behavior, decided by stats instead of a hardcoded hint
    (plan-asserted in tests/test_plans.py). The single-row n_docs
    relation needs no hint either: a 1-row nested-loop side is
    broadcast automatically."""
    # no fan_out: measured 0.93 s vs 1.40 s warm at sf0.1 — plain
    # tokenization is cheaper than the extra text shuffle (see corpus._tokens)
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "term",
            pround(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition stats — the within-doc analogue of
    corpus dedup (pipelines drop or down-weight self-repetitive docs):
    token count, distinct-token count, the most-frequent token's count,
    repeated-token ratio, and top-token share. One explode + two
    aggregations, both partitioned by doc_id (the second reuses the
    first's partitioning — a single shuffle end to end)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    agg = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_tok_count"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "max_tok_count",
        pround(
            (F.col("n_tokens") - F.col("n_distinct")).cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("repetition"),
        pround(
            F.col("max_tok_count").cast("double") / F.col("n_tokens"), 6
        ).alias("top_share"),
    )


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text cleaning — the normalization pass that precedes
    exact dedup in a pipeline (so trivially-different copies collapse):
    lowercase, punctuation → space, whitespace collapse, trim. Pure
    codegen'd Column expressions; output includes a portable hash of
    the normalized form so the downstream dedup key is right here."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), _PUNCT_RE, " "), r"\s+", " "
        )
    )
    from ..functions.hashing import token_hash

    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("norm_chars"),
        token_hash(norm).alias("norm_hash"),
    )


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring — the perplexity-style quality
    filter (CCNet lineage): P(tok) is the corpus-wide unigram relative
    frequency; each doc gets avg negative log-likelihood (low = fluent/
    typical, high = outlier). Two aggregations + one term-keyed join
    (AQE broadcasts the vocabulary when small; unbounded vocabularies
    shuffle-join — same reasoning as tf-idf). ln under pround(6) is
    engine-stable off measure-zero boundaries."""
    from ..functions.rounding import from_iunits, iunits

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    freq = terms.groupBy("tok").agg(F.count("*").alias("c"))
    total = terms.select(F.count("*").alias("total"))
    # per-token nll → integer nano-units BEFORE summing: double sums are
    # order-dependent across engines; integer sums are exact (the iunits
    # discipline — ln itself is the only libm call, same as tf-idf)
    scored = (
        terms.join(freq, "tok")
        .crossJoin(total)
        .select(
            "doc_id",
            iunits(-F.log(F.col("c").cast("double") / F.col("total")), 9).alias("nllu"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        pround(from_iunits(F.sum("nllu"), 9) / F.count("*"), 6).alias("avg_nll"),
    )


QUERIES = {
    "text_lang_id": text_lang_id,
    "text_quality": text_quality,
    "text_token_count": text_token_count,
    "text_fingerprint": text_fingerprint,
    "text_tfidf_top_terms": text_tfidf_top_terms,
    "text_repetition": text_repetition,
    "text_normalize": text_normalize,
    "text_lm_score": text_lm_score,
}


def _sql_stop_count(words: list[str]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({sql_tokens('text')}, t -> t IN ({in_list})))"


def _sql_lang_case() -> str:
    branches = []
    for i, lang in enumerate(_LANGS):
        conds = [f"s_{lang} >= s_{other}" for other in _LANGS[i + 1 :]] or ["TRUE"]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{_LANGS[-1]}' END"


_ALL_STOPS = [w for ws in STOPWORDS.values() for w in ws]

ORACLES = {
    "text_lang_id": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {", ".join(f'CAST({_sql_stop_count(STOPWORDS[lang])} AS INTEGER) AS s_{lang}' for lang in _LANGS)}
            FROM documents
        )
        SELECT doc_id, lang, {_sql_lang_case()} AS predicted_lang,
               greatest({", ".join(f's_{lang}' for lang in _LANGS)}) AS top_score
        FROM scored
    """,
    "text_quality": f"""
        WITH base AS (
            SELECT doc_id,
                   CAST(len({sql_tokens('text')}) AS INTEGER) AS n_tokens,
                   CAST({_sql_stop_count(_ALL_STOPS)} AS INTEGER) AS stop_n,
                   CAST(len(regexp_extract_all(text, '{_PUNCT_RE}')) AS INTEGER) AS punct_n,
                   CAST(length(text) AS INTEGER) AS n_chars
            FROM documents
        ), ratios AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS avg_tok,
                   CASE WHEN n_tokens > 0 THEN CAST(stop_n AS DOUBLE) / n_tokens ELSE 0.0 END AS stop_ratio,
                   CASE WHEN n_chars > 0 THEN CAST(punct_n AS DOUBLE) / n_chars ELSE 0.0 END AS punct_ratio
            FROM base
        )
        SELECT doc_id, n_tokens,
               {sql_pround('avg_tok', 6)} AS avg_chars_per_token,
               {sql_pround('stop_ratio', 6)} AS stopword_ratio,
               {sql_pround('punct_ratio', 6)} AS punct_ratio,
               {sql_pround('0.4 * stop_ratio + 0.3 * (1.0 - punct_ratio) + 0.3 * least(1.0, CAST(n_tokens AS DOUBLE) / 100.0)', 6)} AS quality
        FROM ratios
    """,
    "text_token_count": f"""
        SELECT doc_id,
               CAST(len({sql_tokens('text')}) AS INTEGER) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS INTEGER) AS n_bpe_tokens,
               CAST(length(text) AS INTEGER) AS n_chars
        FROM documents
    """,
    "text_fingerprint": f"""
        SELECT doc_id,
               {sql_poly_hash('text')} AS fp_full,
               list_min({sql_hash_array(sql_char_shingles('text', 8))}) AS fp_min_gram,
               list_max({sql_hash_array(sql_char_shingles('text', 8))}) AS fp_max_gram
        FROM documents WHERE length(text) > 0
    """,
    "text_tfidf_top_terms": f"""
        WITH terms AS (
            SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
        ), tf AS (
            SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
        ), df AS (
            SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM terms)
            GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, term, tfidf, rank FROM (
            SELECT tf.doc_id, tf.term,
                   {sql_pround('tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)', 6)} AS tfidf,
                   CAST(row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY {sql_pround('tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)', 6)} DESC,
                                tf.term ASC
                   ) AS INTEGER) AS rank
            FROM tf JOIN df ON tf.term = df.term, n
        ) WHERE rank <= 3
    """,
    "text_repetition": f"""
        WITH terms AS (
            SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
        ), per_tok AS (
            SELECT doc_id, tok, count(*) AS c FROM terms GROUP BY doc_id, tok
        ), agg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_distinct,
                   CAST(max(c) AS BIGINT) AS max_tok_count
            FROM per_tok GROUP BY doc_id
        )
        SELECT doc_id, n_tokens, n_distinct, max_tok_count,
               {sql_pround('CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens', 6)}
                   AS repetition,
               {sql_pround('CAST(max_tok_count AS DOUBLE) / n_tokens', 6)}
                   AS top_share
        FROM agg
    """,
    "text_normalize": f"""
        SELECT doc_id, norm_text,
               CAST(length(norm_text) AS INTEGER) AS norm_chars,
               {sql_token_hash('norm_text')} AS norm_hash
        FROM (
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text),
                        '{_PUNCT_RE}', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_text
            FROM documents
        )
    """,
    "text_lm_score": f"""
        WITH terms AS (
            SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
        ), freq AS (
            SELECT tok, count(*) AS c FROM terms GROUP BY tok
        ), total AS (SELECT count(*) AS total FROM terms)
        SELECT doc_id,
               count(*) AS n_tokens,
               {sql_pround(
                   f"({sql_from_iunits('sum(' + sql_iunits('-ln(CAST(c AS DOUBLE) / total)', 9) + ')', 9)}) / count(*)",
                   6,
               )} AS avg_nll
        FROM terms JOIN freq USING (tok), total
        GROUP BY doc_id
    """,
}


# --- BM25 ranked retrieval ---------------------------------------------------

BM25_QUERY = ["table", "merge", "window"]  # fixed query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15


def bm25_scored(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 BM25_QUERY term —
    the scored relation shared by ``search_bm25`` and the RRF fusion
    (queries/retrieval.py)."""
    terms = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    qt = terms.filter(F.col("term").isin(*BM25_QUERY))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.select(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom
    return (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(n_docs)
        .crossJoin(avgdl)
        .groupBy("doc_id")
        .agg(pround(F.sum(contrib), 6).alias("bm25"))
    )


def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval for a fixed query — the ranked-search
    counterpart of tf-idf (idf = ln((N - df + 0.5) / (df + 0.5) + 1),
    the standard non-negative variant).

    Plan shape: one tokenize/explode scan feeds BOTH the per-doc tf
    relation (filtered to the 3 query terms BEFORE the aggregate — the
    predicate prunes ~all rows pre-shuffle) and the per-doc length
    relation; df comes from the tf relation itself (count of docs per
    query term — tiny, broadcast back); avgdl is a 1-row relation. The
    only big shuffles are doc_id-keyed and AQE-coalesced. Determinism:
    ln/division under pround(6) with (score, doc_id) tiebreak, same as
    text_tfidf_top_terms."""
    scored = bm25_scored(load_table(spark, sf_dir, "documents"))
    # TakeOrdered top-k (no global sort shuffle); the rank window then
    # runs on the BM25_TOPK surviving rows only.
    top = scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(BM25_TOPK)
    w = W.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "bm25", "rank"
    )


# --- BPE-style pair induction ------------------------------------------------

BPE_TOPK = 20


def bpe_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first induction step of byte-pair encoding: corpus-wide
    counts of adjacent character pairs inside words, weighted by word
    frequency — the statistic whose argmax becomes the first BPE merge.

    Scale: the corpus collapses to the VOCABULARY before any
    per-character work (groupBy token → word counts), so the expensive
    explode runs on |vocab| rows, not |corpus| rows — the same
    shrink-first trick a tokenizer trainer uses. Integer-exact, no
    floats anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("wfreq"))
    pairs = (
        vocab.filter(F.length("tok") >= 2)
        .select(
            "wfreq",
            F.explode(
                F.sequence(F.lit(1), F.length("tok") - F.lit(1))
            ).alias("i"),
            "tok",
        )
        .select(F.expr("substring(tok, i, 2)").alias("pair"), "wfreq")
    )
    counted = pairs.groupBy("pair").agg(F.sum("wfreq").alias("pair_count"))
    # TakeOrdered top-k, then rank over the surviving BPE_TOPK rows.
    top = counted.orderBy(F.desc("pair_count"), F.asc("pair")).limit(BPE_TOPK)
    w = W.orderBy(F.desc("pair_count"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "pair", "pair_count", "rank"
    )


QUERIES["search_bm25"] = search_bm25
QUERIES["bpe_top_pairs"] = bpe_top_pairs

_BM25_IDF = "ln((n.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)"
_BM25_DENOM = (
    f"tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} "
    "* CAST(dl.dl AS DOUBLE) / a.avgdl)"
)

def sql_bm25_ctes() -> str:
    """The BM25 scored relation as a DuckDB CTE block ending in
    ``scored(doc_id, bm25)`` — shared by the search_bm25 oracle and the
    RRF fusion oracle (queries/retrieval.py)."""
    return f"""terms AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms
        WHERE term IN ({", ".join(f"'{t}'" for t in BM25_QUERY)})
        GROUP BY 1, 2
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    a AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
    scored AS (
        SELECT tf.doc_id,
               {sql_pround(
                   f'sum({_BM25_IDF} * (tf.tf * {BM25_K1 + 1.0}) / ({_BM25_DENOM}))',
                   6,
               )} AS bm25
        FROM tf
        JOIN df USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id, n, a
        GROUP BY 1
    )"""


ORACLES["search_bm25"] = f"""
    WITH {sql_bm25_ctes()}
    SELECT doc_id, bm25, rank FROM (
        SELECT doc_id, bm25,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                    AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {BM25_TOPK}
"""

ORACLES["bpe_top_pairs"] = f"""
    WITH vocab AS (
        SELECT tok, count(*) AS wfreq
        FROM (SELECT unnest({sql_tokens('text')}) AS tok FROM documents)
        GROUP BY 1
    ), p AS (
        SELECT substring(tok, CAST(i AS INTEGER), 2) AS pair, wfreq
        FROM (
            SELECT tok, wfreq, unnest(range(1, length(tok))) AS i
            FROM vocab WHERE length(tok) >= 2
        )
    ), counted AS (
        SELECT pair, CAST(sum(wfreq) AS BIGINT) AS pair_count
        FROM p GROUP BY 1
    )
    SELECT pair, pair_count, rank FROM (
        SELECT pair, pair_count,
               CAST(row_number() OVER (ORDER BY pair_count DESC, pair ASC)
                    AS INTEGER) AS rank
        FROM counted
    ) WHERE rank <= {BPE_TOPK}
"""


# BPE ENCODE: a fixed ranked merge table (what a tokenizer's merges.txt
# ships); later merges may reference units built by earlier ones.
BPE_MERGES = [
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("e", "r"),
    ("o", "n"),
    ("r", "e"),
    ("s", "t"),
]
_U0, _U1 = "\x01", "\x02"  # unit delimiters — cannot occur in text tokens


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY a BPE merge table (the encode side of ``bpe_top_pairs``'s
    train side): each word becomes a sequence of single-char units
    (every char wrapped in sentinel delimiters), then the merges run in
    rank order as chained LITERAL string replaces — ``replace`` in both
    engines substitutes non-overlapping occurrences left-to-right,
    which is exactly BPE's greedy merge semantics, so the entire encode
    is a chain of codegen'd built-ins: no UDF, no per-character
    higher-order fold, no loop.

    Corpus→vocab collapse first (the bpe_top_pairs trick): the encode
    runs once per DISTINCT word, and per-word unit counts re-weight by
    word frequency. Output: one row per merge — its rank, the merged
    unit, the weighted number of times the unit appears in the encoded
    corpus, and how many distinct words contain it. Exact integers
    end-to-end.

    100 TB: vocab collapse bounds the expensive stage at |vocab|; the
    replace chain is scan-local; the only shuffles are the vocab
    groupBy and the final 8-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("wfreq"))
    enc = F.regexp_replace(F.col("tok"), "(.)", f"{_U0}$1{_U1}")
    for a, b in BPE_MERGES:
        enc = F.replace(
            enc, F.lit(f"{_U0}{a}{_U1}{_U0}{b}{_U1}"), F.lit(f"{_U0}{a}{b}{_U1}")
        )
    encoded = vocab.select("tok", "wfreq", enc.alias("enc"))
    per_merge = [
        F.struct(
            F.lit(rank + 1).alias("rank"),
            F.lit(a + b).alias("unit"),
            (
                (
                    F.length("enc")
                    - F.length(F.replace(F.col("enc"), F.lit(f"{_U0}{a}{b}{_U1}")))
                )
                / F.lit(len(a + b) + 2)
            )
            .cast("long")
            .alias("occ"),
        )
        for rank, (a, b) in enumerate(BPE_MERGES)
    ]
    exploded = encoded.select(
        "wfreq", F.explode(F.array(*per_merge)).alias("m")
    ).select("wfreq", "m.rank", "m.unit", "m.occ")
    return (
        exploded.groupBy("rank", "unit")
        .agg(
            F.sum(F.col("occ") * F.col("wfreq")).alias("occurrences"),
            F.sum(F.when(F.col("occ") > 0, 1).otherwise(0)).alias("n_distinct_words"),
        )
    )


QUERIES["bpe_encode"] = bpe_encode


def _bpe_encode_oracle() -> str:
    enc = f"regexp_replace(tok, '(.)', '{_U0}\\1{_U1}', 'g')"
    for a, b in BPE_MERGES:
        enc = f"replace({enc}, '{_U0}{a}{_U1}{_U0}{b}{_U1}', '{_U0}{a}{b}{_U1}')"
    selects = " UNION ALL ".join(
        f"""SELECT {rank + 1} AS rank, '{a + b}' AS unit, wfreq,
            (length(enc) - length(replace(enc, '{_U0}{a}{b}{_U1}', '')))
                // {len(a + b) + 2} AS occ
            FROM encoded"""
        for rank, (a, b) in enumerate(BPE_MERGES)
    )
    return f"""
        WITH vocab AS (
            SELECT tok, count(*) AS wfreq FROM (
                SELECT unnest({sql_tokens('text')}) AS tok FROM documents
            ) GROUP BY tok
        ), encoded AS (
            SELECT tok, wfreq, {enc} AS enc FROM vocab
        ), ex AS ({selects})
        SELECT rank, unit,
               CAST(sum(occ * wfreq) AS BIGINT) AS occurrences,
               CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_distinct_words
        FROM ex GROUP BY rank, unit
    """


ORACLES["bpe_encode"] = _bpe_encode_oracle()


def text_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring — the conditional upgrade of
    ``text_lm_score``: each transition scores −ln P(wᵢ | wᵢ₋₁) with
    P = c(wᵢ₋₁wᵢ) / c(wᵢ₋₁ ·) from corpus counts (scoring the training
    corpus itself, so every observed bigram has c ≥ 1 — no smoothing
    zeros). Per-transition nll is fixed to integer nano-units BEFORE
    summing (double-sum order varies across engines; integer sums
    don't). Docs with < 2 tokens carry no transitions and drop out.

    Scale: two count aggregations + two term-keyed joins over bigram
    instances — same shuffle shape as tf-idf with a 2-gram key. The
    conditional denominator is the count of instances SHARING the left
    token, itself a mergeable count."""
    from ..functions.rounding import from_iunits, iunits

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    inst = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("l"),
                    F.concat_ws(
                        " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                    ).alias("b"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.l").alias("l"), F.col("s.b").alias("b"))
    cb = inst.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    cl = inst.groupBy("l").agg(F.count(F.lit(1)).alias("cl"))
    scored = (
        inst.join(cb, "b")
        .join(cl, "l")
        .select(
            "doc_id",
            iunits(-F.log(F.col("cb").cast("double") / F.col("cl")), 9).alias("nllu"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        pround(from_iunits(F.sum("nllu"), 9) / F.count(F.lit(1)), 6).alias("avg_nll"),
    )


QUERIES["text_lm_bigram"] = text_lm_bigram

ORACLES["text_lm_bigram"] = f"""
    WITH t AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
        WHERE len({sql_tokens('text')}) >= 2
    ), inst AS (
        SELECT doc_id, s['l'] AS l, s['b'] AS b FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(toks) - 1),
                       i -> {{'l': toks[i], 'b': toks[i] || ' ' || toks[i + 1]}}))
                       AS s
            FROM t
        )
    ), cb AS (
        SELECT b, count(*) AS cb FROM inst GROUP BY 1
    ), cl AS (
        SELECT l, count(*) AS cl FROM inst GROUP BY 1
    ), scored AS (
        SELECT doc_id,
               CAST(floor(-ln(CAST(cb.cb AS DOUBLE) / cl.cl) * 1000000000.0 + 0.5)
                   AS BIGINT) AS nllu
        FROM inst JOIN cb USING (b) JOIN cl USING (l)
    )
    SELECT doc_id,
           count(*) AS n_transitions,
           {sql_pround('(CAST(sum(nllu) AS DOUBLE) / 1000000000.0) / count(*)', 6)}
               AS avg_nll
    FROM scored GROUP BY doc_id
"""


# ------------------------------------------------------------ BPE TRAIN
# The iterative side of the tokenizer story: bpe_top_pairs counts the
# FIRST merge's statistic, bpe_encode APPLIES a shipped merge table —
# bpe_train LEARNS the table: N rounds of (count adjacent unit pairs →
# take the argmax → merge it everywhere), the textbook BPE training
# loop. Iterative-op discipline (pagerank/kmeans house rules): a FIXED
# round count, exact integer counts, a deterministic argmax tiebreak
# (count DESC, pair ASC), and an oracle that unrolls the identical
# rounds as CTEs. Per round the driver collects exactly ONE row (the
# winning merge — it must become a literal in the next round's replace
# chain, the same way kmeans centroids parameterize the next assignment
# pass); all counting is distributed.
#
# 100 TB: the corpus collapses to the VOCABULARY before any
# per-character work (the bpe_top_pairs trick), so each round is a
# groupBy over |vocab| exploded units — and real tokenizer training
# (e.g. SentencePiece's BPE) does exactly this vocab-collapse too.

BPE_TRAIN_ROUNDS = 3


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("wfreq"))

    enc = F.regexp_replace(F.col("tok"), "(.)", f"{_U0}$1{_U1}")
    learned: list[tuple[int, str, str, int]] = []
    for rnd in range(1, BPE_TRAIN_ROUNDS + 1):
        encoded = vocab.select("wfreq", enc.alias("enc"))
        # encoded string → unit array: split at unit ends, drop the
        # trailing empty, strip each unit's leading start-sentinel.
        us = F.filter(
            F.transform(
                F.split(F.col("enc"), _U1), lambda u: F.substring(u, 2, 1_000_000)
            ),
            lambda u: u != F.lit(""),
        )
        with_units = encoded.select("wfreq", us.alias("us"), F.size(us).alias("k"))
        z = F.arrays_zip(
            F.col("us").alias("a"),
            F.slice("us", 2, F.greatest(F.col("k") - 1, F.lit(0))).alias("b"),
        )
        pairs = (
            with_units.select("wfreq", F.posexplode(z).alias("pos", "z"))
            .filter(F.col("z.b").isNotNull())
            .select("wfreq", F.col("z.a").alias("a"), F.col("z.b").alias("b"))
        )
        counted = pairs.groupBy("a", "b").agg(F.sum("wfreq").alias("pair_count"))
        top = counted.orderBy(
            F.desc("pair_count"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            # no adjacent pairs left (empty corpus, or every word merged
            # to a single unit): return the merges learned so far — the
            # empty-input totality every operator guarantees
            # (tests/test_empty_inputs.py; ADVICE r4)
            break
        best = top[0]
        learned.append((rnd, best["a"], best["b"], best["pair_count"]))
        enc = F.replace(
            enc,
            F.lit(f"{_U0}{best['a']}{_U1}{_U0}{best['b']}{_U1}"),
            F.lit(f"{_U0}{best['a']}{best['b']}{_U1}"),
        )
    return spark.createDataFrame(
        learned, "round int, pair_a string, pair_b string, pair_count long"
    )


QUERIES["bpe_train"] = bpe_train


def _bpe_train_oracle() -> str:
    u0, u1 = _U0, _U1
    ctes = [
        f"""vocab AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS wfreq
        FROM (SELECT unnest({sql_tokens('text')}) AS tok FROM documents)
        GROUP BY 1
    ), enc1 AS (
        SELECT wfreq, regexp_replace(tok, '(.)', '{u0}\\1{u1}', 'g') AS enc
        FROM vocab
    )"""
    ]
    for r in range(1, BPE_TRAIN_ROUNDS + 1):
        ctes.append(f"""us{r} AS (
        SELECT wfreq,
               list_filter(list_transform(str_split(enc, '{u1}'), u -> u[2:]),
                           u -> u != '') AS us
        FROM enc{r}
    ), c{r} AS (
        SELECT a, b, CAST(sum(wfreq) AS BIGINT) AS pair_count FROM (
            SELECT us[i] AS a, us[i + 1] AS b, wfreq
            FROM (SELECT wfreq, us, unnest(range(1, len(us))) AS i FROM us{r})
        ) GROUP BY 1, 2
    ), b{r} AS (
        SELECT a, b, pair_count FROM c{r}
        ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
    ), enc{r + 1} AS (
        SELECT wfreq,
               replace(enc, '{u0}' || b{r}.a || '{u1}{u0}' || b{r}.b || '{u1}',
                       '{u0}' || b{r}.a || b{r}.b || '{u1}') AS enc
        FROM enc{r}, b{r}
    )""")
    unions = "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS round, a AS pair_a, b AS pair_b, pair_count FROM b{r}"
        for r in range(1, BPE_TRAIN_ROUNDS + 1)
    )
    return "WITH " + ", ".join(ctes) + "\n    " + unions


ORACLES["bpe_train"] = _bpe_train_oracle()


# ------------------------------------------------------ vocab coverage
# Tokenizer-ops metric: fix a vocabulary (the top-VOCAB_N corpus tokens
# by frequency, token-ascending tiebreak) and report per-language OOV —
# the out-of-vocabulary token share a tokenizer/embedding table of that
# size would face. The vocab relation is a top-k aggregate (TakeOrdered,
# no global sort) and joins the exploded tokens key-equi (vocabulary ≪
# corpus; AQE broadcasts — the tfidf precedent); OOV is the left-anti
# null branch of that join, counted per language.

VOCAB_N = 20


def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(VOCAB_N)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    joined = toks.join(vocab, "tok", "left")
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            pround(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("oov_rate"),
        )
    )


QUERIES["text_vocab_coverage"] = text_vocab_coverage

ORACLES["text_vocab_coverage"] = f"""
    WITH toks AS (
        SELECT lang, unnest({sql_tokens('text')}) AS tok FROM documents
    ), vocab AS (
        SELECT tok FROM (
            SELECT tok, count(*) AS cnt FROM toks GROUP BY 1
        ) ORDER BY cnt DESC, tok ASC LIMIT {VOCAB_N}
    ), flagged AS (
        SELECT t.lang, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           {sql_pround('CAST(sum(oov) AS DOUBLE) / CAST(count(*) AS DOUBLE)', 6)}
               AS oov_rate
    FROM flagged GROUP BY 1
"""


# ------------------------------------------ interpolated (JM) LM score
# Jelinek–Mercer interpolation — the smoothing step between
# text_lm_score (unigram) and text_lm_bigram (conditional):
# P(w|prev) = λ·c(prev w)/c(prev ·) + (1−λ)·c(w)/N. The interpolation
# is what makes a bigram LM usable on unseen text (an unseen bigram
# backs off to the unigram instead of −ln 0); here it is scored over
# the training corpus so the oracle stays exact. Same discipline as
# the other LM queries: the double probability is computed with one
# fixed expression shape in both engines, each transition's −ln snaps
# to integer nano-units BEFORE the per-doc sum. Same shuffle shape as
# tf-idf plus one broadcast-able unigram relation and a 1-row N.

LM_LAMBDA = 0.7


def text_lm_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import from_iunits, iunits

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokenize(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    inst = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("l"),
                    F.element_at("toks", i + 1).alias("r"),
                    F.concat_ws(
                        " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                    ).alias("b"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.l").alias("l"), F.col("s.r").alias("r"), F.col("s.b").alias("b"))
    all_toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tokenize(F.col("text"))).alias("w")
    )
    cu = all_toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    n_tot = all_toks.agg(F.count(F.lit(1)).alias("n_tot"))
    cb = inst.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    cl = inst.groupBy("l").agg(F.count(F.lit(1)).alias("cl"))
    lam = F.lit(LM_LAMBDA)
    p = lam * (F.col("cb").cast("double") / F.col("cl").cast("double")) + (
        F.lit(1.0) - lam
    ) * (F.col("cu").cast("double") / F.col("n_tot").cast("double"))
    scored = (
        inst.join(cb, "b")
        .join(cl, "l")
        .join(cu.withColumnRenamed("w", "r"), "r")
        .crossJoin(n_tot)
        .select("doc_id", iunits(-F.log(p), 9).alias("nllu"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        pround(from_iunits(F.sum("nllu"), 9) / F.count(F.lit(1)), 6).alias("avg_nll"),
    )


QUERIES["text_lm_interpolated"] = text_lm_interpolated

ORACLES["text_lm_interpolated"] = f"""
    WITH t AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
        WHERE len({sql_tokens('text')}) >= 2
    ), inst AS (
        SELECT doc_id, toks[i] AS l, toks[i + 1] AS r,
               toks[i] || ' ' || toks[i + 1] AS b
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t)
    ), at2 AS (
        SELECT unnest({sql_tokens('text')}) AS w FROM documents
    ), cu AS (
        SELECT w, CAST(count(*) AS BIGINT) AS cu FROM at2 GROUP BY 1
    ), nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM at2),
    cb AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM inst GROUP BY 1),
    cl AS (SELECT l, CAST(count(*) AS BIGINT) AS cl FROM inst GROUP BY 1),
    scored AS (
        SELECT doc_id,
               CAST(floor((-ln({LM_LAMBDA} * (CAST(cb AS DOUBLE) / CAST(cl AS DOUBLE))
                           + {1.0 - LM_LAMBDA} * (CAST(cu.cu AS DOUBLE) / CAST(n_tot AS DOUBLE))))
                          * 1000000000.0 + 0.5) AS BIGINT) AS nllu
        FROM inst
        JOIN cb USING (b)
        JOIN cl USING (l)
        JOIN cu ON inst.r = cu.w
        CROSS JOIN nt
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_transitions,
           {sql_pround('(CAST(sum(nllu) AS DOUBLE) / 1000000000.0) / count(*)', 6)}
               AS avg_nll
    FROM scored GROUP BY 1
"""


# ---------------------------------------------------------- Zipf fit
# Does the corpus obey Zipf's law? Log-log least squares of word
# frequency against frequency rank: slope ≈ −1 for natural language,
# far off for synthetic/TEMPLATED corpora — a cheap generator-artifact
# detector for training data. Ranks use a deterministic (count DESC,
# word ASC) row_number; both ln() calls run on identical doubles and
# the regression moments accumulate in integer 1e-6 units (the exact-
# sum discipline), so slope/intercept are engine-identical after
# pround. One vocabulary aggregate + one 1-row reduction.


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import from_iunits, iunits

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.orderBy(F.desc("cnt"), F.asc("word"))
    pts = wc.withColumn("rank", F.row_number().over(w)).select(
        iunits(F.log(F.col("rank").cast("double")), 6).alias("x"),
        iunits(F.log(F.col("cnt").cast("double")), 6).alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e12)
    sxx = F.col("sxx").cast("double") / F.lit(1e12)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    from ..functions.rounding import pround

    return m.select(
        F.col("n").alias("vocab_size"),
        pround(slope, 6).alias("zipf_slope"),
        pround((sy - slope * sx) / n, 6).alias("zipf_intercept"),
    )


QUERIES["text_zipf_fit"] = text_zipf_fit

ORACLES["text_zipf_fit"] = f"""
    WITH wc AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({sql_tokens('text')}) AS word FROM documents)
        GROUP BY 1
    ), pts AS (
        SELECT {sql_iunits('ln(CAST(rank AS DOUBLE))', 6)} AS x,
               {sql_iunits('ln(CAST(cnt AS DOUBLE))', 6)} AS y
        FROM (
            SELECT cnt,
                   row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank
            FROM wc
        )
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT n AS vocab_size,
           {sql_pround(
               '(CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)'
               ' - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))'
               ' / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)'
               ' - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))', 6
           )} AS zipf_slope,
           {sql_pround(
               '((CAST(sy AS DOUBLE) / 1e6)'
               ' - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)'
               ' - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))'
               ' / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)'
               ' - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6)))'
               ' * (CAST(sx AS DOUBLE) / 1e6)) / CAST(n AS DOUBLE)', 6
           )} AS zipf_intercept
    FROM m
"""


# ----------------------------------------------------- token entropy
# Shannon entropy of each language's token distribution — the
# "natural vs templated" diversity signal (a low-entropy slice is
# boilerplate; curation pipelines down-weight it). Identity used:
# H = ln(N) − (Σ c·ln c)/N over per-(lang, token) counts c, so the only
# per-term float is ln(c) — snapped to integer nano-units and WEIGHTED
# BY THE EXACT COUNT before the order-free BIGINT sum (the lm-score
# discipline). Two grouped counts, nothing else.


def text_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("lang", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_lang = tc.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.col("c") * iunits(F.log(F.col("c").cast("double")), 9)).alias(
            "_clnc"
        ),
    )
    h = F.log(F.col("n_tokens").cast("double")) - (
        F.col("_clnc").cast("double") / F.lit(1e9)
    ) / F.col("n_tokens").cast("double")
    return per_lang.select(
        "lang",
        "n_tokens",
        "vocab",
        pround(h, 6).alias("entropy_nats"),
    )


QUERIES["text_entropy_by_lang"] = text_entropy_by_lang

ORACLES["text_entropy_by_lang"] = f"""
    WITH tc AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT lang, unnest({sql_tokens('text')}) AS tok FROM documents)
        GROUP BY 1, 2
    ), per_lang AS (
        SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(c * {sql_iunits('ln(CAST(c AS DOUBLE))', 9)}) AS BIGINT)
                   AS _clnc
        FROM tc GROUP BY 1
    )
    SELECT lang, n_tokens, vocab,
           {sql_pround(
               'ln(CAST(n_tokens AS DOUBLE))'
               ' - (CAST(_clnc AS DOUBLE) / 1e9) / CAST(n_tokens AS DOUBLE)', 6
           )} AS entropy_nats
    FROM per_lang
"""


# --- Gopher-style repetition filters ----------------------------------------
# The within-document n-gram repetition signals of Rae et al. 2021
# (Gopher, table A1): fraction of n-gram occurrences taken by the most
# frequent n-gram, and fraction that are repeats of an earlier
# occurrence. Pretraining pipelines drop documents exceeding these —
# the template-heavy half of a crawl that token-level stats
# (text_repetition) under-detect because individual tokens stay
# diverse while PHRASES loop.
#
# Scale: one tokenize scan per n; n-grams come from the zip-at-explode
# trick (arrays_zip of shifted slices — no window, no shuffle before
# the doc_id-keyed counts); both aggregations partial map-side. The
# keep flag applies the thresholds; emitted as INTEGER for portable
# hashing.

GOPHER_TOP2_MAX = 0.20
GOPHER_TOP3_MAX = 0.18
GOPHER_DUP2_MAX = 0.60
# Integer micro-unit twins — spelled out (NOT ``int(0.18 * 1e6)``,
# whose float product can truncate to 179999):
GOPHER_TOP2_MAX_MICROS = 200_000
GOPHER_TOP3_MAX_MICROS = 180_000
GOPHER_DUP2_MAX_MICROS = 600_000


def _ngram_stat(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, n_grams, top_c, dup_c) over word n-grams — all BIGINT.

    ``top_c`` = count of the most frequent gram, ``dup_c`` = grams
    beyond first occurrence (``sum(c) - count(distinct grams)``); the
    Gopher fractions are derived from these integers via pure-BIGINT
    ``ratio_micros`` in the caller (VERDICT r6 item 2: the prounded
    double ratios were the only FP in the query and went driver-red on
    a rounding-boundary ulp)."""
    base = docs.select("doc_id", tokenize(F.col("text")).alias("t")).filter(
        F.size("t") >= n
    )
    shifted = [
        F.slice("t", i + 1, F.greatest(F.size("t") - i, F.lit(0))).alias(f"s{i}")
        for i in range(1, n)
    ]
    ex = base.select(
        "doc_id",
        F.size("t").alias("k"),
        F.posexplode(F.arrays_zip(F.col("t").alias("g0"), *shifted)).alias("pos", "z"),
    )
    gram = F.concat_ws(
        " ", F.col("z.g0"), *[F.col(f"z.s{i}") for i in range(1, n)]
    )
    rows = ex.filter(F.col("pos") + n <= F.col("k")).select(
        "doc_id", gram.alias("gram")
    )
    per_gram = rows.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("top_c"),
        (F.sum("c") - F.count(F.lit(1))).alias("dup_c"),
    )


def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZERO floating point anywhere: the three repetition fractions are
    BIGINT micro-units from :func:`ratio_micros` and the keep flag
    compares those integers against integer thresholds (0.20 → 200000
    etc.), so the query is bit-exact on any FMA/libm build."""
    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents")
    g2 = _ngram_stat(docs, 2).select(
        "doc_id",
        F.col("n_grams").alias("n_bigrams"),
        F.col("top_c").alias("top2_c"),
        F.col("dup_c").alias("dup2_c"),
    )
    g3 = _ngram_stat(docs, 3).select(
        "doc_id",
        F.col("top_c").alias("top3_c"),
        F.col("n_grams").alias("n_trigrams"),
    )
    out = (
        docs.select("doc_id")
        .join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce(ratio_micros("top2_c", "n_bigrams"), F.lit(0)).alias(
                "top2_frac_micros"
            ),
            F.coalesce(ratio_micros("dup2_c", "n_bigrams"), F.lit(0)).alias(
                "dup2_frac_micros"
            ),
            F.coalesce(ratio_micros("top3_c", "n_trigrams"), F.lit(0)).alias(
                "top3_frac_micros"
            ),
        )
    )
    keep = (
        (F.col("top2_frac_micros") <= GOPHER_TOP2_MAX_MICROS)
        & (F.col("top3_frac_micros") <= GOPHER_TOP3_MAX_MICROS)
        & (F.col("dup2_frac_micros") <= GOPHER_DUP2_MAX_MICROS)
    )
    return out.withColumn("keep", keep.cast("int"))


QUERIES["text_gopher_repetition"] = text_gopher_repetition


def _sql_ngram_stat(n: int) -> str:
    """DuckDB CTE body producing (doc_id, n_grams, top_c, dup_c) — all
    BIGINT, mirroring :func:`_ngram_stat`."""
    grams = (
        f"list_transform(range(1, len(t) - {n} + 2), "
        f"i -> array_to_string(t[i:i+{n - 1}], ' '))"
    )
    return f"""
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
               max(c) AS top_c,
               CAST(sum(c) - count(*) AS BIGINT) AS dup_c
        FROM (
            SELECT doc_id, gram, count(*) AS c FROM (
                SELECT doc_id, unnest({grams}) AS gram
                FROM (SELECT doc_id, {sql_tokens('text')} AS t FROM documents)
                WHERE len(t) >= {n}
            ) GROUP BY doc_id, gram
        ) GROUP BY doc_id
    """


ORACLES["text_gopher_repetition"] = f"""
    WITH g2 AS ({_sql_ngram_stat(2)}), g3 AS ({_sql_ngram_stat(3)}),
    m AS (
        SELECT d.doc_id,
               coalesce(g2.n_grams, 0) AS n_bigrams,
               coalesce({sql_ratio_micros('g2.top_c', 'g2.n_grams')}, 0)
                   AS top2_frac_micros,
               coalesce({sql_ratio_micros('g2.dup_c', 'g2.n_grams')}, 0)
                   AS dup2_frac_micros,
               coalesce({sql_ratio_micros('g3.top_c', 'g3.n_grams')}, 0)
                   AS top3_frac_micros
        FROM documents d
        LEFT JOIN g2 ON d.doc_id = g2.doc_id
        LEFT JOIN g3 ON d.doc_id = g3.doc_id
    )
    SELECT *,
           CAST(top2_frac_micros <= {GOPHER_TOP2_MAX_MICROS}
                AND top3_frac_micros <= {GOPHER_TOP3_MAX_MICROS}
                AND dup2_frac_micros <= {GOPHER_DUP2_MAX_MICROS}
                AS INTEGER) AS keep
    FROM m
"""


# --- Heaps'-law vocabulary-growth fit ---------------------------------------
# The companion diagnostic to text_zipf_fit: natural corpora grow
# vocabulary as V(N) ≈ K·N^β with β ≈ 0.4–0.6; template-generated or
# heavily duplicated corpora flatten (tiny β) and concatenations of
# unrelated domains kink. Checkpoints are per document in doc_id
# order: V(d) counts words whose FIRST occurrence is ≤ d (one min()
# per word — no quadratic distinct-so-far), N(d) is the running token
# count; the log-log OLS runs in the same exact 1e-6-unit integer
# moments as the Zipf fit. Scale (VERDICT r10 item 2): the running
# sums ride the distributed prefix-sum rail (operators/ranks.py) —
# doc ids range-bucket into 1024 slices, local cumulative windows run
# per slice, and one bucket-grain stitch window (≤1024 rows) carries
# the offsets. Bit-identical checkpoints, no single-task doc sort.


def text_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, pround
    from ..operators.ranks import range_bucket, with_global_order

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    new_per_doc = (
        toks.groupBy("word")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    joined = (
        per_doc.join(new_per_doc, "doc_id", "left")
        .select("doc_id", "n_toks", F.coalesce("n_new", F.lit(0)).alias("n_new"))
    )
    bounds = joined.agg(
        F.min("doc_id").alias("lo_d"), F.max("doc_id").alias("hi_d")
    )
    pts = (
        with_global_order(
            joined.crossJoin(F.broadcast(bounds)),
            buckets=[
                range_bucket(F.col("doc_id"), F.col("lo_d"), F.col("hi_d"))
            ],
            order=[F.asc("doc_id")],
            sums={"N": F.col("n_toks"), "V": F.col("n_new")},
        )
        .select(
            iunits(F.log(F.col("N").cast("double")), 6).alias("x"),
            iunits(F.log(F.col("V").cast("double")), 6).alias("y"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / F.lit(1e6)
    sy = F.col("sy").cast("double") / F.lit(1e6)
    sxy = F.col("sxy").cast("double") / F.lit(1e12)
    sxx = F.col("sxx").cast("double") / F.lit(1e12)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        F.col("n").alias("n_checkpoints"),
        pround(slope, 6).alias("heaps_beta"),
        pround((sy - slope * sx) / n, 6).alias("heaps_intercept"),
    )


QUERIES["text_heaps_fit"] = text_heaps_fit

ORACLES["text_heaps_fit"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS word FROM documents
    ), per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks FROM toks GROUP BY 1
    ), new_per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_new FROM (
            SELECT word, min(doc_id) AS doc_id FROM toks GROUP BY 1
        ) GROUP BY 1
    ), cum AS (
        SELECT sum(p.n_toks) OVER w AS N,
               sum(coalesce(q.n_new, 0)) OVER w AS V
        FROM per_doc p LEFT JOIN new_per_doc q USING (doc_id)
        WINDOW w AS (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
    ), pts AS (
        SELECT {sql_iunits('ln(CAST(N AS DOUBLE))', 6)} AS x,
               {sql_iunits('ln(CAST(V AS DOUBLE))', 6)} AS y
        FROM cum
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts
    )
    SELECT n AS n_checkpoints,
           {sql_pround(
               '(CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)'
               ' - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))'
               ' / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)'
               ' - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))', 6)}
               AS heaps_beta,
           {sql_pround(
               '((CAST(sy AS DOUBLE) / 1e6)'
               ' - ((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e12)'
               '     - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))'
               '    / (CAST(n AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e12)'
               '       - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6)))'
               '   * (CAST(sx AS DOUBLE) / 1e6)) / CAST(n AS DOUBLE)', 6)}
               AS heaps_intercept
    FROM m
"""


# --- Gopher document-level quality rule battery ------------------------------
# The companion to text_gopher_repetition: Rae et al. 2021 (Gopher,
# §A1.1.1) document-LEVEL rules — word-count bounds, mean word length,
# symbol-to-word ratio, alphabetic-word fraction, minimum stopword
# hits. Thresholds follow the paper where the fixture allows
# (mean-word-length [3,10], symbol ratio <= 0.1, alpha frac >= 0.8,
# stopwords >= 2) with the word-count floor fixture-tuned (20 vs the
# paper's 50: fixture docs run 10-99 words; measured keep split ~350
# keep / ~150 drop, so BOTH branches of every conjunct are exercised).
# All per-doc integer counts; the only doubles are final ratios —
# exact oracle. Scale: one scan, per-row codegen'd array ops, no
# shuffle at all (the embarrassingly-parallel filter every curation
# pipeline front-loads at 100 TB).

GR_MIN_WORDS = 20
GR_MAX_WORDS = 1000
GR_MIN_MWL = 3.0
GR_MAX_MWL = 10.0
GR_MAX_SYMBOL = 0.1
GR_MIN_ALPHA = 0.8
GR_MIN_STOP = 2
GR_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    nw = F.size(toks).cast("long")
    len_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*GR_STOPWORDS))
    ).cast("long")
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ell = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / F.lit(3)
    # empty documents (zero tokens) carry no ratio semantics: emit the
    # metrics row with 0-ratios and keep=0 instead of 0/0 NaNs (the
    # empty-input totality discipline of tests/test_empty_inputs.py)
    safe_nw = F.greatest(nw, F.lit(1).cast("long"))
    m = docs.select(
        "doc_id",
        nw.alias("n_words"),
        pround(len_sum.cast("double") / safe_nw, 6).alias("mean_word_len"),
        pround((n_hash + n_ell).cast("double") / safe_nw, 6).alias("symbol_ratio"),
        pround(n_alpha.cast("double") / safe_nw, 6).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
    )
    keep = (
        F.col("n_words").between(GR_MIN_WORDS, GR_MAX_WORDS)
        & F.col("mean_word_len").between(GR_MIN_MWL, GR_MAX_MWL)
        & (F.col("symbol_ratio") <= GR_MAX_SYMBOL)
        & (F.col("alpha_frac") >= GR_MIN_ALPHA)
        & (F.col("n_stopwords") >= GR_MIN_STOP)
    )
    return m.withColumn("keep", keep.cast("int"))


QUERIES["text_gopher_rules"] = text_gopher_rules

_GR_STOPLIST_SQL = ", ".join(f"'{w}'" for w in GR_STOPWORDS)

ORACLES["text_gopher_rules"] = f"""
    WITH t AS (
        SELECT doc_id, text, {sql_tokens('text')} AS toks FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               {sql_pround(
                   "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
                   "list_transform(toks, x -> CAST(len(x) AS BIGINT))), "
                   "(a, b) -> a + b) AS DOUBLE) / greatest(len(toks), 1)", 6)} AS mean_word_len,
               {sql_pround(
                   "CAST((len(text) - len(replace(text, '#', ''))) "
                   "+ (len(text) - len(replace(text, '...', ''))) / 3 "
                   "AS DOUBLE) / greatest(len(toks), 1)", 6)} AS symbol_ratio,
               {sql_pround(
                   "CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
                   "AS DOUBLE) / greatest(len(toks), 1)", 6)} AS alpha_frac,
               CAST(len(list_filter(toks, x -> x IN ({_GR_STOPLIST_SQL})))
                    AS BIGINT) AS n_stopwords
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stopwords,
           CAST(n_words BETWEEN {GR_MIN_WORDS} AND {GR_MAX_WORDS}
                AND mean_word_len BETWEEN {GR_MIN_MWL} AND {GR_MAX_MWL}
                AND symbol_ratio <= {GR_MAX_SYMBOL}
                AND alpha_frac >= {GR_MIN_ALPHA}
                AND n_stopwords >= {GR_MIN_STOP} AS INTEGER) AS keep
    FROM m
"""


# --- BPE fertility by language ------------------------------------------------
# The tokenizer-equity metric: after applying the learned merge table,
# how many UNITS does a word cost in each language (fertility), and how
# many chars does a unit carry (compression)? High fertility for a
# language means it pays more sequence length per word under this
# vocabulary — the standard multilingual-tokenizer diagnostic. Reuses
# the bpe_encode chain (vocab collapse per (lang, word); sentinel
# string replaces ARE greedy BPE; unit count = count of the _U1
# delimiter), all exact integers until the two final ratios. 100 TB:
# vocab collapse bounds the replace chain at |vocab per lang|; one
# groupBy(lang) aggregate after it.


def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokenize(F.col("text"))).alias("tok"))
    vocab = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("wfreq"))
    enc = F.regexp_replace(F.col("tok"), "(.)", f"{_U0}$1{_U1}")
    for a, b in BPE_MERGES:
        enc = F.replace(
            enc, F.lit(f"{_U0}{a}{_U1}{_U0}{b}{_U1}"), F.lit(f"{_U0}{a}{b}{_U1}")
        )
    units = F.length("enc") - F.length(F.replace(F.col("enc"), F.lit(_U1)))
    encoded = vocab.select(
        "lang",
        "wfreq",
        F.length("tok").cast("long").alias("chars"),
        enc.alias("enc"),
    ).withColumn("units", units.cast("long"))
    return (
        encoded.groupBy("lang")
        .agg(
            F.sum("wfreq").alias("n_words"),
            F.sum(F.col("units") * F.col("wfreq")).alias("total_units"),
            F.sum(F.col("chars") * F.col("wfreq")).alias("total_chars"),
        )
        .select(
            "lang",
            "n_words",
            "total_units",
            pround(
                F.col("total_units").cast("double") / F.col("n_words"), 6
            ).alias("fertility"),
            pround(
                F.col("total_chars").cast("double") / F.col("total_units"), 6
            ).alias("chars_per_unit"),
        )
    )


QUERIES["bpe_fertility"] = bpe_fertility


def _bpe_fertility_oracle() -> str:
    enc = f"regexp_replace(tok, '(.)', '{_U0}\\1{_U1}', 'g')"
    for a, b in BPE_MERGES:
        enc = f"replace({enc}, '{_U0}{a}{_U1}{_U0}{b}{_U1}', '{_U0}{a}{b}{_U1}')"
    return f"""
        WITH vocab AS (
            SELECT lang, tok, count(*) AS wfreq FROM (
                SELECT lang, unnest({sql_tokens('text')}) AS tok FROM documents
            ) GROUP BY lang, tok
        ), encoded AS (
            SELECT lang, wfreq, CAST(length(tok) AS BIGINT) AS chars,
                   CAST(length({enc})
                        - length(replace({enc}, '{_U1}', '')) AS BIGINT) AS units
            FROM vocab
        ), agg AS (
            SELECT lang,
                   CAST(sum(wfreq) AS BIGINT) AS n_words,
                   CAST(sum(units * wfreq) AS BIGINT) AS total_units,
                   CAST(sum(chars * wfreq) AS BIGINT) AS total_chars
            FROM encoded GROUP BY lang
        )
        SELECT lang, n_words, total_units,
               {sql_pround('CAST(total_units AS DOUBLE) / n_words', 6)} AS fertility,
               {sql_pround('CAST(total_chars AS DOUBLE) / total_units', 6)}
                   AS chars_per_unit
        FROM agg
    """


ORACLES["bpe_fertility"] = _bpe_fertility_oracle()


# --- boilerplate-by-source diagnostic -----------------------------------------
# Template text (headers, footers, nav, license blurbs) shows up as the
# SAME n-gram in a large fraction of one source's documents — the thing
# C4/RefinedWeb-style pipelines strip before training. Per source:
# count distinct word-3-grams, flag as boilerplate the grams present in
# ≥ BP_FRAC of that source's docs (and ≥ 2 docs), report the share.
# Exact integers until the one final ratio. Scale: shingles explode to
# one (source, gram, doc) relation; both aggregations shuffle on
# (source, gram) / source — the tf-idf shuffle shape, map-side
# combinable; no joins larger than the per-source doc-count broadcast.

BP_N = 3
BP_FRAC = 0.3


def text_boilerplate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    grams = docs.select(
        "source",
        "doc_id",
        F.explode(word_shingles(tokenize(F.col("text")), BP_N)).alias("gram"),
    )
    ndocs = docs.groupBy("source").agg(F.countDistinct("doc_id").alias("n_docs"))
    gram_df = grams.groupBy("source", "gram").agg(
        F.countDistinct("doc_id").alias("df")
    )
    flagged = gram_df.join(F.broadcast(ndocs), "source").select(
        "source",
        "n_docs",
        "df",
        (
            (F.col("df") >= F.lit(2))
            & (
                F.col("df").cast("double")
                >= F.lit(BP_FRAC) * F.col("n_docs").cast("double")
            )
        ).cast("int").alias("is_bp"),
    )
    return (
        flagged.groupBy("source", "n_docs")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("is_bp").alias("n_boilerplate"),
        )
        .select(
            "source",
            "n_docs",
            "n_grams",
            "n_boilerplate",
            pround(
                F.col("n_boilerplate").cast("double") / F.col("n_grams"), 6
            ).alias("bp_share"),
        )
    )


QUERIES["text_boilerplate_by_source"] = text_boilerplate_by_source

from ..functions.hashing import sql_word_shingles as _sql_wsh  # noqa: E402

ORACLES["text_boilerplate_by_source"] = f"""
    WITH grams AS (
        SELECT source, doc_id, unnest({_sql_wsh(sql_tokens('text'), BP_N)}) AS gram
        FROM documents WHERE length(text) > 0
    ), ndocs AS (
        SELECT source, count(DISTINCT doc_id) AS n_docs
        FROM documents WHERE length(text) > 0 GROUP BY source
    ), gram_df AS (
        SELECT source, gram, count(DISTINCT doc_id) AS df
        FROM grams GROUP BY source, gram
    ), flagged AS (
        SELECT g.source, n.n_docs, g.df,
               CAST(g.df >= 2 AND CAST(g.df AS DOUBLE)
                    >= {BP_FRAC} * CAST(n.n_docs AS DOUBLE) AS INTEGER) AS is_bp
        FROM gram_df g JOIN ndocs n USING (source)
    )
    SELECT source, n_docs,
           count(*) AS n_grams,
           CAST(sum(is_bp) AS BIGINT) AS n_boilerplate,
           {sql_pround('CAST(sum(is_bp) AS DOUBLE) / count(*)', 6)} AS bp_share
    FROM flagged GROUP BY source, n_docs
"""


# --------------------- distilled quality classifier (logistic GD, exact)
# The fastText/CCNet production pattern: an EXPENSIVE quality filter
# (here the Gopher rule battery above) labels the corpus once, and a
# CHEAP linear scorer is trained to imitate it, so day-2 filtering
# costs four arithmetic features instead of the full battery. Trained
# ON the engine: feature standardization + LOGREG_ITERS unrolled
# full-batch logistic gradient steps, then the corpus is scored and the
# confusion matrix vs the teacher rules is the gate output (fixture
# measures 96% train agreement — the classifier genuinely learns the
# rules, dominated by the word-count and stopword conjuncts).
#
# Scale/determinism discipline (the iterative-operator rails):
# - weights and feature moments flow as ONE-ROW relations
#   crossJoin-broadcast onto the corpus — no collect(); the whole
#   train+score chain is a single lazy plan;
# - every corpus reduction (feature means, variances, gradients) sums
#   9-dp integer units — exact BIGINT sums, order-independent, so 1000
#   executors agree bit-for-bit with DuckDB's serial fold;
# - each nonlinearity (sqrt, sigmoid's exp — both ulp-unstable across
#   libm builds) is snapped to 9 dp immediately (the DSIR trick);
# - cost: T+2 map-side-combinable aggregate passes over the feature
#   relation (n·5 doubles, persisted once) — no shuffle growth, no
#   pairwise work, iteration count fixed at authoring time.

LOGREG_ITERS = 4
LOGREG_LR = 4.0
_LR_NX = 4  # features besides bias


def _lr_features(docs: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """Label = the EXACT text_gopher_rules keep flag (same snapped
    expressions); features = cheap surface stats, standardized later.
    ``extra`` columns (e.g. doc_id for the streaming scorer) are
    carried through."""
    toks = tokenize(F.col("text"))
    nw = F.size(toks).cast("long")
    len_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*GR_STOPWORDS))).cast("long")
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ell = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / F.lit(3)
    safe_nw = F.greatest(nw, F.lit(1).cast("long"))
    mwl = pround(len_sum.cast("double") / safe_nw, 6)
    sym = pround((n_hash + n_ell).cast("double") / safe_nw, 6)
    alpha = pround(n_alpha.cast("double") / safe_nw, 6)
    keep = (
        nw.between(GR_MIN_WORDS, GR_MAX_WORDS)
        & mwl.between(GR_MIN_MWL, GR_MAX_MWL)
        & (sym <= GR_MAX_SYMBOL)
        & (alpha >= GR_MIN_ALPHA)
        & (n_stop >= GR_MIN_STOP)
    )
    return docs.select(
        *extra,
        keep.cast("int").alias("keep"),
        keep.cast("double").alias("y"),
        (n_stop.cast("double") / safe_nw).alias("x1"),
        (mwl / F.lit(10.0)).alias("x2"),
        F.least(F.lit(1.0), nw.cast("double") / F.lit(100.0)).alias("x3"),
        alpha.alias("x4"),
    )


def _lr_stats(feat: DataFrame) -> DataFrame:
    """One-row (mu_j, sd_j) relation from exact integer-unit moments;
    zero-variance features get sd -> 1 (standardize to 0)."""
    from ..functions.rounding import from_iunits, iunits

    stats = feat.agg(
        *[F.sum(iunits(F.col(f"x{j}"), 9)).alias(f"s{j}") for j in range(1, _LR_NX + 1)],
        *[
            F.sum(iunits(F.col(f"x{j}") * F.col(f"x{j}"), 9)).alias(f"q{j}")
            for j in range(1, _LR_NX + 1)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    mus, sds = {}, {}
    for j in range(1, _LR_NX + 1):
        mu = from_iunits(
            iunits(F.col(f"s{j}").cast("double") / F.lit(1e9) / F.col("n").cast("double"), 9), 9
        )
        var = from_iunits(
            iunits(
                F.col(f"q{j}").cast("double") / F.lit(1e9) / F.col("n").cast("double")
                - mu * mu,
                9,
            ),
            9,
        )
        sd = from_iunits(iunits(F.sqrt(F.greatest(var, F.lit(0.0))), 9), 9)
        mus[j] = mu.alias(f"mu{j}")
        sds[j] = F.when(sd > 0, sd).otherwise(F.lit(1.0)).alias(f"sd{j}")
    return stats.select(*mus.values(), *sds.values())


def _lr_apply_stats(
    feat: DataFrame, stats: DataFrame, extra: tuple[str, ...] = ()
) -> DataFrame:
    """z_j = snap9((x_j - mu_j) / sd_j) against a (possibly persisted)
    one-row stats relation."""
    from ..functions.rounding import from_iunits, iunits

    zcols = [
        from_iunits(
            iunits((F.col(f"x{j}") - F.col(f"mu{j}")) / F.col(f"sd{j}"), 9), 9
        ).alias(f"z{j}")
        for j in range(1, _LR_NX + 1)
    ]
    return feat.crossJoin(F.broadcast(stats)).select(*extra, "keep", "y", *zcols)


def _lr_standardize(feat: DataFrame) -> DataFrame:
    return _lr_apply_stats(feat, _lr_stats(feat))


def _lr_z() -> Column:
    z = F.col("w0")
    for j in range(1, _LR_NX + 1):
        z = z + F.col(f"w{j}") * F.col(f"z{j}")
    return z


def _lr_p(z) -> Column:
    from ..functions.rounding import from_iunits, iunits

    return from_iunits(iunits(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9), 9)


def _lr_step(zfeat: DataFrame, w: DataFrame) -> DataFrame:
    """One full-batch step: w' = snap9(w + (lr * (Σ snap9((y-p)·z))/1e9) / N)."""
    from ..functions.rounding import from_iunits, iunits

    fw = zfeat.crossJoin(F.broadcast(w))
    res = F.col("y") - _lr_p(_lr_z())
    xs = [F.lit(1.0)] + [F.col(f"z{j}") for j in range(1, _LR_NX + 1)]
    g = fw.agg(
        *[F.sum(iunits(res * xj, 9)).alias(f"g{j}") for j, xj in enumerate(xs)],
        *[F.first(f"w{j}").alias(f"pw{j}") for j in range(len(xs))],
        F.count(F.lit(1)).alias("n"),
    )
    return g.select(
        *[
            from_iunits(
                iunits(
                    F.col(f"pw{j}")
                    + (F.lit(LOGREG_LR) * (F.col(f"g{j}").cast("double") / F.lit(1e9)))
                    / F.col("n").cast("double"),
                    9,
                ),
                9,
            ).alias(f"w{j}")
            for j in range(len(xs))
        ]
    )


_LR_WEIGHTS_CACHE: dict[str, tuple[float, ...]] = {}


def _lr_trained_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-once shared model for the four batch gate queries
    (VERDICT r7 item 6): ``quality_logreg{,_pr,_calibration,_auc}``
    each re-ran the IDENTICAL ``LOGREG_ITERS`` full-batch GD chain —
    4× the training cost per bench session for one model. The trained
    weight vector is a pure function of the documents table and every
    step is 1e-9-snapped, so the collected doubles are exact k/1e9
    values; caching the ONE row per fixture dir and re-materializing
    via ``F.lit`` reproduces bit-identical scores while eliminating
    3×LOGREG_ITERS corpus passes. Same staleness contract as
    ``_LOGREG_MODEL_PATHS``: keyed by immutable fixture dir for the
    process lifetime."""
    from ..session import path_cached

    def build() -> tuple[float, ...]:
        from pyspark import StorageLevel

        zfeat = _lr_standardize(
            _lr_features(load_table(spark, sf_dir, "documents"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            w = spark.range(1).select(
                *[F.lit(0.0).alias(f"w{j}") for j in range(_LR_NX + 1)]
            )
            for _ in range(LOGREG_ITERS):
                w = _lr_step(zfeat, w)
            row = w.collect()[0]  # exactly ONE row: the weight vector
        finally:
            zfeat.unpersist()
        return tuple(float(row[f"w{j}"]) for j in range(_LR_NX + 1))

    weights = path_cached(_LR_WEIGHTS_CACHE, sf_dir, build)
    return spark.range(1).select(
        *[F.lit(v).alias(f"w{j}") for j, v in enumerate(weights)]
    )


#: (applicationId, sf_dir) -> lazily localCheckpoint-ed scored corpus.
_LR_SCORED_CACHE: dict[str, DataFrame] = {}


def _build_lr_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNCACHED score-once relation ``(doc_id, keep, score_units)``
    — one full standardize+score pass over documents with the shared
    trained weights. ``score_units = round(p · 1e9)`` is the exact
    integer every logreg rider already snapped to (ADVICE r10: snap
    BEFORE thresholding), so each rider's former per-call ``p`` /
    ``p_units`` expression is reproduced bit-identically as
    ``score_units / 1e9`` / ``score_units``. Plan contracts inspect
    this builder (the cached artifact's lineage truncates to an
    ExistingRDD scan once materialized, by design)."""
    from ..functions.rounding import iunits

    feat = _lr_features(
        load_table(spark, sf_dir, "documents"), extra=("doc_id",)
    )
    zfeat = _lr_apply_stats(feat, _lr_stats(feat), extra=("doc_id",))
    w = _lr_trained_weights(spark, sf_dir)
    return zfeat.crossJoin(F.broadcast(w)).select(
        "doc_id",
        "keep",
        iunits(_lr_p(_lr_z()), 9).alias("score_units"),
    )


def _lr_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-once shared artifact for the NINE logreg readout queries
    (r13 OPT: each rider re-ran the identical tokenize+standardize+
    score corpus scan TWICE per call — once for the moment stats, once
    for scoring — to reduce a ≤|corpus|-row relation that every rider
    then aggregates a different way). One lazy localCheckpoint per
    (session, fixture dir) pays the scan once; riders become one
    aggregate over (doc_id, keep, score_units). Same keying and
    staleness contract as ``_supplier_cograph`` (applicationId, not
    recyclable ``id(spark)`` — ADVICE r12)."""
    from ..session import artifact_cached

    return artifact_cached(
        _LR_SCORED_CACHE,
        spark,
        sf_dir,
        lambda: _build_lr_scored(spark, sf_dir).localCheckpoint(eager=False),
    )


def quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One aggregate over the score-once artifact. p was already the
    # 1e-9-snapped double score_units/1e9 (``_lr_p`` ends in
    # from_iunits(iunits(·,9),9)), so p >= 0.5 ⟺ score_units >= 5e8
    # and Σ iunits(p,9) ≡ Σ score_units — bit-identical readout.
    scored = _lr_scored(spark, sf_dir)
    w = _lr_trained_weights(spark, sf_dir)
    out = scored.groupBy(
        "keep",
        (F.col("score_units") >= F.lit(500_000_000)).cast("int").alias(
            "pred_keep"
        ),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        pround(
            F.sum("score_units").cast("double")
            / F.lit(1e9)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_score"),
    )
    return out.crossJoin(F.broadcast(w)).select(
        "keep",
        "pred_keep",
        "n_docs",
        "avg_score",
        *[pround(F.col(f"w{j}"), 6).alias(f"w{j}") for j in range(_LR_NX + 1)],
    )


QUERIES["quality_logreg"] = quality_logreg


# Train-once model artifact for the STREAMING scorer: moments + weights
# from the day-1 corpus (doc_id % 10 != 0, the incremental-dedup
# convention) stored as ONE parquet row, read back by the stream-static
# scoring join. Same staleness contract as queries/dedup._INDEX_PATHS:
# keyed by immutable fixture dir for the process lifetime; a mutated
# source table needs a new path (or process).
_LOGREG_MODEL_PATHS: dict[str, str] = {}


def logreg_model_path(spark: SparkSession, sf_dir: str) -> str:
    from ..session import path_cached

    def build() -> str:
        from pyspark import StorageLevel

        from .connectors import _fixture_path

        path = _fixture_path("logreg_model")
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        feat = _lr_features(docs).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            stats = _lr_stats(feat)
            zfeat = _lr_apply_stats(feat, stats)
            w = spark.range(1).select(
                *[F.lit(0.0).alias(f"w{j}") for j in range(_LR_NX + 1)]
            )
            for _ in range(LOGREG_ITERS):
                w = _lr_step(zfeat, w)
            w.crossJoin(stats).write.mode("overwrite").parquet(path)
        finally:
            feat.unpersist()
        return path

    return path_cached(_LOGREG_MODEL_PATHS, sf_dir, build)


def _sql_logreg(
    train_where: str = "TRUE",
    mode: str = "confusion",
    score_where: str | None = None,
) -> str:
    """DuckDB replay of the standardize+GD+score chain. ``train_where``
    restricts the rows the moments and gradients see; ``mode``
    'confusion' emits the train confusion matrix (quality_logreg),
    'per_doc' scores the ``score_where`` slice row-wise (the streaming
    day-2 scorer)."""
    nx = _LR_NX
    z = "w0"
    for j in range(1, nx + 1):
        z = f"{z} + w{j} * z{j}"
    p = sql_from_iunits(sql_iunits(f"1.0 / (1.0 + exp(-({z})))", 9), 9)
    xs = ["1.0"] + [f"z{j}" for j in range(1, nx + 1)]
    gsel = ", ".join(
        f"sum({sql_iunits(f'(y - ({p})) * {x}', 9)}) AS g{j}, first(w{j}) AS pw{j}"
        for j, x in enumerate(xs)
    )
    upd = ", ".join(
        sql_from_iunits(
            sql_iunits(
                f"pw{j} + ({LOGREG_LR} * (CAST(g{j} AS DOUBLE) / 1000000000.0))"
                f" / CAST(n AS DOUBLE)",
                9,
            ),
            9,
        )
        + f" AS w{j}"
        for j in range(len(xs))
    )
    steps = []
    prev = "w_init"
    for t in range(LOGREG_ITERS):
        steps.append(
            f"g{t} AS (SELECT {gsel}, count(*) AS n FROM ztrain, {prev}),\n"
            f"    w{t + 1} AS (SELECT {upd} FROM g{t})"
        )
        prev = f"w{t + 1}"
    mu = lambda j: sql_from_iunits(  # noqa: E731
        sql_iunits(f"CAST(s{j} AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE)", 9), 9
    )
    var = lambda j: sql_from_iunits(  # noqa: E731
        sql_iunits(
            f"CAST(q{j} AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE)"
            f" - mu{j} * mu{j}",
            9,
        ),
        9,
    )
    sd = lambda j: sql_from_iunits(  # noqa: E731
        sql_iunits(f"sqrt(greatest(var{j}, 0.0))", 9), 9
    )
    toks = sql_tokens("text")
    stoplist = ", ".join(f"'{w}'" for w in GR_STOPWORDS)
    mwl = sql_pround(
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(toks, x -> CAST(len(x) AS BIGINT))), "
        "(a, b) -> a + b) AS DOUBLE) / greatest(len(toks), 1)", 6)
    sym = sql_pround(
        "CAST((len(text) - len(replace(text, '#', ''))) "
        "+ (len(text) - len(replace(text, '...', ''))) / 3 "
        "AS DOUBLE) / greatest(len(toks), 1)", 6)
    alpha = sql_pround(
        "CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
        "AS DOUBLE) / greatest(len(toks), 1)", 6)
    if mode == "confusion":
        final = f"""
    SELECT keep, CAST(p >= 0.5 AS INTEGER) AS pred_keep, count(*) AS n_docs,
           {sql_pround('CAST(sum(' + sql_iunits('p', 9) + ') AS DOUBLE) / 1000000000.0 / CAST(count(*) AS DOUBLE)', 6)} AS avg_score,
           {', '.join(f'{sql_pround(f"first(w{j})", 6)} AS w{j}' for j in range(nx + 1))}
    FROM scored GROUP BY keep, pred_keep"""
        scored_src = "ztrain"
    else:
        final = f"""
    SELECT doc_id, keep, {sql_iunits('p', 9)} AS score_units,
           CAST(p >= 0.5 AS INTEGER) AS pred_keep
    FROM scored"""
        scored_src = f"(SELECT * FROM zfeat WHERE {score_where})"
    return f"""
    WITH t AS (
        SELECT doc_id, text, {toks} AS toks FROM documents
    ), m AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
               {mwl} AS mwl, {sym} AS sym, {alpha} AS alpha,
               CAST(len(list_filter(toks, x -> x IN ({stoplist}))) AS BIGINT)
                   AS n_stop
        FROM t
    ), feat AS (
        SELECT doc_id,
               CAST(n_words BETWEEN {GR_MIN_WORDS} AND {GR_MAX_WORDS}
                    AND mwl BETWEEN {GR_MIN_MWL} AND {GR_MAX_MWL}
                    AND sym <= {GR_MAX_SYMBOL}
                    AND alpha >= {GR_MIN_ALPHA}
                    AND n_stop >= {GR_MIN_STOP} AS INTEGER) AS keep,
               CAST(n_words BETWEEN {GR_MIN_WORDS} AND {GR_MAX_WORDS}
                    AND mwl BETWEEN {GR_MIN_MWL} AND {GR_MAX_MWL}
                    AND sym <= {GR_MAX_SYMBOL}
                    AND alpha >= {GR_MIN_ALPHA}
                    AND n_stop >= {GR_MIN_STOP} AS DOUBLE) AS y,
               CAST(n_stop AS DOUBLE) / greatest(n_words, 1) AS x1,
               mwl / 10.0 AS x2,
               least(1.0, CAST(n_words AS DOUBLE) / 100.0) AS x3,
               alpha AS x4
        FROM m
    ), train AS (
        SELECT * FROM feat WHERE {train_where}
    ), raw_stats AS (
        SELECT {", ".join(f"sum({sql_iunits(f'x{j}', 9)}) AS s{j}, sum({sql_iunits(f'x{j} * x{j}', 9)}) AS q{j}" for j in range(1, nx + 1))},
               count(*) AS n
        FROM train
    ), mu_stats AS (
        SELECT *, {", ".join(f"{mu(j)} AS mu{j}" for j in range(1, nx + 1))} FROM raw_stats
    ), var_stats AS (
        SELECT *, {", ".join(f"{var(j)} AS var{j}" for j in range(1, nx + 1))} FROM mu_stats
    ), stats AS (
        SELECT *, {", ".join(f"CASE WHEN {sd(j)} > 0 THEN {sd(j)} ELSE 1.0 END AS sd{j}" for j in range(1, nx + 1))} FROM var_stats
    ), zfeat AS (
        SELECT doc_id, keep, y,
               {", ".join(sql_from_iunits(sql_iunits(f'(x{j} - mu{j}) / sd{j}', 9), 9) + f' AS z{j}' for j in range(1, nx + 1))}
        FROM feat, stats
    ), ztrain AS (
        SELECT * FROM zfeat WHERE {train_where}
    ), w_init AS (
        SELECT {", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(nx + 1))}
    ), {','.join(steps)},
    scored AS (
        SELECT doc_id, keep, {", ".join(f"w{j}" for j in range(nx + 1))}, {p} AS p
        FROM {scored_src}, {prev}
    )
    {final}
"""


ORACLES["quality_logreg"] = _sql_logreg()


# -------------------- classifier threshold sweep (precision / recall)
# The eval loop that closes the distillation story (the ann_recall
# discipline applied to the quality scorer): per decision threshold,
# the confusion counts and precision/recall of the trained scorer
# against its teacher labels — the curve an operator reads to pick the
# keep threshold for a target recall. One per-doc scored relation,
# THRESHOLDS replicated by explode, one aggregate; the scored relation
# is bounded by the corpus, the output by |thresholds| rows.

LOGREG_THRESHOLDS = [0.3, 0.4, 0.5, 0.6, 0.7]


def quality_logreg_pr(spark: SparkSession, sf_dir: str) -> DataFrame:

    # nano-snap BEFORE thresholding (ADVICE r10): the artifact stores
    # the snapped integer score_units, so p = score_units/1e9 is the
    # identical double the per-call chain produced
    scored = _lr_scored(spark, sf_dir).select(
        "keep",
        (F.col("score_units").cast("double") / F.lit(1e9)).alias("p"),
    )
    thr = F.explode(
        F.array(*[F.lit(t) for t in LOGREG_THRESHOLDS])
    ).alias("threshold")
    sweep = scored.select("keep", "p", thr)
    pred = (F.col("p") >= F.col("threshold")).cast("long")
    tp = F.sum(pred * F.col("keep"))
    fp = F.sum(pred * (F.lit(1) - F.col("keep")))
    fn = F.sum((F.lit(1) - pred) * F.col("keep"))
    tn = F.sum((F.lit(1) - pred) * (F.lit(1) - F.col("keep")))
    out = (
        sweep.groupBy("threshold")
        .agg(
            tp.alias("tp"), fp.alias("fp"), fn.alias("fn"), tn.alias("tn"),
        )
        .select(
            "threshold", "tp", "fp", "fn", "tn",
            F.when(
                F.col("tp") + F.col("fp") > 0,
                pround(
                    F.col("tp").cast("double")
                    / (F.col("tp") + F.col("fp")).cast("double"),
                    6,
                ),
            ).alias("precision"),
            F.when(
                F.col("tp") + F.col("fn") > 0,
                pround(
                    F.col("tp").cast("double")
                    / (F.col("tp") + F.col("fn")).cast("double"),
                    6,
                ),
            ).alias("recall"),
        )
    )
    return out


QUERIES["quality_logreg_pr"] = quality_logreg_pr


def _sql_logreg_pr() -> str:
    thr_list = ", ".join(str(t) for t in LOGREG_THRESHOLDS)
    return f"""
    WITH perdoc AS ({_sql_logreg(mode="per_doc", score_where="TRUE")}),
    sweep AS (
        SELECT keep, CAST(score_units AS DOUBLE) / 1000000000.0 AS p,
               CAST(t.threshold AS DOUBLE) AS threshold
        FROM perdoc, (SELECT unnest([{thr_list}]) AS threshold) t
    ), cm AS (
        SELECT threshold,
               CAST(sum(CAST(p >= threshold AS BIGINT) * keep) AS BIGINT) AS tp,
               CAST(sum(CAST(p >= threshold AS BIGINT) * (1 - keep)) AS BIGINT) AS fp,
               CAST(sum((1 - CAST(p >= threshold AS BIGINT)) * keep) AS BIGINT) AS fn,
               CAST(sum((1 - CAST(p >= threshold AS BIGINT)) * (1 - keep)) AS BIGINT) AS tn
        FROM sweep GROUP BY threshold
    )
    SELECT CAST(threshold AS DOUBLE) AS threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0 THEN
               {sql_pround('CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)', 6)}
           END AS precision,
           CASE WHEN tp + fn > 0 THEN
               {sql_pround('CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)', 6)}
           END AS recall
    FROM cm
"""


ORACLES["quality_logreg_pr"] = _sql_logreg_pr()


def quality_logreg_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the in-engine quality classifier: decile
    bins over the predicted probability, each with observed keep rate
    vs mean predicted score — the standard calibration check before a
    classifier's threshold gates a 100 TB corpus (an over-confident
    scorer silently biases the kept set).

    Same exact-integer rails as the rest of the logreg family: p is
    snapped to 1e-9 units, bins are integer division of those units,
    and both rates are BIGINT rationals (``ratio_units``) — no doubles
    anywhere past the model itself. Scale: one aggregate over the
    scored relation, 10 output rows."""

    from ..functions.rounding import ratio_units

    scored = _lr_scored(spark, sf_dir).select("keep", "score_units")
    binned = scored.select(
        "keep",
        "score_units",
        # decile of p in 1e-9 units; p = 1.0 exactly folds into bin 9
        F.least(F.lit(9).cast("long"), F.expr("score_units div 100000000")).alias(
            "bin"
        ),
    )
    out = (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("keep").alias("n_keep"),
            F.sum("score_units").alias("_sum_units"),
        )
        .select(
            "bin",
            "n",
            "n_keep",
            ratio_units("n_keep", "n").alias("keep_rate_micros"),
            # mean predicted p in MICRO (not nano) units: the per-doc
            # 1e-9 snap of an exp() chain can flip by one unit on a
            # different libm build when p sits on a snap boundary, and
            # a nano-resolution mean surfaces every such flip (the
            # round-7 jitter audit flagged exactly this); averaging to
            # 1e-6 absorbs single-unit input flips
            ratio_units("_sum_units", "1000 * n", 1).alias("mean_score_micros"),
        )
    )
    return out


QUERIES["quality_logreg_calibration"] = quality_logreg_calibration

ORACLES["quality_logreg_calibration"] = f"""
    WITH perdoc AS ({_sql_logreg(mode="per_doc", score_where="TRUE")})
    SELECT bin, n, n_keep,
           {sql_ratio_units('n_keep', 'n')} AS keep_rate_micros,
           {sql_ratio_units('sum_units', '1000 * n', 1)} AS mean_score_micros
    FROM (
        SELECT least(9, score_units // 100000000) AS bin,
               count(*) AS n,
               CAST(sum(keep) AS BIGINT) AS n_keep,
               CAST(sum(score_units) AS BIGINT) AS sum_units
        FROM perdoc GROUP BY 1
    )
"""


# ----------------------- token-distribution drift (Jensen–Shannon)
# Completes the drift family: KS and PSI cover numeric columns; JS
# divergence is the standard for TOKEN distributions — per source, how
# far its unigram distribution sits from the corpus mixture (0 =
# identical, ln 2 = disjoint). The absent-token tail (tokens the source
# never emits, where p=0 and the q-side term collapses to q·ln2) is
# folded in CLOSED FORM from the source's covered corpus mass, so the
# join only materializes (source, token) pairs the source actually
# contains — tf-idf shuffle shape, never |sources|×|vocab|. Per-row
# log terms snap to 9-dp integer units before the exact BIGINT sum
# (the entropy/PMI discipline), so 1000 executors agree with DuckDB's
# serial fold.


def text_js_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
    sc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    cc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ct"))
    stot = sc.groupBy("source").agg(F.sum("c").alias("ns"))
    tot = toks.agg(F.count(F.lit(1)).alias("n"))
    p = F.col("c").cast("double") / F.col("ns").cast("double")
    q = F.col("ct").cast("double") / F.col("n").cast("double")
    m = (p + q) / F.lit(2.0)
    rows = (
        sc.join(cc, "tok")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
    )
    agg = rows.groupBy("source").agg(
        F.first("ns").alias("n_tokens"),
        F.first("n").alias("n_corpus"),
        F.sum(iunits(p * F.log(p / m), 9)).alias("a_units"),
        F.sum(iunits(q * F.log(q / m), 9)).alias("b_units"),
        F.sum("ct").alias("covered"),
    )
    js = (
        F.lit(0.5)
        * ((F.col("a_units") + F.col("b_units")).cast("double") / F.lit(1e9))
        + (F.lit(0.5) * F.log(F.lit(2.0)))
        * (
            (F.col("n_corpus") - F.col("covered")).cast("double")
            / F.col("n_corpus").cast("double")
        )
    )
    return agg.select("source", "n_tokens", pround(js, 6).alias("js_divergence"))


QUERIES["text_js_by_source"] = text_js_by_source

ORACLES["text_js_by_source"] = f"""
    WITH toks AS (
        SELECT source, unnest({sql_tokens('text')}) AS tok FROM documents
    ), sc AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2
    ), cc AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS ct FROM toks GROUP BY 1
    ), stot AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM sc GROUP BY 1
    ), tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM toks
    ), rows_ AS (
        SELECT sc.source, sc.c, cc.ct, stot.ns, tot.n,
               CAST(sc.c AS DOUBLE) / CAST(stot.ns AS DOUBLE) AS p,
               CAST(cc.ct AS DOUBLE) / CAST(tot.n AS DOUBLE) AS q
        FROM sc JOIN cc USING (tok) JOIN stot USING (source), tot
    ), agg AS (
        SELECT source,
               first(ns) AS n_tokens,
               first(n) AS n_corpus,
               CAST(sum({sql_iunits('p * ln(p / ((p + q) / 2.0))', 9)}) AS BIGINT)
                   AS a_units,
               CAST(sum({sql_iunits('q * ln(q / ((p + q) / 2.0))', 9)}) AS BIGINT)
                   AS b_units,
               CAST(sum(ct) AS BIGINT) AS covered
        FROM rows_ GROUP BY source
    )
    SELECT source, n_tokens,
           {sql_pround(
               '(0.5 * (CAST(a_units + b_units AS DOUBLE) / 1e9))'
               ' + (0.5 * ln(2.0))'
               ' * (CAST(n_corpus - covered AS DOUBLE) / CAST(n_corpus AS DOUBLE))',
               6)} AS js_divergence
    FROM agg
"""


QUERIES["text_winnowing"] = text_winnowing
QUERIES["dedup_winnowing_pairs"] = dedup_winnowing_pairs
QUERIES["dedup_winnowing_clusters"] = dedup_winnowing_clusters

ORACLES["text_winnowing"] = f"""
    WITH w AS MATERIALIZED ({_sql_winnow_cte()})
    SELECT doc_id, n_grams,
           CAST(n_grams - {WINNOW_W - 1} AS INTEGER) AS n_windows,
           CAST(len(fps) AS INTEGER) AS n_fps,
           list_min(fps) AS fp_min,
           list_max(fps) AS fp_max,
           {sql_ratio_units('len(fps)', f'n_grams - {WINNOW_W - 1}')}
               AS density_micros
    FROM w
"""

ORACLES["dedup_winnowing_pairs"] = f"""
    WITH w AS MATERIALIZED ({_sql_winnow_cte()}),
    ex AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fp FROM w),
    keep_fp AS (
        SELECT fp FROM ex GROUP BY fp
        HAVING count(*) >= 2 AND count(*) <= {WINNOW_MAX_BUCKET}
    ),
    exk AS MATERIALIZED (SELECT ex.* FROM ex JOIN keep_fp USING (fp)),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        FROM exk a JOIN exk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {WINNOW_MIN_SHARED}
    ),
    sizes AS (SELECT doc_id, len(fps) AS nf FROM w)
    SELECT id_a, id_b, shared,
           {sql_ratio_units('shared', 'least(sa.nf, sb.nf)')} AS containment_micros
    FROM pairs
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
"""

ORACLES["dedup_winnowing_clusters"] = f"""
    WITH RECURSIVE w AS MATERIALIZED ({_sql_winnow_cte()}),
    ex AS MATERIALIZED (SELECT doc_id, unnest(fps) AS fp FROM w),
    keep_fp AS (
        SELECT fp FROM ex GROUP BY fp
        HAVING count(*) >= 2 AND count(*) <= {WINNOW_MAX_BUCKET}
    ),
    exk AS MATERIALIZED (SELECT ex.* FROM ex JOIN keep_fp USING (fp)),
    wpairs AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM exk a JOIN exk b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {WINNOW_MIN_SHARED}
    ),
    nodes AS (
        SELECT id_a AS id FROM wpairs UNION SELECT id_b FROM wpairs
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM wpairs
        UNION SELECT id_b, id_a FROM wpairs
    ),
    reach(a, b) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, min(b) AS canonical_id FROM reach GROUP BY a
"""


def quality_logreg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the quality classifier vs its teacher labels —
    the threshold-free ranking metric completing the eval trio
    (confusion / PR sweep / calibration). Mann-Whitney form with
    tie-averaged ranks, ALL integer: scores are already 1e-9-unit
    BIGINTs, rank groups come from one aggregate over distinct scores
    (2·avg_rank = lo + hi, an integer), U2 = Σ n_pos·(lo+hi), and
    AUC_micros = half-up rational of (U2 − n1(n1+1)) / (2·n1·n0) with
    the arithmetic in DECIMAL(38,0)/HUGEINT (ADVICE r7: u2 grows ~n²,
    so the 2e6-scaled numerator wraps int64 past ~2e6 scored rows).
    Remaining documented bound: u2 ITSELF is BIGINT, exact to ~3e9
    rows; past that, widen the u2/hi aggregates to DECIMAL too.

    Scale: the rank window orders DISTINCT SCORE VALUES (bounded by the
    score quantization, ≤ 1e9 and in practice thousands), not rows —
    the partition-less window is over that tiny relation; everything
    row-sized is map-side-combined aggregation."""
    from pyspark.sql import Window as W

    scored = _lr_scored(spark, sf_dir).select("keep", "score_units")
    groups = scored.groupBy("score_units").agg(
        F.count(F.lit(1)).alias("n"), F.sum("keep").alias("n_pos")
    )
    win = W.orderBy("score_units").rowsBetween(W.unboundedPreceding, 0)
    ranked = groups.select(
        "n_pos",
        "n",
        F.sum("n").over(win).alias("hi"),
    ).select("n_pos", "n", "hi", (F.col("hi") - F.col("n") + 1).alias("lo"))
    agg = ranked.agg(
        F.sum(F.col("n_pos") * (F.col("lo") + F.col("hi"))).alias("u2"),
        F.sum("n_pos").alias("n1"),
        F.sum(F.col("n") - F.col("n_pos")).alias("n0"),
    )
    # Final rational in DECIMAL(38,0) (ADVICE r7): u2 grows ~n² (ranks
    # are cumulative row counts), so 2e6·(u2 − n1(n1+1)) passes 2^63
    # once the scored corpus passes ~2e6 rows — Spark non-ANSI would
    # wrap silently while DuckDB raises. The 38-digit rail holds to
    # ~10^15 rows; the quotient itself is ≤ 1e6, trivially BIGINT.
    d = "CAST({} AS DECIMAL(38,0))"
    u2d, n1d, n0d = d.format("u2"), d.format("n1"), d.format("n0")
    out = agg.select(
        "n0",
        "n1",
        "u2",
        F.expr(
            f"(2000000 * ({u2d} - {n1d} * ({n1d} + 1)) + (2 * {n1d} * {n0d}))"
            f" div (2 * (2 * {n1d} * {n0d}))"
        ).alias("auc_micros"),
    )
    return out


QUERIES["quality_logreg_auc"] = quality_logreg_auc

ORACLES["quality_logreg_auc"] = f"""
    WITH perdoc AS ({_sql_logreg(mode="per_doc", score_where="TRUE")}),
    groups AS (
        SELECT score_units, count(*) AS n, CAST(sum(keep) AS BIGINT) AS n_pos
        FROM perdoc GROUP BY 1
    ), ranked AS (
        SELECT n_pos, n,
               CAST(sum(n) OVER (ORDER BY score_units
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS hi
        FROM groups
    ), agg AS (
        SELECT CAST(sum(n_pos * ((hi - n + 1) + hi)) AS BIGINT) AS u2,
               CAST(sum(n_pos) AS BIGINT) AS n1,
               CAST(sum(n - n_pos) AS BIGINT) AS n0
        FROM ranked
    )
    SELECT n0, n1, u2,
           CAST((2000000 * (CAST(u2 AS HUGEINT) - CAST(n1 AS HUGEINT) * (n1 + 1))
                     + (2 * CAST(n1 AS HUGEINT) * n0))
               // (2 * (2 * CAST(n1 AS HUGEINT) * n0)) AS BIGINT) AS auc_micros
    FROM agg
"""


# ------------------------------------------------------- n-gram novelty
# First-occurrence novelty scoring for curriculum/curation (round 8):
# per document, the fraction of its DISTINCT word-bigrams whose global
# first occurrence (min doc_id over the corpus) is this document. High
# novelty = the doc contributes n-grams the corpus hasn't seen in any
# earlier doc — the dedup-aware "information contribution" signal used
# to order or down-weight crawl snapshots (later mirrors of the same
# content score near 0 without being exact/near duplicates).
#
# Scale: shingle_hash_rows is the shared codegen'd zero-shuffle shingle
# relation (same as minhash); then ONE (id,h) distinct, ONE groupBy(h)
# with a map-side-combinable min, and per-doc counts that reuse the
# distinct relation's partitioning. No joins on the gram axis are
# needed at all: n_novel per doc falls out of re-grouping the per-gram
# argmin by its OWNING doc — O(distinct grams) shuffle rows, never
# O(docs × grams). The ratio is the exact BIGINT rational.


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros
    from ..operators.dedup import shingle_hash_rows

    docs = load_table(spark, sf_dir, "documents")
    g = shingle_hash_rows(docs, "doc_id", "text", 2).distinct()
    n_distinct = g.groupBy("id").agg(F.count(F.lit(1)).alias("n_distinct"))
    n_novel = (
        g.groupBy("h")
        .agg(F.min("id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    return (
        n_distinct.join(
            n_novel, n_distinct["id"] == n_novel["first_doc"], "left"
        )
        .select(
            F.col("id").alias("doc_id"),
            "n_distinct",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        )
        .withColumn(
            "novelty_micros", ratio_micros("n_novel", "n_distinct")
        )
    )


QUERIES["text_ngram_novelty"] = text_ngram_novelty

from ..functions.hashing import (  # noqa: E402
    sql_shingle_hashes_from_token_hashes,
    sql_token_hash_array,
)

_SQL_TH = sql_token_hash_array(sql_tokens("text"))
_SQL_GRAMS2 = sql_shingle_hashes_from_token_hashes("th", 2)

ORACLES["text_ngram_novelty"] = f"""
    WITH th AS (
        SELECT doc_id, {_SQL_TH} AS th
        FROM documents
        WHERE length(text) > 0 AND len({sql_tokens('text')}) > 0
    ), g AS (
        SELECT DISTINCT doc_id, unnest({_SQL_GRAMS2}) AS h FROM th
    ), nd AS (
        SELECT doc_id, count(*) AS n_distinct FROM g GROUP BY 1
    ), nv AS (
        SELECT first_doc, count(*) AS n_novel FROM (
            SELECT h, min(doc_id) AS first_doc FROM g GROUP BY 1
        ) GROUP BY 1
    )
    SELECT nd.doc_id,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
           {sql_ratio_micros('COALESCE(n_novel, 0)', 'n_distinct')}
               AS novelty_micros
    FROM nd LEFT JOIN nv ON nd.doc_id = nv.first_doc
"""


# Persisted day-1 gram index for the STREAMING novelty scorer — the
# novelty twin of _winnow_index_path: the corpus's distinct word-bigram
# hash set as ONE parquet column, built once per fixture dir, probed
# stream-static at ingest. Same staleness contract as
# _LOGREG_MODEL_PATHS (immutable fixture dir for the process lifetime).
_NOVELTY_INDEX_PATHS: dict[str, str] = {}


def _novelty_index_path(spark: SparkSession, sf_dir: str) -> str:
    from ..session import path_cached

    def build() -> str:
        from ..operators.dedup import shingle_hash_rows
        from .connectors import _fixture_path

        path = _fixture_path("novelty_grams")
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        shingle_hash_rows(docs, "doc_id", "text", 2).select(
            F.col("h").alias("g")
        ).distinct().write.mode("overwrite").parquet(path)
        return path

    return path_cached(_NOVELTY_INDEX_PATHS, sf_dir, build)


# ------------------------------------------------- encoding quality
# Mojibake / encoding-damage detection (round 8): the hygiene pass
# that catches UTF-8-decoded-as-Latin-1 artifacts ("caf\u00c3\u00a9"-
# class digraphs: \u00c2/\u00c3 followed by a Latin-1 continuation
# character) and U+FFFD replacement characters (lossy transcoding).
# The fixture corpus is clean ASCII, so -- the privacy_redact_pii
# discipline -- damage is PLANTED deterministically per doc_id residue
# class in BOTH engines and must be found by the detector under the
# gate, proving the patterns fire identically (Java regex vs RE2:
# literal characters and literal-char classes only; the \u escapes
# below are PYTHON escapes, resolved to literal chars before either
# regex engine parses the pattern).
#
# Scale: stateless per-row regexp_count scan -- zero shuffle,
# codegen'd, pushdown/pruning untouched. keep=1 is the filter bit.

_MOJI_RE = "[\u00c2\u00c3][\u0080-\u00ff]"
_REPL_CH = "\ufffd"
_MOJI_PLANT = " caf\u00c3\u00a9"
_REPL_PLANT = " bad\ufffdseq"


def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit(_MOJI_PLANT)
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0, F.lit(_REPL_PLANT)
        ).otherwise(F.lit("")),
    )
    n_moji = F.regexp_count(planted, F.lit(_MOJI_RE))
    n_repl = F.regexp_count(planted, F.lit(_REPL_CH))
    return docs.select(
        "doc_id",
        n_moji.cast("long").alias("n_mojibake"),
        n_repl.cast("long").alias("n_replacement"),
        ((n_moji + n_repl) == 0).cast("int").alias("keep"),
    )


QUERIES["text_encoding_quality"] = text_encoding_quality

ORACLES["text_encoding_quality"] = """
    WITH planted AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0 THEN '{moji_plant}' ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN '{repl_plant}' ELSE '' END
                   AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{moji}')) AS BIGINT)
               AS n_mojibake,
           CAST(len(regexp_extract_all(t, '{repl}')) AS BIGINT)
               AS n_replacement,
           CAST(len(regexp_extract_all(t, '{moji}'))
                + len(regexp_extract_all(t, '{repl}')) = 0 AS INTEGER)
               AS keep
    FROM planted
""".replace("{moji_plant}", _MOJI_PLANT).replace(
    "{repl_plant}", _REPL_PLANT
).replace("{moji}", _MOJI_RE).replace("{repl}", _REPL_CH)


# Per-source novelty rollup (round 8): the snapshot-level curation
# signal on top of text_ngram_novelty — "which sources still add new
# n-grams" is the number that decides recrawl cadence and mixture
# down-weighting of mirror-heavy sources. One doc-keyed join for the
# source label + one map-side-combined aggregate over the per-doc
# novelty relation.


def text_novelty_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    nov = text_ngram_novelty(spark, sf_dir)
    return (
        nov.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_distinct").alias("n_grams_distinct"),
            F.sum("n_novel").alias("n_grams_novel"),
        )
        .select(
            "source",
            "n_docs",
            "n_grams_distinct",
            "n_grams_novel",
            ratio_micros("n_grams_novel", "n_grams_distinct").alias(
                "novelty_micros"
            ),
        )
    )


QUERIES["text_novelty_by_source"] = text_novelty_by_source

ORACLES["text_novelty_by_source"] = f"""
    WITH nov AS ({ORACLES['text_ngram_novelty']})
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(n_distinct) AS BIGINT) AS n_grams_distinct,
           CAST(sum(n_novel) AS BIGINT) AS n_grams_novel,
           {sql_ratio_micros('sum(n_novel)', 'sum(n_distinct)')}
               AS novelty_micros
    FROM nov JOIN documents d ON nov.doc_id = d.doc_id
    GROUP BY 1
"""


# Language-ID evaluation (round 8): confusion matrix + per-true-lang
# precision/recall of the stopword-signature classifier against the
# fixture's labeled lang column — the eval row that turns "we have a
# lang-ID heuristic" into a measured number (the routing decision a
# multilingual pipeline makes with it needs the per-lang recall, not
# vibes). One groupBy over the per-doc prediction relation.


def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros

    pred = text_lang_id(spark, sf_dir)
    cells = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    true_tot = pred.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    pred_tot = pred.groupBy("predicted_lang").agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    return (
        cells.join(true_tot, "lang")
        .join(pred_tot, "predicted_lang")
        .select(
            "lang",
            "predicted_lang",
            "n",
            "n_true",
            "n_pred",
            F.when(
                F.col("lang") == F.col("predicted_lang"),
                ratio_micros("n", "n_true"),
            )
            .otherwise(F.lit(None).cast("long"))
            .alias("recall_micros"),
            F.when(
                F.col("lang") == F.col("predicted_lang"),
                ratio_micros("n", "n_pred"),
            )
            .otherwise(F.lit(None).cast("long"))
            .alias("precision_micros"),
        )
    )


QUERIES["text_langid_confusion"] = text_langid_confusion

ORACLES["text_langid_confusion"] = f"""
    WITH pred AS ({ORACLES['text_lang_id']}),
    cells AS (
        SELECT lang, predicted_lang, count(*) AS n
        FROM pred GROUP BY 1, 2
    ), tt AS (
        SELECT lang, count(*) AS n_true FROM pred GROUP BY 1
    ), pt AS (
        SELECT predicted_lang, count(*) AS n_pred FROM pred GROUP BY 1
    )
    SELECT c.lang, c.predicted_lang,
           c.n, tt.n_true, pt.n_pred,
           CASE WHEN c.lang = c.predicted_lang
                THEN {sql_ratio_micros('c.n', 'tt.n_true')}
                ELSE NULL END AS recall_micros,
           CASE WHEN c.lang = c.predicted_lang
                THEN {sql_ratio_micros('c.n', 'pt.n_pred')}
                ELSE NULL END AS precision_micros
    FROM cells c JOIN tt ON c.lang = tt.lang
    JOIN pt ON c.predicted_lang = pt.predicted_lang
"""


# Sequence-length distribution (round 8): per power-of-2 token-length
# bucket, doc count + token mass + corpus share — the input that sizes
# context windows and packing budgets (and the fastest way to see a
# truncation cliff after a bad extraction run). Buckets via an exact
# integer CASE over fixed edges — floor(log2(n)) through a double log
# is boundary-fragile at exact powers of two; a compare chain is not.

_SEQLEN_EDGES = [1 << k for k in range(0, 12)]  # 1 .. 2048


def _seqlen_bucket(n):
    b = F.when(n >= F.lit(_SEQLEN_EDGES[-1]), F.lit(len(_SEQLEN_EDGES) - 1))
    for i in range(len(_SEQLEN_EDGES) - 2, -1, -1):
        b = b.when(n >= F.lit(_SEQLEN_EDGES[i]), F.lit(i))
    return b.otherwise(F.lit(-1))  # n == 0


def text_seqlen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_micros
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokenize(F.col("text")))
    per = docs.select(
        _seqlen_bucket(n).alias("bucket"), n.alias("n_tokens")
    )
    tot = per.agg(F.count(F.lit(1)).alias("_n"))
    return (
        per.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("token_mass"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_docs",
            "token_mass",
            ratio_micros("n_docs", "_n").alias("share_micros"),
        )
    )


QUERIES["text_seqlen_histogram"] = text_seqlen_histogram


def _sql_seqlen() -> str:
    from ..functions.rounding import sql_ratio_micros

    edges = _SEQLEN_EDGES
    case = "CASE "
    case += f"WHEN n >= {edges[-1]} THEN {len(edges) - 1} "
    for i in range(len(edges) - 2, -1, -1):
        case += f"WHEN n >= {edges[i]} THEN {i} "
    case += "ELSE -1 END"
    return f"""
    WITH per AS (
        SELECT {case} AS bucket, n AS n_tokens FROM (
            SELECT len({sql_tokens('text')}) AS n FROM documents
        )
    ), tot AS (SELECT count(*) AS _n FROM per)
    SELECT bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS token_mass,
           {sql_ratio_micros('count(*)', '(SELECT _n FROM tot)')}
               AS share_micros
    FROM per GROUP BY 1
"""


ORACLES["text_seqlen_histogram"] = _sql_seqlen()


# ------------------------------------------------------- Cohen's kappa
# Chance-corrected agreement between the stopword-signature classifier
# and the labeled lang column — the single-number companion to
# text_langid_confusion (a 95%-accurate classifier on a 90%-one-class
# corpus can still have near-zero kappa; this is the statistic that
# catches it). κ = (p_o − p_e)/(1 − p_e) cleared of denominators:
# num = N·D − P, den = N² − P with D = Σ diagonal, P = Σ_k row_k·col_k
# — every term an exact integer, the final κ a half-up signed rational
# in micros. N² and the row·col products run on the round-8
# DECIMAL(38,0)/HUGEINT wide rail (N² wraps int64 past ~3e9 docs — the
# quality_srm_check precedent); only the bounded κ·1e6 quotient lands
# back in BIGINT. Sign is split explicitly because Spark ``div`` and
# DuckDB ``//`` both truncate toward zero — half-up via the
# (2·m·n + d) trick is only round-half-up on the non-negative domain,
# so negative κ negates the absolute-value rational.
#
# Scale: one corpus scan (the classifier), a |langs|² cell aggregate,
# and |langs|-row marginal joins — everything after the scan is
# constant-size.


def quality_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = text_lang_id(spark, sf_dir).select("lang", "predicted_lang")
    # |langs|² rows, three consumers (tot, rk, ck) — checkpoint so the
    # classifier scan runs once
    cells = (
        pred.groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("lang") == F.col("predicted_lang"), F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("n_agree"),
    )
    rk = cells.groupBy("lang").agg(F.sum("n").alias("rk"))
    ck = cells.groupBy("predicted_lang").agg(F.sum("n").alias("ck"))
    pe = (
        rk.join(ck, rk["lang"] == ck["predicted_lang"])
        .select(
            (F.col("rk").cast("decimal(38,0)") * F.col("ck")).alias("p")
        )
        .agg(
            F.coalesce(F.sum("p"), F.lit(0).cast("decimal(38,0)")).alias(
                "pe_mass"
            )
        )
    )
    return (
        tot.crossJoin(pe)
        .withColumn(
            "kappa_micros",
            F.expr(
                "CASE WHEN CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_mass = 0"
                " THEN NULL"
                " WHEN CAST(n_docs AS DECIMAL(38,0)) * n_agree - pe_mass >= 0"
                " THEN CAST((2000000 * (CAST(n_docs AS DECIMAL(38,0)) * n_agree - pe_mass)"
                "      + (CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_mass))"
                "  div (2 * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_mass)) AS BIGINT)"
                " ELSE -CAST((2000000 * (pe_mass - CAST(n_docs AS DECIMAL(38,0)) * n_agree)"
                "      + (CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_mass))"
                "  div (2 * (CAST(n_docs AS DECIMAL(38,0)) * n_docs - pe_mass)) AS BIGINT)"
                " END"
            ),
        )
        .select(
            "n_docs",
            "n_agree",
            F.col("pe_mass").cast("long").alias("pe_mass"),
            "kappa_micros",
        )
    )


QUERIES["quality_cohens_kappa"] = quality_cohens_kappa

ORACLES["quality_cohens_kappa"] = f"""
    WITH pred AS ({{LANGID}}),
    cells AS (
        SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
                    AS BIGINT) AS n_agree
        FROM cells
    ), pe AS (
        SELECT CAST(coalesce(sum(CAST(rk.rk AS HUGEINT) * ck.ck), 0) AS HUGEINT)
               AS pe_mass
        FROM (SELECT lang, sum(n) AS rk FROM cells GROUP BY 1) rk
        JOIN (SELECT predicted_lang, sum(n) AS ck FROM cells GROUP BY 1) ck
          ON rk.lang = ck.predicted_lang
    )
    SELECT n_docs, n_agree, CAST(pe_mass AS BIGINT) AS pe_mass,
           CASE WHEN CAST(n_docs AS HUGEINT) * n_docs - pe_mass = 0 THEN NULL
                WHEN CAST(n_docs AS HUGEINT) * n_agree - pe_mass >= 0
                THEN CAST((2000000 * (CAST(n_docs AS HUGEINT) * n_agree - pe_mass)
                     + (CAST(n_docs AS HUGEINT) * n_docs - pe_mass))
                 // (2 * (CAST(n_docs AS HUGEINT) * n_docs - pe_mass)) AS BIGINT)
                ELSE -CAST((2000000 * (pe_mass - CAST(n_docs AS HUGEINT) * n_agree)
                     + (CAST(n_docs AS HUGEINT) * n_docs - pe_mass))
                 // (2 * (CAST(n_docs AS HUGEINT) * n_docs - pe_mass)) AS BIGINT)
           END AS kappa_micros
    FROM tot, pe
""".replace(
    "{LANGID}", ORACLES["text_lang_id"]
)


# ------------------------------------------------------- word burstiness
# Church & Gale (1995): content words are BURSTY — once a document
# uses a word it tends to reuse it — while function words arrive
# ~Poisson. The statistic is the variance-to-mean ratio (VMR) of the
# per-document count, over ALL documents including the zeros:
# VMR = (N·Σc² − (Σc)²) / (N·Σc). The zero documents never
# materialize — Σc and Σc² come from the word's own occurrence rows
# and N is the corpus count (the text_js_by_source closed-form-tail
# trick), so no docs × vocab join exists at any scale. Everything is
# an exact integer: the square runs on the DECIMAL(38,0)/HUGEINT rail
# ((Σc)² wraps int64 for corpus-dominant words past ~3e9 total
# occurrences), and the VMR is the house half-up micros rational.
# VMR ≈ 1e6 → Poissonian (function word); ≫ 1e6 → bursty (content
# word) — the signal separating topical vocabulary from glue without
# any stopword list, and a direct input to tf-idf-style weighting
# decisions. Vocabulary is capped at the top BURST_TOP by corpus
# frequency (word-asc tiebreak) — the TakeOrdered constant-size
# discipline of text_zipf_fit.

BURST_TOP = 200


def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # literal, not a join (1-row driver scalar)
    per = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per.groupBy("word").agg(
        F.sum("c").alias("total_count"),
        F.count(F.lit(1)).alias("df"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
    )
    top = stats.orderBy(F.desc("total_count"), F.asc("word")).limit(BURST_TOP)
    return top.select(
        "word",
        "total_count",
        "df",
        ratio_units_dec(
            f"CAST({n_docs} AS BIGINT) * sum_c2 - total_count * total_count",
            f"CAST({n_docs} AS BIGINT) * total_count",
        ).alias("vmr_micros"),
    )


QUERIES["text_burstiness"] = text_burstiness


def _burstiness_oracle() -> str:
    from ..functions.rounding import sql_ratio_units_dec

    return f"""
    WITH nd AS (
        SELECT CAST(count(*) AS BIGINT) AS n FROM documents
    ), per AS (
        SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT doc_id, unnest({sql_tokens('text')}) AS word
            FROM documents
        ) GROUP BY 1, 2
    ), stats AS (
        SELECT word,
               CAST(sum(c) AS BIGINT) AS total_count,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(c * c) AS BIGINT) AS sum_c2
        FROM per GROUP BY 1
    )
    SELECT word, total_count, df,
           {sql_ratio_units_dec(
               'n * sum_c2 - total_count * total_count',
               'n * total_count')} AS vmr_micros
    FROM stats, nd
    ORDER BY total_count DESC, word ASC LIMIT {BURST_TOP}
"""


ORACLES["text_burstiness"] = _burstiness_oracle()


# ------------------------------------------- pseudo-relevance feedback
# RM3-style query expansion (Lavrenko & Croft 2001 / Abdul-Jaleel 2004
# lite): retrieve with the base query, mine expansion terms from the
# top-PRF_FB feedback documents (highest cumulative tf, original terms
# and sub-3-char tokens excluded, term-asc tiebreak), re-score the
# corpus on the expansion terms with the SAME BM25 formula, and blend
# 1.0·original + 0.5·expansion. PRF is definitionally a TWO-PASS
# retrieval — the second scan is the algorithm, not an accident. The
# blend runs in exact integers: both BM25 scores are pround(6) grid
# doubles, so iunits() recovers them exactly and the combined score
# 2·orig + exp is a total-ordered BIGINT (the ×2 clears the ½ weight).
#
# Scale: pass 1 is search_bm25's profile (query-term filter prunes the
# tf relation pre-shuffle); the feedback set is PRF_FB rows and the
# expansion vocabulary PRF_EXP rows (checkpointed, broadcast back);
# pass 2 repeats the profile with the expansion-term filter as a
# broadcast semi-join instead of a literal IN. Nothing quadratic.

PRF_FB = 10  # feedback depth
PRF_EXP = 5  # expansion terms


def search_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits

    docs = load_table(spark, sf_dir, "documents")
    # r13 OPT: three consumers (expansion terms, doc lengths, expanded
    # tf) re-ran the tokenize explode — materialize once. r14 OPT
    # (ADVICE r13): checkpoint the (doc_id, term, c) COUNT aggregate
    # instead of the raw occurrence rows — every consumer is
    # count-shaped (occurrence sums), so the persisted blocks shrink
    # from corpus grain to doc×vocabulary grain, exactly like the
    # char-entropy rewrite.
    tcnt = (
        docs.select(
            "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    orig = bm25_scored(docs).localCheckpoint()
    fb = (
        orig.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(PRF_FB)
        .select("doc_id")
    )
    exp = (
        tcnt.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("term").isin(*BM25_QUERY))
        .filter(F.length("term") >= 3)
        .groupBy("term")
        .agg(F.sum("c").alias("w"))
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(PRF_EXP)
        .select("term")
        .localCheckpoint()
    )
    dl = tcnt.groupBy("doc_id").agg(F.sum("c").alias("dl"))
    etf = tcnt.join(F.broadcast(exp), "term").select(
        "doc_id", "term", F.col("c").alias("tf")
    )
    edf = etf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.select(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(BM25_K1 + 1.0)) / denom
    escored = (
        etf.join(edf, "term")
        .join(dl, "doc_id")
        .crossJoin(n_docs)
        .crossJoin(avgdl)
        .groupBy("doc_id")
        .agg(pround(F.sum(contrib), 6).alias("bm25x"))
    )
    comb = (
        orig.join(escored, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.lit(2) * iunits(F.coalesce(F.col("bm25"), F.lit(0.0)), 6)
                + iunits(F.coalesce(F.col("bm25x"), F.lit(0.0)), 6)
            ).alias("combined_units"),
        )
    )
    top = comb.orderBy(F.desc("combined_units"), F.asc("doc_id")).limit(
        BM25_TOPK
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(W.orderBy(F.desc("combined_units"), F.asc("doc_id")))
        .cast("int"),
    )


QUERIES["search_prf_expansion"] = search_prf_expansion

ORACLES["search_prf_expansion"] = f"""
    WITH {sql_bm25_ctes()},
    fb AS (
        SELECT doc_id FROM scored ORDER BY bm25 DESC, doc_id LIMIT {PRF_FB}
    ), exp AS (
        SELECT term FROM terms JOIN fb USING (doc_id)
        WHERE term NOT IN ({", ".join(f"'{t}'" for t in BM25_QUERY)})
          AND length(term) >= 3
        GROUP BY term ORDER BY count(*) DESC, term ASC LIMIT {PRF_EXP}
    ), etf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms
        WHERE term IN (SELECT term FROM exp)
        GROUP BY 1, 2
    ), edf AS (
        SELECT term, count(*) AS df FROM etf GROUP BY 1
    ), escored AS (
        SELECT tf.doc_id,
               {sql_pround(
                   f'sum({_BM25_IDF} * (tf.tf * {BM25_K1 + 1.0}) / ({_BM25_DENOM}))',
                   6,
               )} AS bm25x
        FROM etf tf
        JOIN edf df USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id, n, a
        GROUP BY 1
    ), comb AS (
        SELECT coalesce(s.doc_id, e.doc_id) AS doc_id,
               2 * {sql_iunits('coalesce(s.bm25, 0.0)')}
                 + {sql_iunits('coalesce(e.bm25x, 0.0)')} AS combined_units
        FROM scored s FULL OUTER JOIN escored e ON s.doc_id = e.doc_id
    )
    SELECT doc_id, combined_units,
           CAST(row_number() OVER (
               ORDER BY combined_units DESC, doc_id ASC
           ) AS INTEGER) AS rank
    FROM comb
    ORDER BY combined_units DESC, doc_id ASC
    LIMIT {BM25_TOPK}
"""


# -------------------------------------------------- code/prose routing
# The code-vs-prose router every pretraining pipeline runs before
# choosing a tokenizer/quality battery (StarCoder/StackV2 intake
# shape): classify by symbol density + code-keyword hits. The fixture
# corpus is pure prose, so the detector is graded by PLANTING: docs
# with doc_id % 7 == 3 get a deterministic code snippet appended
# in-query on BOTH engines (text_encoding_quality's plant-and-detect
# discipline — Java-regex/RE2 agreement on the symbol classes becomes
# hash-proven instead of assumed). Rules (all integer counts over the
# planted text): symbol chars {}();=<>[] per 100 chars ≥ 3, or ≥ 2
# keyword hits among def/return/void/import/class. Output is the
# per-doc verdict plus the rule counters — stateless single scan,
# keep/route is the filter bit.

_CODE_PLANT = " def f(x): return (x == 1); class T { void g() { y[0] = 2; } }"
_CODE_SYM_RE = r"[{}();=<>\[\]]"
_CODE_KW_RE = r"\b(def|return|void|import|class)\b"


def text_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 7 == 3, F.lit(_CODE_PLANT)).otherwise(
            F.lit("")
        ),
    )
    n_sym = F.regexp_count(planted, F.lit(_CODE_SYM_RE)).cast("long")
    n_kw = F.regexp_count(planted, F.lit(_CODE_KW_RE)).cast("long")
    n_chars = F.length(planted).cast("long")
    is_code = (
        (n_sym * F.lit(100) >= F.lit(3) * n_chars) | (n_kw >= F.lit(2))
    ).cast("int")
    return docs.select(
        "doc_id",
        n_sym.alias("n_symbols"),
        n_kw.alias("n_keywords"),
        n_chars.alias("n_chars_planted"),
        is_code.alias("is_code"),
        (F.col("doc_id") % 7 == 3).cast("int").alias("was_planted"),
    )


QUERIES["text_code_detection"] = text_code_detection

ORACLES["text_code_detection"] = r"""
    WITH planted AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 7 = 3 THEN '{plant}' ELSE '' END
                   AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[{{}}();=<>\[\]]')) AS BIGINT)
               AS n_symbols,
           CAST(len(regexp_extract_all(t, '\b(def|return|void|import|class)\b'))
               AS BIGINT) AS n_keywords,
           CAST(length(t) AS BIGINT) AS n_chars_planted,
           CAST(CASE WHEN
                    len(regexp_extract_all(t, '[{{}}();=<>\[\]]')) * 100
                        >= 3 * length(t)
                    OR len(regexp_extract_all(t,
                        '\b(def|return|void|import|class)\b')) >= 2
                THEN 1 ELSE 0 END AS INTEGER) AS is_code,
           CAST(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END AS INTEGER)
               AS was_planted
    FROM planted
""".replace(
    "{plant}", _CODE_PLANT
).replace(
    "{{", "{"
).replace(
    "}}", "}"
)


# ------------------------------------------------ ranking-shift report
# "How much did query expansion change the answer" as exact numbers —
# the eval that tells an IR team whether PRF is a no-op, a reshuffle,
# or a replacement on their corpus. Compares search_bm25's top-k with
# search_prf_expansion's: set overlap, Spearman footrule Σ|rA − rB|
# and Kendall concordant/discordant pair counts over the COMMON
# documents (ranks are distinct integers, so tau = (nc − nd)/C(n,2)
# needs no tie handling — signed half-up micros with the kappa sign
# split). The pair stage is C(k,2) ≤ 105 rows — constant whatever the
# corpus size; both input rankings carry their own scale contracts.


def search_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = search_bm25(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("ra")
    )
    b = search_prf_expansion(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("rb")
    )
    common = a.join(b, "doc_id").localCheckpoint()
    x, y = common.alias("x"), common.alias("y")
    pairs = x.join(
        y, F.col("x.doc_id") < F.col("y.doc_id")
    ).select(
        (
            (F.col("x.ra") < F.col("y.ra")) == (F.col("x.rb") < F.col("y.rb"))
        )
        .cast("long")
        .alias("conc")
    )
    pa = pairs.agg(
        F.coalesce(F.sum("conc"), F.lit(0)).alias("n_concordant"),
        F.coalesce(F.sum(F.lit(1) - F.col("conc")), F.lit(0)).alias(
            "n_discordant"
        ),
    )
    ca = common.agg(
        F.count(F.lit(1)).alias("n_common"),
        F.coalesce(
            F.sum(F.abs(F.col("ra") - F.col("rb"))), F.lit(0)
        ).alias("footrule"),
    )
    na = a.agg(F.count(F.lit(1)).alias("n_base"))
    nb = b.agg(F.count(F.lit(1)).alias("n_expanded"))
    return (
        na.crossJoin(nb)
        .crossJoin(ca)
        .crossJoin(pa)
        .select(
            "n_base",
            "n_expanded",
            "n_common",
            "footrule",
            "n_concordant",
            "n_discordant",
            F.expr(
                "CASE WHEN n_concordant + n_discordant = 0 THEN NULL"
                " WHEN n_concordant >= n_discordant"
                " THEN (2000000 * (n_concordant - n_discordant)"
                "       + (n_concordant + n_discordant))"
                "      div (2 * (n_concordant + n_discordant))"
                " ELSE -((2000000 * (n_discordant - n_concordant)"
                "       + (n_concordant + n_discordant))"
                "      div (2 * (n_concordant + n_discordant))) END"
            ).alias("tau_micros"),
        )
    )


QUERIES["search_rank_shift"] = search_rank_shift

ORACLES["search_rank_shift"] = f"""
    WITH base AS ({ORACLES['search_bm25']}),
    expd AS ({ORACLES['search_prf_expansion']}),
    common AS (
        SELECT base.doc_id, base.rank AS ra, expd.rank AS rb
        FROM base JOIN expd ON base.doc_id = expd.doc_id
    ), pairs AS (
        SELECT CAST(CASE WHEN (x.ra < y.ra) = (x.rb < y.rb)
                    THEN 1 ELSE 0 END AS BIGINT) AS conc
        FROM common x JOIN common y ON x.doc_id < y.doc_id
    ), pa AS (
        SELECT CAST(coalesce(sum(conc), 0) AS BIGINT) AS n_concordant,
               CAST(coalesce(sum(1 - conc), 0) AS BIGINT) AS n_discordant
        FROM pairs
    ), ca AS (
        SELECT CAST(count(*) AS BIGINT) AS n_common,
               CAST(coalesce(sum(abs(ra - rb)), 0) AS BIGINT) AS footrule
        FROM common
    ), na AS (SELECT CAST(count(*) AS BIGINT) AS n_base FROM base),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_expanded FROM expd)
    SELECT n_base, n_expanded, n_common, footrule,
           n_concordant, n_discordant,
           CASE WHEN n_concordant + n_discordant = 0 THEN NULL
                WHEN n_concordant >= n_discordant
                THEN (2000000 * (n_concordant - n_discordant)
                      + (n_concordant + n_discordant))
                     // (2 * (n_concordant + n_discordant))
                ELSE -((2000000 * (n_discordant - n_concordant)
                      + (n_concordant + n_discordant))
                     // (2 * (n_concordant + n_discordant))) END
               AS tau_micros
    FROM na, nb, ca, pa
"""


# ------------------------------------------------- MATTR lexical diversity
# Round 10: Moving-Average Type-Token Ratio (Covington & McFall 2010) —
# the length-robust lexical-diversity score (plain TTR collapses as
# docs grow; MATTR averages TTR over every W-token sliding window, so
# scores are comparable across lengths — the diversity feature quality
# classifiers actually use). W = 20.
#
# Exactness: window distinct counts are integers; MATTR =
# Σ_w distinct_w / (n_windows · W) goes through ratio_micros — zero
# doubles. Docs shorter than W get their single full-length window
# (TTR = |types|/n), the reference MATTR convention.
#
# Scale: the naive per-window array_distinct(slice(toks, i, W)) would
# re-evaluate the tokenizer inside every window lambda (projection
# collapse re-inlines it — the winnowing O(n²) lesson). Instead the
# window fold runs on the PREV-OCCURRENCE array: prev[p] = last
# position q < p with the same token (0 if none), computed with one
# (doc, token)-keyed lag window; distinct_w(i) is then
# #{p ∈ [i, i+W−1] : prev[p] < i} — an O(n·W) integer fold per doc
# over a shuffle-materialized int array, no string ops inside lambdas.
# One posexplode + one window shuffle + one id-keyed agg, all bounded
# by total token count.

MATTR_W = 20


def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(tokenize(F.col("text"))).alias("p0", "tok"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    lw = W.partitionBy("doc_id", "tok").orderBy("p")
    prev = pos.select(
        "doc_id",
        "p",
        F.coalesce(F.lag("p").over(lw), F.lit(0)).alias("prev"),
    )
    arr = prev.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "prev"))),
            lambda s: s["prev"],
        ).alias("pv"),
    )
    n = F.col("n")
    nw = F.greatest(n - F.lit(MATTR_W - 1), F.lit(1))
    # Σ_w distinct_w: for each window start i, count prev[j] < i over
    # the window slice — pure integer HOF fold on the materialized
    # prev array
    sum_d = F.aggregate(
        F.sequence(F.lit(1), nw),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.aggregate(
            F.slice(F.col("pv"), i, F.least(F.lit(MATTR_W), n)),
            F.lit(0).cast("long"),
            lambda a, v: a + F.when(v < i, 1).otherwise(0),
        ),
    )
    from ..functions.rounding import ratio_micros

    return arr.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        nw.cast("long").alias("n_windows"),
        sum_d.alias("sum_distinct"),
        ratio_micros(
            "sum_distinct", f"n_windows * least({MATTR_W}, n)"
        ).alias("mattr_micros"),
    ).withColumn("sum_distinct", F.col("sum_distinct").cast("long"))


QUERIES["text_mattr_diversity"] = text_mattr_diversity

ORACLES["text_mattr_diversity"] = f"""
    WITH t AS (
        SELECT doc_id, {sql_tokens('text')} AS toks
        FROM documents
        WHERE len({sql_tokens('text')}) > 0
    ), sized AS (
        SELECT doc_id, toks, len(toks) AS n,
               greatest(len(toks) - {MATTR_W - 1}, 1) AS n_windows,
               least({MATTR_W}, len(toks)) AS w
        FROM t
    ), summed AS (
        SELECT doc_id, n, n_windows, w,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, n_windows + 1),
                       i -> CAST(len(list_distinct(toks[i:i+w-1]))
                                 AS BIGINT))),
                   (x, y) -> x + y) AS sum_distinct
        FROM sized
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(n_windows AS BIGINT) AS n_windows,
           sum_distinct,
           {sql_ratio_micros('sum_distinct', 'n_windows * w')} AS mattr_micros
    FROM summed
"""


# ------------------------------------ Query likelihood (Dirichlet) IR
QL_MU = 2000  # Dirichlet smoothing pseudo-count (Zhai & Lafferty 2001)
QL_TOPK = 15


def search_ql_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing — the
    language-modeling counterpart of search_bm25 (Zhai & Lafferty
    2001): score(d) = Σ_{w∈Q} ln((tf_{w,d} + μ·cf_w/|C|)/(|d| + μ)),
    the second classic lexical ranker an IR stack serves next to BM25
    (and a different idf-free statistic, so RRF fusion over the pair
    is meaningful).

    Exactness rail — tighter than bm25's pround(6): with μ integer the
    per-term log factors as ln(tf·|C| + μ·cf_w) − ln(|C|) − ln(|d|+μ),
    EVERY argument an exact integer, so each ln() is snapped to
    nano-units (the behavior-entropy ln contract) and the score is a
    pure BIGINT sum — engine-exact, no pround boundary anywhere.
    Docs missing a query term still pay that term's smoothed cost
    (tf = 0), which is what separates QL from a tf-filter: the
    candidate×term grid is built by crossJoin against the 3-row
    broadcast query relation, candidates = docs matching ≥ 1 term.

    Scale: one tokenize/explode scan feeds tf (pre-filtered to query
    terms), dl, and the two corpus scalars (cf_w — 3 rows, |C| — 1
    row, both broadcast); the grid is |candidates|×|Q|. Integer-ln
    ceiling: tf·|C| < 2^53 holds to ~10^12-token corpora per run —
    past that, rescale |C| to kilo-token units on both sides.
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    )
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    c_tot = terms.agg(F.count(F.lit(1)).alias("c"))
    qt = terms.filter(F.col("term").isin(*BM25_QUERY))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cf = qt.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    cand = tf.select("doc_id").distinct()
    grid = (
        cand.crossJoin(F.broadcast(cf))
        .join(tf, ["doc_id", "term"], "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(c_tot))
        .select(
            "doc_id",
            F.coalesce(F.col("tf"), F.lit(0)).alias("tf"),
            "cf",
            "dl",
            "c",
        )
    )
    from ..functions.rounding import iunits

    ln9 = lambda c: iunits(F.log(c.cast("double")), 9)  # noqa: E731
    scored = grid.groupBy("doc_id").agg(
        F.sum(
            ln9(F.col("tf") * F.col("c") + F.lit(QL_MU) * F.col("cf"))
            - ln9(F.col("c"))
            - ln9(F.col("dl") + F.lit(QL_MU))
        ).alias("ql_nanos")
    )
    top = scored.orderBy(F.desc("ql_nanos"), F.asc("doc_id")).limit(QL_TOPK)
    w = W.orderBy(F.desc("ql_nanos"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "ql_nanos", "rank"
    )


QUERIES["search_ql_dirichlet"] = search_ql_dirichlet

_QL_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)
_SQL_LN9 = lambda e: (  # noqa: E731
    f"CAST(floor(ln(CAST(({e}) AS DOUBLE)) * 1000000000.0 + 0.5) AS BIGINT)"
)

ORACLES["search_ql_dirichlet"] = f"""
    WITH terms AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS term FROM documents
    ), dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        FROM terms GROUP BY doc_id
    ), c_tot AS (
        SELECT CAST(count(*) AS BIGINT) AS c FROM terms
    ), qt AS (
        SELECT doc_id, term FROM terms WHERE term IN ({_QL_TERMS_SQL})
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM qt GROUP BY doc_id, term
    ), cf AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cf FROM qt GROUP BY term
    ), cand AS (
        SELECT DISTINCT doc_id FROM tf
    ), grid AS (
        SELECT cand.doc_id,
               CAST(coalesce(tf.tf, 0) AS BIGINT) AS tf,
               cf.cf, dl.dl, c_tot.c
        FROM cand
        CROSS JOIN cf
        LEFT JOIN tf ON tf.doc_id = cand.doc_id AND tf.term = cf.term
        JOIN dl ON dl.doc_id = cand.doc_id
        CROSS JOIN c_tot
    ), scored AS (
        SELECT doc_id,
               CAST(sum({_SQL_LN9(f'tf * c + {QL_MU} * cf')}
                        - {_SQL_LN9('c')}
                        - {_SQL_LN9(f'dl + {QL_MU}')}) AS BIGINT) AS ql_nanos
        FROM grid GROUP BY doc_id
    )
    SELECT doc_id, ql_nanos,
           CAST(row_number() OVER (ORDER BY ql_nanos DESC, doc_id ASC)
                AS INTEGER) AS rank
    FROM scored
    ORDER BY ql_nanos DESC, doc_id ASC
    LIMIT {QL_TOPK}
"""


# ----------------------------------------------- RAKE keyword phrases
RAKE_MAX_LEN = 4  # candidate phrases longer than this are dropped
RAKE_TOPK = 15


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) — the phrase-level
    counterpart of text_textrank_keywords: candidate phrases are
    maximal stopword-free token runs (gaps-and-islands on positions),
    each word scores degree/frequency over the candidate set (degree =
    Σ length of phrases containing the word, multiplicity included),
    and a phrase scores the sum of its words' scores. Runs longer than
    RAKE_MAX_LEN are dropped as non-keyword-like (the standard cap).

    Exactness: degree and frequency are BIGINT counts; word scores are
    half-up micro-rationals (zero doubles); phrase scores are BIGINT
    sums of those. Ties break on phrase text.

    Scale: one tokenize/posexplode scan; islands come from ONE
    per-document window (partitioned — no global sort); word stats
    aggregate to |vocab| rows; the phrase relation re-aggregates the
    same member rows. All shuffles are doc- or token-keyed.
    """
    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(tokenize(F.col("text"))).alias("pos", "tok"),
    )
    dw = W.partitionBy("doc_id").orderBy("pos")
    members = (
        toks.filter(~F.col("tok").isin(*GR_STOPWORDS))
        .withColumn("island", F.col("pos") - F.row_number().over(dw))
        .withColumn(
            "plen",
            F.count(F.lit(1)).over(W.partitionBy("doc_id", "island")),
        )
        .filter(F.col("plen") <= RAKE_MAX_LEN)
    )
    wstats = members.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    )
    wscore = wstats.select(
        "tok", ratio_micros("deg", "freq").alias("wscore")
    )
    phrases = members.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.getField("tok"),
            ),
            " ",
        ).alias("phrase")
    )
    iscore = (
        members.join(F.broadcast(wscore), "tok")
        .groupBy("doc_id", "island")
        .agg(F.sum("wscore").alias("score_micros"))
    )
    dist = (
        phrases.join(iscore, ["doc_id", "island"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occur"),
            F.max("score_micros").alias("score_micros"),
        )
    )
    top = dist.orderBy(
        F.desc("score_micros"), F.asc("phrase")
    ).limit(RAKE_TOPK)
    w = W.orderBy(F.desc("score_micros"), F.asc("phrase"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "phrase", "n_occur", "score_micros", "rank"
    )


QUERIES["text_rake_keywords"] = text_rake_keywords

_RAKE_STOPS_SQL = ", ".join(f"'{s}'" for s in GR_STOPWORDS)

ORACLES["text_rake_keywords"] = f"""
    WITH toks AS (
        SELECT doc_id, unnest(t) AS tok,
               generate_subscripts(t, 1) AS pos
        FROM (SELECT doc_id, {sql_tokens('text')} AS t FROM documents)
    ), isl AS (
        SELECT doc_id, pos, tok,
               pos - row_number() OVER (
                   PARTITION BY doc_id ORDER BY pos) AS island
        FROM toks WHERE tok NOT IN ({_RAKE_STOPS_SQL})
    ), members AS (
        SELECT * FROM (
            SELECT doc_id, pos, tok, island,
                   CAST(count(*) OVER (
                       PARTITION BY doc_id, island) AS BIGINT) AS plen
            FROM isl
        ) WHERE plen <= {RAKE_MAX_LEN}
    ), wscore AS (
        SELECT tok,
               {sql_ratio_micros('CAST(sum(plen) AS BIGINT)',
                                 'CAST(count(*) AS BIGINT)')} AS wscore
        FROM members GROUP BY tok
    ), phrases AS (
        SELECT doc_id, island,
               string_agg(tok, ' ' ORDER BY pos) AS phrase
        FROM members GROUP BY doc_id, island
    ), iscore AS (
        SELECT m.doc_id, m.island,
               CAST(sum(w.wscore) AS BIGINT) AS score_micros
        FROM members m JOIN wscore w ON m.tok = w.tok
        GROUP BY m.doc_id, m.island
    ), dist AS (
        SELECT p.phrase,
               CAST(count(*) AS BIGINT) AS n_occur,
               CAST(max(s.score_micros) AS BIGINT) AS score_micros
        FROM phrases p JOIN iscore s
          ON p.doc_id = s.doc_id AND p.island = s.island
        GROUP BY p.phrase
    )
    SELECT phrase, n_occur, score_micros,
           CAST(row_number() OVER (
               ORDER BY score_micros DESC, phrase ASC) AS INTEGER) AS rank
    FROM dist
    ORDER BY score_micros DESC, phrase ASC
    LIMIT {RAKE_TOPK}
"""


# --------------------------------------------------- feature hashing
FH_BITS = 10  # 2^10 = 1024 buckets


def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger 2009, the Vowpal Wabbit feature
    map): vocabulary → 2^FH_BITS buckets by hash, no dictionary. This
    op reports what a feature-hashing deployment must measure before
    trusting the map — bucket utilization and the collision profile
    (how many buckets fold ≥2 distinct tokens, the worst fold, and
    the share of token MASS landing in colliding buckets). Pure
    integer arithmetic on one tokenize scan; collisions resolve at
    the VOCABULARY grain (groupBy token first), so the expensive
    explode aggregates before the bucket fold.
    """
    from ..functions.hashing import token_hash
    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    buckets = vocab.groupBy(
        (token_hash(F.col("tok")) % (1 << FH_BITS)).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("tf").alias("mass"),
    )
    return buckets.agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.sum("n_toks").alias("vocab_size"),
        F.sum("mass").alias("total_tokens"),
        F.sum((F.col("n_toks") >= 2).cast("long")).alias(
            "colliding_buckets"
        ),
        F.max("n_toks").alias("max_fold"),
        F.sum(
            F.when(F.col("n_toks") >= 2, F.col("mass")).otherwise(0)
        ).alias("colliding_mass"),
    ).select(
        "buckets_used",
        "vocab_size",
        "total_tokens",
        "colliding_buckets",
        "max_fold",
        ratio_micros("colliding_mass", "total_tokens").alias(
            "colliding_mass_micros"
        ),
    )


QUERIES["text_feature_hashing"] = text_feature_hashing

from ..functions.hashing import sql_token_hash as _sql_th_fh  # noqa: E402

ORACLES["text_feature_hashing"] = f"""
    WITH vocab AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT unnest({sql_tokens('text')}) AS tok FROM documents)
        GROUP BY tok
    ), buckets AS (
        SELECT {_sql_th_fh('tok')} % {1 << FH_BITS} AS b,
               CAST(count(*) AS BIGINT) AS n_toks,
               CAST(sum(tf) AS BIGINT) AS mass
        FROM vocab GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS buckets_used,
           CAST(sum(n_toks) AS BIGINT) AS vocab_size,
           CAST(sum(mass) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN n_toks >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS colliding_buckets,
           CAST(max(n_toks) AS BIGINT) AS max_fold,
           {sql_ratio_micros(
               'sum(CASE WHEN n_toks >= 2 THEN mass ELSE 0 END)',
               'sum(mass)')} AS colliding_mass_micros
    FROM buckets
"""


# ----------------------------------------- MCC / F1 threshold sweep
def quality_logreg_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation + F1 per decision threshold — the
    class-imbalance-honest pair that completes the PR sweep
    (quality_logreg_pr): MCC is the single scalar that cannot be
    gamed by predicting the majority class. Same scored relation and
    confusion rail as the PR sweep (train-once shared weights); F1 is
    a pure integer rational, MCC spends one double conversion per
    exact confusion factor and one sqrt under pround."""
    from ..functions.rounding import ratio_micros

    # nano-snap BEFORE thresholding (ADVICE r10) — the logreg_pr rail,
    # read off the score-once artifact
    scored = _lr_scored(spark, sf_dir).select(
        "keep",
        (F.col("score_units").cast("double") / F.lit(1e9)).alias("p"),
    )
    thr = F.explode(
        F.array(*[F.lit(t) for t in LOGREG_THRESHOLDS])
    ).alias("threshold")
    sweep = scored.select("keep", "p", thr)
    pred = (F.col("p") >= F.col("threshold")).cast("long")
    cm = sweep.groupBy("threshold").agg(
        F.sum(pred * F.col("keep")).alias("tp"),
        F.sum(pred * (F.lit(1) - F.col("keep"))).alias("fp"),
        F.sum((F.lit(1) - pred) * F.col("keep")).alias("fn"),
        F.sum((F.lit(1) - pred) * (F.lit(1) - F.col("keep"))).alias("tn"),
    )
    den = (
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn")).cast("double")
        * (F.col("tn") + F.col("fp")).cast("double")
        * (F.col("tn") + F.col("fn")).cast("double")
    )
    num = (
        F.col("tp") * F.col("tn") - F.col("fp") * F.col("fn")
    ).cast("double")
    return cm.select(
        "threshold",
        ratio_micros("2 * tp", "2 * tp + fp + fn").alias("f1_micros"),
        F.when(den <= 0, F.lit(None).cast("double"))
        .otherwise(pround(num / F.sqrt(den), 6))
        .alias("mcc"),
    )


QUERIES["quality_logreg_mcc"] = quality_logreg_mcc


def _sql_logreg_mcc() -> str:
    thr_list = ", ".join(str(t) for t in LOGREG_THRESHOLDS)
    return f"""
    WITH perdoc AS ({_sql_logreg(mode="per_doc", score_where="TRUE")}),
    sweep AS (
        SELECT keep, CAST(score_units AS DOUBLE) / 1000000000.0 AS p,
               CAST(t.threshold AS DOUBLE) AS threshold
        FROM perdoc, (SELECT unnest([{thr_list}]) AS threshold) t
    ), cm AS (
        SELECT threshold,
               CAST(sum(CAST(p >= threshold AS BIGINT) * keep) AS BIGINT) AS tp,
               CAST(sum(CAST(p >= threshold AS BIGINT) * (1 - keep)) AS BIGINT) AS fp,
               CAST(sum((1 - CAST(p >= threshold AS BIGINT)) * keep) AS BIGINT) AS fn,
               CAST(sum((1 - CAST(p >= threshold AS BIGINT)) * (1 - keep)) AS BIGINT) AS tn
        FROM sweep GROUP BY threshold
    )
    SELECT CAST(threshold AS DOUBLE) AS threshold,
           {sql_ratio_micros('2 * tp', '2 * tp + fp + fn')} AS f1_micros,
           CASE WHEN CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                     * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)
                     <= 0 THEN NULL
                ELSE {sql_pround(
                    "CAST(tp * tn - fp * fn AS DOUBLE)"
                    " / sqrt(CAST(tp + fp AS DOUBLE)"
                    " * CAST(tp + fn AS DOUBLE)"
                    " * CAST(tn + fp AS DOUBLE)"
                    " * CAST(tn + fn AS DOUBLE))", 6)}
           END AS mcc
    FROM cm
"""


ORACLES["quality_logreg_mcc"] = _sql_logreg_mcc()


# ------------------------------------------------- hapax legomena
def text_hapax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis-legomena profile per language — the Zipf-tail health
    check next to text_zipf_fit (a natural corpus keeps roughly half
    its vocabulary as hapaxes; templated/duplicated corpora collapse
    the tail): vocabulary size, once- and twice-seen type counts, and
    their micro-shares, from the same one-scan vocabulary aggregate
    as the Zipf fit. HEADLINE-exempt: it duplicates text_zipf_fit's
    vocabulary scan (the double-counting convention)."""
    from ..functions.rounding import ratio_micros

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "lang", F.explode(tokenize(F.col("text"))).alias("tok")
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        vocab.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum("tf").alias("n_tokens"),
            F.sum((F.col("tf") == 1).cast("long")).alias("hapax"),
            F.sum((F.col("tf") == 2).cast("long")).alias("dis"),
        )
        .select(
            "lang",
            "vocab_size",
            "n_tokens",
            "hapax",
            "dis",
            ratio_micros("hapax", "vocab_size").alias("hapax_share_micros"),
            ratio_micros("dis", "vocab_size").alias("dis_share_micros"),
        )
    )


QUERIES["text_hapax_stats"] = text_hapax_stats

ORACLES["text_hapax_stats"] = f"""
    WITH vocab AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT lang, unnest({sql_tokens('text')}) AS tok
              FROM documents)
        GROUP BY lang, tok
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           {sql_ratio_micros(
               'sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)', 'count(*)')}
               AS hapax_share_micros,
           {sql_ratio_micros(
               'sum(CASE WHEN tf = 2 THEN 1 ELSE 0 END)', 'count(*)')}
               AS dis_share_micros
    FROM vocab GROUP BY lang
"""


# ------------------------------------------------ Yule's K / Simpson
# Round 11: frequency-SPECTRUM lexical concentration per language —
# the repetitiveness scalar the diversity battery lacked: MATTR/TTR
# track type growth, hapax stats the tail, Yule's K the repeat MASS:
#   K = 10⁴·(Σ_f f²·V(f) − N) / N²
# (V(f) = #types occurring exactly f times, N = token count), with
# Simpson's repeat rate D = (Σ f²V − N)/(N(N−1)) riding the same
# aggregate. K is sample-size-invariant by construction (the classic
# property vs raw TTR) — templated/duplicated corpora push K up an
# order of magnitude. Pure integer moments: one vocab aggregate, one
# spectrum aggregate, DECIMAL-widened squares (the ADVICE r10 rail),
# half-up micros rationals. Scale: token-keyed shuffle → |vocab| →
# |spectrum| (≤ max frequency) rows; no windows at all.


def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select("lang", F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    spectrum = vocab.groupBy("lang", "f").agg(F.count(F.lit(1)).alias("vf"))
    dec = "decimal(38,0)"
    agg = spectrum.groupBy("lang").agg(
        F.sum(F.col("f") * F.col("vf")).alias("n_tokens"),
        F.sum("vf").alias("vocab"),
        F.sum((F.col("f").cast(dec) * F.col("f") * F.col("vf")).cast(dec))
        .cast("long")
        .alias("s2"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "vocab",
        "s2",
        F.when(F.col("n_tokens") <= 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                "(s2 - n_tokens) * 10000",
                "CAST(n_tokens AS DECIMAL(38,0)) * n_tokens",
                1_000_000,
            )
        )
        .alias("yule_k_micros"),
        F.when(F.col("n_tokens") <= 1, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                "s2 - n_tokens",
                "CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)",
                1_000_000,
            )
        )
        .alias("simpson_micros"),
    )


QUERIES["text_yule_k"] = text_yule_k

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_yk  # noqa: E402

ORACLES["text_yule_k"] = f"""
    WITH vocab AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS f
        FROM (
            SELECT lang, unnest({sql_tokens('text')}) AS tok FROM documents
        ) GROUP BY lang, tok
    ), spectrum AS (
        SELECT lang, f, CAST(count(*) AS BIGINT) AS vf
        FROM vocab GROUP BY lang, f
    ), agg AS (
        SELECT lang,
               CAST(sum(f * vf) AS BIGINT) AS n_tokens,
               CAST(sum(vf) AS BIGINT) AS vocab,
               CAST(sum(CAST(f AS HUGEINT) * f * vf) AS BIGINT) AS s2
        FROM spectrum GROUP BY lang
    )
    SELECT lang, n_tokens, vocab, s2,
           CASE WHEN n_tokens <= 0 THEN NULL
                ELSE {_sql_rud_yk('(s2 - n_tokens) * 10000',
                                  'CAST(n_tokens AS HUGEINT) * n_tokens',
                                  1_000_000)}
           END AS yule_k_micros,
           CASE WHEN n_tokens <= 1 THEN NULL
                ELSE {_sql_rud_yk('s2 - n_tokens',
                                  'CAST(n_tokens AS HUGEINT) * (n_tokens - 1)',
                                  1_000_000)}
           END AS simpson_micros
    FROM agg
"""


# --------------------------------------------- McNemar paired test
# Round 11 (re-paired round 12, ADVICE r11): the PAIRED classifier
# comparison the threshold sweeps (quality_logreg_pr / _mcc) cannot
# answer. The r11 version compared two NESTED cutoffs of the same
# score, so cell c (A drops, B keeps) was structurally zero and the
# statistic degenerated to the one-sided count b. Now the pair is
# genuinely different classifiers on the SAME documents: A = the
# distilled logreg at 0.5, B = the incumbent Gopher keep rule it
# distills — the standard "can the student model replace the
# rule-based system" decision, where BOTH discordant cells are live.
# McNemar looks only at those cells: b = #(model keeps, rule drops),
# c = #(model drops, rule keeps); χ² = (b−c)²/(b+c) (and the
# continuity-corrected (|b−c|−1)²/(b+c)), both exact half-up micros
# rationals of integer counts with the square DECIMAL/HUGEINT-widened
# first. Scores nano-snap before thresholding (the logreg_pr rail,
# ADVICE r10). One scored scan, one 4-cell aggregate — no shuffle
# beyond the train-once weights.

MCN_THR = 0.5


def quality_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    scored = _lr_scored(spark, sf_dir).select(
        (F.col("score_units").cast("double") / F.lit(1e9)).alias("p"),
        F.col("keep"),
    )
    pa = (F.col("p") >= F.lit(MCN_THR)).cast("int")  # the student model
    pb = F.col("keep")  # the incumbent rule
    cm = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(pa * (1 - pb)).alias("b"),
        F.sum((1 - pa) * pb).alias("c"),
    )
    return cm.select(
        "n_docs",
        F.col("b").alias("n_a_only"),
        F.col("c").alias("n_b_only"),
        F.when(F.col("b") + F.col("c") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                "CAST(b - c AS DECIMAL(38,0)) * (b - c)", "b + c"
            )
        )
        .alias("chi2_micros"),
        F.when(F.col("b") + F.col("c") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(
                "CAST(abs(b - c) - 1 AS DECIMAL(38,0))"
                " * (abs(b - c) - 1)",
                "b + c",
            )
        )
        .alias("chi2_cc_micros"),
    )


QUERIES["quality_mcnemar"] = quality_mcnemar

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_mcn  # noqa: E402

ORACLES["quality_mcnemar"] = f"""
    WITH perdoc AS ({{_PD}}),
    cells AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN p >= {MCN_THR} AND keep = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(sum(CASE WHEN p < {MCN_THR} AND keep = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM (SELECT CAST(score_units AS DOUBLE) / 1000000000.0 AS p,
                     keep
              FROM perdoc)
    )
    SELECT n_docs, b AS n_a_only, c AS n_b_only,
           CASE WHEN b + c = 0 THEN NULL
                ELSE {_sql_rud_mcn('CAST(b - c AS HUGEINT) * (b - c)',
                                   'b + c')}
           END AS chi2_micros,
           CASE WHEN b + c = 0 THEN NULL
                ELSE {_sql_rud_mcn(
                    'CAST(abs(b - c) - 1 AS HUGEINT) * (abs(b - c) - 1)',
                    'b + c')}
           END AS chi2_cc_micros
    FROM cells
"""

ORACLES["quality_mcnemar"] = ORACLES["quality_mcnemar"].replace(
    "{_PD}", _sql_logreg(mode="per_doc", score_where="TRUE")
)


# ------------------------------------- model-vs-rule Cohen's kappa
# Round 12: the AGREEMENT readout on the same classifier pair McNemar
# tests for marginal difference — McNemar asks "do the student model
# and the incumbent rule disagree asymmetrically?"; kappa asks "how
# much of their agreement exceeds chance?" (Cohen 1960). Both cells
# rails share one scored scan. Exactness: all four confusion cells are
# integers; po and pe are half-up micros rationals; kappa uses the
# closed form 2(tp·tn − fp·fn) / ((tp+fp)(fp+tn) + (tp+fn)(fn+tn)),
# whose numerator is SIGNED — the first user of
# ratio_units_dec_signed (the OFFSET-shifted divide: Spark decimal div
# truncates toward zero, DuckDB // floors; shifting positive makes
# them agree). |kappa| ≤ 1 so off=16 is ample headroom.


def quality_kappa_model_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec, ratio_units_dec_signed

    scored = _lr_scored(spark, sf_dir).select(
        (F.col("score_units").cast("double") / F.lit(1e9)).alias("p"),
        F.col("keep"),
    )
    pa = (F.col("p") >= F.lit(MCN_THR)).cast("long")
    y = F.col("keep").cast("long")
    cm = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pa * y).alias("tp"),
        F.sum(pa * (1 - y)).alias("fp"),
        F.sum((1 - pa) * y).alias("fn"),
        F.sum((1 - pa) * (1 - y)).alias("tn"),
    )
    return cm.select(
        F.col("n").alias("n_docs"),
        (F.col("tp") + F.col("tn")).alias("n_agree"),
        ratio_units_dec("tp + tn", "n").alias("po_micros"),
        ratio_units_dec(
            "CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)"
            " + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn)",
            "CAST(n AS DECIMAL(38,0)) * n",
        ).alias("pe_micros"),
        F.when(
            F.expr(
                "CAST(tp + fp AS DECIMAL(38,0)) * (fp + tn)"
                " + CAST(tp + fn AS DECIMAL(38,0)) * (fn + tn)"
            )
            == 0,
            F.lit(None).cast("long"),
        )
        .otherwise(
            ratio_units_dec_signed(
                "2 * (CAST(tp AS DECIMAL(38,0)) * tn"
                " - CAST(fp AS DECIMAL(38,0)) * fn)",
                "CAST(tp + fp AS DECIMAL(38,0)) * (fp + tn)"
                " + CAST(tp + fn AS DECIMAL(38,0)) * (fn + tn)",
                off=16,
            )
        )
        .alias("kappa_micros"),
    )


QUERIES["quality_kappa_model_rule"] = quality_kappa_model_rule

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_qk,
    sql_ratio_units_dec_signed as _sql_ruds_qk,
)

ORACLES["quality_kappa_model_rule"] = f"""
    WITH perdoc AS ({{_PD}}),
    cm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN p >= {MCN_THR} AND keep = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN p >= {MCN_THR} AND keep = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN p < {MCN_THR} AND keep = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN p < {MCN_THR} AND keep = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM (SELECT CAST(score_units AS DOUBLE) / 1000000000.0 AS p,
                     keep
              FROM perdoc)
    )
    SELECT n AS n_docs,
           CAST(tp + tn AS BIGINT) AS n_agree,
           {_sql_rud_qk('tp + tn', 'n')} AS po_micros,
           {_sql_rud_qk(
               'CAST(tp + fp AS HUGEINT) * (tp + fn)'
               ' + CAST(fn + tn AS HUGEINT) * (fp + tn)',
               'CAST(n AS HUGEINT) * n')} AS pe_micros,
           CASE WHEN CAST(tp + fp AS HUGEINT) * (fp + tn)
                   + CAST(tp + fn AS HUGEINT) * (fn + tn) = 0 THEN NULL
                ELSE {_sql_ruds_qk(
                    '2 * (CAST(tp AS HUGEINT) * tn'
                    ' - CAST(fp AS HUGEINT) * fn)',
                    'CAST(tp + fp AS HUGEINT) * (fp + tn)'
                    ' + CAST(tp + fn AS HUGEINT) * (fn + tn)',
                    off=16)}
           END AS kappa_micros
    FROM cm
"""

ORACLES["quality_kappa_model_rule"] = ORACLES["quality_kappa_model_rule"].replace(
    "{_PD}", _sql_logreg(mode="per_doc", score_where="TRUE")
)


# ----------------------------------------------- Brier proper score
# Round 11: the PROPER scoring rule over the distilled quality
# classifier — quality_logreg_calibration bins reliability, AUC ranks,
# MCC/F1 threshold; Brier = mean((p − y)²) is the single
# decomposition-friendly scalar that punishes both miscalibration and
# noise, reported next to its climatology reference p̄(1−p̄) (a model
# worse than the base rate is instantly visible). Exact rail: p is
# the nano-snapped score (the logreg_pr contract), so every term
# (p_units − y·1e9)² is an exact widened integer; Brier·1e9 and the
# reference are half-up integer rationals. One scored scan, one
# aggregate.


def quality_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    scored = _lr_scored(spark, sf_dir).select(
        "keep", F.col("score_units").alias("p_units")
    )
    dec = "decimal(38,0)"
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_keep"),
        F.sum(
            (
                (F.col("p_units") - F.col("keep") * F.lit(1_000_000_000)).cast(dec)
                * (F.col("p_units") - F.col("keep") * F.lit(1_000_000_000))
            ).cast(dec)
        ).alias("sum_sq"),
    )
    return agg.select(
        "n_docs",
        "n_keep",
        ratio_units_dec(
            "sum_sq", "CAST(n_docs AS DECIMAL(38,0)) * 1000000000", 1
        ).alias("brier_nanos"),
        ratio_units_dec(
            "CAST(n_keep AS DECIMAL(38,0)) * (n_docs - n_keep)"
            " * 1000000000",
            "CAST(n_docs AS DECIMAL(38,0)) * n_docs",
            1,
        ).alias("climatology_nanos"),
    )


QUERIES["quality_brier_score"] = quality_brier_score

from ..functions.rounding import sql_ratio_units_dec as _sql_rud_br  # noqa: E402

ORACLES["quality_brier_score"] = f"""
    WITH perdoc AS ({{_PD}}),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(keep) AS BIGINT) AS n_keep,
               CAST(sum(CAST(score_units - keep * 1000000000 AS HUGEINT)
                        * (score_units - keep * 1000000000)) AS HUGEINT)
                   AS sum_sq
        FROM perdoc
    )
    SELECT n_docs, n_keep,
           {_sql_rud_br('sum_sq', 'CAST(n_docs AS HUGEINT) * 1000000000', 1)}
               AS brier_nanos,
           {_sql_rud_br(
               'CAST(n_keep AS HUGEINT) * (n_docs - n_keep) * 1000000000',
               'CAST(n_docs AS HUGEINT) * n_docs', 1)}
               AS climatology_nanos
    FROM agg
"""

ORACLES["quality_brier_score"] = ORACLES["quality_brier_score"].replace(
    "{_PD}", _sql_logreg(mode="per_doc", score_where="TRUE")
)


# ------------------------------------------------ readability profile
# Round 11: Flesch–Kincaid-style readability per language — the
# curation signal between gopher_rules (hard gates) and quality_logreg
# (learned): word/sentence/syllable rates with the classic grade
# formula. Deterministic proxies both engines share bit-for-bit:
# sentences = count of maximal [.!?]+ runs (floored at 1 per doc),
# syllables = count of maximal [aeiouy]+ runs in the lowercased text
# (the standard vowel-run estimator), words = the engine's tokenize
# contract. Counts are exact integers; the per-language rates are
# half-up micros rationals; only the final grade spends doubles from
# exact factors under pround. One scan, one aggregate, zero windows.


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(tokenize(F.col("text"))).cast("long").alias("w"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        ).cast("long").alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+"))
        .cast("long")
        .alias("y"),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("w").alias("n_words"),
        F.sum("s").alias("n_sentences"),
        F.sum("y").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        ratio_units_dec("n_words", "n_sentences").alias("wps_micros"),
        ratio_units_dec("n_syllables", "n_words").alias("spw_micros"),
        pround(
            F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
        ).alias("fk_grade"),
    )


QUERIES["text_readability"] = text_readability

ORACLES["text_readability"] = f"""
    WITH per AS (
        SELECT lang,
               CAST(len({sql_tokens('text')}) AS BIGINT) AS w,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS s,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS y
        FROM documents
    ), agg AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS n_words,
               CAST(sum(s) AS BIGINT) AS n_sentences,
               CAST(sum(y) AS BIGINT) AS n_syllables
        FROM per GROUP BY lang
    )
    SELECT lang, n_docs, n_words, n_sentences, n_syllables,
           {_sql_rud_br('n_words', 'n_sentences')} AS wps_micros,
           {_sql_rud_br('n_syllables', 'n_words')} AS spw_micros,
           {sql_pround(
               '0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))'
               ' + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))'
               ' - 15.59', 6)} AS fk_grade
    FROM agg
"""


# --------------------------------------- bigram LM cross-entropy
# Round 12: the intrinsic-fluency score a data pipeline uses to rank
# corpora against a reference language model when no external LM is
# available — train an add-one-smoothed bigram model ON the corpus
# itself and report per-language cross-entropy (average negative
# log-likelihood per bigram, in nats): boilerplate-heavy or repetitive
# languages compress better (lower NLL), noisy ones worse. Exactness:
# counts c₂(w₁,w₂), c₁(w₁) and vocabulary size V are exact integers;
# each bigram's −ln p = ln(c₁+V) − ln(c₂+1) takes ln of EXACT INTEGER
# arguments only, snapped to nano units (iunits 9 — the house ln
# contract), so sums and the final per-bigram average are exact
# integer arithmetic. Scale: one tokenize scan → bigram/unigram
# aggregates (vocab-bounded), equi-joins on token keys, a 1-row V
# broadcast — no window, no data-grain sort.


def text_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", tokenize(F.col("text")).alias("tk")
    ).localCheckpoint(eager=False)
    k = F.greatest(F.size("tk") - 1, F.lit(0))
    bi = toks.select(
        "lang",
        F.explode(
            F.zip_with(
                F.slice("tk", 1, k),
                F.slice("tk", 2, k),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("p"),
    ).select("lang", "p.w1", "p.w2")
    lb = (
        bi.groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    gb = lb.groupBy("w1", "w2").agg(F.sum("n").alias("c2"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=False)
    )
    vt = uni.agg(F.count(F.lit(1)).alias("v"))
    per = (
        lb.join(gb, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vt))
        .select(
            "lang",
            "n",
            (
                F.col("n")
                * (
                    iunits(F.log(F.col("c1") + F.col("v")), 9)
                    - iunits(F.log(F.col("c2") + F.lit(1)), 9)
                )
            ).alias("nll"),
        )
    )
    return per.groupBy("lang").agg(
        F.sum("n").alias("n_bigrams"),
        F.sum("nll").alias("total_nll_nanos"),
        ratio_units("sum(nll)", "sum(n)", 1).alias("avg_nll_nanos"),
    )


QUERIES["text_bigram_lm_perplexity"] = text_bigram_lm_perplexity

ORACLES["text_bigram_lm_perplexity"] = f"""
    WITH t AS (
        SELECT doc_id, lang, {sql_tokens('text')} AS tk FROM documents
    ), bi AS (
        SELECT lang,
               unnest(tk[1:len(tk) - 1]) AS w1,
               unnest(tk[2:len(tk)]) AS w2
        FROM t
    ), lb AS (
        SELECT lang, w1, w2, CAST(count(*) AS BIGINT) AS n
        FROM bi GROUP BY 1, 2, 3
    ), gb AS (
        SELECT w1, w2, CAST(sum(n) AS BIGINT) AS c2 FROM lb GROUP BY 1, 2
    ), uni AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c1 FROM (
            SELECT unnest(tk) AS w FROM t
        ) GROUP BY 1
    ), vt AS (
        SELECT CAST(count(*) AS BIGINT) AS v FROM uni
    ), per AS (
        SELECT lang, n,
               n * ({sql_iunits('ln(c1 + v)', 9)}
                    - {sql_iunits('ln(c2 + 1)', 9)}) AS nll
        FROM lb
        JOIN gb USING (w1, w2)
        JOIN uni ON lb.w1 = uni.w
        CROSS JOIN vt
    )
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_bigrams,
           CAST(sum(nll) AS BIGINT) AS total_nll_nanos,
           {sql_ratio_units('sum(nll)', 'sum(n)', 1)} AS avg_nll_nanos
    FROM per GROUP BY lang
"""




# --------------------------------------------- Wilson score interval
# Round 12: the per-slice confidence interval a curation dashboard
# puts around every keep-rate — the normal (Wald) interval collapses
# at p̂ near 0/1 and small n, exactly where filter-rate monitoring
# matters; Wilson (1927) stays inside [0, 1] and is the standard
# production choice. Per language: n, k = Gopher-rule keeps, p̂ = k/n,
# and the z = 1.96 Wilson bounds
#   (p̂ + z²/2n ± z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n).
# Exactness: counts are exact integers; the bounds are doubles built
# from ONE fixed expression shape in both engines (single sqrt — the
# portable transcendental — and pround(6), the quality_benford
# discipline). One scan, one |langs|-row aggregate.

WILSON_Z = 1.96
WILSON_Z2 = 3.8416  # z² exact literal (1.96² in decimal)


def quality_wilson_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    feat = _lr_features(
        load_table(spark, sf_dir, "documents"), extra=("lang",)
    )
    agg = feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_keep"),
    )
    n = F.col("n_docs").cast("double")
    p = F.col("n_keep").cast("double") / n
    z, z2 = F.lit(WILSON_Z), F.lit(WILSON_Z2)
    denom = F.lit(1.0) + z2 / n
    center = (p + z2 / (F.lit(2.0) * n)) / denom
    half = (
        z
        * F.sqrt(
            p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
        )
        / denom
    )
    return agg.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_keep").cast("long").alias("n_keep"),
        pround(p, 6).alias("keep_rate"),
        pround(center - half, 6).alias("wilson_lo"),
        pround(center + half, 6).alias("wilson_hi"),
    )


QUERIES["quality_wilson_interval"] = quality_wilson_interval


def _wilson_sql() -> str:
    n = "CAST(n_docs AS DOUBLE)"
    p = f"(CAST(n_keep AS DOUBLE) / {n})"
    z, z2 = WILSON_Z, WILSON_Z2
    denom = f"(1.0 + {z2} / {n})"
    center = f"(({p} + {z2} / (2.0 * {n})) / {denom})"
    half = (
        f"({z} * sqrt({p} * (1.0 - {p}) / {n}"
        f" + {z2} / (4.0 * {n} * {n})) / {denom})"
    )
    # the per_doc logreg CTE does not carry lang — re-derive the
    # Gopher keep flag with lang directly (the text_gopher_rules SQL)
    mwl = sql_pround(
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(toks, x -> CAST(len(x) AS BIGINT))), "
        "(a, b) -> a + b) AS DOUBLE) / greatest(len(toks), 1)", 6)
    sym = sql_pround(
        "CAST((len(text) - len(replace(text, '#', ''))) "
        "+ (len(text) - len(replace(text, '...', ''))) / 3 "
        "AS DOUBLE) / greatest(len(toks), 1)", 6)
    alpha = sql_pround(
        "CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
        "AS DOUBLE) / greatest(len(toks), 1)", 6)
    return f"""
    WITH t AS (
        SELECT lang, text, {{TOKS}} AS toks FROM documents
    ), m AS (
        SELECT lang,
               CAST(len(toks) AS BIGINT) AS n_words,
               {mwl} AS mean_word_len,
               {sym} AS symbol_ratio,
               {alpha} AS alpha_frac,
               CAST(len(list_filter(toks, x -> x IN ({{STOPS}})))
                    AS BIGINT) AS n_stopwords
        FROM t
    ), perdoc AS (
        SELECT lang,
               CAST(n_words BETWEEN {{MINW}} AND {{MAXW}}
                    AND mean_word_len BETWEEN {{MINM}} AND {{MAXM}}
                    AND symbol_ratio <= {{MAXS}}
                    AND alpha_frac >= {{MINA}}
                    AND n_stopwords >= {{MINSTOP}} AS INTEGER) AS keep
        FROM m
    ),
    agg AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(keep) AS BIGINT) AS n_keep
        FROM perdoc GROUP BY 1
    )
    SELECT lang, n_docs, n_keep,
           {sql_pround(p, 6)} AS keep_rate,
           {sql_pround(f'{center} - {half}', 6)} AS wilson_lo,
           {sql_pround(f'{center} + {half}', 6)} AS wilson_hi
    FROM agg
"""


ORACLES["quality_wilson_interval"] = (
    _wilson_sql()
    .replace("{TOKS}", sql_tokens("text"))
    .replace("{STOPS}", _GR_STOPLIST_SQL)
    .replace("{MINW}", str(GR_MIN_WORDS))
    .replace("{MAXW}", str(GR_MAX_WORDS))
    .replace("{MINM}", str(GR_MIN_MWL))
    .replace("{MAXM}", str(GR_MAX_MWL))
    .replace("{MAXS}", str(GR_MAX_SYMBOL))
    .replace("{MINA}", str(GR_MIN_ALPHA))
    .replace("{MINSTOP}", str(GR_MIN_STOP))
)


# ----------------------------------------------------- Gwet's AC1
# Round 12: the paradox-robust twin of quality_kappa_model_rule on
# the SAME model-vs-rule pairing (distilled logreg @ 0.5 vs the
# incumbent Gopher keep rule). Cohen's κ collapses toward 0 under
# skewed prevalence even at high raw agreement (the "kappa paradox",
# Feinstein & Cicchetti 1990); Gwet's AC1 (2008) replaces the
# chance-agreement model with e(γ) = 2π(1−π), π = (p₁+p₂)/2, which
# stays stable — a curation dashboard that gates on κ alone flags
# healthy skewed slices, so ship both numbers off one contingency
# pass. Closed form on the exact 2×2 cells:
# AC1 = [2n(tp+tn) − m(2n−m)] / [2n² − m(2n−m)], m = 2·tp+fp+fn —
# numerator signed (offset-shifted DECIMAL rational), denominator
# n² + (n−m)² > 0 for n > 0. One aggregate over the shared per-doc
# logreg artifact; the oracle replays the identical cells and
# rational off the nested per-doc CTE.


def quality_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec, ratio_units_dec_signed

    scored = _lr_scored(spark, sf_dir).select(
        (F.col("score_units").cast("double") / F.lit(1e9)).alias("p"),
        F.col("keep"),
    )
    pa = (F.col("p") >= F.lit(MCN_THR)).cast("long")
    y = F.col("keep").cast("long")
    cm = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(pa * y).alias("tp"),
        F.sum(pa * (1 - y)).alias("fp"),
        F.sum((1 - pa) * y).alias("fn"),
        F.sum((1 - pa) * (1 - y)).alias("tn"),
    )
    m = "(2 * tp + fp + fn)"
    return cm.select(
        F.col("n").alias("n_docs"),
        (F.col("tp") + F.col("tn")).alias("n_agree"),
        F.expr(m).cast("long").alias("m_pos_marginals"),
        ratio_units_dec("tp + tn", "n").alias("po_micros"),
        ratio_units_dec(
            f"CAST({m} AS DECIMAL(38,0)) * (2 * n - {m})",
            "2 * CAST(n AS DECIMAL(38,0)) * n",
        ).alias("pe_gamma_micros"),
        F.when(F.col("n") == 0, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec_signed(
                f"2 * CAST(n AS DECIMAL(38,0)) * (tp + tn)"
                f" - CAST({m} AS DECIMAL(38,0)) * (2 * n - {m})",
                f"2 * CAST(n AS DECIMAL(38,0)) * n"
                f" - CAST({m} AS DECIMAL(38,0)) * (2 * n - {m})",
                off=16,
            )
        )
        .alias("ac1_micros"),
    )


QUERIES["quality_gwet_ac1"] = quality_gwet_ac1

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_ac1,
    sql_ratio_units_dec_signed as _sql_ruds_ac1,
)

_AC1_M = "(2 * tp + fp + fn)"

ORACLES["quality_gwet_ac1"] = f"""
    WITH perdoc AS ({{_PD}}),
    cm AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN p >= {MCN_THR} AND keep = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN p >= {MCN_THR} AND keep = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN p < {MCN_THR} AND keep = 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN p < {MCN_THR} AND keep = 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM (SELECT CAST(score_units AS DOUBLE) / 1000000000.0 AS p,
                     keep
              FROM perdoc)
    )
    SELECT n AS n_docs,
           CAST(tp + tn AS BIGINT) AS n_agree,
           CAST({_AC1_M} AS BIGINT) AS m_pos_marginals,
           {_sql_rud_ac1('tp + tn', 'n')} AS po_micros,
           {_sql_rud_ac1(
               f'CAST({_AC1_M} AS HUGEINT) * (2 * n - {_AC1_M})',
               '2 * CAST(n AS HUGEINT) * n')} AS pe_gamma_micros,
           CASE WHEN n = 0 THEN NULL
                ELSE {_sql_ruds_ac1(
                    f'2 * CAST(n AS HUGEINT) * (tp + tn)'
                    f' - CAST({_AC1_M} AS HUGEINT) * (2 * n - {_AC1_M})',
                    f'2 * CAST(n AS HUGEINT) * n'
                    f' - CAST({_AC1_M} AS HUGEINT) * (2 * n - {_AC1_M})',
                    off=16)}
           END AS ac1_micros
    FROM cm
"""

ORACLES["quality_gwet_ac1"] = ORACLES["quality_gwet_ac1"].replace(
    "{_PD}", _sql_logreg(mode="per_doc", score_where="TRUE")
)


# --------------------------------------- Cochran–Armitage trend test
# Round 12: the ORDERED-groups companion to the crosstab χ² — the
# curation dashboard question is rarely "do keep rates differ by
# slice" (quality_crosstab_chisq) but "does keep rate TREND with
# document length" (too-short and too-long docs fail Gopher for
# different reasons); the Cochran–Armitage test (1954/1955) scores
# ordered buckets s = 0..B−1 and tests the linear component:
# z² = N·(N·Σsx − X·Σsn)² / (X(N−X)(N·Σs²n − (Σsn)²)) — every factor
# an exact integer on the (bucket, kept, total) cells (length bucket
# = min(n_chars div 1000, 4)). z² is a DECIMAL micros rational, the
# trend direction the exact sign of N·Σsx − X·Σsn, and the 5% flag
# the cross-multiplied 10⁶·num² ·N > 3841459·den inequality (χ²(1)
# 0.95 = 3.841459) — no doubles anywhere. Overflow ceiling: num² ≤
# ~16·N⁴ must fit DECIMAL(38,0) ⇒ exact to N ≈ 2e8 docs per slice;
# beyond that, run per-shard and Stouffer-combine. One per-doc pass
# (the Gopher flag) + one 5-row cell aggregate.

CA_BUCKET_CHARS = 120
CA_MAX_BUCKET = 4
CA_CHI2_5PCT_MICROS = 3_841_459


def quality_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import ratio_units_dec

    docs = load_table(spark, sf_dir, "documents")
    feat = _lr_features(docs, extra=("n_chars",))
    cells = feat.groupBy(
        F.least(
            F.expr(f"n_chars div {CA_BUCKET_CHARS}"),
            F.lit(CA_MAX_BUCKET),
        ).alias("s")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("keep").alias("x"))
    dec = "decimal(38,0)"
    m = cells.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("n").alias("nn"),
        F.sum("x").alias("xx"),
        F.sum(F.col("s").cast(dec) * F.col("x")).alias("sx"),
        F.sum(F.col("s").cast(dec) * F.col("n")).alias("sn"),
        F.sum(
            (F.col("s").cast(dec) * F.col("s") * F.col("n")).cast(dec)
        ).alias("ssn"),
    )
    num = f"(CAST(nn AS {dec}) * sx - CAST(xx AS {dec}) * sn)"
    den = (
        f"(CAST(xx AS {dec}) * (nn - xx)"
        f" * (CAST(nn AS {dec}) * ssn - CAST(sn AS {dec}) * sn))"
    )
    degenerate = (
        (F.col("xx") == 0)
        | (F.col("xx") == F.col("nn"))
        | (F.expr(f"CAST(nn AS {dec}) * ssn - CAST(sn AS {dec}) * sn") == 0)
    )
    return m.select(
        F.col("n_buckets").cast("int").alias("n_buckets"),
        F.col("nn").cast("long").alias("n_docs"),
        F.col("xx").cast("long").alias("n_kept"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(F.expr(f"CAST(sign({num}) AS INT)"))
        .alias("trend_sign"),
        F.when(degenerate, F.lit(None).cast("long"))
        .otherwise(
            ratio_units_dec(f"CAST(nn AS {dec}) * {num} * {num}", den)
        )
        .alias("z2_micros"),
        F.when(degenerate, F.lit(None).cast("int"))
        .otherwise(
            (
                F.expr(
                    f"1000000 * CAST(nn AS {dec}) * {num} * {num}"
                )
                > F.expr(f"{CA_CHI2_5PCT_MICROS} * {den}")
            ).cast("int")
        )
        .alias("significant_5pct"),
    )


QUERIES["quality_cochran_armitage"] = quality_cochran_armitage

from ..functions.rounding import (  # noqa: E402
    sql_ratio_units_dec as _sql_rud_ca,
)


def _ca_sql() -> str:
    mwl = sql_pround(
        "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "list_transform(toks, x -> CAST(len(x) AS BIGINT))), "
        "(a, b) -> a + b) AS DOUBLE) / greatest(len(toks), 1)", 6)
    sym = sql_pround(
        "CAST((len(text) - len(replace(text, '#', ''))) "
        "+ (len(text) - len(replace(text, '...', ''))) / 3 "
        "AS DOUBLE) / greatest(len(toks), 1)", 6)
    alpha = sql_pround(
        "CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) "
        "AS DOUBLE) / greatest(len(toks), 1)", 6)
    num = "(CAST(nn AS HUGEINT) * sx - CAST(xx AS HUGEINT) * sn)"
    den = (
        "(CAST(xx AS HUGEINT) * (nn - xx)"
        " * (CAST(nn AS HUGEINT) * ssn - CAST(sn AS HUGEINT) * sn))"
    )
    return f"""
    WITH t AS (
        SELECT n_chars, text, {{TOKS}} AS toks FROM documents
    ), m0 AS (
        SELECT n_chars,
               CAST(len(toks) AS BIGINT) AS n_words,
               {mwl} AS mean_word_len,
               {sym} AS symbol_ratio,
               {alpha} AS alpha_frac,
               CAST(len(list_filter(toks, x -> x IN ({{STOPS}})))
                    AS BIGINT) AS n_stopwords
        FROM t
    ), perdoc AS (
        SELECT least(n_chars // {CA_BUCKET_CHARS}, {CA_MAX_BUCKET}) AS s,
               CAST(n_words BETWEEN {{MINW}} AND {{MAXW}}
                    AND mean_word_len BETWEEN {{MINM}} AND {{MAXM}}
                    AND symbol_ratio <= {{MAXS}}
                    AND alpha_frac >= {{MINA}}
                    AND n_stopwords >= {{MINSTOP}} AS INTEGER) AS keep
        FROM m0
    ), cells AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(keep) AS BIGINT) AS x
        FROM perdoc GROUP BY 1
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(x) AS BIGINT) AS xx,
               CAST(sum(CAST(s AS HUGEINT) * x) AS HUGEINT) AS sx,
               CAST(sum(CAST(s AS HUGEINT) * n) AS HUGEINT) AS sn,
               CAST(sum(CAST(s AS HUGEINT) * s * n) AS HUGEINT) AS ssn
        FROM cells
    )
    SELECT CAST(n_buckets AS INTEGER) AS n_buckets,
           nn AS n_docs, xx AS n_kept,
           CASE WHEN xx = 0 OR xx = nn
                  OR CAST(nn AS HUGEINT) * ssn
                     - CAST(sn AS HUGEINT) * sn = 0 THEN NULL
                ELSE CAST(sign({num}) AS INTEGER)
           END AS trend_sign,
           CASE WHEN xx = 0 OR xx = nn
                  OR CAST(nn AS HUGEINT) * ssn
                     - CAST(sn AS HUGEINT) * sn = 0 THEN NULL
                ELSE {_sql_rud_ca(f'CAST(nn AS HUGEINT) * {num} * {num}',
                                  den)}
           END AS z2_micros,
           CASE WHEN xx = 0 OR xx = nn
                  OR CAST(nn AS HUGEINT) * ssn
                     - CAST(sn AS HUGEINT) * sn = 0 THEN NULL
                ELSE CAST(1000000 * CAST(nn AS HUGEINT) * {num} * {num}
                          > {CA_CHI2_5PCT_MICROS} * {den} AS INTEGER)
           END AS significant_5pct
    FROM m
"""


ORACLES["quality_cochran_armitage"] = (
    _ca_sql()
    .replace("{TOKS}", sql_tokens("text"))
    .replace("{STOPS}", _GR_STOPLIST_SQL)
    .replace("{MINW}", str(GR_MIN_WORDS))
    .replace("{MAXW}", str(GR_MAX_WORDS))
    .replace("{MINM}", str(GR_MIN_MWL))
    .replace("{MAXM}", str(GR_MAX_MWL))
    .replace("{MAXS}", str(GR_MAX_SYMBOL))
    .replace("{MINA}", str(GR_MIN_ALPHA))
    .replace("{MINSTOP}", str(GR_MIN_STOP))
)


# ------------------------------------------ character entropy rate
# Round 12: the CHARACTER-level compressibility ladder — the classic
# "compression ratio" junk filter (CCNet/RedPajama gate on it) without
# shipping zlib into the engine: Shannon's H₁ (char unigram entropy)
# and the conditional H₂ = H(c_t | c_{t−1}) (bigram entropy rate)
# bound any order-2 compressor's bits-per-char; gibberish and
# key-mash text read HIGH on both, template/boilerplate reads LOW on
# H₂ long before H₁ moves (repetitive structure is a bigram
# phenomenon). Corpus-level per source: char n-gram counts are exact
# integers off a substring explode; each entropy term is
# n·(snap9(ln N) − snap9(ln n)) (H₁) or n_ab·(snap9(ln n_a·) −
# snap9(ln n_ab)) (H₂, the transition-entropy identity) — logs of
# exact positive integers, nano-snapped, averaged as one integer
# rational in nanos. Scale: vocabulary-grain after one explode pass
# (char alphabet × alphabet is tiny); never a window.


def text_char_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import iunits, ratio_units

    docs = load_table(spark, sf_dir, "documents")
    # split-based char array: per-index substring() is O(i) on UTF8
    # strings, making the naive sequence+substring explode QUADRATIC
    # per document (measured 9 s warm at sf0.1 before this rewrite;
    # 3.5 s after); zip_with pads the shifted slice with NULL for the
    # final char, which is exactly the "no successor" marker H2 needs
    docs = docs.withColumn(
        "cs", F.expr("filter(split(text, ''), x -> x != '')")
    )
    chars = docs.select(
        "source",
        F.explode(
            F.expr(
                "zip_with(cs, slice(cs, 2, greatest(size(cs) - 1, 0)),"
                " (x, y) -> struct(x AS a, y AS b))"
            )
        ).alias("p"),
    ).select("source", "p.a", "p.b")
    # r13 OPT: aggregate to (source, a, b) grain in ONE explode pass
    # (map-side partial agg; the old char-grain localCheckpoint
    # materialized every character of the corpus just so two consumers
    # could re-aggregate it). The unigram counts are recoverable
    # exactly: every char appears as ``a`` in exactly one zip_with
    # pair (the final char with b = NULL), so n(source, a) = Σ_b nab
    # including the NULL-b rows. The checkpointed relation is now
    # alphabet²-bounded, not corpus-bounded.
    bi_all = (
        chars.groupBy("source", "a", "b")
        .agg(F.count(F.lit(1)).alias("nab"))
        .localCheckpoint(eager=False)
    )
    uni = bi_all.groupBy("source", "a").agg(F.sum("nab").alias("n"))
    n_tot = uni.groupBy("source").agg(F.sum("n").alias("nn"))
    h1 = (
        uni.join(n_tot, "source")
        .groupBy("source")
        .agg(
            F.max("nn").alias("n_chars"),
            F.sum(
                F.col("n")
                * (
                    iunits(F.log(F.col("nn").cast("double")), 9)
                    - iunits(F.log(F.col("n").cast("double")), 9)
                )
            ).alias("h1_sum"),
        )
    )
    bi = bi_all.filter(F.col("b").isNotNull())
    ctx = bi.groupBy("source", "a").agg(F.sum("nab").alias("na"))
    h2 = (
        bi.join(ctx, ["source", "a"])
        .groupBy("source")
        .agg(
            F.sum("nab").alias("n_bigrams"),
            F.sum(
                F.col("nab")
                * (
                    iunits(F.log(F.col("na").cast("double")), 9)
                    - iunits(F.log(F.col("nab").cast("double")), 9)
                )
            ).alias("h2_sum"),
        )
    )
    return (
        h1.join(h2, "source")
        .select(
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            ratio_units("h1_sum", "n_chars", 1).alias("h1_nanos"),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            ratio_units("h2_sum", "n_bigrams", 1).alias("h2_cond_nanos"),
        )
        .orderBy("source")
    )


QUERIES["text_char_entropy_rate"] = text_char_entropy_rate

from ..functions.rounding import (  # noqa: E402
    sql_iunits as _sql_iu_ce,
    sql_ratio_units as _sql_ru_ce,
)

ORACLES["text_char_entropy_rate"] = f"""
    WITH chars AS (
        SELECT source,
               substring(text, CAST(i AS INTEGER), 1) AS a,
               CASE WHEN i < length(text)
                    THEN substring(text, CAST(i AS INTEGER) + 1, 1)
               END AS b
        FROM (
            SELECT source, text,
                   unnest(range(1, length(text) + 1)) AS i
            FROM documents
        )
    ), uni AS (
        SELECT source, a, CAST(count(*) AS BIGINT) AS n
        FROM chars GROUP BY 1, 2
    ), n_tot AS (
        SELECT source, CAST(sum(n) AS BIGINT) AS nn FROM uni GROUP BY 1
    ), h1 AS (
        SELECT uni.source,
               max(nn) AS n_chars,
               CAST(sum(n * ({_sql_iu_ce('ln(nn)', 9)}
                    - {_sql_iu_ce('ln(n)', 9)})) AS BIGINT) AS h1_sum
        FROM uni JOIN n_tot ON uni.source = n_tot.source
        GROUP BY 1
    ), bi AS (
        SELECT source, a, b, CAST(count(*) AS BIGINT) AS nab
        FROM chars WHERE b IS NOT NULL GROUP BY 1, 2, 3
    ), ctx AS (
        SELECT source, a, CAST(sum(nab) AS BIGINT) AS na
        FROM bi GROUP BY 1, 2
    ), h2 AS (
        SELECT bi.source,
               CAST(sum(nab) AS BIGINT) AS n_bigrams,
               CAST(sum(nab * ({_sql_iu_ce('ln(na)', 9)}
                    - {_sql_iu_ce('ln(nab)', 9)})) AS BIGINT) AS h2_sum
        FROM bi JOIN ctx ON bi.source = ctx.source AND bi.a = ctx.a
        GROUP BY 1
    )
    SELECT h1.source AS source,
           CAST(n_chars AS BIGINT) AS n_chars,
           {_sql_ru_ce('h1_sum', 'n_chars', 1)} AS h1_nanos,
           n_bigrams,
           {_sql_ru_ce('h2_sum', 'n_bigrams', 1)} AS h2_cond_nanos
    FROM h1 JOIN h2 ON h1.source = h2.source
    ORDER BY h1.source
"""
