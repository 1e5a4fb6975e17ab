"""The reference's two shipped applications, Spark-first.

- word_count     ← ``src/WordCounter.cpp:19-41``  (map: emit (word,"1")
  per token; reduce: sum) — here a single declarative plan:
  scan → split/explode → groupBy(word).count(). Catalyst inserts the
  map-side partial count the reference lacks (SURVEY.md §4 "combiners:
  none"), so the shuffle carries one row per (partition, word), not one
  per token occurrence — the difference between shuffling ~100 TB and
  shuffling a vocabulary.
- inverted_index ← ``src/InvertedIndex.cpp:20-39`` (map: emit
  (word, position); reduce: sort+unique). Positions here are document
  ids over the ``documents`` corpus table, numerically sorted
  (normalized semantics; the reference's lexicographic string sort is
  quirk Q1, covered by a compat test instead).

Output discipline: the harness hash-compares unordered row sets, so the
position list is emitted as a comma-joined string — identical text in
both engines, no array-hashing ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import sql_tokens
from ..functions.text import tokenize
from ..sources.catalog import load_table


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan_out here, by measurement: whitespace tokenization is cheap
    # enough that the round-robin shuffle of the raw text costs MORE
    # than the single-split scan stage it parallelizes (word_count warm
    # median 0.30 s direct vs 0.74 s fanned at sf0.1). fan_out pays
    # only on md5/shingle-heavy inputs (operators/dedup.py).
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("word")
    )


def word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token → occurrence count across the corpus."""
    return _tokens(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


def _doc_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, distinct doc ids array) via a DIRECT collect_set.

    A manual salted two-stage version of this was benchmarked and
    reverted: Spark's partial aggregation already runs collect_set
    map-side, so the reduce side merges one partial set per map task —
    the same two-level merge tree the salt builds by hand, minus the
    extra full shuffle (the salted form measured 1.9× slower at sf0.1).
    The reusable salted aggregation lives in ``operators/skew.py``
    (``salted_collect_set``) for the regime where it does pay: ≥10⁵ map
    partitions funneling into a vocabulary far smaller than the cluster,
    where a two-stage tree bounds per-reducer fan-in."""
    return _tokens(spark, sf_dir).groupBy("word").agg(
        F.collect_set("doc_id").alias("ids")
    )


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token → comma-joined ascending distinct doc ids."""
    return _doc_sets(spark, sf_dir).select(
        "word",
        F.array_join(
            F.transform(
                F.sort_array(F.col("ids")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("doc_ids"),
    )


def inverted_index_lexicographic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quirk-Q1 compat mode: the reference sorts positions as STRINGS
    ("10" < "2", ``src/InvertedIndex.cpp:35`` — positions are stringified
    line numbers, `std::sort` over strings). Same inverted index as
    ``inverted_index`` but with byte-lexicographic position order."""
    return _doc_sets(spark, sf_dir).select(
        "word",
        F.array_join(
            F.sort_array(F.transform(F.col("ids"), lambda x: x.cast("string"))), ","
        ).alias("doc_ids"),
    )


def grouped_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's grouped relation (SURVEY.md §2a row 5): key →
    ordered value list, as one shuffle + collect_list. Emitted as a
    joined string for portable hashing; the reference's ordered
    ``map<key, vector<value>>`` is the same bag, key-sorted per
    reducer (ordering is physical, not semantic — quirk Q4)."""
    return (
        _tokens(spark, sf_dir)
        .groupBy("word")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("doc_ids_all"),
            F.count("*").alias("n_values"),
        )
    )


def top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 words by count — deterministic tiebreak on the word itself."""
    wc = word_count(spark, sf_dir)
    return wc.orderBy(F.desc("cnt"), F.asc("word")).limit(20)


TOKENS_SQL = f"SELECT doc_id, unnest({sql_tokens('text')}) AS word FROM documents"

def reverse_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's PLANNED-but-dead third application,
    ReverseWeblinkGraph (commented out at ``CMakeLists.txt:35-37``):
    edges (source → target) inverted to target → sorted source list.
    Realized over the lineitem edge set (supplier ships part):
    part → ascending distinct suppliers."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("target"))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("l_suppkey")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("sources")
        )
    )


QUERIES = {
    "word_count": word_count,
    "inverted_index": inverted_index,
    "inverted_index_lexicographic": inverted_index_lexicographic,
    "top_words": top_words,
    "grouped_values": grouped_values,
    "reverse_graph": reverse_graph,
}

ORACLES = {
    "word_count": f"""
        SELECT word, count(*) AS cnt
        FROM ({TOKENS_SQL})
        GROUP BY word
    """,
    "inverted_index": f"""
        SELECT word, string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids
        FROM (SELECT DISTINCT word, doc_id FROM ({TOKENS_SQL}))
        GROUP BY word
    """,
    "inverted_index_lexicographic": f"""
        SELECT word,
               string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY CAST(doc_id AS VARCHAR)) AS doc_ids
        FROM (SELECT DISTINCT word, doc_id FROM ({TOKENS_SQL}))
        GROUP BY word
    """,
    "reverse_graph": """
        SELECT l_partkey AS target,
               string_agg(l_suppkey, ',' ORDER BY l_suppkey) AS sources
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        GROUP BY l_partkey
    """,
    "grouped_values": f"""
        SELECT word,
               string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids_all,
               count(*) AS n_values
        FROM ({TOKENS_SQL})
        GROUP BY word
    """,
    "top_words": f"""
        SELECT word, cnt FROM (
            SELECT word, count(*) AS cnt FROM ({TOKENS_SQL}) GROUP BY word
        )
        ORDER BY cnt DESC, word ASC
        LIMIT 20
    """,
}


def text_line_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL source relation under the gate: a
    line-oriented text FILE scanned into (line_no, line) with 0-based
    dense global line numbers (include/MapReduceMaster.h:463-478).

    The fixture ships parquet, so the query materializes the corpus as
    one deterministic text file first (documents ordered by doc_id,
    coalesce(1) — fine for a correctness fixture; global DENSE line
    numbers inherently impose a total order, which is why the engine's
    scale path keys by (doc_id, line_no) instead, see
    sources/text.corpus_lines). Output: per-line token count keyed by
    line number — the reference's record shape feeding its map phase.
    """
    from ..functions.text import tokenize
    from ..sources.text import read_text_lines
    from .connectors import _fixture_path

    docs = load_table(spark, sf_dir, "documents")
    path = _fixture_path("text_scan")
    (
        docs.filter(F.length("text") > 0)
        .orderBy("doc_id")
        .select(F.regexp_replace("text", "\n", " ").alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
    lines = read_text_lines(spark, path, dense=True)
    return lines.select(
        "line_no",
        F.size(tokenize(F.col("line"))).alias("n_tokens"),
        F.length("line").alias("n_chars"),
    )


QUERIES["text_line_scan"] = text_line_scan

_LINE_TOKS = (
    "list_filter(string_split_regex(replace(text, chr(10), ' '), '\\s+'),"
    " t -> t != '')"
)

ORACLES["text_line_scan"] = f"""
    SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS line_no,
           CAST(len({_LINE_TOKS}) AS INTEGER) AS n_tokens,
           CAST(length(replace(text, chr(10), ' ')) AS INTEGER) AS n_chars
    FROM documents WHERE length(text) > 0
"""
