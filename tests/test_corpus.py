"""Corpus queries (word_count / inverted_index) vs the DuckDB oracle,
plus golden semantics checks against an independent pure-Python
computation (SURVEY.md §5 'rebuild test strategy')."""

from __future__ import annotations

from collections import Counter

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_con


@pytest.mark.parametrize(
    "name", ["word_count", "inverted_index", "top_words", "grouped_values"]
)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    n = compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)
    assert n > 0


def _python_reference(sf_dir):
    """Independent reimplementation of the reference's WordCounter
    semantics (src/WordCounter.cpp:19-41, quirk Q2 tokenizer)."""
    con = duck_con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    counts: Counter = Counter()
    index: dict[str, set] = {}
    for doc_id, text in docs:
        for tok in text.split():  # any-whitespace split, case kept
            counts[tok] += 1
            index.setdefault(tok, set()).add(doc_id)
    return counts, index


def test_word_count_golden(spark):
    from multithreaded_map_reduce_spark.queries.corpus import word_count

    counts, _ = _python_reference(SF_SMOKE)
    got = {r["word"]: r["cnt"] for r in word_count(spark, SF_SMOKE).collect()}
    assert got == dict(counts)
    # count conservation: sum of counts == total token occurrences
    assert sum(got.values()) == sum(counts.values())


def test_inverted_index_golden(spark):
    from multithreaded_map_reduce_spark.queries.corpus import inverted_index

    _, index = _python_reference(SF_SMOKE)
    got = {r["word"]: r["doc_ids"] for r in inverted_index(spark, SF_SMOKE).collect()}
    want = {w: ",".join(str(i) for i in sorted(ids)) for w, ids in index.items()}
    assert got == want


def test_partition_invariance(spark):
    """Reference analog: output union independent of N_WORKER — here,
    result independent of spark.sql.shuffle.partitions."""
    from multithreaded_map_reduce_spark.queries.corpus import word_count

    base = sorted(map(tuple, word_count(spark, SF_SMOKE).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = sorted(map(tuple, word_count(spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == alt
