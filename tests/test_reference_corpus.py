"""Golden parity on the REFERENCE'S OWN bundled corpus.

The strongest parity evidence available: run this engine's WordCounter
and InvertedIndex on the exact Project Gutenberg input the reference
ships (``testcase/WordCounterInput.txt``, 3,494 lines of "The
Importance of Being Earnest") and compare against an independent
pure-Python computation of the reference's semantics
(``src/WordCounter.cpp:19-41`` / ``src/InvertedIndex.cpp:20-39``,
tokenizer quirk Q2, position-sort quirk Q1 both normalized and compat).
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path

import pytest

from pyspark.sql import functions as F

REF_INPUT = Path("/root/reference/testcase/WordCounterInput.txt")

pytestmark = pytest.mark.skipif(
    not REF_INPUT.exists(), reason="reference corpus not available"
)


def _python_reference():
    counts: Counter = Counter()
    index: dict[str, set[int]] = {}
    lines = REF_INPUT.read_text().splitlines()
    for line_no, line in enumerate(lines):
        for tok in line.split():  # quirk Q2: any-whitespace, case kept
            counts[tok] += 1
            index.setdefault(tok, set()).add(line_no)
    return lines, counts, index


def test_word_count_on_reference_corpus(spark):
    from multithreaded_map_reduce_spark.functions.text import tokenize
    from multithreaded_map_reduce_spark.sources.text import read_text_lines

    lines, counts, _ = _python_reference()
    df = read_text_lines(spark, str(REF_INPUT))
    assert df.count() == len(lines)
    wc = (
        df.select(F.explode(tokenize(F.col("line"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = {r["word"]: r["cnt"] for r in wc.collect()}
    assert got == dict(counts)
    assert sum(got.values()) == sum(counts.values())  # token conservation


def test_inverted_index_on_reference_corpus(spark):
    """Normalized semantics (numeric position sort) AND the reference's
    lexicographic quirk Q1 ('10' < '2'), via the MapReduce adapter."""
    from multithreaded_map_reduce_spark.operators.programs import run_inverted_index
    from multithreaded_map_reduce_spark.sources.text import read_text_lines

    _, _, index = _python_reference()
    docs = read_text_lines(spark, str(REF_INPUT)).withColumnRenamed(
        "line_no", "doc_id"
    ).withColumnRenamed("line", "text")

    num = {r["word"]: r["doc_ids"] for r in run_inverted_index(docs).collect()}
    want_num = {w: ",".join(str(i) for i in sorted(ids)) for w, ids in index.items()}
    assert num == want_num

    lex = {
        r["word"]: r["doc_ids"]
        for r in run_inverted_index(docs, lexicographic=True).collect()
    }
    want_lex = {w: ",".join(sorted({str(i) for i in ids})) for w, ids in index.items()}
    assert lex == want_lex
