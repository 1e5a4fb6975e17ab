"""Driver-gate entries for the generic MapReduce API path.

Same semantics as the declarative corpus queries, executed through the
``map_fn``/``reduce_fn`` adapter — so the correctness gate covers BOTH
the reference's client API (this module) and the Spark-first fast path
(``corpus.py``) against one oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.programs import run_inverted_index, run_word_counter
from ..sources.catalog import load_table
from .corpus import ORACLES as CORPUS_ORACLES


def mr_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_word_counter(load_table(spark, sf_dir, "documents"), combiner=True)


def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_inverted_index(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "mr_word_count": mr_word_count,
    "mr_inverted_index": mr_inverted_index,
}

ORACLES = {
    "mr_word_count": CORPUS_ORACLES["word_count"],
    "mr_inverted_index": CORPUS_ORACLES["inverted_index"],
}


def mr_chained_freq_of_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.programs import run_chained_freq_of_freq

    return run_chained_freq_of_freq(load_table(spark, sf_dir, "documents"))


QUERIES["mr_chained_freq_of_freq"] = mr_chained_freq_of_freq

ORACLES["mr_chained_freq_of_freq"] = f"""
    WITH wc AS ({CORPUS_ORACLES["word_count"]})
    SELECT cnt AS freq, count(*) AS n_words
    FROM wc GROUP BY 1
"""


GREP_PATTERN = "merge"  # fixed needle, present across the fixture corpus


def mr_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep through the reference-parity MapReduce API —
    completes the Dean & Ghemawat 2004 §2.3 canonical program set
    (grep + word count + inverted index + reverse web-link graph, the
    last already realized as ``reverse_graph``)."""
    from ..operators.programs import run_grep

    return run_grep(load_table(spark, sf_dir, "documents"), GREP_PATTERN)


QUERIES["mr_grep"] = mr_grep

ORACLES["mr_grep"] = """
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    )
    WHERE tok = '{P}'
    GROUP BY 1
""".replace(
    "{P}", GREP_PATTERN
)


def mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort through the MapReduce surface (round 12): per
    event_type, the event_ids in exact (ts, event_id) order — the
    order-sensitive reduction (sessionization, time-series assembly)
    the reference's unordered reducer vector cannot express without
    an in-core sort per key. One shuffle; values arrive at the
    reducer pre-sorted via repartitionAndSortWithinPartitions
    (operators/mapreduce.py run_secondary_sort)."""
    from ..operators.mapreduce import run_secondary_sort

    ev = load_table(spark, sf_dir, "events")
    return run_secondary_sort(
        ev, "event_type", ["ts", "event_id"], "event_id"
    )


QUERIES["mr_secondary_sort"] = mr_secondary_sort

ORACLES["mr_secondary_sort"] = """
    SELECT event_type AS key,
           string_agg(CAST(event_id AS VARCHAR), ','
                      ORDER BY ts, event_id) AS ordered_values
    FROM events
    GROUP BY event_type
"""
