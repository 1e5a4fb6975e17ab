"""Query registry: every implemented operator from SURVEY.md §2 shows up
here as a named (spark_query, oracle_sql) pair consumed by
``__spark_entry__.py`` and ``bench.py``.

Each query callable: ``(SparkSession, sf_dir: str) -> DataFrame``.
Each oracle: ANSI SQL DuckDB can run on the same parquet tables
(views: region nation customer supplier part orders lineitem events
documents embeddings). Computed/aggregate columns are aliased the SAME
on both sides — the harness hashes values under sorted column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

ALL_QUERIES: dict[str, QueryFn] = {}
ALL_ORACLES: dict[str, str] = {}


def _register(module) -> None:
    ALL_QUERIES.update(module.QUERIES)
    ALL_ORACLES.update(getattr(module, "ORACLES", {}))


from . import (  # noqa: E402
    corpus,
    curation,
    dedup,
    events,
    graphrank,
    mapreduce_api,
    multimodal,
    profiling,
    relational,
    similarity,
    sketches,
    skewproof,
    sql_surface,
    streaming_gate,
    textstats,
    tpch_more,
    tpch_rest,
    udfs,
    windows,
)

_register(corpus)
_register(mapreduce_api)
_register(relational)
_register(windows)
_register(events)
_register(dedup)
_register(similarity)
_register(textstats)
_register(multimodal)
_register(sql_surface)
_register(sketches)
_register(tpch_more)
_register(udfs)
_register(streaming_gate)
_register(skewproof)
_register(tpch_rest)
_register(curation)
_register(graphrank)
_register(profiling)

# The driver's correctness gate verifies the registry in registration order
# and caps the number of queries per round (~50 of 111 in rounds 1-2).
# Re-rank so the highest-signal rows come first:
#   1. queries that have NEVER had a driver CORRECTNESS row (r1 ∪ r2);
#   2. queries whose implementation or oracle CHANGED since their last
#      green row (ADVICE r2: a green row describing code that no longer
#      exists is not verification);
#   3. everything verified-and-unchanged, registration order.

# Never sampled by the driver in r1 or r2 (VERDICT r2 'What's missing' #1).
_NEVER_SAMPLED = [
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_waiting_suppliers",
    "q22_prospective_customers",
    "skew_salted_join",
]

# Changed since their last green driver row — round 3 edits:
# q6/scalar_subquery: DECIMAL→DOUBLE cast fix (were the two r2 FAILs);
# dedup_simhash: bucketed pair expansion + max_bucket cap rewrite;
# dedup_minhash_lsh: per-call unique temp view;
# dedup_ngram_jaccard / embedding_neardup: block-size rail added;
# dedup_clusters / dedup_clusters_bigstar: non-convergence now raises.
_CHANGED_THIS_ROUND = [
    "q6_forecast_revenue",
    "scalar_subquery",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "embedding_neardup",
    "dedup_clusters",
    "dedup_clusters_bigstar",
]


def _rerank() -> None:
    global ALL_QUERIES, ALL_ORACLES
    head = [n for n in _NEVER_SAMPLED if n in ALL_QUERIES] + [
        n for n in _CHANGED_THIS_ROUND if n in ALL_QUERIES
    ]
    order = head + [n for n in ALL_QUERIES if n not in head]
    ALL_QUERIES = {n: ALL_QUERIES[n] for n in order}
    ALL_ORACLES = {n: ALL_ORACLES[n] for n in order if n in ALL_ORACLES}


_rerank()
