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
# and caps the number of queries per round (round 1 covered exactly the
# first 50 of 70).  Re-rank so queries WITHOUT a driver CORRECTNESS row yet
# come first: the 20 names round 1 missed, then any entry new this round
# (not in either list below), then the 50 already verified in round 1.
_ROUND1_MISSING = [
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "multimodal_features",
    "q6_forecast_revenue",
    "grouping_sets_pricing",
    "exists_correlated",
    "in_subquery",
    "scalar_subquery",
    "array_functions",
    "kmv_distinct_parts",
    "q10_returned_revenue",
    "q12_priority_by_status",
    "q14_promo_share",
    "q16_supplier_counts",
    "q18_large_orders",
    "q19_disjunctive",
    "pandas_udf_scalar",
    "pandas_udaf_mean",
]


# Among driver-unverified entries, verify NEW CAPABILITY CLASSES before
# variants of already-verified shapes (a bigstar CC row adds less signal
# than a pagerank row while dedup_clusters holds the shared oracle).
_PRIORITY_NEW = [
    "pagerank_nations",
    "stats_covar",
    "text_lm_score",
    "curation_pack",
    "events_retention",
    "events_transitions",
    "events_funnel",
    "multimodal_bmp",
    "value_histogram",
    "profile_lineitem",
    "curation_decontaminate",
    "curation_stratified",
    "curation_sample_weighted",
    "curation_split",
    "curation_sample_bottomk",
    "curation_topk_quality",
    "text_normalize",
    "text_repetition",
    "dedup_clusters",
    "streaming_tumbling",
    "streaming_session",
    "streaming_join",
    "streaming_stateful",
]


def _rerank() -> None:
    global ALL_QUERIES, ALL_ORACLES
    verified_r1 = [n for n in ALL_QUERIES if n not in _ROUND1_MISSING]
    new_this_round = [
        n for n in ALL_QUERIES
        if n not in _ROUND1_MISSING and n not in _R1_VERIFIED
    ]
    new_ordered = [n for n in _PRIORITY_NEW if n in new_this_round] + [
        n for n in new_this_round if n not in _PRIORITY_NEW
    ]
    order = (
        [n for n in _ROUND1_MISSING if n in ALL_QUERIES]
        + new_ordered
        + [n for n in verified_r1 if n not in new_this_round]
    )
    ALL_QUERIES = {n: ALL_QUERIES[n] for n in order}
    ALL_ORACLES = {n: ALL_ORACLES[n] for n in order if n in ALL_ORACLES}


# Names that already have a green row in CORRECTNESS_r01.json.
_R1_VERIFIED = frozenset({
    "word_count", "inverted_index", "top_words", "grouped_values",
    "reverse_graph", "mr_word_count", "mr_inverted_index",
    "q1_pricing_summary", "agg_distinct", "rollup_pricing", "cube_orders",
    "conditional_agg", "percentiles_by_flag", "q3_shipping_priority",
    "q5_local_supplier", "join_left_counts", "join_semi_parts",
    "join_anti_customers", "topk_customers", "setop_intersect",
    "setop_except", "setop_union", "scalar_functions", "scalar_strings",
    "scalar_dates", "null_semantics", "pivot_linestatus",
    "window_topk_parts", "window_range_frame", "unpivot_pricing",
    "window_distribution", "window_running_total", "window_lag_lead",
    "window_moving_avg", "brand_above_avg", "events_tumbling",
    "events_sliding", "events_session", "asof_join_clicks",
    "events_json_props", "user_activity", "range_join_recent_clicks",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "embedding_neardup", "sim_topk_bruteforce",
    "sim_topk_lsh", "text_lang_id",
})

_rerank()
