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
    connectors,
    corpus,
    curation,
    dedup,
    events,
    graphrank,
    linalg,
    mapreduce_api,
    mergeops,
    mining,
    multimodal,
    profiling,
    quality,
    privacy,
    relational,
    retrieval,
    similarity,
    sketches,
    skewproof,
    sql_surface,
    streaming_gate,
    textstats,
    tpch_more,
    timeseries,
    tpch_rest,
    udfs,
    udtf,
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
_register(linalg)
_register(profiling)
_register(quality)
_register(privacy)
_register(timeseries)
_register(udtf)
_register(mergeops)
_register(connectors)
_register(mining)
_register(retrieval)


# ------------------------------------------------------- shared artifacts
# Build-once session artifacts (persisted parquet indexes, checkpointed
# shared relations, trained weight vectors) that multiple registry
# queries ride. bench.py times each build SEPARATELY before the query
# loop, so an artifact-backed query's cold row measures the PROBE
# against a ready artifact instead of silently bundling a once-per-day
# index build into one rider's number (VERDICT r12 item 3). Each entry:
# artifact name -> (force-build fn, rider query names). Builders are
# idempotent — they hit the same per-session caches the queries use.


def _force_shingle_index(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _shared_ranked_shingles

    _shared_ranked_shingles(spark, sf_dir).count()


def _force_minhash_index_day1(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _minhash_index_path

    _minhash_index_path(spark, sf_dir, "corpus")


def _force_minhash_index_full(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _minhash_index_path

    _minhash_index_path(spark, sf_dir, "full")


def _force_ivfpq_index(spark: SparkSession, sf_dir: str) -> None:
    from .similarity import _shared_ivfpq_index

    for rel in _shared_ivfpq_index(spark, sf_dir):
        rel.count()


def _force_supplier_cograph(spark: SparkSession, sf_dir: str) -> None:
    from .graphrank import _supplier_cograph

    _supplier_cograph(spark, sf_dir).count()


def _force_knn_graph(spark: SparkSession, sf_dir: str) -> None:
    from .similarity import _knn_graph

    _knn_graph(spark, sf_dir).count()


def _force_dup_components(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _dup_components

    _dup_components(spark, sf_dir).count()


def _force_trade_edges(spark: SparkSession, sf_dir: str) -> None:
    from .graphrank import _trade_edges

    _trade_edges(spark, sf_dir).count()


def _force_copurchase_edges(spark: SparkSession, sf_dir: str) -> None:
    from .mining import _copurchase_pairs_shared

    _copurchase_pairs_shared(spark, sf_dir).count()


def _force_daily_event_counts(spark: SparkSession, sf_dir: str) -> None:
    from .timeseries import _daily_event_counts

    _daily_event_counts(spark, sf_dir).count()


def _force_lsh_eval(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _lsh_eval_artifacts

    sigs, truth = _lsh_eval_artifacts(spark, sf_dir)
    sigs.count()
    truth.count()


def _force_mh_eval(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _mh_eval_relations

    cand, side = _mh_eval_relations(spark, sf_dir)
    cand.count()
    side.count()


def _force_detector_pairs(spark: SparkSession, sf_dir: str) -> None:
    from .dedup import _shared_minhash_pairs, _shared_simhash_pairs

    _shared_minhash_pairs(spark, sf_dir).count()
    _shared_simhash_pairs(spark, sf_dir).count()


def _force_audio_pcm(spark: SparkSession, sf_dir: str) -> None:
    from .multimodal import _shared_audio_pcm

    _shared_audio_pcm(spark, sf_dir).count()


def _force_lr_weights(spark: SparkSession, sf_dir: str) -> None:
    # weights (collected floats) + the score-once checkpointed corpus
    # relation every readout rider aggregates (r13 OPT)
    from .textstats import _lr_scored

    _lr_scored(spark, sf_dir).count()


ArtifactBuilder = Callable[[SparkSession, str], None]

ARTIFACT_BUILDERS: dict[str, tuple[ArtifactBuilder, tuple[str, ...]]] = {
    "shingle_index": (
        _force_shingle_index,
        (
            "dedup_jaccard_prefix",
            "dedup_containment",
            "dedup_minhash_accuracy",
            "dedup_minhash_lsh",
            "dedup_minhash_bbit",
            "dedup_cross_source_matrix",
            "dedup_capture_recapture",
        ),
    ),
    "minhash_index_day1": (
        _force_minhash_index_day1,
        ("dedup_incremental_day2", "dedup_incremental_keep"),
    ),
    "minhash_index_full": (
        _force_minhash_index_full,
        ("curation_split_persisted", "curation_pipeline_report"),
    ),
    "ivfpq_index": (
        _force_ivfpq_index,
        ("sim_topk_ivfpq", "sim_topk_ivfpq_rerank", "ann_mrr_map_report"),
    ),
    "dup_components": (
        _force_dup_components,
        (
            "dedup_cluster_histogram",
            "curation_split_leakproof",
            "curation_pipeline_report",
            "dedup_pipeline_summary",
        ),
    ),
    "knn_graph": (
        _force_knn_graph,
        (
            "embedding_hubness",
            "embedding_intrinsic_dim",
            "embedding_knn_outliers",
        ),
    ),
    "daily_event_counts": (
        _force_daily_event_counts,
        (
            "timeseries_ljung_box",
            "timeseries_runs_test",
            "timeseries_hurst_rs",
            "timeseries_variance_ratio",
            "timeseries_ar1_halflife",
            "timeseries_periodogram",
            "timeseries_mann_kendall",
            "timeseries_seasonal_mann_kendall",
            "timeseries_ses_gridsearch",
            "timeseries_spectral_entropy",
            "timeseries_turning_points",
            "timeseries_cox_stuart",
            "timeseries_kpss",
            "timeseries_cum_periodogram",
        ),
    ),
    "copurchase_edges": (
        _force_copurchase_edges,
        (
            "copurchase_rules",
            "graph_link_prediction",
            "graph_modularity",
        ),
    ),
    "trade_edges": (
        _force_trade_edges,
        (
            "pagerank_nations",
            "ppr_region_nations",
            "sssp_nations",
            "closeness_nations",
            "graph_hits_nations",
            "graph_labelprop_communities",
        ),
    ),
    "supplier_cograph": (
        _force_supplier_cograph,
        (
            "graph_clustering_coefficient",
            "graph_ktruss",
            "graph_richclub",
            "graph_transitivity",
            "triangle_suppliers",
        ),
    ),
    "logreg_weights": (
        _force_lr_weights,
        (
            "quality_logreg",
            "quality_logreg_pr",
            "quality_logreg_auc",
            "quality_logreg_mcc",
            "quality_logreg_calibration",
            "quality_mcnemar",
            "quality_brier_score",
            "quality_gwet_ac1",
            "quality_kappa_model_rule",
            "curation_quality_pareto",
        ),
    ),
    "audio_pcm": (
        _force_audio_pcm,
        (
            "multimodal_audio_levels",
            "multimodal_audio_zcr",
            "multimodal_audio_snr",
            "multimodal_audio_periodicity",
            "multimodal_audio_segments",
        ),
    ),
    "lsh_eval": (
        _force_lsh_eval,
        ("dedup_lsh_recall", "dedup_banding_sweep"),
    ),
    "detector_pairs": (
        _force_detector_pairs,
        ("dedup_capture_recapture",),
    ),
    "mh_eval_side": (
        _force_mh_eval,
        ("dedup_minhash_accuracy", "dedup_minhash_bbit"),
    ),
}

# The driver's correctness gate verifies the registry in registration order
# and caps the number of queries per round (~50 of the registry). Re-rank so the
# highest-signal rows come first:
#   1. queries that have NEVER had a green driver CORRECTNESS row —
#      computed DYNAMICALLY from the CORRECTNESS_r*.json files at repo
#      root (round 4 proved a hand-maintained list goes stale the moment
#      a round lands), pre-existing queries before this round's new ones
#      (VERDICT r4 item 1: the 75 never-sampled queries are free green
#      rows; new queries queue behind them);
#   2. queries whose implementation or oracle CHANGED since their last
#      green row (ADVICE r2: a green row describing code that no longer
#      exists is not verification);
#   3. everything verified-and-unchanged, registration order.


def _driver_verified() -> set[str]:
    """Names with at least one hash_match=true row in any driver
    CORRECTNESS_r{N}.json (repo root = two levels above this package)."""
    import json
    from pathlib import Path

    seen: set[str] = set()
    root = Path(__file__).resolve().parents[2]
    for rec in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(rec.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                seen.add(name)
    return seen


# Registered for the first time in round 5 — never-verified like the
# backlog above them, but ranked AFTER it so the driver's ~50-sample
# round drains the oldest evidence gap first.
_NEW_THIS_ROUND: list[str] = [
    # round 13 — spectral/trend randomness tier, rank-quality metrics,
    # sketch set algebra, survival hazard, generalization ladder:
    "timeseries_spectral_entropy",
    "timeseries_turning_points",
    "timeseries_cox_stuart",
    "ann_mrr_map_report",
    "sketch_theta_intersection",
    "privacy_generalization",
    "events_nelson_aalen",
    # round 13 batch 2 — audio ZCR, ordinal association, variance
    # homogeneity, KPSS stationarity, weighted quantiles, multi-rater
    # agreement:
    "multimodal_audio_zcr",
    "quality_gk_gamma",
    "quality_bartlett",
    "timeseries_kpss",
    "stats_weighted_quantiles",
    "quality_fleiss_kappa",
    # round 13 batch 3 — ANSI-safe try_* surface, sweep-line peak
    # concurrency, cumulative-periodogram whiteness:
    "sql_try_arithmetic",
    "events_peak_concurrency",
    "timeseries_cum_periodogram",
    # round 13 batch 4 — two-detector dedup completeness audit,
    # cycle-robust trend, effect size:
    "dedup_capture_recapture",
    "timeseries_seasonal_mann_kendall",
    "quality_cohens_d",
    # round 13 batch 5 — dup-graph health, PQ-independence audit:
    "dedup_cluster_histogram",
    "embedding_covariance_audit",
    # round 13 batch 6 — ordered-alternative rank trend, letterbox
    # screen, session-definition sensitivity:
    "quality_jonckheere",
    "multimodal_image_borders",
    "events_session_sensitivity",
    "dedup_incremental_day2",
    "curation_split_persisted",
    "text_gopher_repetition",
    "search_rrf_fusion",
    "ann_recall_report",
    "privacy_l_diversity",
    "timeseries_holt",
    "dedup_containment",
    "streaming_hll_users",
    "embedding_neardup_ivf",
    "quality_ks_test",
    "quality_correlation",
    "streaming_checkpoint_resume",
    "connector_csv_badrecords",
    "streaming_latedata_drop",
    "quality_bootstrap_ci",
    "events_cuped",
    "dedup_incremental_keep",
    "text_heaps_fit",
    "sql_udf_pricing",
    "sql_udtf_installments",
    "connector_python_stream",
    "embedding_neardup_ivf_auto",
    "sim_topk_ivf2",
    "sim_topk_pq",
    "text_gopher_rules",
    "sim_topk_ivfpq",
    "streaming_dedup_probe",
    "curation_dsir",
    "bpe_fertility",
    "curation_coverage_greedy",
    "text_boilerplate_by_source",
    "quality_psi",
    "embedding_pca2",
    "streaming_dsir_score",
    "mg_top_words",
    "dedup_soft_weights",
    "closeness_nations",
    # round 6 — queued behind the round-5 backlog above (oldest
    # evidence gap drains first; VERDICT r5 item 2):
    "sim_topk_ivfpq_rerank",
    "curation_training_order",
    "quality_logreg",
    "streaming_quality_score",
    "curation_domain_cap",
    "ppr_region_nations",
    "quality_logreg_pr",
    "curation_shard_budget",
    "multimodal_phash_neardup",
    "curation_token_budget",
    "curation_decontaminate_semantic",
    "text_js_by_source",
    "streaming_drift_monitor",
    "multimodal_phash_clusters",
    "dedup_cross_source_matrix",
    # round 7:
    "quality_logreg_calibration",
    "text_winnowing",
    "dedup_winnowing_pairs",
    "sim_topk_mmr",
    "curation_anneal_schedule",
    "streaming_winnowing_probe",
    "timeseries_acf",
    "events_attribution",
    "quality_logreg_auc",
    "dedup_winnowing_clusters",
    "events_interarrival_regularity",
    "profile_key_skew",
    "events_behavior_entropy",
    # round 8:
    "text_ngram_novelty",
    "dedup_lsh_recall",
    "curation_doremi_weights",
    "streaming_novelty_probe",
    "text_encoding_quality",
    "dedup_minhash_accuracy",
    "streaming_ann_probe",
    "text_textrank_keywords",
    "curation_doremi_draw",
    "text_novelty_by_source",
    "quality_srm_check",
    "multimodal_audio_fingerprint",
    "text_langid_confusion",
    "multimodal_audio_fp_neardup",
    "dq_referential_integrity",
    "streaming_srm_monitor",
    "curation_pack_efficiency",
    "events_dau_wau",
    "text_seqlen_histogram",
    "embedding_norm_stats",
    "timeseries_mad_anomaly",
    # round 9:
    "quality_cohens_kappa",
    "dedup_semantic",
    "curation_unimax",
    "ann_ndcg_report",
    "sim_topk_maxsim",
    "embedding_drift_cells",
    "timeseries_backtest_mase",
    "streaming_semdedup_probe",
    "events_cohort_ltv",
    "dq_freshness",
    "quality_anova_sources",
    "graph_link_prediction",
    "dedup_banding_sweep",
    "text_burstiness",
    "streaming_freshness_monitor",
    "search_prf_expansion",
    "events_rfm",
    "quality_spearman",
    "curation_mixture_dedupaware",
    "text_code_detection",
    "multimodal_bmp_histogram",
    "privacy_t_closeness",
    "search_rank_shift",
    "timeseries_deseasonal_anomaly",
    "embedding_mmd_drift",
    "multimodal_audio_segments",
    "mr_grep",
    "curation_dataset_card",
    "events_bounce_rate",
    "quality_permutation_test",
    "events_survival_km",
    # round 10 — binaryFile connector pair, path mining, MATTR,
    # Mann-Whitney/Levene, assortativity, Theil-Sen:
    "multimodal_binaryfile_histogram",
    "multimodal_binaryfile_quarantine",
    "events_top_paths",
    "text_mattr_diversity",
    "quality_mannwhitney",
    "quality_levene",
    "graph_degree_assortativity",
    "timeseries_theil_sen",
    "graph_modularity",
    "sim_topk_ivfpq_persisted",
    "events_funnel_dwell",
    "embedding_knn_outliers",
    "events_growth_accounting",
    "timeseries_seasonal_strength",
    # round 11 — paired rank test + exact multi-quantile on the
    # two-pass rail:
    "quality_wilcoxon_signed_rank",
    "stats_quantiles_exact",
    # round 11 batch 2 — association, lexical concentration, Lorenz
    # top-share on the grouped rail:
    "quality_cramers_v",
    "text_yule_k",
    "stats_lorenz_topshare",
    # round 11 batch 3 — residual whiteness, sign-runs randomness,
    # paired classifier comparison:
    "timeseries_ljung_box",
    "timeseries_runs_test",
    "quality_mcnemar",
    # round 11 batch 4 — node-level graph cohesion, SPC p-chart,
    # fixed-width connector:
    "graph_clustering_coefficient",
    "events_spc_chart",
    "connector_fixedwidth",
    # round 11 batch 5 — per-shot keyframes, online quantile routing:
    "multimodal_keyframe_select",
    "streaming_quantile_router",
    # round 11 batch 6 — long-range dependence, SQ8 serving audit:
    "timeseries_hurst_rs",
    "embedding_quantize_int8",
    # round 11 batch 7 — higher moments, proper scoring, readability:
    "stats_skewness_kurtosis",
    "quality_brier_score",
    "text_readability",
    # round 11 batch 8 — curation skyline on the rail, sketch
    # compression audit:
    "curation_quality_pareto",
    "dedup_minhash_bbit",
    # round 11 batch 9 — the SPC chart's alerting tier:
    "streaming_spc_alert",
]

# Changed since their last green driver row. r4 verified linkage_customers;
# the rest of the r4 list carries over, plus the round-5 edits:
_CHANGED_SINCE_GREEN = [
    # round 13 ADVICE fixes — the TOST degenerate guard now tests the
    # oracle's exact Welch-term expression (cross-engine guard parity);
    # the secondary-sort operator re-keyed its composite sort
    # (key, sort...) with NULL-safe sentinels:
    "quality_tost_equivalence",
    "mr_secondary_sort",
    # round 12 FIRST — the triangle-family re-plan (VERDICT r11 item 1)
    # CHANGED THE ORACLE (support-filtered, degree-capped projection):
    # both r11-green rows describe a retired query; the family also
    # gained a session-shared build-once projection artifact (plan
    # change) in the same round:
    "triangle_suppliers",
    "graph_clustering_coefficient",
    # round 12 ADVICE re-pairs — Ljung-Box now snaps r̂_k before
    # squaring (c₀ enters linearly; oracle text changed), McNemar now
    # pairs the distilled logreg against the Gopher rule it distills
    # (both discordant cells live; oracle changed):
    "timeseries_ljung_box",
    "quality_mcnemar",
    # round 11 FIRST — the rank-statistic family moved off single-task
    # global sorts onto the value-grain / distributed-bucket rail
    # (VERDICT r10 item 1). Statistics are tie-invariant and
    # gate-verified bit-identical at two SFs, but the executed plans
    # are new — their old green rows describe retired plans:
    "quality_spearman",
    "quality_xi_correlation",
    "stats_gini",
    "events_rfm",
    "text_heaps_fit",
    # round 11 ADVICE fixes — overflow widening (decimal/HUGEINT-first
    # squares and cubes) changed oracles+plans for the changepoint pair
    # and the rank tests; the logreg sweeps now nano-snap p before
    # thresholding on the Spark side (former near-tie exposure):
    "timeseries_changepoint",
    "timeseries_changepoint2",
    "quality_kruskal_wallis",
    "quality_mannwhitney",
    "quality_logreg_pr",
    "quality_logreg_mcc",
    # round 11 decade-probe fix — adaptive ⌈√n⌉ IVF cell count (same
    # results at every fixture SF, but plan + oracle text changed):
    "knn_join_embeddings",
    "embedding_knn_outliers",
    # round 10 FIRST — the persist-leak/plan-determinism fix (VERDICT
    # r9 item 1) moved every formerly-persisted relation to a
    # localCheckpoint or a shared artifact. Results are bit-identical
    # (gate-verified locally), but the executed PLANS changed for the
    # whole dedup rail, its cluster/pipeline consumers, the IVFPQ
    # family (now train-once shared), events_cohort_ltv and
    # curation_coverage_greedy — their old green rows describe retired
    # plans:
    "dedup_jaccard_prefix",
    "dedup_containment",
    "dedup_minhash_accuracy",
    "dedup_minhash_lsh",
    "dedup_lsh_recall",
    "dedup_banding_sweep",
    "dedup_semantic",
    "dedup_incremental",
    "dedup_incremental_day2",
    "dedup_incremental_keep",
    "dedup_clusters",
    "dedup_clusters_bigstar",
    "dedup_pipeline_summary",
    "dedup_cross_source_matrix",
    "sim_topk_ivfpq",
    "sim_topk_ivfpq_rerank",
    "ann_recall_report",
    "ann_ndcg_report",
    "events_cohort_ltv",
    "curation_coverage_greedy",
    # round 9 (the round-7/5/4 entries below were all re-verified
    # green in rounds 7-8 and only remain as belt-and-braces):
    # zero-norm guard added to the ANN index build + probe — same
    # fixture results, but plan and oracle text changed:
    "streaming_ann_probe",
    # iunits_grid input snap + exact integer-decided z (values can
    # shift one micro at the former tie cells):
    "embedding_standardize",
    # round-9 full-sweep jitter fixes (all were REAL ties on the
    # regenerated fixture; outputs can move one quantum at the tie):
    "q1_pricing_summary",
    "q7_volume_shipping",
    "events_cuped",
    "embedding_pca2",
    "power_iteration_embeddings",
    # round 7: the jitter audit (tests/boundary_audit.py) flagged these
    # as rounding-boundary fragile; all were converted to exact
    # decimal/integer snaps with one final display division — values
    # change at former ties, so their green rows describe stale output:
    "window_running_total",
    "window_moving_avg",
    "brand_above_avg",
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "value_histogram",
    "timeseries_gapfill",
    # round 5: dedup_minhash_lsh now runs the Column-builder twin
    # (persisted shingles — the r4 perf verdict item); the cms_top_words
    # oracle was regenerated parameterized (same text modulo alias
    # placement); multimodal_decode / connector_binaryfile_decode /
    # text_line_scan oracles went through the template refactor:
    "dedup_minhash_lsh",
    "cms_top_words",
    "multimodal_decode",
    "connector_binaryfile_decode",
    "text_line_scan",
    # round-4 perf rewrites (same results, new representation/plan —
    # hashed shingles + checkpointed pair features; re-verify):
    "dedup_ngram_jaccard",
    "dedup_editdistance",
    # salted two-stage aggregation rewrite — r1/r2 green rows
    # describe the pre-salting plan
    "inverted_index",
    "inverted_index_lexicographic",
    # round-4 NTZ timestamp migration (driver regenerated testdata with
    # naive-us timestamps; every timestamp-computing query re-ranked)
    # plus the dedup_simhash pair-generation rewrite:
    "dedup_simhash",
    "streaming_tumbling",
    "streaming_dedup",
    "streaming_session",
    "streaming_join",
    "streaming_stateful",
    "events_tumbling",
    "events_sliding",
    "events_session",
    "asof_join_clicks",
    "user_activity",
    "range_join_recent_clicks",
    "events_funnel",
    "events_retention",
    "events_transitions",
    "window_range_frame",
    "window_lag_lead",
    "q3_shipping_priority",
    "scalar_dates",
    # round-4 fan_out (single-split scan repartition) changed the PLAN
    # of every token-hashing consumer — results are set-identical, but
    # by the ADVICE-r2 standard a green row for a different plan is
    # stale:
    "word_count",
    "top_words",
    "grouped_values",
    "text_tfidf_top_terms",
    "dedup_clusters",
    "dedup_clusters_bigstar",
    "curation_decontaminate",
]


# Round-8 verification set (VERDICT r7 items 1+4). The r7 bisection
# twins proved the 5 persistent driver-reds were HUGEINT *oracle output
# types* (DuckDB sum() over ints widens to int128; the driver's hasher
# canonicalizes int128 unlike the local fetchall() path) — this round
# every one of those oracles got a CAST(... AS BIGINT) at the output
# position and tests/test_oracle_types.py lints all 304 oracles so a
# sixth can never ship. Ranked ABSOLUTELY FIRST so CORRECTNESS_r08
# samples the fixes, then the 4 never-driver-sampled r7 queries.
_DIAGNOSTICS: list[str] = [
    # round 11: drained. The r8 HUGEINT-oracle fixes and the r7
    # never-sampled four all have multiple green rows; parking them
    # here was costing head sample slots (VERDICT r10: the two
    # never-sampled r10 ops missed the 50-row sample by exactly this).
    # The lane stays for future must-resample-first emergencies.
]


def _rerank() -> None:
    global ALL_QUERIES, ALL_ORACLES
    verified = _driver_verified()
    new = set(_NEW_THIS_ROUND)
    diag = [n for n in _DIAGNOSTICS if n in ALL_QUERIES]
    dset = set(diag)
    backlog = [
        n
        for n in ALL_QUERIES
        if n not in verified and n not in new and n not in dset
    ]
    # verified members of _NEW_THIS_ROUND have their green row — they
    # stop occupying head sample slots (VERDICT r6 item 4: the ~50-query
    # round must drain the 29 never-sampled rows)
    fresh = [
        n
        for n in _NEW_THIS_ROUND
        if n in ALL_QUERIES and n not in dset and n not in verified
    ]
    # exclude duplicates with the FRESH list (not the whole
    # _NEW_THIS_ROUND set: an entry introduced in an old round, since
    # verified, then CHANGED again must re-enter through this lane —
    # round 9's streaming_ann_probe was silently deprioritized by the
    # broader exclusion)
    fset = set(fresh)
    changed = [
        n
        for n in _CHANGED_SINCE_GREEN
        if n in ALL_QUERIES
        and n not in backlog
        and n not in fset
        and n not in dset
    ]
    head = diag + backlog + fresh + changed
    order = head + [n for n in ALL_QUERIES if n not in head]
    ALL_QUERIES = {n: ALL_QUERIES[n] for n in order}
    ALL_ORACLES = {n: ALL_ORACLES[n] for n in order if n in ALL_ORACLES}


_rerank()
