"""Curation tier: deterministic splits, hash sampling, quality top-k."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare


@pytest.mark.parametrize(
    "name",
    [
        "curation_split",
        "curation_sample_bottomk",
        "curation_topk_quality",
        "curation_sample_weighted",
        "curation_stratified",
        "curation_decontaminate",
        "curation_pack",
    ],
)
def test_oracle_match(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    assert compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE) > 0


def test_split_is_stable_and_partitions_corpus(spark):
    """The split must cover every doc exactly once and be identical on
    rerun (hash-based, not rand())."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    a = {tuple(r) for r in ALL_QUERIES["curation_split"](spark, SF_SMOKE).collect()}
    b = {tuple(r) for r in ALL_QUERIES["curation_split"](spark, SF_SMOKE).collect()}
    assert a == b
    total = sum(r[2] for r in a)
    assert total == load_table(spark, SF_SMOKE, "documents").count()
    splits = {r[0] for r in a}
    assert splits == {"train", "valid", "test"}


def test_bottomk_sample_merges_across_shards(spark):
    """Bottom-k of a uniform hash is mergeable: bottom-k of the union ==
    bottom-k of (bottom-k per shard) — the property that makes the
    sample collectable from distributed shards."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.functions.hashing import token_hash
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", token_hash(F.col("doc_id").cast("string")).alias("h")
    )
    k = 20
    full = [r["doc_id"] for r in docs.orderBy("h", "doc_id").limit(k).collect()]
    sh1 = docs.filter(F.col("doc_id") % 2 == 0).orderBy("h", "doc_id").limit(k)
    sh2 = docs.filter(F.col("doc_id") % 2 == 1).orderBy("h", "doc_id").limit(k)
    merged = [
        r["doc_id"] for r in sh1.unionByName(sh2).orderBy("h", "doc_id").limit(k).collect()
    ]
    assert full == merged


def test_weighted_sample_prefers_long_docs(spark):
    """P(keep) ∝ n_chars, so the sampled mean length must exceed the
    corpus mean, and every draw must actually satisfy draw < n_chars."""
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    rows = ALL_QUERIES["curation_sample_weighted"](spark, SF_SMOKE).collect()
    assert rows and all(r["draw"] < r["n_chars"] for r in rows)
    sampled_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus = load_table(spark, SF_SMOKE, "documents").select("n_chars").collect()
    corpus_mean = sum(r["n_chars"] for r in corpus) / len(corpus)
    assert sampled_mean > corpus_mean


def test_stratified_exact_k_per_language(spark):
    """Each language with ≥ K docs yields exactly K rows, ranked 1..K."""
    from collections import Counter

    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.curation import STRATUM_K
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    rows = ALL_QUERIES["curation_stratified"](spark, SF_SMOKE).collect()
    per_lang = Counter(r["lang"] for r in rows)
    avail = Counter(
        r["lang"] for r in load_table(spark, SF_SMOKE, "documents").select("lang").collect()
    )
    for lang, n_avail in avail.items():
        assert per_lang[lang] == min(STRATUM_K, n_avail)
    for lang in per_lang:
        ranks = sorted(r["strat_rank"] for r in rows if r["lang"] == lang)
        assert ranks == list(range(1, per_lang[lang] + 1))


def test_decontaminate_excludes_benchmark_and_flags_consistently(spark):
    """Benchmark docs never appear in the output; the contaminated flag
    is exactly (n_overlap > 0); overlap never exceeds shingle count."""
    from pyspark.sql import functions as F

    from multithreaded_map_reduce_spark.functions.hashing import token_hash
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.curation import BENCH_MOD
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    rows = ALL_QUERIES["curation_decontaminate"](spark, SF_SMOKE).collect()
    assert rows
    bench_ids = {
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id")
        .filter(token_hash(F.col("doc_id").cast("string")) % BENCH_MOD == 0)
        .collect()
    }
    assert bench_ids  # the split actually selects a benchmark
    for r in rows:
        assert r["doc_id"] not in bench_ids
        assert r["contaminated"] == int(r["n_overlap"] > 0)
        assert 0 <= r["n_overlap"] <= r["n_shingles"]


def test_dsir_gate_and_weight_spread(spark):
    """DSIR matches its oracle exactly; importance weights actually
    vary across the raw pool (a constant weight would mean the bucket
    LMs degenerated and the 'selection' is just the Gumbel noise)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["curation_dsir"], ALL_ORACLES["curation_dsir"], SF_SMOKE
    ) > 0
    rows = ALL_QUERIES["curation_dsir"](spark, SF_SMOKE).collect()
    ws = {r["logw_units"] for r in rows}
    assert len(ws) > 1


def test_coverage_greedy_gate_and_monotone(spark):
    """Greedy coverage coreset matches its unrolled-CTE oracle; marginal
    gains are non-increasing (submodularity of max coverage) and
    covered_total is the running gain sum."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark,
        ALL_QUERIES["curation_coverage_greedy"],
        ALL_ORACLES["curation_coverage_greedy"],
        SF_SMOKE,
    ) > 0
    rows = sorted(
        ALL_QUERIES["curation_coverage_greedy"](spark, SF_SMOKE).collect(),
        key=lambda r: r["round"],
    )
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    run = 0
    for r in rows:
        run += r["gain"]
        assert r["covered_total"] == run
