"""Text-analysis queries vs DuckDB oracles + invariants."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare

TEXT_QUERIES = [
    "text_lang_id",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_repetition",
    "text_normalize",
    "text_lm_score",
]


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_token_counts_consistent(spark):
    """BPE-ish tokens ≥ whitespace tokens (punct splits add tokens)."""
    from multithreaded_map_reduce_spark.queries.textstats import text_token_count

    for r in text_token_count(spark, SF_SMOKE).collect():
        assert r["n_bpe_tokens"] >= r["n_ws_tokens"] >= 0
        assert r["n_chars"] > 0


def test_fingerprint_detects_planted_neardups(spark):
    """Exact-duplicate fingerprints only for identical texts (none in
    fixture), but min-gram fingerprints collide for the planted
    near-dups found by the char-ngram dedup query."""
    from multithreaded_map_reduce_spark.queries.dedup import dedup_ngram_jaccard
    from multithreaded_map_reduce_spark.queries.textstats import text_fingerprint

    fp = {r["doc_id"]: r for r in text_fingerprint(spark, SF_SMOKE).collect()}
    assert len({r["fp_full"] for r in fp.values()}) == len(fp)  # all texts unique
    pairs = dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    near = [p for p in pairs if p["jaccard"] >= 0.9]
    assert near
    same_min = sum(fp[p["id_a"]]["fp_min_gram"] == fp[p["id_b"]]["fp_min_gram"] for p in near)
    assert same_min >= len(near) // 2  # most near-dups share the min-gram sketch


def test_gopher_rules_gate_and_discrimination(spark):
    """Full Gopher document-rule battery matches its oracle exactly AND
    actually discriminates on the fixture (both keep branches hit —
    a filter that keeps or drops everything is untested logic)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.oracle import compare
    from tests.conftest import SF_SMOKE

    assert compare(
        spark, ALL_QUERIES["text_gopher_rules"], ALL_ORACLES["text_gopher_rules"], SF_SMOKE
    ) > 0
    split = {
        r["keep"]: r["count"]
        for r in ALL_QUERIES["text_gopher_rules"](spark, SF_SMOKE)
        .groupBy("keep")
        .count()
        .collect()
    }
    assert split.get(0, 0) > 0 and split.get(1, 0) > 0


def test_gopher_rules_empty_doc_total(spark):
    """A zero-token document yields a metrics row with 0 ratios and
    keep=0 — not a 0/0 NaN (empty-input totality)."""
    import multithreaded_map_reduce_spark.queries.textstats as ts

    df = spark.createDataFrame(
        [(1, "", "en", "s", 0), (2, "the a " + "word " * 30, "en", "s", 150)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = ts.load_table
    try:
        ts.load_table = lambda spark, sf_dir, name: df
        rows = {r["doc_id"]: r for r in ts.text_gopher_rules(spark, "unused").collect()}
    finally:
        ts.load_table = orig
    assert rows[1]["keep"] == 0 and rows[1]["n_words"] == 0
    assert rows[1]["mean_word_len"] == 0.0
    assert rows[2]["keep"] == 1


def test_bpe_fertility_gate(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["bpe_fertility"], ALL_ORACLES["bpe_fertility"], SF_SMOKE
    ) > 0


def test_boilerplate_by_source_gate(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark,
        ALL_QUERIES["text_boilerplate_by_source"],
        ALL_ORACLES["text_boilerplate_by_source"],
        SF_SMOKE,
    ) > 0
