"""Empty-input totality: every core operator must return an EMPTY
result (never raise) when handed zero rows — the behavior a pipeline
stage sees on an empty partition day, a fully-filtered source, or a
first incremental run."""

from __future__ import annotations

import pytest


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_exact_dedup_empty(spark):
    from multithreaded_map_reduce_spark.operators.dedup import exact_dedup

    assert exact_dedup(_empty_docs(spark), ["text"], "doc_id").count() == 0


def test_minhash_pairs_empty(spark):
    from multithreaded_map_reduce_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_dedup_pairs_sql,
    )

    assert minhash_dedup_pairs(_empty_docs(spark), "doc_id", "text").count() == 0
    assert minhash_dedup_pairs_sql(_empty_docs(spark), "doc_id", "text").count() == 0


def test_simhash_pairs_empty(spark):
    from multithreaded_map_reduce_spark.operators.dedup import simhash_pairs

    assert simhash_pairs(_empty_docs(spark), "doc_id", "text").count() == 0


def test_shingles_empty_and_whitespace_only(spark):
    from multithreaded_map_reduce_spark.operators.dedup import shingle_hash_rows

    assert shingle_hash_rows(_empty_docs(spark), "doc_id", "text").count() == 0
    ws = spark.createDataFrame([(1, "   "), (2, "")], "doc_id long, text string")
    assert shingle_hash_rows(ws, "doc_id", "text").count() == 0


def test_connected_components_empty(spark):
    from multithreaded_map_reduce_spark.operators.graph import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_knn_join_empty(spark):
    from multithreaded_map_reduce_spark.operators.similarity import knn_join_ivf

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert knn_join_ivf(emb, "vec_id", "embedding", dim=4).count() == 0


def test_incremental_pairs_empty_batch(spark):
    """First-ingest shape: corpus present, batch empty (and vice versa)."""
    from multithreaded_map_reduce_spark.operators.dedup import (
        minhash_incremental_pairs,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    empty = _empty_docs(spark)
    assert minhash_incremental_pairs(corpus, empty, "doc_id", "text").count() == 0
    out = minhash_incremental_pairs(empty, corpus, "doc_id", "text")
    assert out.filter("match_in = 'corpus'").count() == 0
