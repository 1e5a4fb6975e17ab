"""Curation tier: deterministic splits, hash sampling, quality top-k."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare


@pytest.mark.parametrize(
    "name", ["curation_split", "curation_sample_bottomk", "curation_topk_quality"]
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
