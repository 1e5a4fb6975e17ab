"""Round-5 session additions: persisted-index day-2 dedup, fan_out
guards, bench plan-hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle import compare


def test_dedup_incremental_day2_gate(spark):
    from multithreaded_map_reduce_spark.queries.dedup import ORACLES, QUERIES

    compare(
        spark,
        QUERIES["dedup_incremental_day2"],
        ORACLES["dedup_incremental_day2"],
        SF_SMOKE,
    )


def test_probe_index_equals_inline_incremental(spark, tmp_path):
    """The persisted-index probe must produce EXACTLY the inline
    incremental pairs (parquet round-trip is semantically invisible),
    plus a canonical_id that folds into the corpus cluster map."""
    from multithreaded_map_reduce_spark.operators.dedup import (
        build_minhash_index,
        minhash_incremental_pairs,
        minhash_probe_index,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "idx")
    build_minhash_index(corpus, "doc_id", "text", path)
    probed = minhash_probe_index(batch, path, "doc_id", "text")
    inline = minhash_incremental_pairs(corpus, batch, "doc_id", "text")
    got = {
        (r["new_id"], r["match_id"], r["match_in"], r["jaccard"])
        for r in probed.collect()
    }
    want = {
        (r["new_id"], r["match_id"], r["match_in"], r["jaccard"])
        for r in inline.collect()
    }
    assert got == want
    # canonical_id: either the match's own id (unclustered) or the
    # min-id of the match's corpus cluster — never larger than match_id
    for r in probed.collect():
        assert r["canonical_id"] <= r["match_id"]


def test_build_minhash_index_artifacts(spark, tmp_path):
    """The artifact layout is the contract day-2 readers depend on."""
    from multithreaded_map_reduce_spark.operators.dedup import build_minhash_index
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") % 10 != 0)
    path = str(tmp_path / "idx")
    build_minhash_index(docs, "doc_id", "text", path)
    buckets = spark.read.parquet(f"{path}/buckets")
    hashes = spark.read.parquet(f"{path}/hashes")
    canon = spark.read.parquet(f"{path}/canonical")
    assert set(buckets.columns) == {"id", "bh"}
    assert set(hashes.columns) == {"id", "hashes"}
    assert set(canon.columns) == {"id", "root"}
    # 8 bands -> 8 band rows per non-empty doc
    n_docs = hashes.count()
    assert buckets.count() == 8 * n_docs
    # every clustered id labels to a root that is itself a member id
    roots = {r["root"] for r in canon.collect()}
    ids = {r["id"] for r in canon.collect()}
    assert roots <= ids
