"""Data-curation operators (§2d tier): the selection steps an LLM
training-data pipeline runs after cleaning/dedup — deterministic
train/holdout splitting, uniform hash sampling, and quality-ranked
per-language selection. All deterministic (hash-based, no rand()), so
every one has an exact DuckDB oracle.

Scale notes: splitting and sampling are stateless scan work — the hash
IS the assignment, so the split is stable under reruns, retries, and
cluster resizes (the property rand()-based splits lack). Bottom-k
sampling uses orderBy+limit, which Spark executes as per-partition
top-k + merge, never a global sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.hashing import sql_token_hash, token_hash
from ..sources.catalog import load_table
from .textstats import text_quality

SAMPLE_K = 100
_SPLIT = "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END"


def curation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment from the md5
    hash of doc_id; per (split, lang) doc counts + char volume."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = token_hash(F.col("doc_id").cast("string")) % F.lit(100)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "lang", F.length("text").alias("_nc"))
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("_nc").alias("sum_chars"))
    )


def curation_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform deterministic sample: the SAMPLE_K docs with the smallest
    doc_id hash (bottom-k of a uniform hash = a fixed-size uniform
    sample that is stable across runs and mergeable across shards)."""
    docs = load_table(spark, sf_dir, "documents")
    h = token_hash(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", h.alias("sample_hash"))
        .orderBy(F.asc("sample_hash"), F.asc("doc_id"))
        .limit(SAMPLE_K)
    )


def curation_topk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 documents per language by the composite quality score
    (deterministic doc_id tiebreak) — quality-based corpus selection."""
    q = text_quality(spark, sf_dir).select("doc_id", "quality")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = W.partitionBy("lang").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        docs.join(q, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "rank", "doc_id", "quality")
    )


QUERIES = {
    "curation_split": curation_split,
    "curation_sample_bottomk": curation_sample_bottomk,
    "curation_topk_quality": curation_topk_quality,
}

_H = sql_token_hash("CAST(doc_id AS VARCHAR)")

ORACLES = {
    "curation_split": f"""
        SELECT {_SPLIT} AS split, lang,
               count(*) AS n_docs,
               CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_chars
        FROM (SELECT ({_H}) % 100 AS bucket, lang, text FROM documents)
        GROUP BY 1, 2
    """,
    "curation_sample_bottomk": f"""
        SELECT doc_id, {_H} AS sample_hash
        FROM documents
        ORDER BY sample_hash ASC, doc_id ASC
        LIMIT {SAMPLE_K}
    """,
    # reuses the text_quality oracle pipeline, joined back to lang
    "curation_topk_quality": None,  # filled below from textstats
}

from .textstats import ORACLES as _TS_ORACLES  # noqa: E402

ORACLES["curation_topk_quality"] = f"""
    WITH quality AS ({_TS_ORACLES["text_quality"]})
    SELECT lang, rank, doc_id, quality FROM (
        SELECT d.lang,
               CAST(row_number() OVER (
                   PARTITION BY d.lang ORDER BY q.quality DESC, q.doc_id ASC
               ) AS INTEGER) AS rank,
               q.doc_id, q.quality
        FROM quality q JOIN documents d ON q.doc_id = d.doc_id
    ) WHERE rank <= 3
"""
