"""Sketch queries: approximate distinct counting with exact oracles
(operators/sketches.py — KMV is deterministic in both engines, unlike
engine-internal HLL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import kmv_distinct, sql_kmv_distinct
from ..sources.catalog import load_table

K = 64


def kmv_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: KMV estimate vs exact distinct part count."""
    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, "l_returnflag", "l_partkey", k=K)


QUERIES = {"kmv_distinct_parts": kmv_distinct_parts}

ORACLES = {
    "kmv_distinct_parts": sql_kmv_distinct("lineitem", "l_returnflag", "l_partkey", K)
}


def cms_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min top-20 tokens over the documents corpus — the sketch
    answer to ``top_words`` (exact); comparing the two quantifies CMS
    overcount on this corpus."""
    from pyspark.sql import functions as F

    from ..functions.text import tokenize as _tokens
    from ..operators.sketches import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
    return cms_heavy_hitters(toks, "word").withColumnRenamed("val", "word")


QUERIES["cms_top_words"] = cms_top_words

from ..functions.hashing import sql_tokens as _sql_tokens  # noqa: E402
from ..operators.sketches import sql_cms_heavy_hitters as _sql_cms  # noqa: E402

ORACLES["cms_top_words"] = _sql_cms(
    f"SELECT unnest({_sql_tokens('text')}) AS val FROM documents"
).replace("SELECT val, min(c) AS cms_count", "SELECT val AS word, min(c) AS cms_count").replace(
    "GROUP BY val\n        ORDER BY cms_count DESC, val ASC",
    "GROUP BY val\n        ORDER BY cms_count DESC, word ASC",
)


def hll_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return flag: deterministic HyperLogLog estimate (256 exact
    integer registers, one shared-literal IEEE division) vs exact
    distinct part count — the register-sketch sibling of
    ``kmv_distinct_parts``; see operators/sketches.py for the
    cross-engine determinism construction."""
    from ..operators.sketches import hll_distinct

    li = load_table(spark, sf_dir, "lineitem")
    return hll_distinct(li, "l_returnflag", "l_partkey")


QUERIES["hll_distinct_parts"] = hll_distinct_parts

from ..operators.sketches import sql_hll_distinct as _sql_hll  # noqa: E402

ORACLES["hll_distinct_parts"] = _sql_hll("lineitem", "l_returnflag", "l_partkey")
