"""Hybrid-retrieval operators (§2d tier): reciprocal-rank fusion of a
lexical (BM25) and a semantic (embedding-cosine) ranking — the standard
two-tower RAG retrieval shape (Cormack et al. 2009 RRF; every hybrid
search engine ships this merge).

The two rankings cover the SAME id space: documents.doc_id and
embeddings.vec_id are aligned in the fixture (the embedding of doc i is
row i). Each ranking is first cut to its top-``RRF_CAND`` candidates —
that is the load-bearing scale property: RRF at 100 TB merges per-query
CANDIDATE LISTS (bounded k from each retriever, TakeOrdered — no global
sort), never full-corpus rankings, so the rank windows below run on
≤ 2·RRF_CAND rows regardless of corpus size.

Determinism: both scores are pround(6)-snapped BEFORE ranking with
doc_id as tiebreak, so candidate-set membership and ranks are
bit-identical across engines; the fused score 1/(K+r_a) + 1/(K+r_b) is
integer-seeded double arithmetic, identical in Spark and DuckDB, and
pround(6)-snapped on output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.rounding import pround, sql_pround
from ..functions.vectors import as_double, cosine, sql_as_double, sql_cosine
from ..sources.catalog import load_table
from .textstats import bm25_scored, sql_bm25_ctes

RRF_K = 60
RRF_CAND = 50  # candidates taken from each retriever
RRF_TOPK = 20
RRF_QUERY_VEC = 0  # vec_id whose embedding plays the query


def _ranked(scored: DataFrame, score_col: str, rank_col: str) -> DataFrame:
    """Top-RRF_CAND candidates with dense 1-based ranks. The limit is a
    TakeOrdered (no global sort); the row_number window then runs on
    the RRF_CAND surviving rows in one partition — bounded by k, not by
    corpus size."""
    top = scored.orderBy(F.desc(score_col), F.asc("doc_id")).limit(RRF_CAND)
    w = W.orderBy(F.desc(score_col), F.asc("doc_id"))
    return top.withColumn(rank_col, F.row_number().over(w)).select(
        "doc_id", rank_col
    )


def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = _ranked(bm25_scored(docs), "bm25", "rank_bm25")
    qv = (
        emb.filter(F.col("vec_id") == RRF_QUERY_VEC)
        .select(as_double(F.col("embedding")).alias("qv"))
    )
    sem_scored = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        pround(cosine(as_double(F.col("embedding")), F.col("qv")), 6).alias("cos"),
    )
    sem = _ranked(sem_scored, "cos", "rank_cos")
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("rank_bm25", F.lit(0)).alias("rank_bm25"),
            F.coalesce("rank_cos", F.lit(0)).alias("rank_cos"),
            pround(
                F.when(
                    F.col("rank_bm25").isNotNull(),
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_bm25")),
                ).otherwise(F.lit(0.0))
                + F.when(
                    F.col("rank_cos").isNotNull(),
                    F.lit(1.0) / (F.lit(RRF_K) + F.col("rank_cos")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    top = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOPK)
    w = W.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


QUERIES = {"search_rrf_fusion": search_rrf_fusion}

ORACLES = {
    "search_rrf_fusion": f"""
    WITH {sql_bm25_ctes()}, lex AS (
        SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC)
                            AS INTEGER) AS rank_bm25
        FROM scored
        ORDER BY bm25 DESC, doc_id ASC LIMIT {RRF_CAND}
    ), qv AS (
        SELECT {sql_as_double('embedding')} AS qv FROM embeddings
        WHERE vec_id = {RRF_QUERY_VEC}
    ), sem_scored AS (
        SELECT e.vec_id AS doc_id,
               {sql_pround(sql_cosine(sql_as_double('e.embedding'), 'q.qv'), 6)} AS cos
        FROM embeddings e, qv q
    ), sem AS (
        SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id ASC)
                            AS INTEGER) AS rank_cos
        FROM sem_scored
        ORDER BY cos DESC, doc_id ASC LIMIT {RRF_CAND}
    ), fused AS (
        SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
               coalesce(lex.rank_bm25, 0) AS rank_bm25,
               coalesce(sem.rank_cos, 0) AS rank_cos,
               {sql_pround(
                   f"(CASE WHEN lex.rank_bm25 IS NOT NULL"
                   f" THEN 1.0 / ({RRF_K} + lex.rank_bm25) ELSE 0.0 END)"
                   f" + (CASE WHEN sem.rank_cos IS NOT NULL"
                   f" THEN 1.0 / ({RRF_K} + sem.rank_cos) ELSE 0.0 END)",
                   6,
               )} AS rrf
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, rank_bm25, rank_cos, rrf,
           CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INTEGER)
               AS rank
    FROM fused
    ORDER BY rrf DESC, doc_id ASC LIMIT {RRF_TOPK}
    """
}
