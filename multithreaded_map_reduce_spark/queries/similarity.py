"""Similarity-search gate queries over the embeddings fixture.

Query vectors = vec_id < 5; candidates = the rest. Both the exact
brute-force top-k AND the LSH-bucketed approximate top-k have exact
DuckDB oracles (deterministic portable hyperplanes — see
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import sql_pround
from ..functions.vectors import sql_as_double, sql_cosine
from ..operators.similarity import (
    brute_force_topk,
    lsh_topk,
    sql_home_bucket,
    sql_lsh_bucket,
    sql_plane_dots,
)
from ..sources.catalog import load_table

N_QUERIES = 5
K = 5
N_PLANES = 4
DIM = 64
PROBES = 2


def _split(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < N_QUERIES),
        emb.filter(F.col("vec_id") >= N_QUERIES),
    )


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _split(spark, sf_dir)
    return brute_force_topk(q, c, "vec_id", "embedding", k=K)


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe (2) hyperplane LSH — recall recovery with one extra
    probed bucket per query, still oracle-exact."""
    q, c = _split(spark, sf_dir)
    return lsh_topk(
        q, c, "vec_id", "embedding", k=K, n_planes=N_PLANES, dim=DIM, probes=PROBES
    )


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_topk_lsh": sim_topk_lsh,
}

_COS = sql_pround(sql_cosine("q.qv", "c.cv"), 6)

ORACLES = {
    "sim_topk_bruteforce": f"""
        WITH q AS (
            SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), c AS (
            SELECT vec_id AS neighbor_id, {sql_as_double('embedding')} AS cv
            FROM embeddings WHERE vec_id >= {N_QUERIES}
        ), scored AS (
            SELECT query_id, neighbor_id, {_COS} AS cos_sim FROM c, q
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {K}
    """,
    "sim_topk_lsh": f"""
        WITH q0 AS (
            SELECT vec_id AS query_id, {sql_as_double('embedding')} AS qv
            FROM embeddings WHERE vec_id < {N_QUERIES}
        ), qd AS (
            SELECT query_id, qv, {sql_plane_dots('qv', N_PLANES, DIM)} AS dots FROM q0
        ), qh AS (
            SELECT query_id, qv, dots, {sql_home_bucket('dots', N_PLANES)} AS home FROM qd
        ), q AS (
            SELECT query_id, qv, unnest([
                home,
                xor(home, CAST(1 << (list_position(
                    list_transform(dots, d -> abs(d)),
                    list_min(list_transform(dots, d -> abs(d)))) - 1) AS BIGINT))
            ]) AS bucket
            FROM qh
        ), c AS (
            SELECT vec_id AS neighbor_id, cv, {sql_lsh_bucket('cv', N_PLANES, DIM)} AS bucket
            FROM (SELECT vec_id, {sql_as_double('embedding')} AS cv
                  FROM embeddings WHERE vec_id >= {N_QUERIES})
        ), scored AS (
            SELECT query_id, neighbor_id, {_COS} AS cos_sim
            FROM c JOIN q ON c.bucket = q.bucket
        )
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
            ) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {K}
    """,
}
