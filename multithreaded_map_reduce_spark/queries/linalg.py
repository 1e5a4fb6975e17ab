"""Iterative linear algebra tier: distributed power iteration over the
embeddings table (operators/powerit.py) — the top principal direction
of the corpus computed as repeated y = Xᵀ(X·v) passes, never forming
the Gram matrix. Differential discipline is the pagerank/kmeans one:
fixed rounds, exact fixed-point integers, and an oracle that unrolls
the identical chain as MATERIALIZED CTEs, so even this gets an exact
hash-matched gate row rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.powerit import power_iteration, sql_power_iteration
from ..sources.catalog import load_table

DIM = 64
ROUNDS = 3


def power_iteration_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return power_iteration(emb, "vec_id", "embedding", dim=DIM, rounds=ROUNDS)


QUERIES = {"power_iteration_embeddings": power_iteration_embeddings}

ORACLES = {
    "power_iteration_embeddings": sql_power_iteration(
        "embeddings", "vec_id", "embedding", dim=DIM, rounds=ROUNDS
    )
}
