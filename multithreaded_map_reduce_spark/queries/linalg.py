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


# --- per-dimension feature standardization -----------------------------------


def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding matrix —
    the feature-scaling pass before distance-based ML (k-means, ANN
    with L2) so no dimension dominates.

    Exactness discipline (same as stats_covar): each float enters as an
    exact integer micro-unit (float→double cast is lossless, the floor
    formula is engine-portable), per-dim moments are exact BIGINT sums
    (|v|≲1e7 micro-units, v²≲1e14, ×500 rows ≲1e17 < 2^63), and the
    z-score is computed as (n·v − s1) / sqrt(n·s2 − s1²) — integer
    numerator, sqrt and one division both IEEE-correctly-rounded —
    then pround(6).

    Scale: posexplode produces N·64 narrow rows; the moment aggregate
    is map-side combinable per dim (64 groups — broadcast back); the
    standardize pass is a stateless re-scan joined against the 64-row
    stats relation. Two scans, one tiny broadcast, no big shuffle."""
    from pyspark.sql import functions as F

    from ..functions.rounding import iunits, pround
    from ..sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "vec_id", "dim", iunits(F.col("val").cast("double"), 6).alias("v")
    )
    stats = cells.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    return (
        cells.join(F.broadcast(stats), "dim")
        .select(
            "vec_id",
            "dim",
            pround(
                (F.col("n") * F.col("v") - F.col("s1")).cast("double")
                / F.sqrt((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")),
                6,
            ).alias("z"),
        )
    )


QUERIES["embedding_standardize"] = embedding_standardize

from ..functions.rounding import sql_pround as _sql_pr  # noqa: E402

ORACLES["embedding_standardize"] = f"""
    WITH cells AS (
        SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
               CAST(floor(CAST(val AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                   AS v
        FROM (
            SELECT vec_id,
                   unnest(range(1, len(embedding) + 1)) AS i,
                   unnest(embedding) AS val
            FROM embeddings
        )
    ), stats AS (
        SELECT dim, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2
        FROM cells GROUP BY 1
    )
    SELECT vec_id, dim,
           {_sql_pr('CAST(n * v - s1 AS DOUBLE) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))', 6)}
               AS z
    FROM cells JOIN stats USING (dim)
"""


RP_DIMS = 4  # projected dimensionality
RP_A = 1_103_515_245
RP_B = 12_345
RP_MOD = 2_147_483_647


def embedding_project_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson–
    Lindenstrauss): each embedding is projected onto RP_DIMS
    deterministic pseudo-random integer planes — the feature-
    engineering step that turns 64-dim vectors into a handful of
    coordinates cheap enough to index, bucket, or ship to a dashboard.
    Plane component (j, d) is ((A·(j·dim+d) + B) mod M) − M/2, vectors
    are exact micro-unit integers, so every projected coordinate is an
    exact BIGINT dot product (|coord| ≤ 1e6·M·dim ≈ 6.4e16 < 2^63) —
    no float anywhere, which is what makes a JL projection
    differentially testable at all.

    100 TB: one scan, zero shuffle — the projection is a per-row fold
    against constants; downstream consumers bucket/sort the projected
    coordinates instead of the raw vectors."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    cols = [F.col("vec_id")]
    for j in range(RP_DIMS):
        cols.append(
            F.expr(
                f"""aggregate(
                    zip_with(embedding,
                             sequence(0, size(embedding) - 1),
                             (v, d) -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0d + 0.5d) AS BIGINT)
                                       * ((({RP_A} * CAST({j} * size(embedding) + d AS BIGINT)
                                            + {RP_B}) % {RP_MOD}) - {RP_MOD // 2})),
                    CAST(0 AS BIGINT), (acc, x) -> acc + x)"""
            ).alias(f"proj_{j}")
        )
    return emb.select(*cols)


QUERIES["embedding_project_rp"] = embedding_project_rp


def _rp_oracle() -> str:
    sel = ["vec_id"]
    for j in range(RP_DIMS):
        sel.append(
            f"""CAST(list_sum(list_transform(
                    list_zip(embedding, range(0, len(embedding))),
                    p -> CAST(floor(CAST(p[1] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                         * ((({RP_A} * CAST({j} * len(embedding) + p[2] AS BIGINT)
                              + {RP_B}) % {RP_MOD}) - {RP_MOD // 2})))
                AS BIGINT) AS proj_{j}"""
        )
    return "SELECT " + ", ".join(sel) + " FROM embeddings"


ORACLES["embedding_project_rp"] = _rp_oracle()
