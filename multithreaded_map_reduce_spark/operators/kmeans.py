"""Exact-integer Lloyd's k-means over an embedding column.

Everything is deterministic and cross-engine replayable, in the style
of operators/pagerank.py (fixed iteration count, exact arithmetic, the
oracle unrolls the identical chain as CTEs):

- vectors quantized to BIGINT micro-units (floor(v*1e6+0.5) — the
  portable iunits formula), so squared-L2 distances are exact BIGINT
  sums (|v| ~ 1e6, diff^2 <= 4e12, x 64 dims <= 2.6e14 << 2^63);
- init: centroid j = the quantized vector of vec_id j (j < k) — no RNG;
- assignment: argmin distance, ties broken by smallest cluster id
  (min-struct aggregation — total order, deterministic);
- update: per-dimension mean as floor(CAST(sum AS DOUBLE)/count) —
  sums stay < 2^53 so the double cast is exact and both engines floor
  the same IEEE quotient (the one-IEEE-op-per-exact-factor discipline
  from stats_covar);
- fixed iteration count, no convergence collect: the driver loop only
  builds the plan, nothing crosses to Python.

Spark-first shape: the hot side (assignment over all N vectors) never
explodes — it zip_with/aggregates BIGINT arrays against a BROADCAST
k-row centroid relation, staying JVM-side with no row blowup. Only the
centroid update explodes (N x dim rows, one shuffle on (cluster, i)),
and at 100 TB that update is the classic map-side-combinable
aggregation; k and dim are constants, so per-iteration cost is
O(N·dim·k) compute + one O(N·dim) shuffle. (For truly huge N you'd
switch to mini-batch sampling for the update; the assignment path is
already the scale shape.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import iunits


def _sq_dist(a: str, b: str) -> F.Column:
    diff_sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diff_sq, F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_vectors(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, qvec array<long>) in exact micro-units."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: iunits(x, 6)).alias("qvec"),
    )


def assign_to_centroids(vecs: DataFrame, cent: DataFrame) -> DataFrame:
    """(id, cluster, dist): nearest centroid per quantized vector,
    ties broken by smallest cluster id (min-struct — deterministic)."""
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        "id",
        "cluster",
        _sq_dist("qvec", "cvec").alias("dist"),
    )
    best = scored.groupBy("id").agg(
        F.min(F.struct("dist", "cluster")).alias("best")
    )
    return best.select(
        "id",
        F.col("best.cluster").alias("cluster"),
        F.col("best.dist").alias("dist"),
    )


def kmeans_centroids(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """(cluster, cvec) centroids after ``rounds`` full assign+update
    Lloyd rounds. Init: centroid j = the quantized vector of the
    (j+1)-th smallest id — rank-based, so it works on any id range."""
    vecs = quantized_vectors(emb, id_col, vec_col)
    init_w = Window.orderBy("id")
    centroids = (
        vecs.orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(init_w) - 1).cast("int").alias("cluster"),
            F.col("qvec").alias("cvec"),
        )
    )
    for _ in range(rounds):
        assigned = assign_to_centroids(vecs, centroids)
        dims = (
            assigned.join(vecs, "id")
            .select("cluster", F.posexplode("qvec").alias("i", "v"))
            .groupBy("cluster", "i")
            .agg(
                F.floor(
                    F.sum("v").cast("double") / F.count(F.lit(1)).cast("double")
                )
                .cast("long")
                .alias("cv")
            )
        )
        centroids = (
            dims.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cv"))),
                    lambda s: s.getField("cv"),
                ).alias("cvec")
            )
            # truncate lineage per round (graph.py discipline): without
            # this, round t's plan recomputes rounds 1..t-1 — O(rounds²)
            # work and an ever-deeper plan
            .localCheckpoint(eager=False)
        )
    return centroids


def kmeans_assign(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Final (id, cluster, dist) assignment after ``iters`` Lloyd
    assignment passes ((iters-1) assign+update rounds, then one final
    assignment — mirrors the oracle's s{iters} CTE exactly).

    ``dist`` is the exact BIGINT squared L2 distance in micro-units² to
    the final centroid.
    """
    vecs = quantized_vectors(emb, id_col, vec_col)
    cent = kmeans_centroids(emb, id_col, vec_col, k=k, rounds=iters - 1)
    return assign_to_centroids(vecs, cent)
