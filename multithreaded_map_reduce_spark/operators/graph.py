"""Connected components over a pair relation — the step a production
dedup pipeline runs AFTER pair detection: near-dup pairs are edges,
components are duplicate clusters, and min(id) per component is the
deterministic canonical survivor.

Algorithm: iterative min-label propagation. Each round every node takes
the minimum label among itself and its neighbors; convergence needs
O(component diameter) rounds (near-dup clusters are shallow — a
boilerplate family has diameter ≈ 2). Each round is one join + one
aggregation, fully distributed; the driver only checks the converged
flag (a count of changed labels — a scalar per round, not data).
Deterministic: labels are ids, min is order-free.

At 100 TB: rounds × (shuffle on id) — the standard map-reduce CC
formulation (cf. the large-star/small-star refinement for deep graphs,
unnecessary at dedup diameters). The edge relation is persisted once
and reused every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, root): every node appearing in ``edges``, labeled with the
    min id reachable from it (the component's canonical id)."""
    from pyspark import StorageLevel

    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "root", F.col("id")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    for _ in range(max_iter):
        # candidate label per node: min over (own label, neighbors' labels)
        neighbor_labels = (
            sym.join(labels, sym.b == labels.id)
            .select(F.col("a").alias("id"), F.col("root"))
        )
        new_labels = (
            labels.select("id", "root")
            .unionByName(neighbor_labels)
            .groupBy("id")
            .agg(F.min("root").alias("root"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.root") != F.col("o.root"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", "root")
