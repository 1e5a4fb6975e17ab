"""Power iteration: oracle parity, eigenvector quality vs numpy,
partition invariance."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_power_iteration_gate(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(
        spark,
        ALL_QUERIES["power_iteration_embeddings"],
        ALL_ORACLES["power_iteration_embeddings"],
        SF_SMOKE,
    )


def test_power_iteration_matches_numpy(spark):
    """The distributed iterate must be BIT-EXACTLY the arbitrary-
    precision numpy simulation of the same fixed-point recurrence (the
    strongest possible check — no tolerance), and its alignment with
    the true dominant eigenvector of the quantized Gram matrix must
    improve monotonically with rounds (this fixture's eigengap is tiny,
    λ2/λ1 ≈ 0.93, so full convergence would need ~60 rounds — round
    count is the accuracy dial, not a correctness parameter)."""
    from multithreaded_map_reduce_spark.operators.powerit import (
        VSCALE,
        power_iteration,
    )
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    # iunits_grid twin (round 9): guard-scale snap at 1e7, then the
    # offset integer half-up reduction — the boundary-free contract
    def grid(a):
        v7 = np.floor(np.array(a, dtype=np.float64) * 1e7 + 0.5)
        return np.floor((v7 + 5 + 1e11) / 10.0) - 1e10

    X = np.array([grid(r["embedding"]) for r in rows]).astype(object)
    G = X.T @ X
    w, V = np.linalg.eigh(G.astype(np.float64))
    top = V[:, np.argmax(w)]

    def simulate(rounds):
        v = np.full(64, VSCALE, dtype=object)
        for _ in range(rounds):
            y = X.T @ (X @ v)
            m = max(abs(int(val)) for val in y)
            v = np.array(
                [
                    int(np.sign(int(val))) * ((abs(int(val)) * VSCALE) // m)
                    for val in y
                ],
                dtype=object,
            )
        return v

    def cos(v):
        vf = np.array([float(x) for x in v])
        return abs(vf @ top) / (np.linalg.norm(vf) * np.linalg.norm(top))

    got = power_iteration(emb, "vec_id", "embedding", dim=64, rounds=3).collect()
    v_spark = np.zeros(64, dtype=object)
    for r in got:
        v_spark[r["dim_idx"]] = r["component"]
    assert list(v_spark) == list(simulate(3))
    assert cos(simulate(1)) < cos(simulate(2)) < cos(v_spark)


def test_power_iteration_partition_invariance(spark):
    """Exact integer state ⇒ identical output under any partitioning."""
    from multithreaded_map_reduce_spark.operators.powerit import power_iteration
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = {
        (r["dim_idx"], r["component"])
        for r in power_iteration(emb.coalesce(1), "vec_id", "embedding", 64, 2).collect()
    }
    b = {
        (r["dim_idx"], r["component"])
        for r in power_iteration(emb.repartition(17), "vec_id", "embedding", 64, 2).collect()
    }
    assert a == b


def test_pca2_gate_and_orthogonality(spark):
    """Deflated power iteration matches its unrolled oracle; the two
    rounded integer components are near-orthogonal (|cos| small — the
    deflation actually removed the dominant direction)."""
    import math

    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["embedding_pca2"], ALL_ORACLES["embedding_pca2"], SF_SMOKE
    ) > 0
    rows = ALL_QUERIES["embedding_pca2"](spark, SF_SMOKE).collect()
    v1 = [r["component"] for r in sorted(
        (r for r in rows if r["pc"] == 1), key=lambda r: r["dim_idx"])]
    v2 = [r["component"] for r in sorted(
        (r for r in rows if r["pc"] == 2), key=lambda r: r["dim_idx"])]
    dot = sum(a * b for a, b in zip(v1, v2))
    cos = dot / math.sqrt(sum(a * a for a in v1) * sum(b * b for b in v2))
    assert abs(cos) < 0.1, cos
