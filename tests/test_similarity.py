"""Similarity search: oracle parity + recall sanity."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare


@pytest.mark.parametrize("name", ["sim_topk_bruteforce", "sim_topk_lsh"])
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_bruteforce_shape(spark):
    from multithreaded_map_reduce_spark.queries.similarity import (
        K,
        N_QUERIES,
        sim_topk_bruteforce,
    )

    rows = sim_topk_bruteforce(spark, SF_SMOKE).collect()
    assert len(rows) == N_QUERIES * K
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        sims = [r["cos_sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)


def test_lsh_results_subset_of_candidates(spark):
    """LSH top-k similarities can never exceed the exact top-1."""
    from multithreaded_map_reduce_spark.queries.similarity import (
        sim_topk_bruteforce,
        sim_topk_lsh,
    )

    exact = {
        (r["query_id"], r["rank"]): r["cos_sim"]
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    best = {}
    for (q, _), s in exact.items():
        best[q] = max(best.get(q, -2.0), s)
    for r in sim_topk_lsh(spark, SF_SMOKE).collect():
        assert r["cos_sim"] <= best[r["query_id"]] + 1e-9


def test_ivf_oracle_and_recall(spark):
    """IVF-Flat matches its DuckDB oracle exactly, and its recall vs
    brute force stays above the measured floor for (4 cells, nprobe 2)
    on this fixture (deterministic centroids -> deterministic recall)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["sim_topk_ivf"], ALL_ORACLES["sim_topk_ivf"], SF_SMOKE
    ) > 0
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_ivf"](spark, SF_SMOKE).collect()
    }
    assert len(bf & ivf) >= len(bf) // 2  # >= 50% recall while probing half


def test_auto_cells_python_matches_sql_formula():
    """The adaptive-IVF cell count must agree between the Spark side
    (exact math.isqrt) and the oracle side (DuckDB floor(sqrt(n))) —
    a disagreement at any corpus size would silently change the
    candidate structure and break the differential gate. Sweep small
    n plus the perfect-square boundaries where floor(sqrt) is most
    likely to misround."""
    import duckdb

    from multithreaded_map_reduce_spark.queries.similarity import _auto_cells

    ns = list(range(1, 300)) + [
        k * k + d for k in (100, 1000, 31623, 10**6) for d in (-1, 0, 1)
    ]
    for n in ns:
        sql = duckdb.sql(
            f"SELECT GREATEST(8, CAST(floor(sqrt({n})) AS BIGINT))"
        ).fetchone()[0]
        assert sql == _auto_cells(n), n


def test_neardup_ivf_auto_gate(spark):
    """Adaptive-cell near-dup mining matches its oracle (which computes
    the same k via a scalar subquery) on the smoke fixture."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert (
        compare(
            spark,
            ALL_QUERIES["embedding_neardup_ivf_auto"],
            ALL_ORACLES["embedding_neardup_ivf_auto"],
            SF_SMOKE,
        )
        > 0
    )


def test_ivf2_oracle_and_recall(spark):
    """Two-level IVF matches its DuckDB oracle exactly; recall floor on
    the near-uniform fixture is deterministic (6/25 while scanning
    ~2/16 of the corpus — same honesty note as flat IVF: cells
    concentrate weakly here, structure is what's under test)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["sim_topk_ivf2"], ALL_ORACLES["sim_topk_ivf2"], SF_SMOKE
    ) > 0
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    iv2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_ivf2"](spark, SF_SMOKE).collect()
    }
    assert len(bf & iv2) >= 5


def test_pq_oracle_and_recall(spark):
    """PQ/ADC matches its DuckDB oracle exactly (codebook -> encode ->
    LUT -> nested-list fold all replayed); recall floor conservative
    (measured 12/25 at m=16, ksub=32 — untrained codebooks on the
    near-uniform fixture, honesty note in the operator docstring)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["sim_topk_pq"], ALL_ORACLES["sim_topk_pq"], SF_SMOKE
    ) > 0
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_pq"](spark, SF_SMOKE).collect()
    }
    assert len(bf & pq) >= 4


def test_ivfpq_oracle_and_recall(spark):
    """IVFPQ (IVF routing + residual PQ ADC) matches its DuckDB oracle
    exactly; recall floor conservative (measured 6/25 at n_cells=4,
    nprobe=2, m=16, ksub=32 — both approximations stack on the
    near-uniform fixture; structure is what's under test)."""
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark, ALL_QUERIES["sim_topk_ivfpq"], ALL_ORACLES["sim_topk_ivfpq"], SF_SMOKE
    ) > 0
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_bruteforce"](spark, SF_SMOKE).collect()
    }
    iv = {
        (r["query_id"], r["neighbor_id"])
        for r in ALL_QUERIES["sim_topk_ivfpq"](spark, SF_SMOKE).collect()
    }
    assert len(bf & iv) >= 3
