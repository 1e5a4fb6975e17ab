"""Fixed-point PageRank vs its unrolled-CTE DuckDB oracle + invariants."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tests.oracle import compare


def test_pagerank_oracle_parity(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    assert compare(
        spark,
        ALL_QUERIES["pagerank_nations"],
        ALL_ORACLES["pagerank_nations"],
        SF_SMOKE,
    ) == 25


def test_pagerank_mass_conserved_and_bounded(spark):
    """Rank mass stays ≈ SCALE (integer truncation loses < iters·N·2
    units) and every node keeps at least the teleport floor."""
    from multithreaded_map_reduce_spark.operators.pagerank import SCALE
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.graphrank import N_NATIONS, NUM_ITER

    rows = ALL_QUERIES["pagerank_nations"](spark, SF_SMOKE).collect()
    assert len(rows) == N_NATIONS
    total = sum(r["rank_units"] for r in rows)
    assert SCALE - NUM_ITER * N_NATIONS * 100 <= total <= SCALE
    floor = (SCALE * 15) // (100 * N_NATIONS)
    assert all(r["rank_units"] >= floor for r in rows)


def test_pagerank_favors_heavy_importers(spark):
    """A nation receiving more shipment volume must outrank one
    receiving none beyond teleport mass: ranks are not all equal."""
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    rows = ALL_QUERIES["pagerank_nations"](spark, SF_SMOKE).collect()
    ranks = [r["rank_units"] for r in rows]
    assert max(ranks) > min(ranks)


def test_closeness_gate(spark):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES
    from tests.conftest import SF_SMOKE
    from tests.oracle import compare

    assert compare(
        spark,
        ALL_QUERIES["closeness_nations"],
        ALL_ORACLES["closeness_nations"],
        SF_SMOKE,
    ) > 0
