"""Profiling/statistics queries vs DuckDB oracles + invariants."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare


@pytest.mark.parametrize(
    "name", ["profile_lineitem", "value_histogram", "stats_covar"]
)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    assert compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE) > 0


def test_histogram_partitions_the_table(spark):
    """Bin counts sum to the table row count; bins are disjoint by
    construction; every mean lies inside its bin's value range."""
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.profiling import HIST_BIN_WIDTH
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    rows = ALL_QUERIES["value_histogram"](spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r["n"] for r in rows) == total
    for r in rows:
        lo = r["bin"] * HIST_BIN_WIDTH
        assert lo <= r["mean_value"] < lo + HIST_BIN_WIDTH


def test_covar_matches_float_reference_loosely(spark):
    """The exact integer-moment corr must agree with numpy's float
    computation to ~1e-9 (they differ only by float summation order)."""
    import numpy as np

    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.sources.catalog import load_table

    row = ALL_QUERIES["stats_covar"](spark, SF_SMOKE).collect()[0]
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).toPandas()
    x = li["l_quantity"].to_numpy()
    y = (li["l_extendedprice"] * 100).round().to_numpy()
    ref = np.corrcoef(x, y)[0, 1]
    assert abs(row["corr"] - ref) < 1e-6
    assert row["n"] == len(x)
