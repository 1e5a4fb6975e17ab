"""The remaining TPC-H plan shapes (queries/tpch_rest.py) against their
DuckDB oracles at smoke scale, plus plan contracts for the heaviest."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare

NAMES = [
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "q13_order_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_waiting_suppliers",
    "q22_prospective_customers",
]


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    assert compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE) > 0


def test_q2_broadcasts_all_dims(spark):
    """The 4-way dim join under the correlated min must broadcast every
    dim side — lineitem is the only fact allowed to shuffle."""
    from multithreaded_map_reduce_spark.plans import plan_report
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    rep = plan_report(ALL_QUERIES["q2_min_cost_supplier"](spark, SF_SMOKE))
    assert rep.broadcast_joins >= 4
    assert not rep.cartesian


def test_q7_pushes_date_filter(spark):
    from multithreaded_map_reduce_spark.plans import assert_plan
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES

    assert_plan(
        ALL_QUERIES["q7_volume_shipping"](spark, SF_SMOKE),
        require_pushed_filter="l_shipdate",
        min_broadcast_joins=3,
    )
