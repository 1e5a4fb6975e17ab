"""Relational + window queries vs the DuckDB oracle at sf0.001 (fast)
— the driver re-checks at sf0.01; a subset re-run there in CI-ish mode
via test_sf001_vs_sf01 marker below."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare

RELATIONAL = [
    "q1_pricing_summary",
    "agg_distinct",
    "rollup_pricing",
    "cube_orders",
    "conditional_agg",
    "percentiles_by_flag",
    "q3_shipping_priority",
    "q5_local_supplier",
    "join_left_counts",
    "join_semi_parts",
    "join_anti_customers",
    "topk_customers",
    "setop_intersect",
    "setop_except",
    "setop_union",
    "scalar_functions",
    "scalar_strings",
    "scalar_dates",
    "null_semantics",
    "pivot_linestatus",
    "window_topk_parts",
    "window_range_frame",
    "window_distribution",
    "unpivot_pricing",
    "window_running_total",
    "window_lag_lead",
    "window_moving_avg",
    "brand_above_avg",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


TPCH_MORE = [
    "q10_returned_revenue",
    "q12_priority_by_status",
    "q14_promo_share",
    "q16_supplier_counts",
    "q18_large_orders",
    "q19_disjunctive",
]


@pytest.mark.parametrize("name", TPCH_MORE)
def test_tpch_more_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)
