"""Event-time queries vs DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle import compare

EVENT_QUERIES = [
    "events_tumbling",
    "events_sliding",
    "events_session",
    "asof_join_clicks",
    "events_json_props",
    "user_activity",
    "events_funnel",
    "events_retention",
    "events_transitions",
]


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_oracle_parity(spark, name):
    from multithreaded_map_reduce_spark.queries import ALL_ORACLES, ALL_QUERIES

    compare(spark, ALL_QUERIES[name], ALL_ORACLES[name], SF_SMOKE)


def test_session_window_semantics(spark):
    """Session end = last event ts + gap; no session spans a >gap hole."""
    from multithreaded_map_reduce_spark.queries.events import events_session

    rows = events_session(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_funnel_stage_ordering(spark):
    """Stages are strictly increasing in time and monotone in coverage:
    click implies view, purchase implies click; each step within 1h."""
    from multithreaded_map_reduce_spark.queries import ALL_QUERIES
    from multithreaded_map_reduce_spark.queries.events import FUNNEL_WINDOW_US

    rows = ALL_QUERIES["events_funnel"](spark, SF_SMOKE).collect()
    assert rows
    n_click = n_buy = 0
    for r in rows:
        assert r["view_us"] is not None
        if r["click_us"] is not None:
            n_click += 1
            assert r["view_us"] < r["click_us"] <= r["view_us"] + FUNNEL_WINDOW_US
        if r["purchase_us"] is not None:
            n_buy += 1
            assert r["click_us"] is not None
            assert r["click_us"] < r["purchase_us"] <= r["click_us"] + FUNNEL_WINDOW_US
    assert n_click >= n_buy
